"""Round-4 operational fixes (VERDICT r3 weak #4/#5, ADVICE r3):

* non-dividing GRAD_ACCUM_STEPS warns about the LR-schedule epoch drift;
* shard_batch's replication fallback warns (once per leaf shape) on a
  >1-device mesh instead of silently degrading;
* the async checkpoint writer is crash-safe: non-daemon thread, model_best
  updated via staged-copy+rename (the previous best survives a mid-copy
  crash), best.txt / pruning run only AFTER the write lands;
* SAVE_KEEP_LAST=0 clamps to 1 (never deletes the newest checkpoint).
"""

import os
import os.path as osp
import shutil
import threading
import warnings

import numpy as np
import jax
import pytest


# --------------------------------------------------------------------------- #
# grad-accum schedule guard
# --------------------------------------------------------------------------- #

def _optim_cfg(accum):
    from maed_tpu.core.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.TRAIN.OPTIM.GRAD_ACCUM_STEPS = accum
    return cfg.TRAIN.OPTIM


def test_grad_accum_nondividing_k_warns():
    from maed_tpu.parallel.train_step import make_optimizer

    with pytest.warns(UserWarning, match="does not divide steps_per_epoch"):
        make_optimizer(_optim_cfg(3), steps_per_epoch=10)


def test_grad_accum_dividing_k_is_silent():
    from maed_tpu.parallel.train_step import make_optimizer

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_optimizer(_optim_cfg(2), steps_per_epoch=10)
        make_optimizer(_optim_cfg(1), steps_per_epoch=7)


# --------------------------------------------------------------------------- #
# shard_batch replication fallback is loud
# --------------------------------------------------------------------------- #

def test_shard_batch_replication_warns_once_per_shape():
    from maed_tpu.parallel import mesh as mesh_mod

    m = mesh_mod.make_mesh(dp=4, tp=2)
    mesh_mod._replication_warned.clear()
    batch = {
        "images": np.zeros((8, 3), np.float32),      # dp-divisible: sharded
        "target_3d": {"kp_3d": np.zeros((3, 5), np.float32)},  # 3 % 4 != 0
    }
    with pytest.warns(UserWarning, match="kp_3d.*REPLICATING"):
        out = mesh_mod.shard_batch(batch, m)
    assert out["images"].sharding.spec == jax.sharding.PartitionSpec("dp")
    assert out["target_3d"]["kp_3d"].sharding.spec == jax.sharding.PartitionSpec()

    # same leaf+shape again: no duplicate warning (once-per-shape latch)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mesh_mod.shard_batch(batch, m)


def test_shard_batch_single_device_mesh_is_silent():
    from maed_tpu.parallel import mesh as mesh_mod

    m = mesh_mod.make_mesh(dp=1, tp=1, devices=np.array(jax.devices()[:1]))
    mesh_mod._replication_warned.clear()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mesh_mod.shard_batch({"x": np.zeros((3, 2), np.float32)}, m)


# --------------------------------------------------------------------------- #
# crash-safe async checkpoint writer
# --------------------------------------------------------------------------- #

def test_async_writer_thread_is_non_daemon(tmp_path):
    """A daemon writer dies with the interpreter mid-write; non-daemon means
    Python joins it at exit, so an exception unwinding out of fit() cannot
    truncate the checkpoint (ADVICE r3 medium)."""
    from maed_tpu.utils import checkpoint as ckpt

    ckpt.save_checkpoint(str(tmp_path), {"w": np.ones(3)}, name="epoch_0",
                         async_write=True)
    threads = list(ckpt._pending)
    assert threads and not threads[0].daemon
    ckpt.wait_pending_saves()


def test_model_best_survives_midcopy_crash(tmp_path, monkeypatch):
    """Simulate a crash while staging the new model_best copy: the previous
    model_best must still be on disk afterwards (the old rmtree-then-copytree
    order destroyed it first)."""
    from maed_tpu.utils import checkpoint as ckpt

    ckpt.save_checkpoint(str(tmp_path), {"w": np.ones(3)}, is_best=True,
                         name="epoch_0", async_write=False)
    best = tmp_path / "model_best"
    assert best.is_dir()
    marker = sorted(os.listdir(best))

    real_copytree = shutil.copytree

    def exploding_copytree(src, dst, *a, **k):
        # stage half the tree, then die — the mid-copy crash
        os.makedirs(dst)
        raise RuntimeError("simulated crash mid-copy")

    monkeypatch.setattr(shutil, "copytree", exploding_copytree)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ckpt.save_checkpoint(str(tmp_path), {"w": 2 * np.ones(3)}, is_best=True,
                             name="epoch_1", async_write=False)
    monkeypatch.setattr(shutil, "copytree", real_copytree)

    # previous best intact and loadable
    assert best.is_dir() and sorted(os.listdir(best)) == marker
    restored = ckpt.load_checkpoint(str(best))
    np.testing.assert_array_equal(restored["w"], np.ones(3))

    # the next successful save recovers (stale .tmp cleaned up) and swaps
    ckpt.save_checkpoint(str(tmp_path), {"w": 3 * np.ones(3)}, is_best=True,
                         name="epoch_2", async_write=False)
    restored = ckpt.load_checkpoint(str(best))
    np.testing.assert_array_equal(restored["w"], 3 * np.ones(3))
    assert not (tmp_path / "model_best.tmp").exists()
    assert not (tmp_path / "model_best.old").exists()


def test_model_best_recovers_from_crash_inside_swap_window(tmp_path):
    """Crash AFTER rename(best, old) but BEFORE rename(tmp, best): model_best
    is momentarily absent and the only copies are .old (previous best) and
    .tmp (fully staged new best). The next save must RESTORE a survivor —
    the newer .tmp — not delete both as stale."""
    from maed_tpu.utils import checkpoint as ckpt

    ckpt.save_checkpoint(str(tmp_path), {"w": np.ones(3)}, is_best=True,
                         name="epoch_0", async_write=False)
    best = tmp_path / "model_best"
    # reproduce the on-disk state of the crash window by hand (a real crash
    # there leaves the .staged marker inside the fully-copied .tmp)
    shutil.copytree(best, tmp_path / "model_best.tmp_src")
    os.rename(best, tmp_path / "model_best.old")
    os.rename(tmp_path / "model_best.tmp_src", tmp_path / "model_best.tmp")
    (tmp_path / "model_best.tmp" / ".staged").write_text("")
    assert not best.exists()

    # a non-best save touches nothing; the next best save recovers + swaps
    ckpt.save_checkpoint(str(tmp_path), {"w": 5 * np.ones(3)}, is_best=True,
                         name="epoch_1", async_write=False)
    restored = ckpt.load_checkpoint(str(best))
    np.testing.assert_array_equal(restored["w"], 5 * np.ones(3))
    assert not (tmp_path / "model_best.tmp").exists()
    assert not (tmp_path / "model_best.old").exists()


def test_partial_tmp_never_promoted_to_model_best(tmp_path):
    """Crash mid-copytree during the FIRST-ever best save leaves a partial
    .tmp and NO model_best/.old. The next best save must not promote the
    truncated copy (it lacks the .staged marker) — a half-copied model_best
    would look valid until an orbax restore fails opaquely."""
    from maed_tpu.utils import checkpoint as ckpt

    os.makedirs(tmp_path / "model_best.tmp")
    (tmp_path / "model_best.tmp" / "garbage").write_text("partial copy")

    ckpt.save_checkpoint(str(tmp_path), {"w": 7 * np.ones(3)}, is_best=True,
                         name="epoch_0", async_write=False)
    best = tmp_path / "model_best"
    restored = ckpt.load_checkpoint(str(best))
    np.testing.assert_array_equal(restored["w"], 7 * np.ones(3))
    assert not (best / ".staged").exists()  # marker never ships in best
    assert not (best / "garbage").exists()  # partial tmp was discarded
    assert not (tmp_path / "model_best.tmp").exists()


def test_agree_preempt_promotes_remote_flag(monkeypatch):
    """Multi-process preemption stop: a rank whose OWN flag is unset must
    adopt a peer's SIGTERM at the agreement boundary, so every rank breaks
    at the same iteration (a lone early exit hangs the others' next
    gradient all-reduce)."""
    import sys
    import types

    from maed_tpu.core import trainer as trainer_mod

    class Dummy:
        _preempt_requested = False

    d = Dummy()
    fake = types.SimpleNamespace(
        process_allgather=lambda x: np.array([0, 1], np.int32))
    monkeypatch.setattr(trainer_mod.jax, "process_count", lambda: 2)
    monkeypatch.setitem(sys.modules, "jax.experimental.multihost_utils", fake)
    monkeypatch.setattr(jax.experimental, "multihost_utils", fake,
                        raising=False)
    assert trainer_mod.Trainer._agree_preempt(d) is True
    assert d._preempt_requested is True  # promoted, so fit() also stops


def test_on_success_runs_after_write_lands(tmp_path):
    """best.txt/pruning bookkeeping must observe the finished write: the
    callback fires on the writer thread only once the epoch dir exists."""
    from maed_tpu.utils import checkpoint as ckpt

    seen = {}

    def cb():
        seen["thread"] = threading.current_thread().name
        seen["dir_exists"] = osp.isdir(osp.join(str(tmp_path), "epoch_0"))

    ckpt.save_checkpoint(str(tmp_path), {"w": np.ones(3)}, name="epoch_0",
                         async_write=True, on_success=cb)
    ckpt.wait_pending_saves()
    assert seen["dir_exists"]
    assert seen["thread"].startswith("ckpt-write")

    # a failed write must NOT run the callback
    seen.clear()
    ckpt.save_checkpoint(str(tmp_path), {"w": object()},  # unserializable
                         name="epoch_1", async_write=True, on_success=cb)
    with pytest.raises(BaseException):
        ckpt.wait_pending_saves()
    assert not seen


def test_save_keep_last_zero_clamps_to_one(tmp_path):
    from maed_tpu.core.trainer import Trainer

    t = Trainer.__new__(Trainer)
    t.logdir = str(tmp_path)
    t.save_keep_last = 0
    for e in (1, 2, 3):
        os.makedirs(tmp_path / f"epoch_{e}")
    Trainer._prune_checkpoints(t)
    assert sorted(os.listdir(tmp_path)) == ["epoch_3"]


def test_broadcast_str_single_process_identity():
    """broadcast_str_from_rank0 degenerates to identity when there is only
    one process (no collective, no device work) — the common single-host
    path must not pay or require a distributed runtime. The real 2-process
    broadcast is exercised in test_multiprocess via tests/mp_worker.py."""
    from maed_tpu.core.trainer import broadcast_str_from_rank0

    assert broadcast_str_from_rank0("", rank=0) == ""
    path = "results/19-08-2026_x_default/preempt"
    assert broadcast_str_from_rank0(path, rank=0) == path
