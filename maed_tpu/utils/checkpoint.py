"""Checkpointing: orbax-backed pytree save/restore with the reference's three
load policies.

Parity target: /root/reference/lib/core/trainer.py:330-368 (save/resume),
/root/reference/train.py:97-111 (stage-2 init drops decoder),
/root/reference/eval.py:26-35 (eval load). SMPL tensors are model constants
here (not params), so the reference's 'drop smpl buffers' policy is
automatic.
"""

from __future__ import annotations

import os
import os.path as osp
import re
import shutil
import threading
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    if jax.process_count() > 1:
        # PROCESS-LOCAL checkpointer: the default one runs cross-process
        # barrier syncs inside save() ('Checkpointer:save_start'), which
        # deadlocks/mismatches the rank-0-only write this module's callers
        # use (the Trainer gathers sharded state on every rank, then only
        # rank 0 calls save — caught by test_multiprocess's sharded-save
        # phase). State arrives pre-gathered as plain host numpy, so the
        # write is pure local file IO; no coordination needed.
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me}),
        )
    return ocp.PyTreeCheckpointer()


# At most one checkpoint write is in flight; a failed background write is
# re-raised at the next synchronization point (the following save, any load,
# or the trainer's end-of-fit wait) so it cannot pass silently.
_pending: List[threading.Thread] = []
_pending_error: List[BaseException] = []


def wait_pending_saves() -> None:
    """Block until any in-flight async checkpoint write has finished.

    Re-raises the background writer's exception, if it had one."""
    while _pending:
        _pending.pop().join()
    if _pending_error:
        raise _pending_error.pop()


def gather_to_host(tree):
    """Materialize every leaf as an OWNING host numpy copy, including
    non-fully-addressable jax.Arrays (TP/dp-sharded params and optimizer
    moments on a multi-process mesh, where np.array() raises).

    Those leaves are allgathered across processes — a COLLECTIVE: every
    process must call this together, even though only rank 0 goes on to
    write the checkpoint (Trainer.save/_save_preempt call it on all ranks
    for exactly that reason). Fully-addressable / fully-replicated leaves
    copy locally with no communication. Reference rank-0 save semantics
    being generalized: /root/reference/lib/core/trainer.py:316-318,330-351
    (DDP holds full replicas on every GPU; a sharded mesh does not).
    """
    from jax.experimental import multihost_utils

    def to_host(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            # tiled=True is REQUIRED for global arrays (assembles the global
            # value rather than stacking a new axis); jax raises otherwise
            out = np.asarray(multihost_utils.process_allgather(x, tiled=True))
            assert out.shape == x.shape, (out.shape, x.shape)
            return out
        return np.array(x)

    return jax.tree.map(to_host, tree)


def _write(path: str, state_np: Dict[str, Any], is_best: bool) -> None:
    if osp.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, state_np)
    if is_best:
        # crash-safe model_best update: stage the copy next to the target,
        # then swap via rename. The previous best survives on disk (as
        # model_best or model_best.old) until the new one is fully written —
        # a crash mid-copy can no longer destroy both (ADVICE r3 medium).
        best = osp.join(osp.dirname(path), "model_best")
        tmp = best + ".tmp"
        old = best + ".old"
        staged = osp.join(tmp, ".staged")  # marks a COMPLETE copytree
        if not osp.exists(best):
            # a previous run crashed inside the swap window below: model_best
            # was renamed away (or a fully-staged .tmp never promoted). The
            # leftovers are the only surviving copies of a best checkpoint —
            # restore the newer one rather than deleting it as stale. A .tmp
            # WITHOUT the .staged marker is a partial copy (crash mid-
            # copytree), never promoted — a truncated model_best would look
            # valid until restore fails opaquely.
            survivors = ([tmp] if osp.exists(staged) else []) + [old]
            for survivor in survivors:
                if osp.exists(survivor):
                    os.rename(survivor, best)
                    marker = osp.join(best, ".staged")
                    if osp.exists(marker):
                        os.remove(marker)
                    break
        for stale in (tmp, old):
            if osp.exists(stale):
                shutil.rmtree(stale)
        shutil.copytree(path, tmp)
        open(staged, "w").close()
        if osp.exists(best):
            os.rename(best, old)
        os.rename(tmp, best)
        os.remove(osp.join(best, ".staged"))
        if osp.exists(old):
            shutil.rmtree(old)


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any], is_best: bool = False,
                    name: str = "checkpoint", async_write: bool = False,
                    on_success=None):
    """Save {params, opt_state, batch_stats, epoch, performance, ...}.

    async_write=True snapshots the state to host numpy synchronously (so the
    caller may mutate/donate its buffers immediately) but runs the disk write
    — the slow part for the flagship's ~0.4 GB state — on a background
    thread, overlapping the next epoch's device compute (the reference
    trainer blocks on torch.save; /root/reference/lib/core/trainer.py:330).
    Writes are serialized: a new save waits out the previous one first, and
    load_checkpoint/wait_pending_saves are synchronization points.

    on_success() (optional) runs after the write lands — inline for sync
    writes, on the writer thread for async ones — so bookkeeping tied to the
    on-disk state (best.txt, retention pruning) cannot run ahead of it.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    path = osp.join(osp.abspath(ckpt_dir), name)
    # sync snapshot: every leaf becomes a guaranteed OWNING host copy.
    # np.asarray can alias host numpy, and on the CPU backend a jax Array's
    # __array__ may return a zero-copy view that the jitted step's buffer
    # donation then reuses under the background write (ADVICE r3 low).
    state_np = jax.tree.map(lambda x: np.array(x), state)
    # one write in flight at a time (sync OR async — the deadline-critical
    # sync preempt write must not race a still-in-flight epoch_N writer
    # thread on disk bandwidth or on model_best's swap files); also surfaces
    # a failed background write here rather than silently.
    wait_pending_saves()
    if not async_write:
        _write(path, state_np, is_best)
        if on_success is not None:
            on_success()
        return path

    def run():
        try:
            _write(path, state_np, is_best)
            if on_success is not None:
                on_success()
        except BaseException as e:  # re-raised at the next sync point
            _pending_error.append(e)

    # non-daemon: the interpreter joins the writer at exit, so an exception
    # or Ctrl-C unwinding past the trainer cannot kill a write mid-flight
    t = threading.Thread(target=run, name=f"ckpt-write-{name}", daemon=False)
    t.start()
    _pending.append(t)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    wait_pending_saves()
    return _checkpointer().restore(osp.abspath(path))


def _tree_update(dst: dict, src: dict, path=""):
    """Recursively copy matching leaves from src into dst; returns the list of
    src keys that had no destination (and fills only shape-compatible ones)."""
    unused = []
    for k, v in src.items():
        if k not in dst:
            unused.append(f"{path}{k}")
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            unused += _tree_update(dst[k], v, path=f"{path}{k}/")
        else:
            if np.shape(dst[k]) == np.shape(v):
                dst[k] = v
            else:
                unused.append(f"{path}{k} (shape {np.shape(v)} != {np.shape(dst[k])})")
    return unused


def load_pretrained_params(params: dict, ckpt_params: dict,
                           drop_decoder: bool = True) -> dict:
    """Stage-2 init policy: copy encoder weights, skip the decoder (the
    reference found stage-1 decoder weights hurt stage-2)."""
    params = jax.tree.map(lambda x: x, params)  # copy
    src = {k: v for k, v in ckpt_params.items() if not (drop_decoder and k == "decoder")}
    _tree_update(params, src)
    return params


def load_eval_params(params: dict, ckpt_params: dict) -> dict:
    """Eval policy: everything (SMPL constants live outside params)."""
    params = jax.tree.map(lambda x: x, params)
    unused = _tree_update(params, ckpt_params)
    if unused:
        print(f"[checkpoint] {len(unused)} unused/incompatible keys: {unused[:5]}...")
    return params


def resume_state(path: str) -> Dict[str, Any]:
    """Strict resume: params + opt_state + epoch + best performance."""
    return load_checkpoint(path)


def find_auto_resume(output_dir: str, exp_name: str = "") -> str:
    """Resolve TRAIN.RESUME='auto': the newest resumable checkpoint under any
    run dir in `output_dir`, or '' if none exists (fresh start).

    Candidates are `<run>/preempt` (graceful SIGTERM stop, mid-epoch) and
    `<run>/epoch_*` (end-of-epoch saves — what a hard crash leaves behind);
    newest by mtime wins, so a supervisor can relaunch the SAME command
    (`train.py --cfg x.yaml TRAIN.RESUME auto`) after both preemptions and
    crashes. In-flight orbax tmp dirs and `model_best` (a duplicate of some
    epoch_N, possibly older than the latest) are excluded.

    `exp_name` restricts the scan to this experiment's run dirs
    (`<timestamp>_<exp_name>`, logging_utils.prepare_output_dir's layout) —
    OUTPUT_DIR defaults to "results" for every config, and auto-resuming a
    DIFFERENT experiment's newest checkpoint (e.g. stage-1 while launching
    stage-2) would crash on mismatched param shapes at best.
    """
    candidates = []
    if not osp.isdir(output_dir):
        return ""
    for run in os.listdir(output_dir):
        if exp_name and not run.endswith(f"_{exp_name}"):
            continue
        rdir = osp.join(output_dir, run)
        if not osp.isdir(rdir):
            continue
        for name in os.listdir(rdir):
            # strict whitelist, NOT a '-tmp' suffix blacklist: orbax's
            # in-flight dir name is version-dependent ('...-tmp' in the
            # pinned 0.11.32, '...-tmp-<ts>' elsewhere), and a crash-
            # truncated partial write must never win the newest-mtime
            # race after an orbax upgrade (ADVICE r4)
            if not re.fullmatch(r"epoch_\d+|preempt", name):
                continue
            path = osp.join(rdir, name)
            if osp.isdir(path):
                candidates.append((os.path.getmtime(path), path))
    return max(candidates)[1] if candidates else ""


def fold_weight_standardization(params: dict, eps: float = 1e-5) -> dict:
    """Pre-standardize StdConv kernels for inference.

    Weight standardization is idempotent up to the eps term, so folding it
    into the stored kernels and running the model with standardize_ws=False
    gives identical outputs while skipping ~50 per-forward weight reductions
    (~20% of the hybrid stem's time on v5e). Applies to every 4D kernel under
    an encoder patch_embed/backbone subtree (the only StdConv user).
    """
    import jax.numpy as jnp

    def fold(tree, inside_backbone):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = fold(v, inside_backbone or k == "backbone")
            elif inside_backbone and k == "kernel" and np.ndim(v) == 4:
                arr = jnp.asarray(v, jnp.float32)
                mean = arr.mean(axis=(0, 1, 2), keepdims=True)
                var = arr.var(axis=(0, 1, 2), keepdims=True)
                out[k] = (arr - mean) / (jnp.sqrt(var) + eps)
            else:
                out[k] = v
        return out

    return fold(params, False)
