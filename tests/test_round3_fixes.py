"""Round-3 operational fixes (VERDICT r2 item 5 + 7, ADVICE r2):

* the pallas SPMD latch stands every kernel down on >1-device meshes;
* the Evaluator reuses ONE jitted executable across validation runs and
  sees live params (jit arguments, not trace-time constants);
* Trainer.resume re-applies mesh shardings and restores the global step;
* InfiniteLoader's shuffle epoch is a monotone counter shared with the
  trainer (no early-epoch permutation reuse on mid-epoch wraps);
* find_smpl_model warns loudly / raises instead of a silent random body.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maed_tpu.utils.smpl_io import synthetic_smpl_model


# --------------------------------------------------------------------------- #
# pallas SPMD latch
# --------------------------------------------------------------------------- #

def test_pallas_gates_stand_down_on_multidevice_mesh(monkeypatch):
    from maed_tpu.ops import layernorm, mlp, pallas_gate, smpl_pallas, st_attention
    from maed_tpu.models.vit import _use_fused_attention

    # force the single-chip "on" conditions (interpret mode / env opt-ins)
    monkeypatch.setattr(layernorm, "_INTERPRET", True)
    monkeypatch.setattr(mlp, "_INTERPRET", True)
    monkeypatch.setattr(st_attention, "_INTERPRET", True)
    monkeypatch.setenv("MAED_PALLAS_ATTENTION", "1")
    monkeypatch.setenv("MAED_FUSED_ATTENTION", "1")
    monkeypatch.setenv("MAED_PALLAS_LBS", "1")
    monkeypatch.setenv("MAED_FUSED_GATE", "1")

    try:
        pallas_gate.set_mesh_devices(1)
        assert layernorm.use_pallas_layernorm()
        assert mlp.use_fused_mlp()
        assert mlp.use_fused_gate()
        assert st_attention.use_pallas_st_attention()
        assert smpl_pallas.pallas_lbs_enabled()
        assert _use_fused_attention()

        pallas_gate.set_mesh_devices(8)  # pallas has no GSPMD rule
        assert not layernorm.use_pallas_layernorm()
        assert not mlp.use_fused_mlp()
        assert not mlp.use_fused_gate()
        assert not st_attention.use_pallas_st_attention()
        assert not smpl_pallas.pallas_lbs_enabled()
        assert not _use_fused_attention()
    finally:
        pallas_gate.set_mesh_devices(1)


# --------------------------------------------------------------------------- #
# Evaluator jit caching + live params
# --------------------------------------------------------------------------- #

class _OneBatchLoader:
    """One window batch of shape (1, pool) with constant images."""

    def __init__(self, pool=4, img=4):
        self.pool, self.img = pool, img

    def __iter__(self):
        pool, img = self.pool, self.img
        kp3d = np.concatenate(
            [np.zeros((1, pool, 49, 3), np.float32),
             np.ones((1, pool, 49, 1), np.float32)], axis=3)
        yield {
            "images": np.ones((1, pool, img, img, 3), np.float32),
            "kp_3d": kp3d, "kp_2d": kp3d[..., :3].copy(),
            "theta": np.zeros((1, pool, 85), np.float32),
            "valid": np.ones((1, pool), bool),
        }


def _scaled_apply(variables, images, J_regressor=None):
    """Predictions = scale * 1; proves the Evaluator sees LIVE params."""
    N, T = images.shape[:2]
    s = variables["params"]["scale"]
    mk = lambda shape: jnp.broadcast_to(s, (N, T) + shape)
    return {
        "verts": mk((10, 3)), "kp_3d": mk((49, 3)), "kp_2d": mk((49, 2)),
        "theta": mk((85,)), "rotmat": mk((24, 3, 3)),
    }


def test_evaluator_caches_one_executable_across_runs():
    from maed_tpu.core.evaluate import Evaluator

    ev = Evaluator(synthetic_smpl_model(num_verts=10))
    v1 = {"params": {"scale": jnp.float32(1.0)}}
    ev.inference(_scaled_apply, _OneBatchLoader(), seqlen=4, interp=1,
                 dataset_name="testset", verbose=False, variables=v1)
    jit_first = ev._fwd_jit
    t1 = np.concatenate(ev.accumulators["pred_theta"], axis=0)
    assert np.all(t1 == 1.0)

    # second run, different weights: same cached jit object, fresh values
    v2 = {"params": {"scale": jnp.float32(3.0)}}
    ev.inference(_scaled_apply, _OneBatchLoader(), seqlen=4, interp=1,
                 dataset_name="testset", verbose=False, variables=v2)
    assert ev._fwd_jit is jit_first
    t2 = np.concatenate(ev.accumulators["pred_theta"], axis=0)
    assert np.all(t2 == 3.0)  # params are jit args, not baked constants


# --------------------------------------------------------------------------- #
# Trainer.resume: shardings + global step (8 virtual devices)
# --------------------------------------------------------------------------- #

def test_resume_reapplies_shardings_and_global_step(tmp_path):
    from jax.sharding import NamedSharding
    from maed_tpu.core.config import get_cfg_defaults
    from maed_tpu.core.loss import LossWeights
    from maed_tpu.core.trainer import Trainer
    from maed_tpu.models import MAED
    from maed_tpu.parallel.mesh import make_mesh, param_shardings
    from maed_tpu.parallel.train_step import init_train_state, make_optimizer, make_train_step

    assert len(jax.devices()) == 8
    cfg = get_cfg_defaults()
    cfg.TRAIN.END_EPOCH = 1

    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64)
    tx = make_optimizer(cfg.TRAIN.OPTIM, steps_per_epoch=1)
    sample = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(0))
    state = state._replace(step=np.asarray(7))
    step = make_train_step(model, tx, smpl, LossWeights(), donate=False)

    mesh = make_mesh(dp=4, tp=2)
    shardings = param_shardings(state.params, mesh)
    state = state._replace(
        params=jax.tree.map(jax.device_put, state.params, shardings))

    trainer = Trainer(
        data_loaders={}, train_step=step, state=state, model=model,
        smpl_model=smpl, cfg=cfg, logdir=str(tmp_path),
        num_iters_per_epoch=1, mesh=mesh,
    )
    trainer.train_global_step = 7
    trainer.save(performance=1.23, epoch=4)

    # fresh trainer resumes: shardings (incl. the TP split) must be back,
    # and the TensorBoard x-axis (train_global_step) must continue at 7
    cfg2 = cfg.clone()
    cfg2.TRAIN.RESUME = str(tmp_path / "epoch_4")
    state2 = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(1))
    trainer2 = Trainer(
        data_loaders={}, train_step=step, state=state2, model=model,
        smpl_model=smpl, cfg=cfg2, logdir="", num_iters_per_epoch=1,
        mesh=mesh,
    )
    assert trainer2.train_global_step == 7
    assert trainer2.start_epoch == 5
    qkv = trainer2.state.params["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert isinstance(qkv.sharding, NamedSharding)
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    # values survive the round trip
    orig = trainer.state.params["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(qkv), np.asarray(orig))


# --------------------------------------------------------------------------- #
# InfiniteLoader epoch bookkeeping
# --------------------------------------------------------------------------- #

class _TinyEpochLoader:
    """2-batch loader that records the epoch of every batch it serves."""

    def __init__(self):
        self.epoch = 0
        self.served = []

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        for _ in range(2):
            self.served.append(self.epoch)
            yield {}


def test_infinite_loader_epoch_is_monotone_with_trainer():
    from maed_tpu.data.loaders import InfiniteLoader

    inner = _TinyEpochLoader()
    ld = InfiniteLoader(inner)
    # trainer epoch 5; the tiny dataset wraps TWICE inside it
    ld.set_epoch(5)
    for _ in range(6):
        next(ld)
    # wraps advanced 5 -> 6 -> 7 — never back to 1 (the r2 bug) and never
    # repeating a permutation seed
    assert inner.served == [5, 5, 6, 6, 7, 7]
    # next outer epoch from the trainer cannot move the seed backwards
    ld.set_epoch(6)
    assert inner.epoch == 7


# --------------------------------------------------------------------------- #
# SMPL fallback guard
# --------------------------------------------------------------------------- #

def test_find_smpl_model_warns_and_refuses(tmp_path, capsys):
    from maed_tpu.utils.smpl_io import find_smpl_model

    model = find_smpl_model(str(tmp_path))  # empty dir -> synthetic + warning
    assert model.v_template.shape[0] == 6890
    assert "SYNTHETIC" in capsys.readouterr().err

    with pytest.raises(FileNotFoundError, match="SMPL body model not found"):
        find_smpl_model(str(tmp_path), allow_synthetic=False)
