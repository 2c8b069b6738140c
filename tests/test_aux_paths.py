"""Aux-path coverage: attention-gate accounting end-to-end (the reference's
dormant Evaluator.count_attn, lib/core/evaluate.py:194-202) and the bf16+remat
training configuration (the intended big-batch mode) against the f32 baseline.
"""

import numpy as np
import jax
import jax.numpy as jnp

from maed_tpu.core.evaluate import Evaluator
from maed_tpu.core.loss import LossWeights
from maed_tpu.models import MAED
from maed_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from maed_tpu.utils.smpl_io import synthetic_smpl_model


class _Optim:
    OPTIM = "Adam"
    LR = 1e-4
    WD = 1e-5
    MOMENTUM = 0.9
    WARMUP_EPOCH = 0
    WARMUP_FACTOR = 0.1
    MILESTONES = [60, 90]


def test_count_attn_end_to_end(rng):
    """Drive the parallel-gate accounting through a real model forward: one
    (NT, C) spatial-gate matrix per block, values in (0, 1), and the two
    branch weights sum to 1 by softmax construction."""
    model = MAED(encoder="ste", num_blocks=2, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64)
    x = jnp.asarray(rng.randn(1, 2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, smpl)

    ev = Evaluator(smpl)
    gates = ev.count_attn(model, variables, x, smpl, seqlen=2)

    assert len(gates) == 2, gates.keys()  # one entry per parallel block
    for name, g in gates.items():
        assert g.shape == (2, 768), (name, g.shape)  # (NT, C)
        assert np.all(g > 0) and np.all(g < 1), name


def test_bf16_remat_train_step_matches_f32(rng):
    """The bf16+remat stage-2-shaped composition (video 2D+3D + image batch)
    must produce the same loss as the f32 non-remat step within bf16
    tolerance, so the memory-saving mode can be default for large batches
    (VERDICT round-1 #10)."""
    smpl = synthetic_smpl_model(num_verts=64)
    tx = make_optimizer(_Optim, steps_per_epoch=10)

    n2d, n3d, nimg, T, hw = 1, 2, 3, 2, 32
    kp = lambda d, *s: np.concatenate(
        [rng.randn(*s, 49, d), np.ones(s + (49, 1))], axis=-1
    ).astype(np.float32)
    vid_batch = {
        "images": rng.randn(n2d + n3d, T, hw, hw, 3).astype(np.float32),
        "target_2d": {"kp_2d": kp(2, n2d, T)},
        "target_3d": {
            "kp_2d": kp(2, n3d, T),
            "kp_3d": kp(3, n3d, T),
            "theta": (rng.randn(n3d, T, 85) * 0.1).astype(np.float32),
            "w_smpl": np.ones((n3d, T), np.float32),
        },
    }
    img_batch = {
        "image": rng.randn(nimg, hw, hw, 3).astype(np.float32),
        "kp_2d": kp(2, nimg),
        "kp_3d": kp(3, nimg),
        "theta": (rng.randn(nimg, 85) * 0.1).astype(np.float32),
        "w_smpl": np.ones((nimg,), np.float32),
    }

    losses = {}
    params0 = None
    for mode, (dtype, remat) in {
        "f32": (jnp.float32, False),
        "bf16_remat": (jnp.bfloat16, True),
    }.items():
        model = MAED(encoder="ste", num_blocks=1, num_heads=2,
                     st_mode="parallel", decoder="ktd", hidden_dim=32,
                     dtype=dtype, remat=remat)
        sample = jnp.zeros((n2d + n3d, T, hw, hw, 3), jnp.float32)
        state = init_train_state(model, tx, sample, smpl, jax.random.PRNGKey(0))
        if params0 is None:
            params0 = state.params
        else:
            # same init across modes (init is dtype-independent: params f32)
            state = state._replace(params=params0)
        step = make_train_step(model, tx, smpl, LossWeights(), donate=False)
        new_state, metrics = step(state, vid_batch, img_batch)
        losses[mode] = float(metrics["loss"])
        assert np.isfinite(losses[mode]), mode

    # bf16 has ~3 decimal digits; the composed loss is O(100)
    rel = abs(losses["bf16_remat"] - losses["f32"]) / max(abs(losses["f32"]), 1e-9)
    assert rel < 0.05, losses
