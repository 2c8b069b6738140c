"""Golden-value regression tests: fixed seeds + fixed inputs -> committed
output fingerprints. Catches unintended numeric drift across refactors
(the reference's only analogue was re-running 3DPW eval).

Re-baselining policy (advisor finding, round 2: a golden regenerated in the
same commit as a numeric change audits nothing): any refresh of
golden/maed_tiny_v1.npz must land in its OWN commit, and correctness of the
new numerics must be covered by an independently reproducible oracle in the
suite — today that is test_reference_naming.py (f64 forward parity against
the ACTUAL reference torch encoder, rtol 1e-6) plus the f64 full-model
oracle (test_full_model_oracle.py)."""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

from maed_tpu.models import MAED
from maed_tpu.utils.smpl_io import synthetic_smpl_model

GOLDEN_PATH = osp.join(osp.dirname(__file__), "golden", "maed_tiny_v1.npz")


def _compute_fingerprint():
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    smpl = synthetic_smpl_model(num_verts=64, seed=0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, smpl)
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, x, smpl)
    return {
        "theta": np.asarray(out["theta"], np.float64),
        "kp3d_mean": np.asarray(out["kp_3d"].mean(axis=(0, 1)), np.float64),
        "verts_norm": np.asarray(
            jnp.linalg.norm(out["verts"].astype(jnp.float64), axis=-1).mean(axis=(0, 1))
        ),
    }


def test_golden_forward():
    got = _compute_fingerprint()
    if not osp.isfile(GOLDEN_PATH):
        import os

        os.makedirs(osp.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **got)
        raise AssertionError(
            f"golden file created at {GOLDEN_PATH}; commit it and re-run"
        )
    want = np.load(GOLDEN_PATH)
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-4, atol=1e-5,
            err_msg=f"numeric drift in {k} vs committed golden",
        )
