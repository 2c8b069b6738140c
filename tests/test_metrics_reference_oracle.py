"""Eval metrics vs the REAL reference eval_utils (torch/numpy).

Earlier oracle tests compared our Procrustes/metrics against scipy and
hand-written torch replicas; here the actual
/root/reference/lib/utils/eval_utils.py functions are imported (torch+numpy
only — no stubs needed) and must agree: the batched Procrustes-SVD, the
pelvis-aligned MPJPE/PA-MPJPE of compute_errors, and both acceleration
metrics. This is the currency the acceptance run is scored in.
"""

import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maed_tpu.ops.metrics import accel, accel_error, eval_metrics
from maed_tpu.ops.procrustes import batch_similarity_transform


@pytest.fixture(scope="module")
def ref_eval_utils():
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_eval_utils", "/root/reference/lib/utils/eval_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def joints():
    rng = np.random.RandomState(21)
    gt = rng.randn(12, 14, 3) * 0.4
    pred = gt + rng.randn(12, 14, 3) * 0.05  # realistic: near the GT
    return pred, gt


def test_batched_procrustes_matches_reference(ref_eval_utils, joints):
    import torch

    pred, gt = joints
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)  # the Z eye follows the default
    try:
        with torch.no_grad():
            ref_aligned = ref_eval_utils.batch_compute_similarity_transform_torch(
                torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    finally:
        torch.set_default_dtype(prev)
    with jax.enable_x64(True):
        ours = np.asarray(batch_similarity_transform(
            jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours, ref_aligned, rtol=1e-6, atol=1e-8)


def test_compute_errors_matches_reference(ref_eval_utils, joints):
    """MPJPE + PA-MPJPE after pelvis alignment, the published-table metric."""
    pred, gt = joints
    ref_err, ref_err_pa = ref_eval_utils.compute_errors(gt, pred)
    with jax.enable_x64(True):
        md = eval_metrics(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(md["mpjpe"]), ref_err,
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(md["pa_mpjpe"]), ref_err_pa,
                               rtol=1e-6, atol=1e-9)


def test_accel_metrics_match_reference(ref_eval_utils, joints):
    pred, gt = joints
    ref_accel = ref_eval_utils.compute_accel(pred)
    ref_accel_err = ref_eval_utils.compute_error_accel(gt, pred)
    with jax.enable_x64(True):
        ours_accel = np.asarray(accel(jnp.asarray(pred)))
        ours_err = np.asarray(accel_error(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours_accel, ref_accel, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(ours_err, ref_accel_err, rtol=1e-6, atol=1e-9)
