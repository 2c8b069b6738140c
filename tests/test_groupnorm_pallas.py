"""Fused GroupNorm pallas kernel (ops/groupnorm.py) in interpret mode:
forward parity vs the XLA formulation, residual/relu variants, VJP parity,
and the wired opt-in path through models/resnetv2.GroupNormAct.

The kernel ships DEFAULT-OFF: tools/probe_groupnorm.py measured it 2-4x
slower than XLA at every stem shape on v5e (single-pass stats double the VPU
work for one saved HBM read). These tests keep the opt-in path honest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maed_tpu.ops import groupnorm as GN


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(GN, "_INTERPRET", True)


@pytest.mark.parametrize("shape,g,relu,has_res", [
    ((4, 14, 14, 256), 32, True, False),
    ((2, 8, 8, 64), 32, False, False),
    ((3, 7, 7, 128), 32, True, True),
])
def test_fused_groupnorm_matches_reference(shape, g, relu, has_res):
    rng = np.random.RandomState(0)
    C = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    s = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    res = jnp.asarray(rng.randn(*shape).astype(np.float32)) if has_res else None
    got = GN.fused_groupnorm(x, s, b, g, 1e-5, relu, res)
    want = GN.groupnorm_reference(x, s, b, g, 1e-5, relu, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_groupnorm_vjp_matches_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    _, vjp_f = jax.vjp(
        lambda a, sc, bi: GN.fused_groupnorm(a, sc, bi, 32, 1e-5, True), x, s, b)
    _, vjp_r = jax.vjp(
        lambda a, sc, bi: GN.groupnorm_reference(a, sc, bi, 32, 1e-5, True), x, s, b)
    for got, want in zip(vjp_f(ct), vjp_r(ct)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_groupnormact_opt_in_path_matches(monkeypatch):
    """MAED_FUSED_GN=1 routes GroupNormAct through the kernel, same numbers."""
    from maed_tpu.models.resnetv2 import GroupNormAct

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 7, 7, 64).astype(np.float32))
    mod = GroupNormAct(num_groups=32, apply_act=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    # randomize affine so the test is not trivially scale=1/bias=0
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)), params)
    monkeypatch.setenv("MAED_FUSED_GN", "0")
    want = mod.apply(params, x)
    monkeypatch.setenv("MAED_FUSED_GN", "1")
    assert GN.use_fused_groupnorm()  # interpret-mode gate
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_groupnorm_bf16_keeps_f32_affine(monkeypatch):
    """bf16 activations: the kernel must consume the f32 scale/bias directly
    (rounding them to bf16 first diverges from the plain path, which does
    scale*rsqrt(var+eps) fully in f32 and only rounds the final product)."""
    from maed_tpu.models.resnetv2 import GroupNormAct

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 7, 7, 64).astype(np.float32) * 3
                    ).astype(jnp.bfloat16)
    mod = GroupNormAct(num_groups=32, apply_act=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    # affine values with many mantissa bits so a bf16 round would show up
    params = jax.tree.map(
        lambda p: jnp.asarray(
            (rng.randn(*p.shape) * 1.2345671).astype(np.float32)), params)
    monkeypatch.setenv("MAED_FUSED_GN", "0")
    want = np.asarray(mod.apply(params, x), np.float32)
    monkeypatch.setenv("MAED_FUSED_GN", "1")
    got = np.asarray(mod.apply(params, x), np.float32)
    # both paths round to bf16 at the end; anything beyond 1-ulp-of-bf16
    # noise means the kernel degraded the affine precision
    np.testing.assert_allclose(got, want, rtol=1.6e-2, atol=1e-2)
