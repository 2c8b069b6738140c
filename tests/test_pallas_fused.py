"""Pallas kernel validation in interpret mode (CPU): fused LN, fused
LN+Dense, fused LN+MLP, and the st-attention kernels, each against its jnp
reference, plus gradient checks through the custom VJPs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maed_tpu.ops import layernorm as LN
from maed_tpu.ops import mlp as MLP
from maed_tpu.ops import st_attention as ST


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(LN, "_INTERPRET", True)
    monkeypatch.setattr(MLP, "_INTERPRET", True)
    monkeypatch.setattr(ST, "_INTERPRET", True)


def test_fast_layernorm_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 9, 64).astype(np.float32))
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    got = LN.fast_layernorm(x, s, b, 1e-6)
    want = LN.layernorm_reference(x, s, b, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fast_layernorm_grad_matches():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32))
    s = jnp.asarray(rng.rand(32).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    g1 = jax.grad(lambda x, s, b: LN.fast_layernorm(x, s, b, 1e-6).sum(),
                  argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda x, s, b: LN.layernorm_reference(x, s, b, 1e-6).sum(),
                  argnums=(0, 1, 2))(x, s, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_fused_ln_mlp_matches_reference():
    rng = np.random.RandomState(2)
    C, H = 64, 128
    x = jnp.asarray(rng.randn(3, 7, C).astype(np.float32))
    s = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    bb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray((rng.randn(C, H) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray((rng.randn(H, C) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    got = MLP.fused_ln_mlp(x, s, bb, w1, b1, w2, b2)
    want = MLP.ln_mlp_reference(x, s, bb, w1, b1, w2, b2, 1e-6)
    # the kernel's erf is the A&S rational approx (1.5e-7 abs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_ln_mlp_grads_flow():
    rng = np.random.RandomState(3)
    C, H = 32, 64
    x = jnp.asarray(rng.randn(2, 4, C).astype(np.float32))
    s = jnp.ones((C,), jnp.float32)
    z = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray((rng.randn(C, H) * 0.1).astype(np.float32))
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jnp.asarray((rng.randn(H, C) * 0.1).astype(np.float32))
    g1 = jax.grad(lambda *a: MLP.fused_ln_mlp(*a).sum(),
                  argnums=(0, 3, 5))(x, s, z, w1, b1, w2, z)
    g2 = jax.grad(lambda *a: MLP.ln_mlp_reference(*a, 1e-6).sum(),
                  argnums=(0, 3, 5))(x, s, z, w1, b1, w2, z)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_fused_ln_dense_matches_reference():
    rng = np.random.RandomState(4)
    C, O = 64, 96
    x = jnp.asarray(rng.randn(3, 5, C).astype(np.float32))
    s = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    bb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w = jnp.asarray((rng.randn(C, O) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(O).astype(np.float32) * 0.1)
    got = MLP.fused_ln_dense(x, s, bb, w, b)
    want = MLP.ln_dense_reference(x, s, bb, w, b, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_spatial_attention_kernel_matches_einsum():
    rng = np.random.RandomState(5)
    BT, N, h, d = 8, 17, 2, 32
    qkv = jnp.asarray(rng.randn(BT, N, 3, h, d).astype(np.float32))
    got = ST.spatial_attention(qkv, d ** -0.5)
    want = ST.spatial_reference(qkv, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_temporal_attention_kernel_matches_einsum():
    rng = np.random.RandomState(6)
    B, T, N, h, d = 2, 4, 11, 2, 32  # N=11 exercises the padded last block
    qkv = jnp.asarray(rng.randn(B * T, N, 3, h, d).astype(np.float32))
    got = ST.temporal_attention(qkv, T, d ** -0.5)
    want = ST.temporal_reference(qkv, T, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_temporal_v2_kernel_matches_einsum():
    rng = np.random.RandomState(11)
    B, T, N, h, d = 2, 4, 11, 4, 32  # N=11 exercises the padded last block
    qkv = jnp.asarray(rng.randn(B * T, N, 3, h, d).astype(np.float32))
    got = ST.temporal_attention_fused(qkv, T, d ** -0.5)
    want = ST.temporal_reference_btc(qkv, T, d ** -0.5)
    assert got.shape == (B * T, N, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_temporal_v2_flagship_head_count():
    """h=12 (six head pairs), NB=8-blocked N, d=64: the flagship geometry."""
    rng = np.random.RandomState(12)
    B, T, N, h, d = 1, 2, 9, 12, 64
    qkv = jnp.asarray(rng.randn(B * T, N, 3, h, d).astype(np.float32))
    got = ST.temporal_attention_fused(qkv, T, d ** -0.5)
    want = ST.temporal_reference_btc(qkv, T, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_temporal_v2_grad_matches():
    rng = np.random.RandomState(13)
    B, T, N, h, d = 1, 3, 5, 2, 16
    qkv = jnp.asarray(rng.randn(B * T, N, 3, h, d).astype(np.float32))
    g1 = jax.grad(
        lambda q: ST.temporal_attention_fused(q, T, d ** -0.5).sum())(qkv)
    g2 = jax.grad(
        lambda q: ST.temporal_reference_btc(q, T, d ** -0.5).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_temporal_attention_grad_matches():
    rng = np.random.RandomState(7)
    B, T, N, h, d = 1, 3, 5, 2, 16
    qkv = jnp.asarray(rng.randn(B * T, N, 3, h, d).astype(np.float32))
    g1 = jax.grad(lambda q: ST.temporal_attention(q, T, d ** -0.5).sum())(qkv)
    g2 = jax.grad(lambda q: ST.temporal_reference(q, T, d ** -0.5).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_block_fused_path_matches_modular(monkeypatch):
    """Block with the fused-MLP pallas path == the jnp fallback path."""
    from maed_tpu.models.vit import Block
    from maed_tpu.ops import mlp as mlp_mod

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(6, 9, 64).astype(np.float32))
    blk = Block(64, 4, st_mode="parallel")
    params = blk.init(jax.random.PRNGKey(0), x, 3, True)

    monkeypatch.setattr(mlp_mod, "_INTERPRET", True)
    monkeypatch.setenv("MAED_FUSED_MLP", "1")
    monkeypatch.setenv("MAED_FUSED_GATE", "1")
    fused = blk.apply(params, x, 3, True)
    monkeypatch.setenv("MAED_FUSED_MLP", "0")
    monkeypatch.setenv("MAED_FUSED_GATE", "0")
    plain = blk.apply(params, x, 3, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-4)


def test_block_fused_mlp_in_training_mode(monkeypatch):
    """With all stochastic rates at 0 (every published recipe), the fused
    MLP kernel is legal under deterministic=False: forward AND grads must
    match the jnp path (its VJP recomputes the forward, remat-style)."""
    from maed_tpu.models.vit import Block
    from maed_tpu.ops import mlp as mlp_mod

    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(6, 9, 64).astype(np.float32))
    blk = Block(64, 4, st_mode="parallel")
    params = blk.init(jax.random.PRNGKey(0), x, 3, True)

    def loss(p, use_fused):
        monkeypatch.setenv("MAED_FUSED_MLP", "1" if use_fused else "0")
        out = blk.apply(p, x, 3, False, rngs={"dropout": jax.random.PRNGKey(1)})
        return (out ** 2).sum()

    monkeypatch.setattr(mlp_mod, "_INTERPRET", True)
    monkeypatch.setenv("MAED_FUSED_MLP_TRAIN", "1")
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3),
        g1, g2,
    )


def test_fused_gate_proj_matches_reference():
    from maed_tpu.ops.mlp import fused_gate_proj, gate_proj_reference

    rng = np.random.RandomState(9)
    BT, N, C = 6, 9, 64
    ys = jnp.asarray(rng.randn(BT, N, C).astype(np.float32))
    yt = jnp.asarray(rng.randn(BT, N, C).astype(np.float32))
    xr = jnp.asarray(rng.randn(BT, N, C).astype(np.float32))
    wts = jnp.asarray((rng.randn(2 * C, 2 * C) * 0.1).astype(np.float32))
    bts = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.1)
    wp = jnp.asarray((rng.randn(C, C) * 0.1).astype(np.float32))
    bp = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    got, a_got = fused_gate_proj(ys, yt, xr, wts, bts, wp, bp)
    want, a_want = gate_proj_reference(ys, yt, xr, wts, bts, wp, bp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_got), np.asarray(a_want), atol=1e-5)
