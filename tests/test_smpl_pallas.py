"""Pallas fused LBS skinning kernel vs the XLA einsum formulation
(interpret mode on CPU; compiled natively on TPU where it measures ~7%
faster than XLA by keeping the per-vertex transforms in VMEM)."""

import numpy as np
import jax
import jax.numpy as jnp

from maed_tpu.ops.smpl_pallas import skinning


def xla_skinning(v_posed, W, A):
    T = jnp.einsum("vj,bjpq->bvpq", W, A,
                   precision=jax.lax.Precision.HIGHEST)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    return jnp.einsum("bvpq,bvq->bvp", T[..., :3, :], v_h,
                      precision=jax.lax.Precision.HIGHEST)


def test_skinning_matches_xla(rng):
    B, V, J = 4, 300, 24
    v_posed = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    W = rng.rand(V, J).astype(np.float32)
    W /= W.sum(axis=1, keepdims=True)
    A = rng.randn(B, J, 4, 4).astype(np.float32) * 0.3
    A[:, :, 3] = [0, 0, 0, 1]

    with jax.default_matmul_precision("highest"):
        got = np.asarray(skinning(v_posed, jnp.asarray(W), jnp.asarray(A)))
        want = np.asarray(xla_skinning(v_posed, jnp.asarray(W), jnp.asarray(A)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_skinning_vjp_matches_xla_grad(rng):
    """The custom VJP's gradients equal autodiff through the XLA einsums."""
    from maed_tpu.ops.smpl_pallas import skinning_vjp

    B, V, J = 2, 96, 24
    v_posed = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    W = rng.rand(V, J).astype(np.float32)
    W /= W.sum(axis=1, keepdims=True)
    A = rng.randn(B, J, 4, 4).astype(np.float32) * 0.3
    A[:, :, 3] = [0, 0, 0, 1]
    W, A = jnp.asarray(W), jnp.asarray(A)

    def loss_pl(v, w, a):
        return jnp.sum(skinning_vjp(v, w, a) ** 2)

    def loss_xla(v, w, a):
        return jnp.sum(xla_skinning(v, w, a) ** 2)

    with jax.default_matmul_precision("highest"):
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(v_posed, W, A)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(v_posed, W, A)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_skinning_vertex_padding(rng):
    """V not a multiple of the block size pads internally and slices back."""
    B, V = 2, 1111
    v_posed = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    W = jnp.asarray(np.eye(24)[rng.randint(0, 24, V)].astype(np.float32))
    A = np.tile(np.eye(4, dtype=np.float32), (B, 24, 1, 1))
    A[:, :, :3, 3] = 1.0  # pure translation by (1,1,1)
    got = np.asarray(skinning(v_posed, W, jnp.asarray(A), block_v=512))
    np.testing.assert_allclose(got, np.asarray(v_posed) + 1.0, atol=1e-5)
