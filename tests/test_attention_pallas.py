"""Pallas fused-attention kernels vs the XLA reference (interpret mode on
CPU; the same kernels compile natively on TPU — see ops/attention.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maed_tpu.ops.attention import _xla_attention, fused_attention


@pytest.mark.parametrize("shape", [(2, 4, 197, 64), (2, 2, 16, 32)])
def test_oneshot_matches_xla(rng, shape):
    B, h, S, d = shape
    q = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(*shape).astype(np.float32))
    v = jnp.asarray(rng.randn(*shape).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        got = np.asarray(fused_attention(q, k, v))
        want = np.asarray(_xla_attention(q, k, v, d ** -0.5))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_blocked_online_softmax_matches_xla(rng):
    # S > 1024 takes the blocked path; 1576 = 8*197 also exercises padding
    B, h, S, d = 1, 2, 1576, 32
    q = jnp.asarray(rng.randn(B, h, S, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, h, S, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, S, d).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        got = np.asarray(fused_attention(q, k, v))
        want = np.asarray(_xla_attention(q, k, v, d ** -0.5))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_st_attention_fused_flag_matches_default(rng):
    """StAttention with MAED_FUSED_ATTENTION=1 must equal the default path."""
    from maed_tpu.models.vit import StAttention

    x = rng.randn(8, 5, 16).astype(np.float32)
    for mode in ("vanilla", "coupling"):
        m = StAttention(dim=16, num_heads=4, st_mode=mode)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), 4)["params"]
        with jax.default_matmul_precision("highest"):
            base = np.asarray(m.apply({"params": params}, jnp.asarray(x), 4))
            os.environ["MAED_FUSED_ATTENTION"] = "1"
            try:
                fused = np.asarray(m.apply({"params": params}, jnp.asarray(x), 4))
            finally:
                os.environ["MAED_FUSED_ATTENTION"] = "0"
        np.testing.assert_allclose(fused, base, atol=2e-5), mode
