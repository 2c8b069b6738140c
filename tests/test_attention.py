"""StAttention parity: each st_mode checked against an independently written
torch oracle that follows the published MAED multi-level attention semantics
(qkv -> spatial/temporal/coupling/series/parallel fusion -> proj)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from maed_tpu.models.vit import StAttention

DIM, HEADS, N, B, T = 16, 4, 5, 2, 4
BT = B * T


class TorchOracle:
    """Multi-level attention oracle (torch, eval mode, no dropout)."""

    def __init__(self, params, mode):
        self.mode = mode
        self.h = HEADS
        self.scale = (DIM // HEADS) ** -0.5
        self.qkv_w = torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T.copy())
        self.qkv_b = torch.from_numpy(np.asarray(params["qkv"]["bias"]).copy())
        self.proj_w = torch.from_numpy(np.asarray(params["proj"]["kernel"]).T.copy())
        self.proj_b = torch.from_numpy(np.asarray(params["proj"]["bias"]).copy())
        if mode == "parallel":
            self.ts_w = torch.from_numpy(np.asarray(params["ts_attn"]["kernel"]).T.copy())
            self.ts_b = torch.from_numpy(np.asarray(params["ts_attn"]["bias"]).copy())

    def qkv(self, x):
        b, n, c = x.shape
        qkv = F.linear(x, self.qkv_w, self.qkv_b)
        qkv = qkv.reshape(b, n, 3, self.h, c // self.h).permute(2, 0, 3, 1, 4)
        return qkv[0], qkv[1], qkv[2]

    def attend(self, q, k, v):
        attn = (q @ k.transpose(-2, -1)) * self.scale
        return attn.softmax(dim=-1) @ v

    def spatial(self, q, k, v):
        b, h, n, d = q.shape
        x = self.attend(q, k, v)
        return x.transpose(1, 2).reshape(b, n, h * d)

    def temporal(self, q, k, v, seqlen):
        bt, h, n, d = q.shape
        reshape = lambda a: a.reshape(-1, seqlen, h, n, d).permute(0, 2, 3, 1, 4)
        x = self.attend(reshape(q), reshape(k), reshape(v))  # (B, h, n, T, d)
        return x.permute(0, 3, 2, 1, 4).reshape(bt, n, h * d)

    def coupling(self, q, k, v, seqlen):
        bt, h, n, d = q.shape
        reshape = lambda a: a.reshape(-1, seqlen, h, n, d).transpose(1, 2).reshape(
            -1, h, seqlen * n, d
        )
        x = self.attend(reshape(q), reshape(k), reshape(v))
        x = x.reshape(-1, h, seqlen, n, d).transpose(1, 2).reshape(-1, h, n, d)
        return x.transpose(1, 2).reshape(bt, n, h * d)

    def __call__(self, x, seqlen):
        x = torch.from_numpy(np.asarray(x).copy())
        if self.mode in ("vanilla", "spatial"):
            q, k, v = self.qkv(x)
            y = self.spatial(q, k, v)
        elif self.mode == "temporal":
            xm = x.mean(dim=1, keepdim=True)
            q, k, v = self.qkv(xm)
            y = self.temporal(q, k, v, seqlen)
        elif self.mode == "coupling":
            q, k, v = self.qkv(x)
            y = self.coupling(q, k, v, seqlen)
        elif self.mode == "series":
            q, k, v = self.qkv(x)
            y = self.spatial(q, k, v)
            q, k, v = self.qkv(y)
            y = self.temporal(q, k, v, seqlen)
        elif self.mode == "parallel":
            q, k, v = self.qkv(x)
            y_t = self.temporal(q, k, v, seqlen)
            y_s = self.spatial(q, k, v)
            alpha = torch.cat([y_s, y_t], dim=-1).mean(dim=1, keepdim=True)
            alpha = F.linear(alpha, self.ts_w, self.ts_b).reshape(x.shape[0], 1, DIM, 2)
            alpha = alpha.softmax(dim=-1)
            y = y_t * alpha[..., 1] + y_s * alpha[..., 0]
        y = F.linear(y, self.proj_w, self.proj_b)
        return y.numpy()


@pytest.mark.parametrize("mode", ["vanilla", "temporal", "coupling", "series", "parallel"])
def test_st_attention_matches_oracle(rng, mode):
    x = rng.randn(BT, N, DIM).astype(np.float32)
    module = StAttention(dim=DIM, num_heads=HEADS, st_mode=mode)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x), T)["params"]
    # default matmul precision in this env is bf16-like; parity needs true f32
    with jax.default_matmul_precision("highest"):
        got = np.asarray(module.apply({"params": params}, jnp.asarray(x), T))
    want = TorchOracle(params, mode)(x, T)
    if mode == "temporal":
        assert got.shape == (BT, 1, DIM)
    else:
        assert got.shape == (BT, N, DIM)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_parallel_T1_matches_oracle(rng):
    """seqlen=1 takes the temporal-identity shortcut (softmax of a 1x1
    logit is 1, so the branch returns v exactly) — the mixed train step's
    image forward; must still match the torch oracle bit-for-bit."""
    x = rng.randn(4, N, DIM).astype(np.float32)
    module = StAttention(dim=DIM, num_heads=HEADS, st_mode="parallel")
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x), 1)["params"]
    with jax.default_matmul_precision("highest"):
        got = np.asarray(module.apply({"params": params}, jnp.asarray(x), 1))
    want = TorchOracle(params, "parallel")(x, 1)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_coupling_equals_spatial_when_T1(rng):
    """With seqlen=1 joint attention degenerates to spatial attention."""
    x = rng.randn(4, N, DIM).astype(np.float32)
    m_c = StAttention(dim=DIM, num_heads=HEADS, st_mode="coupling")
    m_s = StAttention(dim=DIM, num_heads=HEADS, st_mode="vanilla")
    params = m_c.init(jax.random.PRNGKey(0), jnp.asarray(x), 1)["params"]
    with jax.default_matmul_precision("highest"):
        got_c = np.asarray(m_c.apply({"params": params}, jnp.asarray(x), 1))
        got_s = np.asarray(m_s.apply({"params": params}, jnp.asarray(x), 1))
    np.testing.assert_allclose(got_c, got_s, atol=1e-5)
