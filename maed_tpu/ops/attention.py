"""Pallas fused attention kernels for the spatio-temporal encoder.

Motivation (measured on v5e): XLA materializes the (batch, heads, S, S)
score tensor in HBM and runs softmax as separate kernels — for the `coupling`
mode that is 96 x 3152 x 3152 f32 (~3.8 GB of traffic per block), and even the
197-token spatial attention pays ~1 GB/block. These kernels keep scores
VMEM-resident:

  * one-shot kernel (S <= 1024): grid (batch, heads); per instance the whole
    (S, S) score matrix lives in VMEM — one MXU matmul, f32 softmax, one more
    matmul.
  * blocked kernel (large S, e.g. coupling's T*197): grid (batch, heads,
    q-blocks) with an online-softmax loop over kv blocks (flash attention).

Layout: q, k, v are (B, h, S, d) (the standard multi-head layout); the
trailing (S, d) dims satisfy the TPU block-shape constraints directly.

On non-TPU backends the kernels run in interpreter mode (used by the CPU test
suite to validate kernel logic); `fused_attention` falls back to the XLA
einsum path when pallas is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _needs_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# one-shot kernel: whole sequence in VMEM
# ---------------------------------------------------------------------------

def _attn_oneshot_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _attention_oneshot(q, k, v, scale):
    B, h, S, d = q.shape
    spec = pl.BlockSpec((1, 1, S, d), lambda b, hh: (b, hh, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_oneshot_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_needs_interpret(),
    )(q, k, v)


# ---------------------------------------------------------------------------
# blocked kernel: online softmax over kv blocks (flash attention)
# ---------------------------------------------------------------------------

def _attn_blocked_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                         *, scale, kv_blocks, block_k, valid_len):
    kv_i = pl.program_id(3)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, bk)
    # mask host-padded kv columns
    col = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < valid_len, s, -jnp.inf)

    m_prev = m_ref[...]            # (bq, 1)
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_ref[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc

    @pl.when(kv_i == kv_blocks - 1)
    def _finish():
        o_ref[0, 0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _attention_blocked(q, k, v, scale, block_q=512, block_k=512):
    B, h, S, d = q.shape
    S_pad = -(-S // block_q) * block_q
    if S_pad % block_k:
        S_pad = -(-S_pad // block_k) * block_k
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    q_blocks = S_pad // block_q
    kv_blocks = S_pad // block_k

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda b, hh, qi, ki: (b, hh, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d), lambda b, hh, qi, ki: (b, hh, ki, 0))

    out = pl.pallas_call(
        functools.partial(
            _attn_blocked_kernel, scale=scale, kv_blocks=kv_blocks,
            block_k=block_k, valid_len=S,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, h, q_blocks, kv_blocks),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=_needs_interpret(),
    )(q, k, v)
    return out[:, :, :S] if S_pad != S else out


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def fused_attention(q, k, v, scale=None):
    """softmax(q k^T * scale) v with VMEM-resident scores.

    q, k, v: (B, h, S, d). Returns (B, h, S, d). Falls back to plain XLA when
    pallas is unavailable.
    """
    B, h, S, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if not _HAS_PALLAS:
        return _xla_attention(q, k, v, scale)
    if S <= 1024:
        return _attention_oneshot(q, k, v, scale)
    return _attention_blocked(q, k, v, scale)


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)
