"""Pallas kernels for the spatio-temporal attention branches (parallel mode).

Design (BT=128, N=197, C=768, T=16 is the flagship shape):

  * spatial: grids over frames, keeps each head's (N, N) scores in VMEM, and
    reads q/k/v straight from the qkv projection's natural (BT, N, 3, h, d)
    layout — no relayout on either side. Avoids the (BT, h, N, N) score
    tensor XLA materializes in HBM (~480 MB of traffic per block).
  * temporal: per-token temporal attention is 18912 independent (T, d) x
    (d, T) matmuls (T=16, d=64). The kernel stacks NB=8 token positions into
    the matmul M/N dimensions, computes one (NB*T, NB*T) product per head
    whose (n, n') off-diagonal blocks are then masked to -inf before the
    softmax: the probability matrix is exactly block-diagonal, so the second
    (NB*T, NB*T) @ (NB*T, d) matmul yields the per-token results directly —
    trading an 8x FLOP waste for dense MXU tiles.

Both are forward kernels with a custom VJP whose backward runs the plain XLA
einsum formulation (attention backward is matmul-shaped and XLA handles it
well).

Measured verdict on v5e (see use_pallas_st_attention): XLA's own batched-dot
packing makes the einsum path faster at these exact shapes, so the kernels
are opt-in, validated against the einsum path in interpret mode on CPU.

Behavioral parity: /root/reference/lib/models/vision_transformer.py:134-145
(spatial) and :160-176 (temporal path of st_mode in parallel/series).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_INTERPRET = False  # tests flip this to run the kernels on CPU


def use_pallas_st_attention() -> bool:
    """Opt-in (MAED_PALLAS_ATTENTION=1), off by default.

    Measured on v5e in the full 6-block chain the temporal kernel runs at
    ~1.6 ms/branch vs XLA's 1.2 ms: the hardware's batched-dot packing (two
    K=64 contractions share one 128-wide MXU pass) already covers the tiny-
    matmul problem, and the kernel's head-serial softmax plus the (h, BT, N,
    d) -> (BT, N, C) output relayout cost more than the score-tensor HBM
    traffic it saves at T=16. Kept for larger T (the waste factor NB shrinks
    relative to the score tile as T grows) and other TPU generations.
    """
    from maed_tpu.ops.pallas_gate import spmd_active

    if not _HAS_PALLAS or spmd_active():
        return False
    if os.environ.get("MAED_PALLAS_ATTENTION", "0") != "1":
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# reference einsum formulations (used for the backward pass and for fallback)
# ---------------------------------------------------------------------------

def spatial_reference(qkv, scale):
    """qkv: (BT, N, 3, h, d) -> (h, BT, N, d) head-leading."""
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->hbqd", probs, v)


def temporal_reference(qkv, seqlen, scale):
    """qkv: (BT, N, 3, h, d) -> (h, BT, N, d); attention over T per (n, h)."""
    BT, N, _, h, d = qkv.shape
    B = BT // seqlen
    t = qkv.reshape(B, seqlen, N, 3, h, d)
    q, k, v = t[:, :, :, 0], t[:, :, :, 1], t[:, :, :, 2]
    logits = jnp.einsum("bqnhd,bknhd->bnhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("bnhqk,bknhd->hbqnd", probs, v)
    return out.reshape(h, BT, N, d)


# ---------------------------------------------------------------------------
# spatial kernel: grid over frames, per-head VMEM-resident scores
# ---------------------------------------------------------------------------

def _spatial_kernel(qkv_ref, o_ref, *, scale, num_heads):
    contract_last = (((1,), (1,)), ((), ()))
    for h in range(num_heads):
        q = qkv_ref[0, :, 0, h, :]  # (N, d)
        k = qkv_ref[0, :, 1, h, :]
        v = qkv_ref[0, :, 2, h, :]
        s = jax.lax.dot_general(
            q, k, contract_last, preferred_element_type=jnp.float32
        ) * scale                                           # (N, N) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        # head-leading output: the store indexes only leading dims, which
        # Mosaic lowers without a shape cast (a (BT, N, h, d) layout would
        # need an unsupported strided mid-dim store)
        o_ref[h, 0] = o.astype(o_ref.dtype)


def _spatial_pallas(qkv, scale):
    BT, N, _, h, d = qkv.shape
    return pl.pallas_call(
        functools.partial(_spatial_kernel, scale=scale, num_heads=h),
        out_shape=jax.ShapeDtypeStruct((h, BT, N, d), qkv.dtype),
        grid=(BT,),
        in_specs=[pl.BlockSpec((1, N, 3, h, d), lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((h, 1, N, d), lambda i: (0, i, 0, 0)),
        interpret=_INTERPRET,
    )(qkv)


# ---------------------------------------------------------------------------
# temporal kernel: stack NB token positions into one MXU-sized matmul whose
# off-diagonal (n, n') blocks are masked off
# ---------------------------------------------------------------------------

def _temporal_kernel(qkv_ref, o_ref, *, scale, num_heads, seqlen, nb, n_total):
    T, NB = seqlen, nb
    M = T * NB
    contract_last = (((1,), (1,)), ((), ()))
    # row index = q * NB + n (the (T, NB) reshape order); valid pairs share n
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    valid = (rows % NB) == (cols % NB)
    neg = jnp.float32(-1e30)
    # the last n-block is partial when NB does not divide N: its padded
    # lanes hold garbage (possibly NaN), and 0 * NaN = NaN would leak
    # through the P @ V product into valid rows — zero the garbage V rows
    valid_n = n_total - pl.program_id(1) * NB
    vmask = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % NB) < valid_n
    for h in range(num_heads):
        q = qkv_ref[:, :, 0, h, :].reshape(M, -1)  # (T*NB, d), row = q*NB+n
        k = qkv_ref[:, :, 1, h, :].reshape(M, -1)
        v = qkv_ref[:, :, 2, h, :].reshape(M, -1)
        v = jnp.where(vmask, v, jnp.zeros_like(v))
        s = jax.lax.dot_general(
            q, k, contract_last, preferred_element_type=jnp.float32
        )                                                   # (M, M) f32
        s = jnp.where(valid, s * scale, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # p is exactly block-diagonal over n, so the full (M, M) @ (M, d)
        # product contracts only the matching-n terms
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        # head-leading output so the store indexes only leading dims
        o_ref[h] = o.reshape(T, NB, -1).astype(o_ref.dtype)


def _temporal_pallas(qkv, seqlen, scale, nb=8):
    BT, N, _, h, d = qkv.shape
    B = BT // seqlen
    nb = min(nb, N)
    nblocks = pl.cdiv(N, nb)
    return pl.pallas_call(
        functools.partial(
            _temporal_kernel, scale=scale, num_heads=h, seqlen=seqlen, nb=nb,
            n_total=N,
        ),
        out_shape=jax.ShapeDtypeStruct((h, BT, N, d), qkv.dtype),
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((seqlen, nb, 3, h, d), lambda b, n: (b, n, 0, 0, 0))
        ],
        out_specs=pl.BlockSpec(
            (h, seqlen, nb, d), lambda b, n: (0, b, n, 0)
        ),
        interpret=_INTERPRET,
    )(qkv)


# ---------------------------------------------------------------------------
# temporal v2: head-PAIR kernel, fully lane-aligned, writes (BT, N, C)
# ---------------------------------------------------------------------------
#
# Why v1 lost (measured round 2, 1.6 vs 1.2 ms/branch) and what v2 changes:
#
#   * v1 read q/k/v per head — a d=64 slice out of the (3, h, d) minor span,
#     i.e. a sub-lane-width strided gather Mosaic must retile — and wrote a
#     head-leading (h, BT, N, d) output that XLA then relaid out to
#     (BT, N, C) (the relayout was most of the loss). v2 processes TWO
#     adjacent heads at a time: their concatenated (2, d) = 128 lanes are
#     exactly one aligned vector register row, so every load
#     (qkv[.., 2j:2j+2, :] -> (M, 128)) and every store
#     (out[.., 128j:128(j+1)]) is a full-width aligned access, and the
#     output IS the (BT, N, C) tensor the gate/proj consume — no relayout
#     on either side of the kernel.
#   * per-head contraction inside a 128-lane pair is recovered by zeroing
#     the other head's lanes in q before each score dot: (q * lane<d) @ k^T
#     contracts only lanes 0..d-1 = head 2j's scores; the MXU does a full
#     K=128 pass either way, so the masked halves are free FLOPs, not extra
#     passes. The same lane masks split V for the P @ V products, and the
#     two heads' outputs land in their own lane halves of one (M, 128)
#     result — already in final layout.
#   * the n-block-diagonal score mask (NB token positions stacked into the
#     matmul M dimension) is v1's trick, unchanged: dense MXU tiles in
#     exchange for an NB x FLOP waste that the roofline absorbs.
# ---------------------------------------------------------------------------


def temporal_reference_btc(qkv, seqlen, scale):
    """qkv: (BT, N, 3, h, d) -> (BT, N, h*d); attention over T per (n, h).
    Identical math to temporal_reference, output in token-major layout."""
    BT, N, _, h, d = qkv.shape
    B = BT // seqlen
    t = qkv.reshape(B, seqlen, N, 3, h, d)
    q, k, v = t[:, :, :, 0], t[:, :, :, 1], t[:, :, :, 2]
    logits = jnp.einsum("bqnhd,bknhd->bnhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("bnhqk,bknhd->bqnhd", probs, v)
    return out.reshape(BT, N, h * d)


def _temporal_v2_kernel(qkv_ref, lo_ref, o_ref, *, scale, num_heads, seqlen,
                        nb, n_total, head_dim):
    # qkv_ref block: (T, NB, 3, h*d) — the (h, d) minor dims are collapsed
    # OUTSIDE the kernel (a free contiguous-minor reshape for XLA) so every
    # in-kernel head-pair access is a static 128-lane span; Mosaic cannot
    # shape-cast a (.., 2, 64) -> (.., 128) merge across the lane boundary.
    # lo_ref: (M, 2d) 0/1 selector of head 2j's lane half. It must be a real
    # VMEM operand: pallas rejects captured array constants, and any
    # iota-derived lane mask is sublane-constant — a layout Mosaic can only
    # use via an unimplemented sublane broadcast.
    T, NB, d = seqlen, nb, head_dim
    M = T * NB
    # row index = q * NB + n (the (T, NB) reshape order); valid pairs share n
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    valid = (rows % NB) == (cols % NB)
    neg = jnp.float32(-1e30)
    # zero the padded lanes of a partial last n-block (garbage/NaN in V
    # would leak through P @ V into valid rows); (M, 1) is the one row-mask
    # layout Mosaic lane-broadcasts for free
    valid_n = n_total - pl.program_id(1) * NB
    vmask = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % NB) < valid_n
    lo = lo_ref[...]
    hi = jnp.ones((), lo.dtype) - lo
    contract_last = (((1,), (1,)), ((), ()))
    zero = jnp.zeros((), qkv_ref.dtype)
    for j in range(num_heads // 2):
        sl = slice(2 * d * j, 2 * d * (j + 1))
        q2 = qkv_ref[:, :, 0, sl].reshape(M, 2 * d)
        k2 = qkv_ref[:, :, 1, sl].reshape(M, 2 * d)
        v2 = qkv_ref[:, :, 2, sl].reshape(M, 2 * d)
        v2 = jnp.where(vmask, v2, zero)
        o = None
        for lane_mask in (lo, hi):
            qm = q2 * lane_mask
            s = jax.lax.dot_general(
                qm, k2, contract_last, preferred_element_type=jnp.float32
            )                                               # (M, M) f32
            s = jnp.where(valid, s * scale, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            # P is block-diagonal over n; V's other-head lanes are zeroed so
            # this head's output occupies exactly its own lane half
            vm = v2 * lane_mask
            oh = jnp.dot(p.astype(v2.dtype), vm,
                         preferred_element_type=jnp.float32)
            o = oh if o is None else o + oh
        o_ref[:, :, 2 * d * j:2 * d * (j + 1)] = (
            o.reshape(T, NB, 2 * d).astype(o_ref.dtype)
        )


def _temporal_v2_pallas(qkv, seqlen, scale, nb=8):
    BT, N, _, h, d = qkv.shape
    B = BT // seqlen
    nb = min(nb, N)
    nblocks = pl.cdiv(N, nb)
    M = seqlen * nb
    # collapse (h, d) before the call: contiguous-minor merge, free in XLA
    qkv = qkv.reshape(BT, N, 3, h * d)
    lo = jnp.asarray(
        np.tile(np.arange(2 * d) < d, (M, 1)).astype(np.float32), qkv.dtype
    )
    return pl.pallas_call(
        functools.partial(
            _temporal_v2_kernel, scale=scale, num_heads=h, seqlen=seqlen,
            nb=nb, n_total=N, head_dim=d,
        ),
        out_shape=jax.ShapeDtypeStruct((BT, N, h * d), qkv.dtype),
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((seqlen, nb, 3, h * d), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((M, 2 * d), lambda b, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (seqlen, nb, h * d), lambda b, n: (b, n, 0)
        ),
        interpret=_INTERPRET,
    )(qkv, lo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def temporal_attention_fused(qkv, seqlen, scale):
    """qkv (BT, N, 3, h, d) -> (BT, N, h*d) per-token attention over T.

    Head-pair pallas kernel (even head count required — the flagship's
    h=12 is); backward runs the einsum formulation."""
    return _temporal_v2_pallas(qkv, seqlen, scale)


def _temporal_v2_fwd(qkv, seqlen, scale):
    return _temporal_v2_pallas(qkv, seqlen, scale), qkv


def _temporal_v2_bwd(seqlen, scale, qkv, g):
    _, vjp = jax.vjp(lambda t: temporal_reference_btc(t, seqlen, scale), qkv)
    return vjp(g)


temporal_attention_fused.defvjp(_temporal_v2_fwd, _temporal_v2_bwd)


def use_temporal_v2() -> bool:
    """Gate for the head-pair temporal kernel (MAED_TEMPORAL_V2, default
    measured on the real chip before flipping)."""
    from maed_tpu.ops.pallas_gate import spmd_active

    if not _HAS_PALLAS or spmd_active():
        return False
    if os.environ.get("MAED_TEMPORAL_V2", "0") != "1":
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# public entries (custom VJP: pallas forward, einsum backward)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def spatial_attention(qkv, scale):
    """qkv (BT, N, 3, h, d) -> (h, BT, N, d) per-frame attention over N."""
    return _spatial_pallas(qkv, scale)


def _spatial_fwd(qkv, scale):
    return _spatial_pallas(qkv, scale), qkv


def _spatial_bwd(scale, qkv, g):
    _, vjp = jax.vjp(lambda t: spatial_reference(t, scale), qkv)
    return vjp(g)


spatial_attention.defvjp(_spatial_fwd, _spatial_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def temporal_attention(qkv, seqlen, scale):
    """qkv (BT, N, 3, h, d) -> (h, BT, N, d) per-token attention over T."""
    return _temporal_pallas(qkv, seqlen, scale)


def _temporal_fwd(qkv, seqlen, scale):
    return _temporal_pallas(qkv, seqlen, scale), qkv


def _temporal_bwd(seqlen, scale, qkv, g):
    _, vjp = jax.vjp(lambda t: temporal_reference(t, seqlen, scale), qkv)
    return vjp(g)


temporal_attention.defvjp(_temporal_fwd, _temporal_bwd)
