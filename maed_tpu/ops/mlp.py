"""Fused LayerNorm -> fc1 -> GELU -> fc2 -> residual-add pallas kernel.

The ViT block's MLP half is memory-bound glue around two big matmuls: XLA
materializes the LayerNorm output (38.7 MB), the (BT, N, 4C) intermediate
(155 MB) and the fc2 output in HBM — ~0.45 GB of traffic per block at the
flagship shape on top of the 238 GFLOP of matmul. This kernel tiles over
tokens and keeps everything between the input read and the residual write
in VMEM: per M-tile it computes f32 LayerNorm statistics, both matmuls
(bf16 in, f32 accumulate), the exact (erf) GELU, and adds the residual —
one 38.7 MB read + one write total. Weights (C x 4C and 4C x C) stay VMEM-
resident across the grid (constant index maps are fetched once).

Backward is a custom VJP running the plain jnp formulation (matmul-shaped,
XLA-friendly); the forward is where the traffic is.

Parity: /root/reference/lib/models/vision_transformer.py:262-275 (Mlp with
nn.GELU, i.e. exact erf gelu) and :281-292 (pre-norm residual block).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_INTERPRET = False  # tests flip this to run the kernel on CPU


def use_fused_gate() -> bool:
    """Opt-in (MAED_FUSED_GATE=1), default off: measured on v5e the
    per-frame kernel runs at ~0.63 ms vs XLA's ~0.22 ms for the same ops —
    the (1, 2C) gate matvec and per-frame grid granularity underutilize the
    MXU, and XLA already fuses the branch means into neighboring ops."""
    from maed_tpu.ops.pallas_gate import spmd_active

    if not _HAS_PALLAS or spmd_active():
        return False
    if os.environ.get("MAED_FUSED_GATE", "0") != "1":
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


def use_fused_mlp() -> bool:
    from maed_tpu.ops.pallas_gate import spmd_active

    if not _HAS_PALLAS or spmd_active():
        return False
    if os.environ.get("MAED_FUSED_MLP", "1") != "1":
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


def _gelu_exact(x):
    # 0.5 x (1 + erf(x / sqrt(2))), f32
    return 0.5 * x * (1.0 + jax.lax.erf(x * 0.7071067811865476))


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 in f32 —
    below bf16 resolution). Mosaic has no erf primitive; exp it has."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _gelu_kernel(x):
    # exact-gelu semantics via the A&S erf (see _erf_approx)
    return 0.5 * x * (1.0 + _erf_approx(x * 0.7071067811865476))


def ln_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    """x + fc2(gelu(fc1(LN(x)))); stats/accumulation in promote(x, f32)."""
    st = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(st)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    xn = (xf - m) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(st) + ln_bias.astype(st)
    h = jnp.dot(xn.astype(x.dtype), w1.astype(x.dtype),
                preferred_element_type=st) + b1.astype(st)
    h = _gelu_exact(h)
    y = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=st) + b2.astype(st)
    return x + y.astype(x.dtype)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps):
    x = x_ref[...]                                       # (BM, C) bf16/f32
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    xn = (xf - m) * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    h = jnp.dot(xn.astype(x.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = _gelu_kernel(h + b1_ref[...].astype(jnp.float32))
    y = jnp.dot(h.astype(x.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    o_ref[...] = x + y.astype(o_ref.dtype)


def _mlp_pallas(x2, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m=256):
    M, C = x2.shape
    H = w1.shape[1]
    block_m = min(block_m, M)
    grid = (pl.cdiv(M, block_m),)
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, C), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, C), lambda i: (i, 0)),
        interpret=_INTERPRET,
    )(x2, row(ln_scale), row(ln_bias), w1.astype(x2.dtype), row(b1),
      w2.astype(x2.dtype), row(b2))


# ---------------------------------------------------------------------------
# fused LayerNorm -> Dense (the norm1 -> qkv projection path)
# ---------------------------------------------------------------------------

def ln_dense_reference(x, ln_scale, ln_bias, w, b, eps):
    st = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(st)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    xn = (xf - m) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(st) + ln_bias.astype(st)
    y = jnp.dot(xn.astype(x.dtype), w.astype(x.dtype),
                preferred_element_type=st) + b.astype(st)
    return y.astype(x.dtype)


def _ln_dense_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    m = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(m)
    xn = (x - m) * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    y = jnp.dot(xn.astype(o_ref.dtype), w_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = (y + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_dense_pallas(x2, ln_scale, ln_bias, w, b, eps, block_m=512):
    M, C = x2.shape
    O = w.shape[1]
    block_m = min(block_m, M)
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, O), x2.dtype),
        grid=(pl.cdiv(M, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, O), lambda i: (0, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, O), lambda i: (i, 0)),
        interpret=_INTERPRET,
    )(x2, row(ln_scale), row(ln_bias), w.astype(x2.dtype), row(b))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_dense(x, ln_scale, ln_bias, w, b, eps=1e-6):
    """Dense(LN(x)) over the last axis; any leading shape."""
    shape = x.shape
    y = _ln_dense_pallas(x.reshape(-1, shape[-1]), ln_scale, ln_bias, w, b, eps)
    return y.reshape(shape[:-1] + (w.shape[1],))


def _lnd_fwd(x, ln_scale, ln_bias, w, b, eps):
    return fused_ln_dense(x, ln_scale, ln_bias, w, b, eps), (x, ln_scale, ln_bias, w, b)


def _lnd_bwd(eps, res, g):
    x, ln_scale, ln_bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: ln_dense_reference(*a, eps), x, ln_scale, ln_bias, w, b)
    return vjp(g)


fused_ln_dense.defvjp(_lnd_fwd, _lnd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-6):
    """x + fc2(gelu(fc1(LN(x)))) over the last axis; any leading shape."""
    shape = x.shape
    y = _mlp_pallas(x.reshape(-1, shape[-1]), ln_scale, ln_bias, w1, b1, w2,
                    b2, eps)
    return y.reshape(shape)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    return (fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _bwd(eps, res, g):
    # Recompute through the f32-accumulating reference (remat-style). A
    # hand-rolled backward materializing every intermediate in x.dtype was
    # measured SLOWER on v5e (164.8 vs 158.0 ms full train step) despite
    # halving the recompute bytes — XLA schedules the reference recompute's
    # mega-fusions better than the explicit dot chain. Training defaults to
    # the plain stored-intermediate path anyway (155.8 ms; see
    # doc/design.md train-step table) — this VJP is the opt-in
    # MAED_FUSED_MLP_TRAIN=1 path and the correctness anchor.
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: ln_mlp_reference(*a, eps), x, ln_scale, ln_bias, w1, b1,
        w2, b2,
    )
    return vjp(g)


fused_ln_mlp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused parallel-mode gate + output projection + residual
# (the tail of StAttention in st_mode='parallel': two branch means, the
#  ts_attn gate, the per-channel softmax blend, proj, and the residual add —
#  five full passes over the (BT, N, C) branch tensors as separate XLA ops,
#  one read of each operand as a kernel. Reference semantics:
#  /root/reference/lib/models/vision_transformer.py:146-158, 196-205.)
# ---------------------------------------------------------------------------

def gate_proj_reference(y_s, y_t, x_res, w_ts, b_ts, w_p, b_p):
    """Returns (x_res + proj(gated), alpha (BT, 1, C, 2))."""
    BT, N, C = y_s.shape
    st = jnp.promote_types(y_s.dtype, jnp.float32)
    alpha_in = jnp.concatenate(
        [y_s.astype(st).mean(1, keepdims=True), y_t.astype(st).mean(1, keepdims=True)],
        axis=-1,
    ).astype(y_s.dtype)
    logits = jnp.dot(alpha_in, w_ts.astype(y_s.dtype),
                     preferred_element_type=st) + b_ts.astype(st)
    alpha = jax.nn.softmax(logits.reshape(BT, 1, C, 2).astype(st), axis=-1)
    alpha = alpha.astype(y_s.dtype)
    y = y_t * alpha[..., 1] + y_s * alpha[..., 0]
    out = jnp.dot(y, w_p.astype(y_s.dtype),
                  preferred_element_type=st) + b_p.astype(st)
    return x_res + out.astype(y_s.dtype), alpha


def _gate_proj_kernel(ys_ref, yt_ref, x_ref, wts_ref, bts_ref, wp_ref, bp_ref,
                      o_ref, a_ref):
    C = ys_ref.shape[-1]
    ys = ys_ref[0]                                        # (N, C)
    yt = yt_ref[0]
    ms = jnp.mean(ys.astype(jnp.float32), axis=0, keepdims=True)   # (1, C)
    mt = jnp.mean(yt.astype(jnp.float32), axis=0, keepdims=True)
    a_in = jnp.concatenate([ms, mt], axis=-1).astype(ys.dtype)     # (1, 2C)
    logits = jnp.dot(a_in, wts_ref[...],
                     preferred_element_type=jnp.float32)
    logits = logits + bts_ref[...].astype(jnp.float32)             # (1, 2C)
    # wts/bts columns are pre-permuted to [all spatial | all temporal], so
    # the softmax pair (s_c, t_c) sits at lanes (c, C + c): aligned slices
    ls, lt = logits[:, :C], logits[:, C:]
    m = jnp.maximum(ls, lt)
    es = jnp.exp(ls - m)
    et = jnp.exp(lt - m)
    den = es + et
    a_s = (es / den).astype(ys.dtype)                              # (1, C)
    a_t = (et / den).astype(ys.dtype)
    y = yt * a_t + ys * a_s                                        # (N, C)
    out = jnp.dot(y, wp_ref[...], preferred_element_type=jnp.float32)
    out = out + bp_ref[...].astype(jnp.float32)
    o_ref[0] = x_ref[0] + out.astype(o_ref.dtype)
    a_ref[0] = jnp.concatenate([a_s, a_t], axis=-1)


def _gate_proj_pallas(y_s, y_t, x_res, w_ts, b_ts, w_p, b_p):
    BT, N, C = y_s.shape
    dt = y_s.dtype
    # permute gate columns from interleaved (s0,t0,s1,t1,...) to blocked
    # [s... | t...] so in-kernel slices are lane-aligned
    perm = jnp.concatenate([jnp.arange(0, 2 * C, 2), jnp.arange(1, 2 * C, 2)])
    wts = w_ts[:, perm].astype(dt)
    bts = b_ts[perm].reshape(1, -1)
    row_spec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    tile_spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0))
    out, alpha = pl.pallas_call(
        _gate_proj_kernel,
        out_shape=(jax.ShapeDtypeStruct((BT, N, C), dt),
                   # (BT, 1, 2C) so the trailing block dims match the array
                   # (Mosaic requires sublane blocks of 8 or the full dim)
                   jax.ShapeDtypeStruct((BT, 1, 2 * C), dt)),
        grid=(BT,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((2 * C, 2 * C), lambda i: (0, 0)),
            row_spec(2 * C),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            row_spec(C),
        ],
        out_specs=(tile_spec, pl.BlockSpec((1, 1, 2 * C), lambda i: (i, 0, 0))),
        interpret=_INTERPRET,
    )(y_s, y_t, x_res, wts, bts, w_p.astype(dt), b_p.reshape(1, -1))
    # alpha back to the reference (BT, 1, C, 2) layout for the ts_gate sow
    alpha = alpha.reshape(BT, 2 * C)
    alpha = jnp.stack([alpha[:, :C], alpha[:, C:]], axis=-1).reshape(BT, 1, C, 2)
    return out, alpha


@jax.custom_vjp
def fused_gate_proj(y_s, y_t, x_res, w_ts, b_ts, w_p, b_p):
    """x_res + proj(softmax-gated blend of y_s/y_t); also returns alpha."""
    return _gate_proj_pallas(y_s, y_t, x_res, w_ts, b_ts, w_p, b_p)


def _gp_fwd(*args):
    return _gate_proj_pallas(*args), args


def _gp_bwd(res, g):
    _, vjp = jax.vjp(lambda *a: gate_proj_reference(*a), *res)
    return vjp(g)


fused_gate_proj.defvjp(_gp_fwd, _gp_bwd)
