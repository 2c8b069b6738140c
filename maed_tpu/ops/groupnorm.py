"""Fused GroupNorm(+ReLU)(+residual) pallas kernel for the hybrid stem.

XLA schedules each GroupNorm in the ResNetV2 stem as two passes over the
activation in HBM: a stats fusion (read) and an apply fusion (read + write).
This kernel grids over the batch, holds one frame's (H, W, C) activation in
VMEM, and does stats + normalize + scale/shift + ReLU (+ the bottleneck's
residual add) in ONE read + ONE write — saving a full HBM pass per GN, which
is worth ~2.4 GB of the eval step's 34 GB byte budget across the stem's ten
norms (see doc/design.md).

Mosaic layout notes (hard-won, mirrors ops/st_attention.py):
  * channels live in lanes (NHWC); per-channel moments are formed by a
    sublane reduction to (1, C) and broadcast back with explicit
    jax.lax.broadcast_in_dim — float sublane broadcasts lower fine (the
    unimplemented case is iota-derived MASKS, which never appear here);
  * the group pooling of per-channel moments ((1, C) -> (1, g) -> (1, C))
    would need lane-boundary reshapes, so it runs as one tiny MXU pass
    against a constant (C, C) group-averaging matrix passed as an operand
    (pallas forbids captured constants).

Semantics parity: torch GroupNorm(32, affine=True) + ReLU as used by
/root/reference/lib/models/resnetv2.py:35-49; equal channels per group.
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

_INTERPRET = False  # tests flip this to run the kernel on CPU


def use_fused_groupnorm() -> bool:
    """Default OFF — measured SLOWER than XLA at every stem shape
    (tools/probe_groupnorm.py, v5e: 2-4x per site; the single-pass formulation
    trades one saved HBM read for doubled VPU stat work, and the stem's GNs
    are bandwidth-light enough that XLA's two-pass wins). MAED_FUSED_GN=1
    opts in for future shapes/generations."""
    from maed_tpu.ops.pallas_gate import spmd_active

    if not _HAS_PALLAS or spmd_active():
        return False
    if os.environ.get("MAED_FUSED_GN", "0") != "1":
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


def groupnorm_reference(x, scale, bias, num_groups, eps, relu, residual=None):
    """Plain-XLA formulation (identical math to models/resnetv2.py's
    _GroupNormCore: per-channel spatial moments, group-pooled)."""
    B, C = x.shape[0], x.shape[-1]
    g = num_groups
    red = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=red)
    s2 = jnp.mean(jnp.square(xf), axis=red)
    gmean = s1.reshape(B, g, C // g).mean(-1)
    gsq = s2.reshape(B, g, C // g).mean(-1)
    mean = jnp.repeat(gmean, C // g, axis=-1)
    var = jnp.repeat(gsq, C // g, axis=-1) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    mul = (scale.astype(jnp.float32) * rstd).astype(x.dtype)
    add = (bias.astype(jnp.float32) - mean * scale.astype(jnp.float32) * rstd
           ).astype(x.dtype)
    bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = x * mul.reshape(bshape) + add.reshape(bshape)
    if residual is not None:
        y = y + residual
    return jnp.maximum(y, 0) if relu else y


def _gn_kernel(x_ref, scale_ref, bias_ref, gavg_ref, o_ref, *, eps, relu,
               hw, has_residual, res_ref=None):
    # x_ref block: (1, HW, C) — one batch row, spatial flattened outside
    C = x_ref.shape[-1]
    x = x_ref[0]                                   # (HW, C)
    xf = x.astype(jnp.float32)
    inv = jnp.float32(1.0 / hw)
    s1 = jnp.sum(xf, axis=0, keepdims=True) * inv          # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True) * inv     # (1, C)
    # group pooling as one tiny MXU pass: gavg[i, j] = 1/(C/g) iff
    # group(i) == group(j) — (1, C) @ (C, C) keeps everything lane-shaped
    gmean = jnp.dot(s1, gavg_ref[...], preferred_element_type=jnp.float32)
    gsq = jnp.dot(s2, gavg_ref[...], preferred_element_type=jnp.float32)
    var = gsq - gmean * gmean
    rstd = jax.lax.rsqrt(var + eps)
    sc = scale_ref[...].astype(jnp.float32)                # (1, C)
    mul = sc * rstd
    add = bias_ref[...].astype(jnp.float32) - gmean * mul
    mulb = jnp.broadcast_to(mul.astype(x.dtype), (hw, C))
    addb = jnp.broadcast_to(add.astype(x.dtype), (hw, C))
    y = x * mulb + addb
    if has_residual:
        y = y + res_ref[0]
    if relu:
        y = jnp.maximum(y, jnp.zeros((), y.dtype))
    o_ref[0] = y


def _gn_pallas(x, scale, bias, num_groups, eps, relu, residual=None):
    B, C = x.shape[0], x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    orig_shape = x.shape
    x2 = x.reshape(B, hw, C)
    g = num_groups
    per = C // g
    gavg = np.zeros((C, C), np.float32)
    for i in range(g):
        gavg[i * per:(i + 1) * per, i * per:(i + 1) * per] = 1.0 / per
    gavg = jnp.asarray(gavg)
    # keep the affine params f32 into the kernel: rounding them to a bf16
    # activation dtype BEFORE the f32 mul/add would diverge from the plain
    # path, which computes scale*rsqrt(var+eps) fully in f32
    scale2 = scale.reshape(1, C).astype(jnp.float32)
    bias2 = bias.reshape(1, C).astype(jnp.float32)
    ins = [x2, scale2, bias2, gavg]
    in_specs = [
        pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((C, C), lambda b: (0, 0)),
    ]
    if residual is not None:
        ins.append(residual.reshape(B, hw, C))
        in_specs.append(pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0)))

        def kern(x_ref, s_ref, b_ref, g_ref, r_ref, o_ref):
            _gn_kernel(x_ref, s_ref, b_ref, g_ref, o_ref, eps=eps, relu=relu,
                       hw=hw, has_residual=True, res_ref=r_ref)
    else:
        def kern(x_ref, s_ref, b_ref, g_ref, o_ref):
            _gn_kernel(x_ref, s_ref, b_ref, g_ref, o_ref, eps=eps, relu=relu,
                       hw=hw, has_residual=False)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, hw, C), x.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0)),
        interpret=_INTERPRET,
    )(*ins)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_groupnorm(x, scale, bias, num_groups, eps, relu, residual=None):
    """GN + affine (+residual) (+ReLU) in one HBM read + write.

    x: (B, ..., C) NHWC activation; scale/bias: (C,). The VJP recomputes
    through the reference formulation (remat-style)."""
    return _gn_pallas(x, scale, bias, num_groups, eps, relu, residual)


def _gn_fwd(x, scale, bias, num_groups, eps, relu, residual=None):
    out = _gn_pallas(x, scale, bias, num_groups, eps, relu, residual)
    return out, (x, scale, bias, residual)


def _gn_bwd(num_groups, eps, relu, res, grads):
    x, scale, bias, residual = res
    if residual is None:
        _, vjp = jax.vjp(
            lambda a, s, b: groupnorm_reference(a, s, b, num_groups, eps, relu),
            x, scale, bias)
        dx, ds, db = vjp(grads)
        return dx, ds, db, None
    _, vjp = jax.vjp(
        lambda a, s, b, r: groupnorm_reference(
            a, s, b, num_groups, eps, relu, r), x, scale, bias, residual)
    return vjp(grads)


fused_groupnorm.defvjp(_gn_fwd, _gn_bwd)
