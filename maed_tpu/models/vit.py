"""Spatial-Temporal-Encoder: R50+ViT-B/16 hybrid with multi-level attention.

Behavioral parity targets (re-architected for TPU/XLA):
  /root/reference/lib/models/vision_transformer.py:115-240  5-mode attention
  /root/reference/lib/models/vision_transformer.py:244-311  Block/Mlp/embeds
  /root/reference/lib/models/vision_transformer.py:314-413  VisionTransformer
  /root/reference/lib/models/vision_transformer.py:560-576  hybrid factory

Design notes (TPU-first):
  * tokens stay in a (B*T, N, C) layout; the spatial/temporal factorization is
    pure reshapes around two batched attentions, which XLA fuses with the
    surrounding projections — the T<=16, N=197 sizes keep the score matrices
    VMEM-resident;
  * all five st_modes share one qkv projection (a single (BT*N, C)x(C, 3C)
    MXU matmul); `series` reuses the same projection twice like the reference;
  * static `seqlen` keeps every shape compile-time constant.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maed_tpu.models.resnetv2 import ResNetV2

ST_MODES = ("vanilla", "spatial", "temporal", "coupling", "parallel", "series")

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def _use_fused_attention() -> bool:
    """Opt-in pallas attention (MAED_FUSED_ATTENTION=1).

    Off by default: on v5e, XLA's own attention fusion beats the pallas
    kernels at these sequence lengths (197 spatial / 3152 coupling) — see
    ops/attention.py for measurements. The kernels remain available for
    larger configurations and other TPU generations.
    """
    from maed_tpu.ops.pallas_gate import spmd_active

    if spmd_active():
        return False
    return os.environ.get("MAED_FUSED_ATTENTION", "0") == "1"


def _use_token_major() -> bool:
    """Opt-in token-major block layout for parallel-mode clips
    (MAED_TOKEN_MAJOR=1) — VERDICT r3 next #4.

    The frame-major (B*T, N, C) contract gives the spatial branch contiguous
    rows but makes the temporal branch's (B, T, N, h, d) batched dots read
    T-strided operands — XLA materializes layout copies around them fwd+bwd
    (~26 ms/step of the 155.4 ms train step, ~7 ms of the eval forward).
    Token-major (B*N, T, C) flips the roles: ONE relayout at stack entry, a
    free cls-row slice at exit, the temporal branch becomes plain contiguous
    row attention, and the spatial branch becomes the grouped einsum whose
    much larger 197x197 dots must tile-load operands anyway. Math is
    identical either way (tests/test_token_major.py); flip by measurement.
    """
    return os.environ.get("MAED_TOKEN_MAJOR", "0") == "1"


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class FastLayerNorm(nn.Module):
    """LayerNorm with a pallas forward on TPU (see ops/layernorm.py: XLA's
    feature-axis moment reduction runs ~45x off memory roofline at the ViT
    token shape; the kernel is one read + one write). Param tree matches
    nn.LayerNorm ({scale, bias}), so checkpoints are unaffected."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from maed_tpu.ops.layernorm import apply_layernorm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return apply_layernorm(x.astype(self.dtype), scale, bias, self.epsilon)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def _softmax_drop(logits, dtype, dropout_rate, deterministic, dropout_rng_module):
    """f32-accumulated softmax over the last axis + (train-only) dropout."""
    probs = jax.nn.softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1
    ).astype(dtype)
    if dropout_rate > 0.0 and not deterministic:
        rng = dropout_rng_module.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return probs


class _LNParams(nn.Module):
    """Param holder with nn.LayerNorm's tree ({scale, bias})."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32))


class _DenseParams(nn.Module):
    """Param holder with nn.Dense's tree ({kernel, bias})."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.out_dim), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class _MlpParams(nn.Module):
    """Param holder matching the Mlp module tree (fc1/fc2)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.dim, self.hidden, name="fc1")(),
                _DenseParams(self.hidden, self.dim, name="fc2")())


class StAttention(nn.Module):
    """Multi-level spatio-temporal attention (the paper's core block).

    Operates on (B*T, N, C) tokens with a static clip length `seqlen`:
      vanilla  — attention over the N tokens of each frame
      temporal — mean-pool tokens, attend over the T frames
      coupling — joint attention over all T*N tokens of a clip
      parallel — spatial & temporal branches from one qkv, fused by a
                 learned per-channel softmax gate
      series   — spatial attention, re-projected qkv, then temporal
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    st_mode: str = "vanilla"
    dtype: Any = jnp.float32
    # token-major contract (parallel mode only): x is (B*N, T, C) and the
    # `seqlen` call arg carries N, the spatial group size (see
    # _use_token_major). Set by VisionTransformer, never user-facing.
    token_major: bool = False

    def setup(self):
        assert self.st_mode in ST_MODES, self.st_mode
        self.qkv_p = _DenseParams(self.dim, self.dim * 3,
                                  use_bias=self.qkv_bias, name="qkv")
        self.proj_p = _DenseParams(self.dim, self.dim, name="proj")
        self.proj_dropout = nn.Dropout(self.proj_drop)
        if self.st_mode == "parallel":
            # input is the concat of the two branch means: (2C) -> (2C)
            self.ts_attn_p = _DenseParams(self.dim * 2, self.dim * 2, name="ts_attn")

    def _qkv_heads(self, x, ln=None, deterministic=True):
        """Project to q, k, v and split heads WITHOUT transposing.

        Returns one (BT, N, 3, h, d) array. All downstream attention modes use
        einsum subscripts (or pallas kernels) that read this layout directly,
        so XLA folds every head split / batch regroup into the matmuls' data
        fetches instead of materializing transposed copies (the reference
        permutes to (3, BT, h, N, d) torch-style,
        vision_transformer.py:129-131 — a real data movement at
        (128, 197, 2304) that the TPU never needs to do).

        With `ln` = (scale, bias), x is the block's PRE-norm input and the
        norm1 LayerNorm fuses into the projection's pallas kernel
        (ops/mlp.py::fused_ln_dense) — one read of x, no materialized
        normalized tokens.
        """
        from maed_tpu.ops.mlp import fused_ln_dense, use_fused_mlp

        BT, N, C = x.shape
        h = self.num_heads
        kern, bias = self.qkv_p()
        x = x.astype(self.dtype)
        # training runs the plain path by default: the kernel's remat VJP
        # measured neutral-to-negative on the memory-bound train step
        # (155.4 ms all-plain vs 155.8 with fused qkv; doc/design.md table).
        # MAED_FUSED_QKV_TRAIN=1 opts it back in.
        fuse_ok = deterministic or os.environ.get(
            "MAED_FUSED_QKV_TRAIN", "0") == "1"
        if ln is not None and use_fused_mlp() and fuse_ok:
            b = jnp.zeros((self.dim * 3,), jnp.float32) if bias is None else bias
            y = fused_ln_dense(x, ln[0], ln[1], kern, b)
        else:
            if ln is not None:
                from maed_tpu.ops.layernorm import apply_layernorm

                x = apply_layernorm(x, ln[0], ln[1])
            y = jnp.dot(x, kern.astype(self.dtype))
            if bias is not None:
                y = y + bias.astype(self.dtype)
        return y.reshape(BT, N, 3, h, C // h)

    def _spatial(self, qkv, deterministic):
        BT, N, _, h, d = qkv.shape
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if _use_fused_attention() and (self.attn_drop == 0.0 or deterministic):
            from maed_tpu.ops.attention import fused_attention

            bhsd = lambda a: jnp.transpose(a, (0, 2, 1, 3))
            out = fused_attention(bhsd(q), bhsd(k), bhsd(v), d ** -0.5)
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(BT, N, h * d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
        probs = _softmax_drop(logits, q.dtype, self.attn_drop, deterministic, self)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(BT, N, h * d)

    def _temporal(self, qkv, seqlen, deterministic):
        BT, N, _, h, d = qkv.shape

        if seqlen == 1 and (self.attn_drop == 0.0 or deterministic):
            # attention over a single frame is exactly the identity over v
            # (softmax of a 1x1 logit is 1) — the image-batch forward of the
            # mixed train step (T=1 clips) skips the whole branch. attn_drop
            # > 0 would still drop/rescale that lone probability, so the
            # shortcut stands down then.
            return qkv[:, :, 2].reshape(BT, N, h * d)

        from maed_tpu.ops.st_attention import (
            temporal_attention, temporal_attention_fused,
            use_pallas_st_attention, use_temporal_v2,
        )

        if (use_temporal_v2() and h % 2 == 0
                and (self.attn_drop == 0.0 or deterministic)):
            # head-pair kernel: lane-aligned reads from the natural qkv
            # layout, output written directly in (BT, N, C) — no XLA
            # relayout on either side (see ops/st_attention.py)
            return temporal_attention_fused(qkv, seqlen, d ** -0.5)

        if use_pallas_st_attention() and (self.attn_drop == 0.0 or deterministic):
            # MXU-stacked pallas kernel (18912 tiny per-token matmuls are
            # ~2% MXU utilization as an XLA batched dot — see ops/st_attention)
            out = temporal_attention(qkv, seqlen, d ** -0.5)  # (h, BT, N, d)
            return jnp.transpose(out, (1, 2, 0, 3)).reshape(BT, N, h * d)

        return self._grouped(qkv, seqlen, deterministic)

    def _grouped(self, qkv, groups, deterministic):
        """Attention over the leading-axis grouping: rows (G*S, L) regrouped
        as (G, S, L, h, d) with attention over S, batched per (L, h). In the
        frame-major contract this is the temporal branch (S=T, L=N); in the
        token-major contract the SAME einsum is the spatial branch (S=N,
        L=T) — the layout experiment swaps which branch pays the grouping."""
        GS, L, _, h, d = qkv.shape
        G = GS // groups

        def to_g(a):  # (G*S, L, h, d) -> (G, S, L, h, d): a free reshape
            return a.reshape(G, groups, L, h, d)

        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqnhd,bknhd->bnhqk", to_g(q), to_g(k)) * (d ** -0.5)
        probs = _softmax_drop(logits, q.dtype, self.attn_drop, deterministic, self)
        out = jnp.einsum("bnhqk,bknhd->bqnhd", probs, to_g(v))
        return out.reshape(GS, L, h * d)

    def _coupling(self, qkv, seqlen, deterministic):
        BT, N, _, h, d = qkv.shape
        B = BT // seqlen

        def to_tn(a):  # (BT, N, h, d) -> (B, T*N, h, d): a free reshape
            return a.reshape(B, seqlen * N, h, d)

        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if _use_fused_attention() and (self.attn_drop == 0.0 or deterministic):
            from maed_tpu.ops.attention import fused_attention

            bhsd = lambda a: jnp.transpose(to_tn(a), (0, 2, 1, 3))
            out = fused_attention(bhsd(q), bhsd(k), bhsd(v), d ** -0.5)
            out = jnp.transpose(out, (0, 2, 1, 3))
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", to_tn(q), to_tn(k)) * (d ** -0.5)
            probs = _softmax_drop(logits, q.dtype, self.attn_drop, deterministic, self)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, to_tn(v))
        return out.reshape(BT, N, h * d)

    def _proj(self, y, deterministic):
        kern, bias = self.proj_p()
        y = jnp.dot(y.astype(self.dtype), kern.astype(self.dtype))
        y = y + bias.astype(self.dtype)
        return self.proj_dropout(y, deterministic=deterministic)

    def __call__(self, x, seqlen: int = 1, deterministic: bool = True,
                 ln=None, residual=None):
        """ln=(scale, bias): x is pre-norm and norm1 fuses into the qkv
        projection; ln=None: x is already normalized (reference-style).
        residual (parallel mode only): the block input — gate + proj +
        residual-add run as ONE pallas kernel and the summed block state is
        returned (the caller must then skip its own residual add)."""
        BT, N, C = x.shape

        if self.st_mode in ("vanilla", "spatial"):
            y = self._spatial(self._qkv_heads(x, ln, deterministic), deterministic)
        elif self.st_mode == "temporal":
            if ln is not None:
                from maed_tpu.ops.layernorm import apply_layernorm

                x = apply_layernorm(x.astype(self.dtype), ln[0], ln[1])
            xm = x.mean(axis=1, keepdims=True)  # (BT, 1, C)
            y = self._temporal(self._qkv_heads(xm, deterministic=deterministic), seqlen, deterministic)
        elif self.st_mode == "coupling":
            y = self._coupling(self._qkv_heads(x, ln, deterministic), seqlen, deterministic)
        elif self.st_mode == "series":
            y = self._spatial(self._qkv_heads(x, ln, deterministic), deterministic)
            y = self._temporal(self._qkv_heads(y, deterministic=deterministic), seqlen, deterministic)
        elif self.st_mode == "parallel" and self.token_major:
            # x is (B*N, T, C), seqlen carries N. Temporal branch = plain
            # contiguous row attention; spatial branch = the grouped einsum.
            N = seqlen
            B = BT // N  # BT here is really B*N
            qkv = self._qkv_heads(x, ln, deterministic)
            y_t = self._spatial(qkv, deterministic)
            y_s = self._grouped(qkv, N, deterministic)
            # the gate's per-frame means reduce over the N grouping
            ys_m = y_s.reshape(B, N, -1, C).mean(axis=1)  # (B, T, C)
            yt_m = y_t.reshape(B, N, -1, C).mean(axis=1)
            alpha = jnp.concatenate([ys_m, yt_m], axis=-1)
            k_ts, b_ts = self.ts_attn_p()
            alpha = jnp.dot(alpha.astype(self.dtype), k_ts.astype(self.dtype))
            alpha = (alpha + b_ts.astype(self.dtype)).reshape(B, -1, C, 2)
            alpha = jax.nn.softmax(alpha, axis=-1)
            # count_attn accounting keeps the frame-major (B*T, 1, C, 2) view
            self.sow("intermediates", "ts_gate", alpha.reshape(-1, 1, C, 2))
            y = (y_t.reshape(B, N, -1, C) * alpha[:, None, ..., 1]
                 + y_s.reshape(B, N, -1, C) * alpha[:, None, ..., 0])
            y = y.reshape(BT, -1, C)
        elif self.st_mode == "parallel":
            from maed_tpu.ops.mlp import fused_gate_proj, use_fused_gate

            qkv = self._qkv_heads(x, ln, deterministic)
            y_t = self._temporal(qkv, seqlen, deterministic)
            y_s = self._spatial(qkv, deterministic)
            if residual is not None and use_fused_gate():
                (k_ts, b_ts), (k_p, b_p) = self.ts_attn_p(), self.proj_p()
                out, alpha = fused_gate_proj(
                    y_s, y_t, residual.astype(self.dtype), k_ts, b_ts, k_p, b_p
                )
                # attention-weight accounting (the reference's count_attn
                # hooks, vision_transformer.py:230-240)
                self.sow("intermediates", "ts_gate", alpha)
                return out
            # learned per-channel gate over the two branches. mean-then-concat
            # == concat-then-mean (reference concats the full (BT, N, 2C)
            # tensor first); reducing first keeps the concat at (BT, 1, 2C).
            alpha = jnp.concatenate(
                [y_s.mean(axis=1, keepdims=True), y_t.mean(axis=1, keepdims=True)],
                axis=-1,
            )
            k_ts, b_ts = self.ts_attn_p()
            alpha = jnp.dot(alpha.astype(self.dtype), k_ts.astype(self.dtype))
            alpha = (alpha + b_ts.astype(self.dtype)).reshape(BT, 1, C, 2)
            alpha = jax.nn.softmax(alpha, axis=-1)
            self.sow("intermediates", "ts_gate", alpha)
            y = y_t * alpha[..., 1] + y_s * alpha[..., 0]
        else:
            raise NotImplementedError(self.st_mode)

        y = self._proj(y, deterministic)
        return y if residual is None else residual.astype(y.dtype) + y


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    st_mode: str = "vanilla"
    dtype: Any = jnp.float32
    token_major: bool = False  # see StAttention.token_major

    @nn.compact
    def __call__(self, x, seqlen: int = 1, deterministic: bool = True):
        ln1 = _LNParams(self.dim, name="norm1")()
        # MAED_FUSED_QKV=1 fuses norm1 into a pallas LN+qkv kernel; default
        # off — measured on v5e, XLA's own qkv matmul (~177 TF/s) plus its
        # LN fusion beats the hand kernel by ~0.7 ms/block.
        if os.environ.get("MAED_FUSED_QKV", "0") == "1":
            attn_in, ln_arg = x, ln1
        else:
            from maed_tpu.ops.layernorm import apply_layernorm

            attn_in = apply_layernorm(x.astype(self.dtype), ln1[0], ln1[1])
            ln_arg = None
        attn = StAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            st_mode=self.st_mode, dtype=self.dtype,
            token_major=self.token_major, name="attn",
        )
        stochastic1 = not deterministic and (self.drop > 0.0 or self.drop_path > 0.0)
        if self.st_mode == "parallel" and not stochastic1:
            # gate + proj + residual fuse into one kernel inside StAttention
            x = attn(attn_in, seqlen, deterministic, ln=ln_arg, residual=x)
        else:
            attn_out = attn(attn_in, seqlen, deterministic, ln=ln_arg)
            x = x + DropPath(self.drop_path, name="drop_path1")(attn_out, deterministic)

        # MLP half: params live at the same paths as the modular
        # norm2/Mlp(fc1, fc2) layout; the compute goes through ONE fused
        # LN+fc1+gelu+fc2+residual pallas kernel on TPU (ops/mlp.py) when no
        # stochastic op is active, else through the identical-math jnp path.
        ln_s, ln_b = _LNParams(self.dim, name="norm2")()
        (w1, b1), (w2, b2) = _MlpParams(
            self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
        from maed_tpu.ops.mlp import fused_ln_mlp, use_fused_mlp

        x = x.astype(self.dtype)
        # The fused kernel skips Dropout/DropPath, so it requires either
        # deterministic mode or all-zero rates (the published recipes set
        # none — flax's Dropout(0.0) is an rng-free no-op, so the swap is
        # exact). Training defaults to the PLAIN path: the kernel's
        # remat-style VJP was measured a net loss on the memory-bound v5e
        # train step (155.8 ms plain vs 158.0 fused+recompute vs 164.8 with
        # a bf16-materializing hand backward — same lesson as block remat,
        # which measured 179.7: recompute loses when HBM is the binding
        # roofline). MAED_FUSED_MLP_TRAIN=1 opts the backward-bearing
        # kernel path in for future shapes/generations. Both weight
        # matrices must stay VMEM-resident: at f32 they alone are 18.9 MB
        # (> the 16 MB scoped-vmem budget), so the kernel is bf16-only.
        hidden = int(self.dim * self.mlp_ratio)
        w_bytes = 2 * self.dim * hidden * jnp.dtype(self.dtype).itemsize
        fusable = deterministic or (
            self.drop == 0.0 and self.drop_path == 0.0
            and os.environ.get("MAED_FUSED_MLP_TRAIN", "0") == "1"
        )
        if use_fused_mlp() and fusable and w_bytes <= 12 * 2 ** 20:
            return fused_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, 1e-6)
        from maed_tpu.ops.layernorm import layernorm_reference

        y = layernorm_reference(x, ln_s, ln_b, 1e-6)
        y = jnp.dot(y, w1.astype(self.dtype)) + b1.astype(self.dtype)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = jnp.dot(y, w2.astype(self.dtype)) + b2.astype(self.dtype)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)



class HybridEmbed(nn.Module):
    """ResNetV2 feature map -> patch tokens via a 1x1 projection."""

    embed_dim: int = 768
    standardize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ResNetV2(layers=(3, 4, 9), preact=False,
                        standardize=self.standardize, dtype=self.dtype,
                        name="backbone")(x)
        tok = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="proj")(feat)
        B, H, W, C = tok.shape
        return tok.reshape(B, H * W, C)


class PatchEmbed(nn.Module):
    """Non-hybrid 16x16 patchification (stock ViT variants)."""

    embed_dim: int = 768
    patch_size: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        tok = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        B, H, W, C = tok.shape
        return tok.reshape(B, H * W, C)


class VisionTransformer(nn.Module):
    """ViT with spatio-temporal attention; returns the pre-logits cls feature.

    Input: (B*T, H, W, 3) NHWC frames with a static clip length `seqlen`.
    Output: (B*T, representation_size or embed_dim).
    """

    embed_dim: int = 768
    depth: int = 6
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    st_mode: str = "parallel"
    hybrid: bool = True
    patch_size: int = 16
    representation_size: Optional[int] = 768
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    max_seqlen: int = 16
    standardize: bool = True
    # rematerialize each transformer block's activations in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of FLOPs for O(depth) less
    # activation memory — enables much larger clip batches in training.
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, seqlen: int = 1, deterministic: bool = True):
        BT = x.shape[0]
        if self.hybrid:
            tokens = HybridEmbed(self.embed_dim, standardize=self.standardize,
                                 dtype=self.dtype, name="patch_embed")(x)
        else:
            tokens = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed")(x)

        cls_token = self.param("cls_token", trunc_init, (1, 1, self.embed_dim), jnp.float32)
        num_patches = tokens.shape[1]  # 196 for 224x224 hybrid input
        pos_embed = self.param(
            "pos_embed", trunc_init, (1, num_patches + 1, self.embed_dim), jnp.float32
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(tokens.dtype), (BT, 1, self.embed_dim)), tokens],
            axis=1,
        )
        tokens = tokens + pos_embed.astype(tokens.dtype)

        if self.st_mode in ("coupling", "parallel", "series"):
            temp_embed = self.param(
                "temp_embed", trunc_init, (1, self.max_seqlen, 1, self.embed_dim), jnp.float32
            )
            _, N, C = tokens.shape
            tokens = tokens.reshape(-1, seqlen, N, C) + temp_embed[:, :seqlen].astype(tokens.dtype)
            tokens = tokens.reshape(BT, N, C)

        tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)

        # token-major layout experiment (see _use_token_major): only for
        # parallel-mode clips, and only when every stochastic op is inert so
        # DropPath/Dropout row semantics cannot differ between contracts.
        _, N, C = tokens.shape
        token_major = (
            self.st_mode == "parallel" and seqlen > 1 and _use_token_major()
            and (deterministic or (self.drop_rate == 0.0
                                   and self.attn_drop_rate == 0.0
                                   and self.drop_path_rate == 0.0)))
        if token_major:
            B = BT // seqlen
            # ONE relayout for the whole stack: (B*T, N, C) -> (B*N, T, C)
            tokens = tokens.reshape(B, seqlen, N, C).transpose(0, 2, 1, 3)
            tokens = tokens.reshape(B * N, seqlen, C)
        blk_seqlen = N if token_major else seqlen

        dpr = [float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)]
        block_cls = nn.remat(Block, static_argnums=(2, 3)) if self.remat else Block
        for i in range(self.depth):
            tokens = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.drop_rate, self.attn_drop_rate, dpr[i],
                st_mode=self.st_mode, dtype=self.dtype,
                token_major=token_major, name=f"blocks_{i}",
            )(tokens, blk_seqlen, deterministic)

        if token_major:
            # exit relayout is FREE: only the cls rows are consumed — slice
            # them (n=0) instead of transposing the whole state back.
            tokens = tokens.reshape(B, N, seqlen, C)[:, 0].reshape(BT, 1, C)
        tokens = FastLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        feat = tokens[:, 0]
        if self.representation_size:
            feat = nn.Dense(self.representation_size, dtype=self.dtype, name="pre_logits")(feat)
            feat = jnp.tanh(feat)
        return feat


# ---------------------------------------------------------------------------
# factory catalog (parity with the reference's stock ViT variants,
# /root/reference/lib/models/vision_transformer.py:426-576)
# ---------------------------------------------------------------------------

def vit_small_patch16_224(**kw):
    return VisionTransformer(embed_dim=768, depth=8, num_heads=8, mlp_ratio=3.0,
                             qkv_bias=False, hybrid=False, patch_size=16,
                             representation_size=None, **kw)


def vit_base_patch16_224(**kw):
    return VisionTransformer(embed_dim=768, depth=12, num_heads=12, hybrid=False,
                             patch_size=16, representation_size=None, **kw)


def vit_base_patch16_384(**kw):
    return vit_base_patch16_224(**kw)  # input size is runtime in this design


def vit_base_patch32_384(**kw):
    return VisionTransformer(embed_dim=768, depth=12, num_heads=12, hybrid=False,
                             patch_size=32, representation_size=None, **kw)


def vit_large_patch16_224(**kw):
    return VisionTransformer(embed_dim=1024, depth=24, num_heads=16, hybrid=False,
                             patch_size=16, representation_size=None, **kw)


def vit_large_patch16_384(**kw):
    return vit_large_patch16_224(**kw)


def vit_large_patch32_384(**kw):
    return VisionTransformer(embed_dim=1024, depth=24, num_heads=16, hybrid=False,
                             patch_size=32, representation_size=None, **kw)


def vit_huge_patch16_224(**kw):
    return VisionTransformer(embed_dim=1280, depth=32, num_heads=16, hybrid=False,
                             patch_size=16, representation_size=None, **kw)


def vit_huge_patch32_384(**kw):
    return VisionTransformer(embed_dim=1280, depth=32, num_heads=16, hybrid=False,
                             patch_size=32, representation_size=None, **kw)


def vit_base_resnet50_224_in21k(**kw):
    """R50+ViT-B/16 hybrid (the in21k-pretrained stem+12-block variant)."""
    return VisionTransformer(embed_dim=768, depth=12, num_heads=12, hybrid=True,
                             representation_size=768, **kw)


def vit_custom_resnet50_224_in21k(num_blocks, num_heads, st_mode, **kw):
    """The MAED STE factory: hybrid stem + custom depth/heads/st_mode."""
    return VisionTransformer(embed_dim=768, depth=num_blocks, num_heads=num_heads,
                             st_mode=st_mode, hybrid=True,
                             representation_size=768, **kw)
