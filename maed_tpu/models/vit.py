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
    import os

    return os.environ.get("MAED_FUSED_ATTENTION", "0") == "1"


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


def _attend(q, k, v, scale, dropout_rate, deterministic, dropout_rng_module):
    """softmax((q k^T) * scale) v over the second-to-last axis of k/v.

    q, k, v: (..., S, d). Softmax accumulates in f32 for bf16 inputs.
    """
    logits = jnp.einsum("...qd,...kd->...qk", q, k) * scale
    probs = jax.nn.softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1
    ).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        rng = dropout_rng_module.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


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

    def setup(self):
        assert self.st_mode in ST_MODES, self.st_mode
        self.qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")
        self.proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")
        self.proj_dropout = nn.Dropout(self.proj_drop)
        if self.st_mode == "parallel":
            self.ts_attn = nn.Dense(self.dim * 2, dtype=self.dtype, name="ts_attn")

    def _qkv_heads(self, x):
        BT, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(BT, N, 3, h, C // h)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, BT, h, N, d)
        return qkv[0], qkv[1], qkv[2]

    def _spatial(self, q, k, v, deterministic):
        BT, h, N, d = q.shape
        if _use_fused_attention() and (self.attn_drop == 0.0 or deterministic):
            from maed_tpu.ops.attention import fused_attention

            out = fused_attention(q, k, v, d ** -0.5)
        else:
            out = _attend(q, k, v, d ** -0.5, self.attn_drop, deterministic, self)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(BT, N, h * d)

    def _temporal(self, q, k, v, seqlen, deterministic):
        BT, h, N, d = q.shape
        B = BT // seqlen

        def to_t(a):  # (BT, h, N, d) -> (B, h, N, T, d)
            return jnp.transpose(a.reshape(B, seqlen, h, N, d), (0, 2, 3, 1, 4))

        out = _attend(to_t(q), to_t(k), to_t(v), d ** -0.5, self.attn_drop, deterministic, self)
        # (B, h, N, T, d) -> (BT, N, C)
        out = jnp.transpose(out, (0, 3, 2, 1, 4)).reshape(BT, N, h * d)
        return out

    def _coupling(self, q, k, v, seqlen, deterministic):
        BT, h, N, d = q.shape
        B = BT // seqlen

        def to_tn(a):  # (BT, h, N, d) -> (B, h, T*N, d)
            return jnp.transpose(a.reshape(B, seqlen, h, N, d), (0, 2, 1, 3, 4)).reshape(
                B, h, seqlen * N, d
            )

        if _use_fused_attention() and (self.attn_drop == 0.0 or deterministic):
            from maed_tpu.ops.attention import fused_attention

            out = fused_attention(to_tn(q), to_tn(k), to_tn(v), d ** -0.5)
        else:
            out = _attend(to_tn(q), to_tn(k), to_tn(v), d ** -0.5, self.attn_drop, deterministic, self)
        out = out.reshape(B, h, seqlen, N, d)
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(BT, N, h * d)
        return out

    def __call__(self, x, seqlen: int = 1, deterministic: bool = True):
        BT, N, C = x.shape

        if self.st_mode in ("vanilla", "spatial"):
            q, k, v = self._qkv_heads(x)
            y = self._spatial(q, k, v, deterministic)
        elif self.st_mode == "temporal":
            xm = x.mean(axis=1, keepdims=True)  # (BT, 1, C)
            q, k, v = self._qkv_heads(xm)
            y = self._temporal(q, k, v, seqlen, deterministic)
        elif self.st_mode == "coupling":
            q, k, v = self._qkv_heads(x)
            y = self._coupling(q, k, v, seqlen, deterministic)
        elif self.st_mode == "series":
            q, k, v = self._qkv_heads(x)
            y = self._spatial(q, k, v, deterministic)
            q, k, v = self._qkv_heads(y)
            y = self._temporal(q, k, v, seqlen, deterministic)
        elif self.st_mode == "parallel":
            q, k, v = self._qkv_heads(x)
            y_t = self._temporal(q, k, v, seqlen, deterministic)
            y_s = self._spatial(q, k, v, deterministic)
            # learned per-channel gate over the two branches
            alpha = jnp.concatenate([y_s, y_t], axis=-1).mean(axis=1, keepdims=True)
            alpha = self.ts_attn(alpha).reshape(BT, 1, C, 2)
            alpha = jax.nn.softmax(alpha, axis=-1)
            # attention-weight accounting (the reference's count_attn hooks,
            # vision_transformer.py:230-240): collect via
            # apply(..., mutable=['intermediates'])
            self.sow("intermediates", "ts_gate", alpha)
            y = y_t * alpha[..., 1] + y_s * alpha[..., 0]
        else:
            raise NotImplementedError(self.st_mode)

        y = self.proj(y)
        y = self.proj_dropout(y, deterministic=deterministic)
        return y


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

    @nn.compact
    def __call__(self, x, seqlen: int = 1, deterministic: bool = True):
        attn_out = StAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            st_mode=self.st_mode, dtype=self.dtype, name="attn",
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), seqlen, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(attn_out, deterministic)
        mlp_out = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype, name="mlp",
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x), deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(mlp_out, deterministic)
        return x


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

        dpr = [float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)]
        block_cls = nn.remat(Block, static_argnums=(2, 3)) if self.remat else Block
        for i in range(self.depth):
            tokens = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.drop_rate, self.attn_drop_rate, dpr[i],
                st_mode=self.st_mode, dtype=self.dtype, name=f"blocks_{i}",
            )(tokens, seqlen, deterministic)

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
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
