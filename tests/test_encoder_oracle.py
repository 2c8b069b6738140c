"""Full STE-encoder parity: our flax hybrid ViT vs an independent torch
re-implementation (weights copied), composing stem + blocks + embeddings +
pre_logits. This validates the whole-composition semantics (init orderings
aside), the strongest checkpoint-free parity evidence."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maed_tpu.models.vit import VisionTransformer

B, T, HW = 2, 2, 64  # stem: 64 -> 4x4 feature map -> 16 patches + cls
DEPTH, HEADS, DIM = 2, 2, 32


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def conv_same(x, w_hwio, stride):
    w = t(np.transpose(w_hwio, (3, 2, 0, 1)))
    ih = x.shape[-1]
    k = w.shape[-1]
    pad = max((int(np.ceil(ih / stride)) - 1) * stride + k - ih, 0)
    x = F.pad(x, [pad // 2, pad - pad // 2] * 2)
    return F.conv2d(x, w, None, stride)


def std_conv_same(x, w_hwio, stride):
    w = t(np.transpose(w_hwio, (3, 2, 0, 1)))
    std, mean = torch.std_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
    w = (w - mean) / (std + 1e-5)
    ih = x.shape[-1]
    k = w.shape[-1]
    pad = max((int(np.ceil(ih / stride)) - 1) * stride + k - ih, 0)
    x = F.pad(x, [pad // 2, pad - pad // 2] * 2)
    return F.conv2d(x, w, None, stride)


def gn_act(x, p, act=True, groups=32):
    y = F.group_norm(x, groups, t(p["GroupNorm_0"]["scale"]), t(p["GroupNorm_0"]["bias"]), eps=1e-5)
    return F.relu(y) if act else y


def maxpool_same(x, k=3, s=2):
    ih = x.shape[-1]
    pad = max((int(np.ceil(ih / s)) - 1) * s + k - ih, 0)
    x = F.pad(x, [pad // 2, pad - pad // 2] * 2, value=-float("inf"))
    return F.max_pool2d(x, k, s)


def bottleneck_s(x, p, stride):
    shortcut = x
    if "downsample" in p:
        sc = std_conv_same(x, p["downsample"]["conv"]["kernel"], stride)
        shortcut = gn_act(sc, p["downsample"]["norm"], act=False)
    y = std_conv_same(x, p["conv1"]["kernel"], 1)
    y = gn_act(y, p["norm1"])
    y = std_conv_same(y, p["conv2"]["kernel"], stride)
    y = gn_act(y, p["norm2"])
    y = std_conv_same(y, p["conv3"]["kernel"], 1)
    y = gn_act(y, p["norm3"], act=False)
    return F.relu(y + shortcut)


def linear(x, p):
    return F.linear(x, t(p["kernel"]).T, t(p["bias"]))


def layernorm(x, p, dim):
    return F.layer_norm(x, (dim,), t(p["scale"]), t(p["bias"]), eps=1e-6)


def attention_parallel(x, p, seqlen, heads):
    BT, N, C = x.shape
    h = heads

    def qkv_heads(inp):
        qkv = linear(inp, p["qkv"]).reshape(inp.shape[0], inp.shape[1], 3, h, C // h)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        return qkv[0], qkv[1], qkv[2]

    def attend(q, k, v):
        s = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
        return s.softmax(dim=-1) @ v

    q, k, v = qkv_heads(x)
    # temporal
    rs = lambda a: a.reshape(-1, seqlen, h, N, C // h).permute(0, 2, 3, 1, 4)
    xt = attend(rs(q), rs(k), rs(v)).permute(0, 3, 2, 1, 4).reshape(BT, N, C)
    # spatial
    xs = attend(q, k, v).transpose(1, 2).reshape(BT, N, C)
    alpha = torch.cat([xs, xt], dim=-1).mean(dim=1, keepdim=True)
    alpha = linear(alpha, p["ts_attn"]).reshape(BT, 1, C, 2).softmax(dim=-1)
    y = xt * alpha[..., 1] + xs * alpha[..., 0]
    return linear(y, p["proj"])


def torch_encoder(x_nhwc, params, seqlen, depth=None, heads=None):
    depth = DEPTH if depth is None else depth
    heads = HEADS if heads is None else heads
    p = params
    x = t(np.transpose(x_nhwc, (0, 3, 1, 2)))

    bb = p["patch_embed"]["backbone"]
    y = std_conv_same(x, bb["stem_conv"]["kernel"], 2)
    y = gn_act(y, bb["stem_norm"])
    y = maxpool_same(y)
    for si in range(3):
        stage = bb[f"stage{si}"]
        stride = 1 if si == 0 else 2
        for bi in sorted(int(k[5:]) for k in stage):
            y = bottleneck_s(y, stage[f"block{bi}"], stride if bi == 0 else 1)

    proj = p["patch_embed"]["proj"]
    y = F.conv2d(y, t(np.transpose(proj["kernel"], (3, 2, 0, 1))), t(proj["bias"]))
    Bt, C, Hh, Ww = y.shape
    tokens = y.flatten(2).transpose(1, 2)  # (BT, N, C)

    cls = t(p["cls_token"]).expand(Bt, -1, -1)
    tokens = torch.cat([cls, tokens], dim=1) + t(p["pos_embed"])
    _, N, C = tokens.shape
    tokens = tokens.reshape(-1, seqlen, N, C) + t(p["temp_embed"])[:, :seqlen]
    tokens = tokens.reshape(Bt, N, C)

    for i in range(depth):
        blk = p[f"blocks_{i}"]
        a = attention_parallel(layernorm(tokens, blk["norm1"], C), blk["attn"], seqlen, heads)
        tokens = tokens + a
        m = linear(layernorm(tokens, blk["norm2"], C), blk["mlp"]["fc1"])
        m = F.gelu(m)
        m = linear(m, blk["mlp"]["fc2"])
        tokens = tokens + m

    tokens = layernorm(tokens, p["norm"], C)
    feat = tokens[:, 0]
    feat = torch.tanh(linear(feat, p["pre_logits"]))
    return feat.numpy()


def test_full_encoder_matches_torch_oracle(rng):
    enc = VisionTransformer(embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                            st_mode="parallel", hybrid=True,
                            representation_size=DIM)
    x = rng.randn(B * T, HW, HW, 3).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), T)["params"]
    # our GroupNorm uses 32 groups; small channels need fewer in the oracle
    with jax.default_matmul_precision("highest"):
        got = np.asarray(enc.apply({"params": params}, jnp.asarray(x), T))
    want = torch_encoder(x, jax.tree.map(np.asarray, params), T)
    assert got.shape == want.shape == (B * T, DIM)
    np.testing.assert_allclose(got, want, atol=5e-4)
