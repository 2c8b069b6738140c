"""Published-init ingestion test: build a synthetic npz in the timm/TF naming
scheme (the jx_vit_base_resnet50_224_in21k layout the reference auto-loads,
/root/reference/lib/models/resnetv2.py:350-379 + vision_transformer.py:560-576)
from a real flax encoder tree via the inverse mapping, convert, and require an
exact round-trip."""

import re

import numpy as np
import jax

from maed_tpu.models import MAED
from maed_tpu.utils.pretrained import apply_pretrained_backbone, convert_timm_npz
from maed_tpu.utils.smpl_io import synthetic_smpl_model


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def encoder_to_npz(enc_flat, num_heads):
    """Inverse mapping: flax encoder paths -> timm npz keys."""
    npz = {}
    qkv = {}
    for p, v in enc_flat.items():
        if "/ts_attn/" in p or p == "temp_embed":
            continue  # MAED-specific, absent from the published init
        m = re.fullmatch(r"patch_embed/backbone/stem_conv/kernel", p)
        if m:
            npz["resnet/root_block/standardized_conv2d/kernel"] = v
            continue
        m = re.fullmatch(r"patch_embed/backbone/stem_norm/GroupNorm_0/(scale|bias)", p)
        if m:
            g = "gamma" if m.group(1) == "scale" else "beta"
            npz[f"resnet/group_norm/{g}"] = v
            continue
        m = re.fullmatch(r"patch_embed/backbone/stage(\d+)/block(\d+)/(.*)", p)
        if m:
            s, u, rest = int(m.group(1)) + 1, int(m.group(2)) + 1, m.group(3)
            base = f"resnet/block{s}/unit{u:02d}"
            mm = re.fullmatch(r"conv(\d)/kernel", rest)
            if mm:
                npz[f"{base}/{'abc'[int(mm.group(1)) - 1]}/standardized_conv2d/kernel"] = v
                continue
            mm = re.fullmatch(r"norm(\d)/GroupNorm_0/(scale|bias)", rest)
            if mm:
                g = "gamma" if mm.group(2) == "scale" else "beta"
                npz[f"{base}/{'abc'[int(mm.group(1)) - 1]}/group_norm/{g}"] = v
                continue
            if rest == "downsample/conv/kernel":
                npz[f"{base}/a/proj/standardized_conv2d/kernel"] = v
                continue
            mm = re.fullmatch(r"downsample/norm/GroupNorm_0/(scale|bias)", rest)
            if mm:
                g = "gamma" if mm.group(1) == "scale" else "beta"
                npz[f"{base}/a/proj/group_norm/{g}"] = v
                continue
            raise AssertionError(p)
        if p == "patch_embed/proj/kernel":
            npz["embedding/kernel"] = v
            continue
        if p == "patch_embed/proj/bias":
            npz["embedding/bias"] = v
            continue
        if p == "cls_token":
            npz["cls"] = v
            continue
        if p == "pos_embed":
            npz["Transformer/posembed_input/pos_embedding"] = v
            continue
        m = re.fullmatch(r"norm/(scale|bias)", p)
        if m:
            npz[f"Transformer/encoder_norm/{m.group(1)}"] = v
            continue
        m = re.fullmatch(r"pre_logits/(kernel|bias)", p)
        if m:
            npz[f"pre_logits/{m.group(1)}"] = v
            continue
        m = re.fullmatch(r"blocks_(\d+)/(.*)", p)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            base = f"Transformer/encoderblock_{i}"
            mm = re.fullmatch(r"norm(\d)/(scale|bias)", rest)
            if mm:
                ln = "LayerNorm_0" if mm.group(1) == "1" else "LayerNorm_2"
                npz[f"{base}/{ln}/{mm.group(2)}"] = v
                continue
            mm = re.fullmatch(r"mlp/fc(\d)/(kernel|bias)", rest)
            if mm:
                d = "Dense_0" if mm.group(1) == "1" else "Dense_1"
                npz[f"{base}/MlpBlock_3/{d}/{mm.group(2)}"] = v
                continue
            if rest == "attn/proj/kernel":
                C = v.shape[-1]
                npz[f"{base}/MultiHeadDotProductAttention_1/out/kernel"] = v.reshape(
                    num_heads, C // num_heads, C
                )
                continue
            if rest == "attn/proj/bias":
                npz[f"{base}/MultiHeadDotProductAttention_1/out/bias"] = v
                continue
            if rest in ("attn/qkv/kernel", "attn/qkv/bias"):
                qkv[(i, rest.split("/")[-1])] = v
                continue
            raise AssertionError(p)
        raise AssertionError(p)

    for (i, leaf), v in qkv.items():
        base = f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1"
        if leaf == "kernel":
            C = v.shape[0]
            for n, part in zip(("query", "key", "value"), np.split(v, 3, axis=1)):
                npz[f"{base}/{n}/kernel"] = part.reshape(C, num_heads, C // num_heads)
        else:
            C = v.shape[0] // 3
            for n, part in zip(("query", "key", "value"), np.split(v, 3)):
                npz[f"{base}/{n}/bias"] = part.reshape(num_heads, C // num_heads)
    return npz


def test_npz_roundtrip_exact():
    model = MAED(encoder="ste", num_blocks=2, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=16)
    smpl = synthetic_smpl_model(num_verts=64)
    x = np.zeros((1, 2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, smpl)["params"]
    enc_flat = flatten(params["encoder"])

    npz = encoder_to_npz(enc_flat, num_heads=2)
    tree, unmatched = convert_timm_npz(npz)
    assert unmatched == [], unmatched

    got = flatten(tree)
    want = {p: v for p, v in enc_flat.items()
            if "/ts_attn/" not in p and p != "temp_embed"}
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for p in want:
        np.testing.assert_array_equal(got[p], want[p], err_msg=p)


def test_apply_pretrained_depth_mismatch(tmp_path):
    """A 12-block published npz loads into a shallower MAED encoder: the first
    num_blocks transfer, the extra blocks are ignored (the reference's
    strict=False load)."""
    model = MAED(encoder="ste", num_blocks=2, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=16)
    smpl = synthetic_smpl_model(num_verts=64)
    x = np.zeros((1, 2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, smpl)["params"]

    donor = MAED(encoder="ste", num_blocks=4, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=16)
    donor_params = donor.init(jax.random.PRNGKey(1), x, smpl)["params"]
    npz = encoder_to_npz(flatten(donor_params["encoder"]), num_heads=2)
    path = str(tmp_path / "init.npz")
    np.savez(path, **npz)

    loaded = apply_pretrained_backbone(params, path)
    # blocks 0/1 now carry the donor's weights; decoder untouched
    np.testing.assert_array_equal(
        loaded["encoder"]["blocks_1"]["mlp"]["fc1"]["kernel"],
        donor_params["encoder"]["blocks_1"]["mlp"]["fc1"]["kernel"],
    )
    np.testing.assert_array_equal(
        loaded["decoder"]["fc1"]["kernel"], params["decoder"]["fc1"]["kernel"]
    )
    # MAED-specific gate stays at the fresh init
    np.testing.assert_array_equal(
        loaded["encoder"]["blocks_0"]["attn"]["ts_attn"]["kernel"],
        params["encoder"]["blocks_0"]["attn"]["ts_attn"]["kernel"],
    )
