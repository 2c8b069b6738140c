"""torch -> jax checkpoint conversion for reference MAED checkpoints.

Maps the reference's torch state_dict naming
(/root/reference/lib/models/{maed,vision_transformer,resnetv2,ktd,spin}.py)
onto this framework's flax param tree, with layout transposes:
  conv   OIHW -> HWIO
  linear (out, in) -> (in, out)
  norm   weight -> scale
Skips SMPL buffers (SMPL tensors are model constants here) and the `module.`
DDP prefix. BatchNorm running stats are returned separately for the 'cnn'
encoder.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # (out, in) -> (in, out)
    return np.transpose(w, (1, 0))


def translate_torch_key(key: str, value: np.ndarray):
    """Returns (flax_path, converted_value, collection) or None to skip.

    collection is 'params' or 'batch_stats'.
    """
    k = key
    if k.startswith("module."):
        k = k[len("module."):]
    if ".smpl." in k or k.startswith("smpl."):
        return None
    if k.startswith("head.") or k.startswith("encoder.head."):
        return None
    if k.endswith("num_batches_tracked"):
        return None
    if k.split(".")[-1] in ("init_pose", "init_shape", "init_cam", "joint_map",
                            "J_regressor_extra"):
        return None

    # ---------------- encoder: ViT top-level tensors ----------------
    m = re.fullmatch(r"encoder\.(cls_token|pos_embed|temp_embed)", k)
    if m:
        return f"encoder/{m.group(1)}", value, "params"

    m = re.fullmatch(r"encoder\.norm\.(weight|bias)", k)
    if m:
        suffix = "scale" if m.group(1) == "weight" else "bias"
        return f"encoder/norm/{suffix}", value, "params"

    m = re.fullmatch(r"encoder\.pre_logits\.fc\.(weight|bias)", k)
    if m:
        v = _lin(value) if m.group(1) == "weight" else value
        suffix = "kernel" if m.group(1) == "weight" else "bias"
        return f"encoder/pre_logits/{suffix}", v, "params"

    # ---------------- encoder: transformer blocks ----------------
    m = re.fullmatch(
        r"encoder\.blocks\.(\d+)\.(norm1|norm2)\.(weight|bias)", k
    )
    if m:
        suffix = "scale" if m.group(3) == "weight" else "bias"
        return f"encoder/blocks_{m.group(1)}/{m.group(2)}/{suffix}", value, "params"

    m = re.fullmatch(
        r"encoder\.blocks\.(\d+)\.attn\.(qkv|proj|ts_attn)\.(weight|bias)", k
    )
    if m:
        v = _lin(value) if m.group(3) == "weight" else value
        suffix = "kernel" if m.group(3) == "weight" else "bias"
        return f"encoder/blocks_{m.group(1)}/attn/{m.group(2)}/{suffix}", v, "params"

    m = re.fullmatch(
        r"encoder\.blocks\.(\d+)\.mlp\.(fc1|fc2)\.(weight|bias)", k
    )
    if m:
        v = _lin(value) if m.group(3) == "weight" else value
        suffix = "kernel" if m.group(3) == "weight" else "bias"
        return f"encoder/blocks_{m.group(1)}/mlp/{m.group(2)}/{suffix}", v, "params"

    # ---------------- encoder: hybrid stem (ResNetV2) ----------------
    m = re.fullmatch(r"encoder\.patch_embed\.proj\.(weight|bias)", k)
    if m:
        v = _conv(value) if m.group(1) == "weight" else value
        suffix = "kernel" if m.group(1) == "weight" else "bias"
        return f"encoder/patch_embed/proj/{suffix}", v, "params"

    base = r"encoder\.patch_embed\.backbone\."
    m = re.fullmatch(base + r"stem\.conv\.weight", k)
    if m:
        return "encoder/patch_embed/backbone/stem_conv/kernel", _conv(value), "params"
    m = re.fullmatch(base + r"stem\.norm\.(weight|bias)", k)
    if m:
        suffix = "scale" if m.group(1) == "weight" else "bias"
        return f"encoder/patch_embed/backbone/stem_norm/GroupNorm_0/{suffix}", value, "params"

    m = re.fullmatch(
        base + r"stages\.(\d+)\.blocks\.(\d+)\.(conv\d)\.weight", k
    )
    if m:
        return (
            f"encoder/patch_embed/backbone/stage{m.group(1)}/block{m.group(2)}/"
            f"{m.group(3)}/kernel", _conv(value), "params",
        )
    m = re.fullmatch(
        base + r"stages\.(\d+)\.blocks\.(\d+)\.(norm\d)\.(weight|bias)", k
    )
    if m:
        suffix = "scale" if m.group(4) == "weight" else "bias"
        return (
            f"encoder/patch_embed/backbone/stage{m.group(1)}/block{m.group(2)}/"
            f"{m.group(3)}/GroupNorm_0/{suffix}", value, "params",
        )
    m = re.fullmatch(
        base + r"stages\.(\d+)\.blocks\.(\d+)\.downsample\.conv\.weight", k
    )
    if m:
        return (
            f"encoder/patch_embed/backbone/stage{m.group(1)}/block{m.group(2)}/"
            f"downsample/conv/kernel", _conv(value), "params",
        )
    m = re.fullmatch(
        base + r"stages\.(\d+)\.blocks\.(\d+)\.downsample\.norm\.(weight|bias)", k
    )
    if m:
        suffix = "scale" if m.group(3) == "weight" else "bias"
        return (
            f"encoder/patch_embed/backbone/stage{m.group(1)}/block{m.group(2)}/"
            f"downsample/norm/GroupNorm_0/{suffix}", value, "params",
        )

    # ---------------- encoder: torchvision resnet50 ('cnn') ----------------
    m = re.fullmatch(r"encoder\.conv1\.weight", k)
    if m:
        return "encoder/conv1/kernel", _conv(value), "params"
    m = re.fullmatch(r"encoder\.bn1\.(weight|bias|running_mean|running_var)", k)
    if m:
        return _bn("encoder/bn1", m.group(1), value)
    m = re.fullmatch(
        r"encoder\.layer(\d)\.(\d+)\.conv(\d)\.weight", k
    )
    if m:
        return (
            f"encoder/layer{m.group(1)}_{m.group(2)}/conv{m.group(3)}/kernel",
            _conv(value), "params",
        )
    m = re.fullmatch(
        r"encoder\.layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|running_mean|running_var)", k
    )
    if m:
        return _bn(f"encoder/layer{m.group(1)}_{m.group(2)}/bn{m.group(3)}",
                   m.group(4), value)
    m = re.fullmatch(r"encoder\.layer(\d)\.(\d+)\.downsample\.0\.weight", k)
    if m:
        return (
            f"encoder/layer{m.group(1)}_{m.group(2)}/downsample_conv/kernel",
            _conv(value), "params",
        )
    m = re.fullmatch(
        r"encoder\.layer(\d)\.(\d+)\.downsample\.1\.(weight|bias|running_mean|running_var)", k
    )
    if m:
        return _bn(f"encoder/layer{m.group(1)}_{m.group(2)}/downsample_bn",
                   m.group(3), value)
    if re.fullmatch(r"encoder\.fc\.(weight|bias)", k):
        return None  # classifier head removed in the reference too

    # ---------------- decoder: KTD ----------------
    m = re.fullmatch(r"decoder\.(fc1|fc2|decshape|deccam)\.(weight|bias)", k)
    if m:
        v = _lin(value) if m.group(2) == "weight" else value
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"decoder/{m.group(1)}/{suffix}", v, "params"
    m = re.fullmatch(r"decoder\.joint_regs\.(\d+)\.(weight|bias)", k)
    if m:
        v = _lin(value) if m.group(2) == "weight" else value
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"decoder/joint_reg{m.group(1)}/{suffix}", v, "params"

    # ---------------- decoder: iterative (SPIN) ----------------
    m = re.fullmatch(r"decoder\.(decpose)\.(weight|bias)", k)
    if m:
        v = _lin(value) if m.group(2) == "weight" else value
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"decoder/{m.group(1)}/{suffix}", v, "params"

    return ("__UNMATCHED__/" + k, value, "params")


def _bn(path, field, value):
    if field == "weight":
        return f"{path}/scale", value, "params"
    if field == "bias":
        return f"{path}/bias", value, "params"
    if field == "running_mean":
        return f"{path}/mean", value, "batch_stats"
    return f"{path}/var", value, "batch_stats"


def convert_state_dict(state_dict: Dict[str, np.ndarray]) -> Tuple[dict, dict, list]:
    """torch state_dict -> (params_tree, batch_stats_tree, unmatched_keys)."""
    params: dict = {}
    batch_stats: dict = {}
    unmatched = []
    for k, v in state_dict.items():
        v = np.asarray(v)
        out = translate_torch_key(k, v)
        if out is None:
            continue
        path, val, coll = out
        if path.startswith("__UNMATCHED__"):
            unmatched.append(k)
            continue
        _set(params if coll == "params" else batch_stats, path, val)
    return params, batch_stats, unmatched


def convert_torch_checkpoint(path: str, reference_params=None) -> dict:
    """Load a reference .pth(.tar) checkpoint -> {'params', 'batch_stats'}.

    batch_stats carries BN running statistics (the cnn/resnet50 encoder);
    dropping them would evaluate a converted stage-1 checkpoint with freshly
    initialized BN stats. Empty dict for the BN-free ste encoder."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                  for k, v in state_dict.items()}
    params, batch_stats, unmatched = convert_state_dict(state_dict)
    if unmatched:
        print(f"[torch_convert] {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
    return {"params": params, "batch_stats": batch_stats}
