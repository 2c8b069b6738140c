"""Published pretrained-weight ingestion for the STE encoder.

The reference builds its encoder with pretrained=True, which downloads the
timm `jx_vit_base_resnet50_224_in21k` torch checkpoint and loads it with
strict=False (/root/reference/lib/models/vision_transformer.py:36,560-576).
This module ingests both publishable formats into our flax tree:

  * `.pth` / `.pth.tar` — the timm torch state_dict (keys like
    `patch_embed.backbone.stages.0.blocks.0.conv1.weight`): re-uses
    utils.torch_convert by prefixing each key with `encoder.`;
  * `.npz` — the original jax/TF checkpoint naming that timm's ResNetV2
    `load_pretrained` reads (/root/reference/lib/models/resnetv2.py:350-379:
    `resnet/root_block/standardized_conv2d/kernel`,
    `resnet/block{i+1}/unit{j+1:02d}/{a,b,c}/...`) plus the ViT side
    (`Transformer/encoderblock_{i}/...`, `cls`, `embedding/kernel`).

Depth mismatches are fine (MAED uses the first `num_blocks` of the 12
pretrained blocks, like the reference's strict=False); MAED-specific params
(ts_attn gate, temp_embed) stay at their fresh init.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def convert_timm_npz(weights: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    """TF/jax npz naming -> our encoder param subtree. Returns (tree, unmatched).

    npz layouts need no transposes: convs are already HWIO and dense kernels
    (in, out) — the reference's tf2th transposes exist only because torch is
    OIHW (/root/reference/lib/models/resnetv2.py:104-108).
    """
    tree: dict = {}
    unmatched = []

    def qkv_merge(prefix):
        """timm npz stores separate q/k/v (C, h, d) kernels; our StAttention
        uses one fused (C, 3C) projection."""
        ks = [f"{prefix}/{n}/kernel" for n in ("query", "key", "value")]
        bs = [f"{prefix}/{n}/bias" for n in ("query", "key", "value")]
        if not all(k in weights for k in ks):
            return None, None
        C = weights[ks[0]].shape[0]
        kernel = np.concatenate([weights[k].reshape(C, -1) for k in ks], axis=1)
        bias = np.concatenate([weights[b].reshape(-1) for b in bs], axis=0)
        return kernel, bias

    handled = set()
    for k in weights:
        v = weights[k]
        # ---------------- ResNet stem/stages ----------------
        if k == "resnet/root_block/standardized_conv2d/kernel":
            _set(tree, "patch_embed/backbone/stem_conv/kernel", v)
            handled.add(k)
            continue
        m = re.fullmatch(r"resnet/group_norm/(gamma|beta)", k)
        if m:
            leaf = "scale" if m.group(1) == "gamma" else "bias"
            _set(tree, f"patch_embed/backbone/stem_norm/GroupNorm_0/{leaf}", v)
            handled.add(k)
            continue
        m = re.fullmatch(
            r"resnet/block(\d+)/unit(\d+)/([abc])/standardized_conv2d/kernel", k
        )
        if m:
            stage, unit = int(m.group(1)) - 1, int(m.group(2)) - 1
            conv = {"a": "conv1", "b": "conv2", "c": "conv3"}[m.group(3)]
            _set(tree, f"patch_embed/backbone/stage{stage}/block{unit}/{conv}/kernel", v)
            handled.add(k)
            continue
        m = re.fullmatch(r"resnet/block(\d+)/unit(\d+)/([abc])/group_norm/(gamma|beta)", k)
        if m:
            stage, unit = int(m.group(1)) - 1, int(m.group(2)) - 1
            norm = {"a": "norm1", "b": "norm2", "c": "norm3"}[m.group(3)]
            leaf = "scale" if m.group(4) == "gamma" else "bias"
            _set(tree, f"patch_embed/backbone/stage{stage}/block{unit}/{norm}/GroupNorm_0/{leaf}", v)
            handled.add(k)
            continue
        m = re.fullmatch(r"resnet/block(\d+)/unit(\d+)/a/proj/standardized_conv2d/kernel", k)
        if m:
            stage, unit = int(m.group(1)) - 1, int(m.group(2)) - 1
            _set(tree, f"patch_embed/backbone/stage{stage}/block{unit}/downsample/conv/kernel", v)
            handled.add(k)
            continue
        # downsample norm (non-preact 'same' stem carries one)
        m = re.fullmatch(r"resnet/block(\d+)/unit(\d+)/a/proj/group_norm/(gamma|beta)", k)
        if m:
            stage, unit = int(m.group(1)) - 1, int(m.group(2)) - 1
            leaf = "scale" if m.group(3) == "gamma" else "bias"
            _set(tree, f"patch_embed/backbone/stage{stage}/block{unit}/downsample/norm/GroupNorm_0/{leaf}", v)
            handled.add(k)
            continue

        # ---------------- ViT ----------------
        if k in ("embedding/kernel", "embedding/bias"):
            leaf = k.split("/")[-1]
            _set(tree, f"patch_embed/proj/{leaf}", v)
            handled.add(k)
            continue
        if k == "cls":
            _set(tree, "cls_token", v.reshape(1, 1, -1))
            handled.add(k)
            continue
        if k == "Transformer/posembed_input/pos_embedding":
            _set(tree, "pos_embed", v)
            handled.add(k)
            continue
        m = re.fullmatch(r"Transformer/encoder_norm/(scale|bias)", k)
        if m:
            _set(tree, f"norm/{m.group(1)}", v)
            handled.add(k)
            continue
        m = re.fullmatch(r"pre_logits/(kernel|bias)", k)
        if m:
            _set(tree, f"pre_logits/{m.group(1)}", v)
            handled.add(k)
            continue
        m = re.fullmatch(r"Transformer/encoderblock_(\d+)/(.+)", k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            base = f"blocks_{i}"
            mm = re.fullmatch(r"LayerNorm_0/(scale|bias)", rest)
            if mm:
                _set(tree, f"{base}/norm1/{mm.group(1)}", v)
                handled.add(k)
                continue
            mm = re.fullmatch(r"LayerNorm_2/(scale|bias)", rest)
            if mm:
                _set(tree, f"{base}/norm2/{mm.group(1)}", v)
                handled.add(k)
                continue
            mm = re.fullmatch(r"MlpBlock_3/Dense_(\d)/(kernel|bias)", rest)
            if mm:
                fc = "fc1" if mm.group(1) == "0" else "fc2"
                _set(tree, f"{base}/mlp/{fc}/{mm.group(2)}", v)
                handled.add(k)
                continue
            mm = re.fullmatch(r"MultiHeadDotProductAttention_1/out/(kernel|bias)", rest)
            if mm:
                if mm.group(1) == "kernel":
                    v = v.reshape(-1, v.shape[-1])  # (h, d, C) -> (C, C)
                _set(tree, f"{base}/attn/proj/{mm.group(1)}", v)
                handled.add(k)
                continue
            mm = re.fullmatch(
                r"MultiHeadDotProductAttention_1/(query|key|value)/(kernel|bias)", rest
            )
            if mm:
                # merged once per block below
                handled.add(k)
                continue
        if k not in handled:
            unmatched.append(k)

    # merge q/k/v per block
    block_ids = sorted({
        int(m.group(1)) for k in weights
        if (m := re.fullmatch(r"Transformer/encoderblock_(\d+)/.*", k))
    })
    for i in block_ids:
        kern, bias = qkv_merge(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1")
        if kern is not None:
            _set(tree, f"blocks_{i}/attn/qkv/kernel", kern)
            _set(tree, f"blocks_{i}/attn/qkv/bias", bias)

    return tree, unmatched


def load_pretrained_backbone(path: str) -> dict:
    """Load a published init into an {'encoder': ...} param tree.

    .npz -> convert_timm_npz; .pth/.pth.tar -> timm torch state_dict
    (head.* dropped like the reference, vision_transformer.py:573-574).
    """
    if path.endswith(".npz"):
        weights = dict(np.load(path))
        tree, unmatched = convert_timm_npz(weights)
        if unmatched:
            print(f"[pretrained] {len(unmatched)} unmatched npz keys, e.g. {unmatched[:5]}")
        return {"encoder": tree}

    import torch

    from maed_tpu.utils.torch_convert import convert_state_dict

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    sd = {
        "encoder." + k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in sd.items()
        if not k.startswith(("head.", "module.head."))
    }
    params, _, unmatched = convert_state_dict(sd)
    if unmatched:
        print(f"[pretrained] {len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params


def apply_pretrained_backbone(params: dict, path: str) -> dict:
    """Copy a published init's encoder weights into a fresh param tree
    (shape-compatible leaves only; extra pretrained blocks are dropped like
    the reference's strict=False load)."""
    import jax

    from maed_tpu.utils.checkpoint import _tree_update

    src = load_pretrained_backbone(path)
    params = jax.tree.map(lambda x: x, params)
    unused = _tree_update(params, src)
    if unused:
        print(f"[pretrained] {len(unused)} unused keys (depth mismatch is normal), "
              f"e.g. {unused[:3]}")
    return params
