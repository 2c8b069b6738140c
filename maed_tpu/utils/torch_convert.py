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


# --------------------------------------------------------------------------- #
# inverse direction: flax params -> reference torch state_dict
# --------------------------------------------------------------------------- #

def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


# (flax-path regex, torch-key replacement) — the exact inverse of
# translate_torch_key's renames; value layout is handled by leaf suffix.
_INVERSE_RENAMES = [
    (r"^encoder/patch_embed/backbone/stem_conv/",
     r"encoder.patch_embed.backbone.stem.conv/"),
    (r"^encoder/patch_embed/backbone/stem_norm/GroupNorm_0/",
     r"encoder.patch_embed.backbone.stem.norm/"),
    (r"^encoder/patch_embed/backbone/stage(\d+)/block(\d+)/downsample/conv/",
     r"encoder.patch_embed.backbone.stages.\1.blocks.\2.downsample.conv/"),
    (r"^encoder/patch_embed/backbone/stage(\d+)/block(\d+)/downsample/norm/GroupNorm_0/",
     r"encoder.patch_embed.backbone.stages.\1.blocks.\2.downsample.norm/"),
    (r"^encoder/patch_embed/backbone/stage(\d+)/block(\d+)/(norm\d)/GroupNorm_0/",
     r"encoder.patch_embed.backbone.stages.\1.blocks.\2.\3/"),
    (r"^encoder/patch_embed/backbone/stage(\d+)/block(\d+)/",
     r"encoder.patch_embed.backbone.stages.\1.blocks.\2."),
    (r"^encoder/blocks_(\d+)/", r"encoder.blocks.\1."),
    (r"^encoder/pre_logits/", r"encoder.pre_logits.fc/"),
    (r"^decoder/joint_reg(\d+)/", r"decoder.joint_regs.\1."),
    # torchvision resnet50 ('cnn' encoder)
    (r"^encoder/layer(\d)_(\d+)/downsample_conv/", r"encoder.layer\1.\2.downsample.0/"),
    (r"^encoder/layer(\d)_(\d+)/downsample_bn/", r"encoder.layer\1.\2.downsample.1/"),
    (r"^encoder/layer(\d)_(\d+)/", r"encoder.layer\1.\2."),
]


def translate_flax_path(path: str, value: np.ndarray, collection: str = "params"):
    """flax param path -> (torch_key, torch_value). Inverse of
    translate_torch_key; round-trip tested, and the produced key set is
    checked against the REAL reference modules' state_dicts
    (tests/test_reference_naming.py)."""
    p = path
    for pat, repl in _INVERSE_RENAMES:
        p = re.sub(pat, repl, p)
    p = p.replace("/", ".")

    leaf = p.rsplit(".", 1)[-1]
    stem = p[: -len(leaf) - 1]
    if collection == "batch_stats":
        field = {"mean": "running_mean", "var": "running_var"}[leaf]
        return f"{stem}.{field}", value
    if leaf == "kernel":
        if value.ndim == 4:
            return f"{stem}.weight", np.transpose(value, (3, 2, 0, 1))
        return f"{stem}.weight", np.transpose(value, (1, 0))
    if leaf == "scale":
        return f"{stem}.weight", value
    return p, value


def convert_params_to_state_dict(
    params: dict, batch_stats: dict | None = None, prefix: str = ""
) -> Dict[str, np.ndarray]:
    """flax (params, batch_stats) -> reference-named torch state_dict.

    The inverse of convert_state_dict: lets a model trained here be loaded
    by the reference codebase (`model.load_state_dict(..., strict=False)` —
    the reference's own eval load path drops smpl buffers the same way,
    /root/reference/eval.py:26-35). prefix='module.' reproduces the DDP
    naming of the published checkpoints. BN num_batches_tracked is
    synthesized (torch tracks it; it does not affect eval-mode math)."""
    sd: Dict[str, np.ndarray] = {}
    for path, v in _flatten(params).items():
        k, tv = translate_flax_path(path, v, "params")
        sd[prefix + k] = tv
    for path, v in _flatten(batch_stats or {}).items():
        k, tv = translate_flax_path(path, v, "batch_stats")
        sd[prefix + k] = tv
        sd[prefix + k.rsplit(".", 1)[0] + ".num_batches_tracked"] = np.asarray(
            0, np.int64)
    return sd


def inspect_torch_checkpoint(path: str) -> int:
    """Report conversion coverage for a reference .pth(.tar): per-prefix
    matched/skipped/unmatched counts. Returns the unmatched count — run this
    against the released checkpoint BEFORE the acceptance eval to see
    whether every learned tensor has a home."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    stats: Dict[str, list] = {}
    unmatched_keys = []
    for k, v in sd.items():
        prefix = ".".join(k.replace("module.", "").split(".")[:2])
        s = stats.setdefault(prefix, [0, 0, 0])  # matched, skipped, unmatched
        out = translate_torch_key(k, np.asarray(v))
        if out is None:
            s[1] += 1
        elif out[0].startswith("__UNMATCHED__"):
            s[2] += 1
            unmatched_keys.append(k)
        else:
            s[0] += 1
    print(f"{path}: {len(sd)} tensors")
    for prefix in sorted(stats):
        m, sk, um = stats[prefix]
        flag = "  <-- UNMATCHED" if um else ""
        print(f"  {prefix:40s} matched {m:4d}  skipped {sk:3d}  "
              f"unmatched {um:3d}{flag}")
    for k in unmatched_keys[:10]:
        print(f"  unmatched: {k}")
    n_unmatched = len(unmatched_keys)
    print("OK: every learned tensor converts" if n_unmatched == 0
          else f"{n_unmatched} keys have NO conversion rule")
    return n_unmatched


def main():
    """CLI: export an orbax checkpoint to a reference-compatible .pth.tar,
    or --inspect a reference checkpoint's conversion coverage."""
    import argparse

    import torch

    from maed_tpu.utils.checkpoint import load_checkpoint

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--checkpoint", default="",
                    help="orbax checkpoint dir (trainer output)")
    ap.add_argument("--out", default="", help=".pth.tar to write")
    ap.add_argument("--prefix", default="module.",
                    help="state_dict key prefix (published checkpoints use "
                    "the DDP 'module.'; '' for a bare module)")
    ap.add_argument("--inspect", default="",
                    help="reference .pth(.tar): report torch->jax conversion "
                    "coverage and exit (nonzero on unmatched keys)")
    args = ap.parse_args()

    if args.inspect:
        raise SystemExit(1 if inspect_torch_checkpoint(args.inspect) else 0)
    if not (args.checkpoint and args.out):
        ap.error("--checkpoint and --out are required (or use --inspect)")

    ckpt = load_checkpoint(args.checkpoint)
    sd = convert_params_to_state_dict(
        ckpt["params"], ckpt.get("batch_stats") or {}, prefix=args.prefix)
    out = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "epoch": int(np.asarray(ckpt.get("epoch", 0))),
        "performance": float(np.asarray(ckpt.get("performance", 0.0))),
    }
    torch.save(out, args.out)
    print(f"wrote {args.out}: {len(sd)} tensors, prefix='{args.prefix}'")


if __name__ == "__main__":
    main()
