"""Checkpoint converter test: generate a torch-style state_dict from a real
flax param tree via an inverse name/layout mapping written here, run the
converter, and require an exact round-trip (every leaf matched, correct
transposes)."""

import numpy as np
import jax

from maed_tpu.models import MAED
from maed_tpu.utils.smpl_io import synthetic_smpl_model
from maed_tpu.utils.torch_convert import convert_state_dict


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def flax_path_to_torch_key(path: str):
    """Inverse mapping: flax param path -> reference torch state_dict key."""
    p = path
    p = p.replace("encoder/patch_embed/backbone/stem_conv/kernel",
                  "encoder.patch_embed.backbone.stem.conv.weight")
    p = p.replace("encoder/patch_embed/backbone/stem_norm/GroupNorm_0",
                  "encoder.patch_embed.backbone.stem.norm")
    import re

    p = re.sub(r"encoder/patch_embed/backbone/stage(\d+)/block(\d+)/downsample/conv",
               r"encoder.patch_embed.backbone.stages.\1.blocks.\2.downsample.conv", p)
    p = re.sub(r"encoder/patch_embed/backbone/stage(\d+)/block(\d+)/downsample/norm/GroupNorm_0",
               r"encoder.patch_embed.backbone.stages.\1.blocks.\2.downsample.norm", p)
    p = re.sub(r"encoder/patch_embed/backbone/stage(\d+)/block(\d+)/(norm\d)/GroupNorm_0",
               r"encoder.patch_embed.backbone.stages.\1.blocks.\2.\3", p)
    p = re.sub(r"encoder/patch_embed/backbone/stage(\d+)/block(\d+)/",
               r"encoder.patch_embed.backbone.stages.\1.blocks.\2.", p)
    p = re.sub(r"encoder/blocks_(\d+)/", r"encoder.blocks.\1.", p)
    p = re.sub(r"decoder/joint_reg(\d+)/", r"decoder.joint_regs.\1.", p)
    p = p.replace("encoder/pre_logits", "encoder.pre_logits.fc")
    p = p.replace("/", ".")
    # leaf names
    if p.endswith(".kernel"):
        p = p[: -len(".kernel")] + ".weight"
    elif p.endswith(".scale"):
        p = p[: -len(".scale")] + ".weight"
    return p


def torch_value_from_flax(path: str, value: np.ndarray):
    if path.endswith("/kernel") and value.ndim == 4:  # conv HWIO -> OIHW
        return np.transpose(value, (3, 2, 0, 1))
    if path.endswith("/kernel") and value.ndim == 2:  # linear (in,out)->(out,in)
        return np.transpose(value, (1, 0))
    return value


def test_roundtrip_ste_ktd():
    model = MAED(encoder="ste", num_blocks=2, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=16)
    smpl = synthetic_smpl_model(num_verts=64)
    x = np.zeros((1, 2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, smpl)["params"]

    flat = flatten(params)
    state_dict = {
        "module." + flax_path_to_torch_key(p): torch_value_from_flax(p, v)
        for p, v in flat.items()
    }
    # sprinkle in keys the converter must skip
    state_dict["module.decoder.smpl.v_template"] = np.zeros((64, 3))
    state_dict["module.encoder.head.weight"] = np.zeros((10, 16))

    got_params, got_stats, unmatched = convert_state_dict(state_dict)
    assert unmatched == [], unmatched

    got_flat = flatten(got_params)
    assert set(got_flat) == set(flat), (
        set(flat) - set(got_flat), set(got_flat) - set(flat)
    )
    for p in flat:
        np.testing.assert_array_equal(got_flat[p], flat[p]), p


def test_torch_load_path(tmp_path):
    """convert_torch_checkpoint reads a real torch-saved .pth.tar (the
    reference's checkpoint container: {'state_dict': ..., 'performance': ...})."""
    import torch

    from maed_tpu.utils.torch_convert import convert_torch_checkpoint

    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=16)
    smpl = synthetic_smpl_model(num_verts=64)
    x = np.zeros((1, 2, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(1), x, smpl)["params"]

    flat = flatten(params)
    state_dict = {
        "module." + flax_path_to_torch_key(p): torch.from_numpy(
            np.ascontiguousarray(torch_value_from_flax(p, v))
        )
        for p, v in flat.items()
    }
    path = str(tmp_path / "model_best.pth.tar")
    torch.save({"state_dict": state_dict, "performance": 45.7, "epoch": 3}, path)

    got = convert_torch_checkpoint(path)
    got_flat = flatten(got["params"])
    assert got["batch_stats"] == {}  # ste encoder is BN-free
    assert set(got_flat) == set(flat)
    for p in flat:
        np.testing.assert_array_equal(got_flat[p], flat[p])


def test_roundtrip_cnn_iterative():
    model = MAED(encoder="cnn", decoder="iterative", hidden_dim=16)
    smpl = synthetic_smpl_model(num_verts=64)
    x = np.zeros((1, 1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, smpl)
    params, stats = variables["params"], variables["batch_stats"]

    import re

    def cnn_key(path):
        p = path
        p = re.sub(r"encoder/layer(\d)_(\d+)/downsample_conv", r"encoder.layer\1.\2.downsample.0", p)
        p = re.sub(r"encoder/layer(\d)_(\d+)/downsample_bn", r"encoder.layer\1.\2.downsample.1", p)
        p = re.sub(r"encoder/layer(\d)_(\d+)/", r"encoder.layer\1.\2.", p)
        p = p.replace("/", ".")
        if p.endswith(".kernel"):
            p = p[: -len(".kernel")] + ".weight"
        elif p.endswith(".scale"):
            p = p[: -len(".scale")] + ".weight"
        elif p.endswith(".mean"):
            p = p[: -len(".mean")] + ".running_mean"
        elif p.endswith(".var"):
            p = p[: -len(".var")] + ".running_var"
        return p

    state_dict = {}
    for p, v in flatten(params).items():
        state_dict[cnn_key(p)] = torch_value_from_flax(p, v)
    for p, v in flatten(stats).items():
        state_dict[cnn_key(p)] = v
    state_dict["encoder.fc.weight"] = np.zeros((10, 2048))

    got_params, got_stats, unmatched = convert_state_dict(state_dict)
    assert unmatched == [], unmatched
    assert set(flatten(got_params)) == set(flatten(params))
    assert set(flatten(got_stats)) == set(flatten(stats))


def test_inspect_reports_unmatched(tmp_path):
    """--inspect coverage report: 0 for a fully-convertible state_dict,
    counts keys with no conversion rule."""
    import torch

    from maed_tpu.utils.torch_convert import inspect_torch_checkpoint

    sd = {
        "module.decoder.fc1.weight": torch.zeros(4, 8),
        "module.decoder.fc1.bias": torch.zeros(4),
        "module.decoder.smpl.v_template": torch.zeros(6, 3),  # skipped
    }
    p = tmp_path / "ok.pth.tar"
    torch.save({"state_dict": sd}, p)
    assert inspect_torch_checkpoint(str(p)) == 0

    sd["module.decoder.mystery.weight"] = torch.zeros(2)
    p2 = tmp_path / "bad.pth.tar"
    torch.save({"state_dict": sd}, p2)
    assert inspect_torch_checkpoint(str(p2)) == 1
