"""Config system tests: reference yaml compatibility, merging, CLI parsing."""

import pytest
import yaml

from maed_tpu.core.config import CfgNode, get_cfg_defaults, parse_args, update_cfg


def test_reference_yamls_load_verbatim():
    for f in ("/root/reference/configs/config_stage1.yaml",
              "/root/reference/configs/config_stage2.yaml"):
        cfg = update_cfg(f)
        assert cfg.DATASET.SEQLEN == 16
        assert cfg.LOSS.KP_2D_W == 300.0
    cfg2 = update_cfg("/root/reference/configs/config_stage2.yaml")
    assert cfg2.MODEL.ENCODER.SPA_TEMP_MODE == "parallel"
    assert cfg2.TRAIN.OPTIM.MILESTONES == [60, 90]


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


@pytest.mark.parametrize("stage", ["stage1", "stage2"])
def test_stage_yaml_reference_parity(stage):
    """Repo stage yamls must carry the reference recipe key-for-key
    (VERDICT round-1 Missing #4: a drifted stage-1 yaml trains a different
    model). Only deliberate cosmetic keys may differ: EXP_NAME (run label)
    and DEVICE (cuda vs tpu)."""
    with open(f"/root/repo/configs/config_{stage}.yaml") as f:
        ours = _flatten(yaml.safe_load(f))
    with open(f"/root/reference/configs/config_{stage}.yaml") as f:
        ref = _flatten(yaml.safe_load(f))
    cosmetic = {"EXP_NAME", "DEVICE"}
    diffs = {
        k: (ours.get(k, "<missing>"), ref[k])
        for k in ref
        if k not in cosmetic and ours.get(k, "<missing>") != ref[k]
    }
    assert diffs == {}, f"recipe drift vs reference {stage}: {diffs}"


def test_defaults_clone_isolated():
    a = get_cfg_defaults()
    b = get_cfg_defaults()
    a.TRAIN.BATCH_SIZE_3D = 99
    assert b.TRAIN.BATCH_SIZE_3D != 99
    c = a.clone()
    a.TRAIN.OPTIM.LR = 123.0
    assert c.TRAIN.OPTIM.LR != 123.0


def test_unknown_key_rejected():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"NOT_A_KEY": 1})
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"TRAIN": {"NOT_A_KEY": 1}})


def test_merge_from_list():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["TRAIN.BATCH_SIZE_3D", "7", "DATASET.SEQLEN", "32"])
    assert cfg.TRAIN.BATCH_SIZE_3D == 7
    assert cfg.DATASET.SEQLEN == 32


def test_dump_roundtrip():
    cfg = get_cfg_defaults()
    data = yaml.safe_load(cfg.dump())
    assert data["MODEL"]["ENCODER"]["BACKBONE"] == "ste"
    fresh = get_cfg_defaults()
    fresh.merge_from_dict(data)  # a dump must merge back cleanly
    assert fresh.EVAL.SAMPLE_POOL == cfg.EVAL.SAMPLE_POOL


def test_parse_args_defaults():
    args, cfg, _ = parse_args([])
    assert args.eval_ds == "3dpw"
    assert args.eval_set == "test"
    assert cfg.DATASET.WIDTH == 224


def test_parse_args_opts_overrides():
    # yacs-style trailing KEY VALUE pairs: a supervisor relaunches ONE fixed
    # command (`train.py --cfg x.yaml TRAIN.RESUME auto`) after preemption
    args, cfg, _ = parse_args(
        ["TRAIN.RESUME", "auto", "TRAIN.END_EPOCH", "60"])
    assert cfg.TRAIN.RESUME == "auto"
    assert cfg.TRAIN.END_EPOCH == 60
    import pytest

    with pytest.raises(SystemExit):  # unknown key -> argparse error
        parse_args(["NOPE.KEY", "1"])
    with pytest.raises(SystemExit):  # odd-length pairs -> argparse error
        parse_args(["TRAIN.END_EPOCH"])
    with pytest.raises(SystemExit):  # mistyped value -> argparse error
        parse_args(["TRAIN.END_EPOCH", "sixty"])


def test_merge_from_list_type_checks():
    cfg = get_cfg_defaults()
    import pytest

    for key, bad in [("TRAIN.END_EPOCH", "sixty"),   # int <- str
                     ("LOSS.KP_2D_W", "heavy"),       # float <- str
                     ("DEBUG", "maybe"),              # bool <- str
                     ("TRAIN.OPTIM.MILESTONES", "5")]:  # list <- int
        with pytest.raises(ValueError):
            cfg.merge_from_list([key, bad])
    cfg.merge_from_list(["LOSS.KP_2D_W", "100"])  # int literal -> float key
    assert cfg.LOSS.KP_2D_W == 100.0 and isinstance(cfg.LOSS.KP_2D_W, float)
    cfg.merge_from_list(["DEBUG", "false", "TRAIN.OPTIM.MILESTONES", "[5,9]"])
    assert cfg.DEBUG is False and cfg.TRAIN.OPTIM.MILESTONES == [5, 9]
    # YAML 1.1 parses bare scientific notation as a STRING; yacs accepts it
    # and `TRAIN.OPTIM.LR 1e-4` is the most common LR spelling (ADVICE r4)
    cfg.merge_from_list(["TRAIN.OPTIM.LR", "1e-4"])
    assert cfg.TRAIN.OPTIM.LR == 1e-4 and isinstance(cfg.TRAIN.OPTIM.LR, float)
    with pytest.raises(ValueError):  # still rejects genuine non-numbers
        cfg.merge_from_list(["TRAIN.OPTIM.LR", "1e-4x"])


def test_nan_param_reporter():
    import numpy as np

    from maed_tpu.parallel.train_step import debug_nan_params

    grads = {"a": {"kernel": np.ones(3)}, "b": {"bias": np.array([1.0, np.nan])}}
    bad = debug_nan_params(grads)
    assert bad == ["b/bias"]
