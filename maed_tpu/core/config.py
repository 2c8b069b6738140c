"""Config system: a minimal yacs-style CfgNode + the MAED config schema.

Parity target: /root/reference/lib/core/config.py (same YAML schema — the
reference's configs/*.yaml files load verbatim). yacs itself is not a
dependency; CfgNode here implements the clone/merge_from_file/merge_from_list
subset the framework needs.
"""

from __future__ import annotations

import argparse
import copy
import os.path as osp

import yaml

# Dataset path constants (overridable via env or cfg files downstream).
DB_DIR = "data/database"
DATA_DIR = "data/smpl_data"
INSTA_DIR = "data/insta_variety"
INSTA_IMG_DIR = "data/insta_variety_img"
MPII3D_DIR = "data/mpi_inf_3dhp"
THREEDPW_DIR = "data/3dpw"
HUMAN36M_DIR = "data/human3.6m"
PENNACTION_DIR = "data/penn_action"
POSETRACK_DIR = "data/posetrack"


class CfgNode(dict):
    """A dict with attribute access and recursive yaml merging."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def merge_from_dict(self, other: dict, _path=""):
        for k, v in other.items():
            if k not in self:
                raise KeyError(f"Unknown config key: {_path}{k}")
            if isinstance(self[k], CfgNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Config key {_path}{k} expects a mapping")
                self[k].merge_from_dict(v, _path=f"{_path}{k}.")
            else:
                self[k] = v

    def merge_from_file(self, path: str):
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        self.merge_from_dict(data)

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0, "merge_from_list expects KEY VALUE pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node[parts[-1]]
            if not isinstance(old, (int, float, bool, list)):
                node[parts[-1]] = value
                continue
            new = yaml.safe_load(value)
            if isinstance(new, str) and isinstance(old, (int, float)) \
                    and not isinstance(old, bool):
                # YAML 1.1 quirk: bare scientific notation without a dot or
                # sign ('1e-4') parses as a STRING; yacs (ast.literal_eval)
                # accepts it, and `TRAIN.OPTIM.LR 1e-4` is the single most
                # common override spelling (ADVICE r4) — retry as a number
                try:
                    new = float(new) if isinstance(old, float) else int(new)
                except ValueError:
                    pass
            # typed keys reject mistyped values loudly (a typo like
            # `TRAIN.END_EPOCH sixty` must not silently store a string)
            if isinstance(old, bool):
                ok = isinstance(new, bool)
            elif isinstance(old, float):
                ok = isinstance(new, (int, float)) and not isinstance(new, bool)
                new = float(new) if ok else new
            elif isinstance(old, int):
                ok = isinstance(new, int) and not isinstance(new, bool)
            else:
                ok = isinstance(new, list)
            if not ok:
                raise ValueError(
                    f"config key {key} expects {type(old).__name__}, "
                    f"got {value!r}")
            node[parts[-1]] = new

    def dump(self) -> str:
        def plain(d):
            return {k: plain(v) if isinstance(v, dict) else v for k, v in d.items()}

        return yaml.safe_dump(plain(self), sort_keys=False)


def _node(**kwargs) -> CfgNode:
    n = CfgNode()
    for k, v in kwargs.items():
        n[k] = v
    return n


def get_cfg_defaults() -> CfgNode:
    cfg = _node(
        OUTPUT_DIR="results",
        EXP_NAME="default",
        DEVICE="tpu",
        DEBUG=True,
        LOGDIR="",
        NUM_WORKERS=8,
        DEBUG_FREQ=1000,
        SEED_VALUE=-1,
        SAVE_FREQ=5,
        # keep only the newest N epoch_* checkpoint dirs (-1 = keep all,
        # the reference behavior; model_best is never pruned). Orbax dirs
        # for the flagship are ~GBs — long runs want a bound.
        SAVE_KEEP_LAST=-1,
        # write checkpoints on a background thread (state is snapshotted to
        # host numpy synchronously first, so training resumes immediately;
        # the reference blocks on torch.save). False = fully synchronous.
        SAVE_ASYNC=True,
        # reference CUDNN block kept for yaml compatibility (ignored on TPU)
        CUDNN=_node(BENCHMARK=True, DETERMINISTIC=False, ENABLED=True),
        TRAIN=_node(
            DATASETS_2D=["insta"],
            DATASETS_3D=["mpii3d"],
            DATASETS_IMG=["coco2014-all"],
            DATASET_EVAL="ThreeDPW",
            BATCH_SIZE_3D=4,
            BATCH_SIZE_2D=4,
            BATCH_SIZE_IMG=8,
            IMG_USE_FREQ=1,
            START_EPOCH=0,
            END_EPOCH=5,
            RESUME="",
            NUM_ITERS_PER_EPOCH=-1,
            OPTIM=_node(
                OPTIM="Adam",
                LR=1e-4,
                WD=1e-4,
                MOMENTUM=0.9,
                WARMUP_EPOCH=2,
                WARMUP_FACTOR=0.1,
                MILESTONES=[10, 15],
                # micro-batch gradient accumulation (optax.MultiSteps): k>1
                # averages k steps' grads into one update — reproduces the
                # reference's 8-GPU global batch on fewer chips. Not in the
                # reference schema; its yamls leave it at 1.
                GRAD_ACCUM_STEPS=1,
            ),
        ),
        DATASET=_node(
            SEQLEN=20,
            OVERLAP=0.5,
            SAMPLE_POOL=64,
            SIZE_JITTER=0.2,
            ROT_JITTER=30,
            RANDOM_SAMPLE=True,
            RANDOM_START=False,
            RANDOM_FLIP=0.5,
            WIDTH=224,
            HEIGHT=224,
            RANDOM_CROP_P=0.0,
            RANDOM_CROP_SIZE=0.5,
            COLOR_JITTER=0.3,
            ERASE_PROB=0.3,
            ERASE_PART=0.7,
            ERASE_FILL=False,
            ERASE_KP=False,
            ERASE_MARGIN=0.2,
            # TPU-native extension (not in the reference schema): ship clips
            # to the device as uint8 and ImageNet-normalize INSIDE the jit
            # (models/maed.py -> ops/image.device_normalize). 1/4 the
            # host->device bytes per step; the normalize fuses into the stem.
            # False restores the reference contract (host f32 normalize).
            DEVICE_PREPROC=True,
            # eval-path extension: ship RAW uint8 frames + per-frame affines
            # and run the crop itself in-jit on the MXU (ops/image.
            # batch_crop_normalize). Opt-in: wins only when source frames
            # are near crop size AND uniformly sized (demo/serve footage);
            # full-resolution video would ship MORE bytes than uint8 crops.
            DEVICE_CROP=False,
        ),
        LOSS=_node(
            KP_2D_W=60.0,
            KP_3D_W=30.0,
            SHAPE_W=0.001,
            POSE_W=1.0,
            SMPL_NORM=1.0,
            ACCL_W=0.0,
        ),
        MODEL=_node(
            DECODER=_node(BACKBONE="ktd", HIDDEN_DIM=1024),
            ENCODER=_node(
                BACKBONE="ste", NUM_BLOCKS=6, NUM_HEADS=12, SPA_TEMP_MODE="vanilla"
            ),
        ),
        EVAL=_node(SEQLEN=16, SAMPLE_POOL=128, BATCH_SIZE=32, INTERPOLATION=1),
    )
    return cfg


def update_cfg(cfg_file: str) -> CfgNode:
    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_file)
    return cfg.clone()


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, help="cfg file path", default=None)
    parser.add_argument("--pretrained", type=str, default="",
                        help="stage 1 checkpoint file path")
    parser.add_argument("--checkpoint", type=str, default="",
                        help="checkpoint to evaluate")
    parser.add_argument("--init_backbone", type=str, default="",
                        help="published encoder init (timm .npz or .pth), the "
                             "reference's pretrained=True auto-download")
    parser.add_argument("--eval_ds", type=str, default="3dpw")
    parser.add_argument("--eval_set", type=str, default="test")
    parser.add_argument("--image_root", type=str, default="")
    parser.add_argument("--image_list", type=str, default="")
    parser.add_argument("--output_path", type=str, default="")
    parser.add_argument(
        "--allow_synthetic_smpl", action="store_true",
        help="permit running without the real SMPL body model files "
             "(metrics computed against a RANDOM body are meaningless; "
             "only useful for smoke tests)")
    parser.add_argument(
        "opts", nargs="*", default=[],
        help="yacs-style KEY VALUE config overrides applied after --cfg, "
             "e.g. `TRAIN.RESUME results/run/preempt TRAIN.END_EPOCH 60` "
             "(beyond the reference CLI: lets a supervisor relaunch one "
             "fixed command after preemption instead of editing yaml)")
    args = parser.parse_args(argv)

    if args.cfg is not None:
        # hard-fail on a missing file: silently running the full default
        # config instead of the requested one is never what the user meant
        # (parity: the reference's yacs merge_from_file raises too,
        # /root/reference/lib/core/config.py:114-117)
        if not osp.isfile(args.cfg):
            parser.error(f"--cfg file not found: {args.cfg}")
        cfg = update_cfg(args.cfg)
    else:
        cfg = get_cfg_defaults()
    if args.opts:
        try:
            cfg.merge_from_list(args.opts)
        except (KeyError, ValueError, AssertionError) as e:
            parser.error(f"bad KEY VALUE overrides: {e}")
    return args, cfg, args.cfg
