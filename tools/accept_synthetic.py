"""Closed-loop synthetic acceptance run (VERDICT r3 next #1).

The real-data north star (PA-MPJPE within 0.5 mm of the released 45.7/50.7,
/root/reference/README.md:93-94) is unvalidatable in this image (no SMPL pkl,
no dataset DBs, no network). This tool is the strongest in-image proxy: a
fully synthetic loop that exercises every convention boundary at once — the
crop-cam <-> weak-perspective <-> pelvis-centering <-> joint-bank chain the
unit oracles cannot see across components.

Pipeline (reference protocol: /root/reference/lib/core/evaluate.py:71-94,
135-179):
  1. `generate`: sample smooth SMPL pose tracks, compute the native 49-joint
     bank + weak-perspective 2D projections, rasterize cheap-but-pose-faithful
     frames (depth-ordered colored joint dots; the mesh rasterizer is O(F)
     Python per frame — too slow on this 1-core host), and write everything
     through the REAL joblib DB format (data/database/synacc_{train,val}_db.pt)
     plus a small-but-real train config (accept.yaml).
  2. `oracle`: run the FULL windowed eval protocol (VideoDataset seqlen=0 ->
     ShardedLoader -> Evaluator strided sub-clips -> merge -> valid-dedup ->
     pelvis-center -> Procrustes -> PVE-from-theta) with a GT-perfect
     prediction head: batches keep their real targets, the images are swapped
     for encoded frame indices, and the jitted apply gathers GT pose/shape and
     pushes them through the REAL head path (rot6d -> rot6d_to_rotmat -> SMPL
     -> joint bank -> projection, models/heads.py). PA-MPJPE/MPJPE/PVE must
     come out ~0: any cross-component sign/indexing/convention bug surfaces
     as millimetres here.
  3. `train`: drive the REAL CLIs end-to-end — eval.py on the untrained
     random init, train.py on the synthetic 3D dataset, eval.py on
     model_best — and assert the trained PA-MPJPE beats the untrained
     baseline by a clear margin (default: < 0.7x).

Usage:
  python tools/accept_synthetic.py generate --out /tmp/synacc
  python tools/accept_synthetic.py oracle   --out /tmp/synacc
  python tools/accept_synthetic.py train    --out /tmp/synacc
  python tools/accept_synthetic.py all      --out /tmp/synacc
Results land in <out>/accept_result.json; doc/runbook.md records the
round-4 reference numbers.
"""

import argparse
import json
import os
import os.path as osp
import re
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from maed_tpu.utils.platform import honor_env_platform

honor_env_platform()

import numpy as np

DATASET = "synacc"


# --------------------------------------------------------------------------- #
# generation
# --------------------------------------------------------------------------- #

def _smooth_pose_tracks(rng, n_frames, n_anchors=6, amp=0.5, orient_amp=0.4):
    """(T, 72) axis-angle tracks: cosine-eased interpolation between random
    anchor poses around the rest pose — smooth like real motion, so ACCEL is
    meaningful and temporal attention has structure to use."""
    anchors = rng.randn(n_anchors, 72).astype(np.float64) * amp
    anchors[:, :3] = rng.randn(n_anchors, 3) * orient_amp  # mild global orient
    seg = max(1, n_frames // (n_anchors - 1))
    ts = np.arange(n_frames, dtype=np.float64)
    i0 = np.minimum((ts // seg).astype(int), n_anchors - 2)
    frac = (ts - i0 * seg) / seg
    w = 0.5 - 0.5 * np.cos(np.pi * np.clip(frac, 0, 1))  # ease in/out
    pose = (1 - w)[:, None] * anchors[i0] + w[:, None] * anchors[i0 + 1]
    return pose.astype(np.float32)


def _joint_palette(n):
    """n visually distinct BGR colors (HSV wheel at two value levels)."""
    import cv2

    hsv = np.zeros((1, n, 3), np.uint8)
    hsv[0, :, 0] = (np.arange(n) * 180 // max(n, 1)).astype(np.uint8)
    hsv[0, :, 1] = 255
    hsv[0, :, 2] = np.where(np.arange(n) % 2 == 0, 255, 160).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0]


def generate(out, n_videos=6, frames_per_video=96, size=64, seed=0,
             val_videos=2, flagship=False):
    """Write synacc_{train,val}_db.pt + rendered frames + accept.yaml."""
    import cv2
    import jax
    import jax.numpy as jnp
    import joblib

    from maed_tpu.ops.geometry import weak_perspective_projection
    from maed_tpu.ops.smpl import smpl_forward
    from maed_tpu.utils.smpl_io import find_smpl_model

    rng = np.random.RandomState(seed)
    smpl = find_smpl_model()  # deterministic synthetic fallback (seed 0)

    img_dir = osp.join(out, "imgs")
    db_dir = osp.join(out, "data", "database")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(db_dir, exist_ok=True)

    fwd = jax.jit(lambda pose: smpl_forward(
        smpl, jnp.zeros((pose.shape[0], 10), jnp.float32),
        pose_axis_angle=pose)["joints"])
    cam = np.array([1.0, 0.0, 0.0], np.float32)
    proj = jax.jit(lambda j: weak_perspective_projection(
        j, jnp.asarray(cam), img_res=float(size)))

    palette = _joint_palette(49)
    radius = max(2, size // 24)
    dbs = {"train": {k: [] for k in
                     ("vid_name", "img_name", "frame_id", "bbox",
                      "joints2D", "joints3D", "pose", "shape")},
           "val": None}
    dbs["val"] = {k: [] for k in dbs["train"]}

    for v in range(n_videos + val_videos):
        split = "val" if v >= n_videos else "train"
        db = dbs[split]
        pose = _smooth_pose_tracks(rng, frames_per_video)
        joints = np.asarray(fwd(jnp.asarray(pose)))          # (T, 49, 3)
        kp_norm = np.asarray(proj(jnp.asarray(joints)))      # (T, 49, 2) [-1,1]
        kp_px = (kp_norm + 1.0) * 0.5 * size

        for t in range(frames_per_video):
            frame = np.full((size, size, 3), 80, np.uint8)
            order = np.argsort(-joints[t, :, 2])  # far-to-near: near wins
            for j in order:
                x, y = kp_px[t, j]
                if -radius <= x < size + radius and -radius <= y < size + radius:
                    cv2.circle(frame, (int(round(x)), int(round(y))), radius,
                               palette[j].tolist(), -1)
            path = osp.join(img_dir, f"v{v:02d}_{t:04d}.jpg")
            cv2.imwrite(path, frame, [cv2.IMWRITE_JPEG_QUALITY, 95])

            db["vid_name"].append(f"v{v:02d}")
            db["img_name"].append(path)
            db["frame_id"].append(t)
            db["bbox"].append([size / 2, size / 2, size * 0.8, size * 0.8])
            db["joints2D"].append(
                np.concatenate([kp_px[t], np.ones((49, 1), np.float32)], 1))
            db["joints3D"].append(
                np.concatenate([joints[t], np.ones((49, 1), np.float32)], 1))
            db["pose"].append(pose[t])
            db["shape"].append(np.zeros(10, np.float32))

    for split, db in dbs.items():
        db = {k: np.asarray(v) for k, v in db.items()}
        db["vid_name"] = db["vid_name"].astype(str)
        joblib.dump(db, osp.join(db_dir, f"{DATASET}_{split}_db.pt"))
        print(f"[generate] {split}: {len(db['img_name'])} frames "
              f"({n_videos if split == 'train' else val_videos} videos)")

    _write_cfg(out, size, flagship=flagship)
    return out


def _write_cfg(out, size, flagship=False):
    """accept.yaml: tiny 1-block/64px config (CPU-friendly convention
    check) or — flagship=True (VERDICT r4 next #4) — the REAL release
    model (6x768 ste-parallel + KTD, seqlen 16, 224px) sized for a short
    on-chip run: the same composition whose jitted-step-only time is 155.4
    ms (doc/design.md), now driven end-to-end through train.py's real
    ShardedLoader + augmentation + H2D (the measurement VERDICT r4 missing
    #2 demands)."""
    from maed_tpu.core.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.NUM_WORKERS = 0
    cfg.SEED_VALUE = 0
    cfg.SAVE_FREQ = 2
    cfg.OUTPUT_DIR = osp.join(out, "results")
    cfg.DATASET.WIDTH = cfg.DATASET.HEIGHT = size
    cfg.DATASET.RANDOM_SAMPLE = True
    cfg.DATASET.RANDOM_START = False
    cfg.DATASET.COLOR_JITTER = 0.0   # photometric noise only slows the loop
    cfg.DATASET.ERASE_PROB = 0.0
    cfg.DATASET.RANDOM_FLIP = 0.0    # flip remaps the joint bank; keep the
    cfg.DATASET.ROT_JITTER = 0.0     # acceptance about cross-component
    cfg.DATASET.SIZE_JITTER = 0.0    # conventions, not augment robustness
    cfg.DATASET.RANDOM_CROP_P = 0.0
    cfg.TRAIN.DATASETS_2D = []
    cfg.TRAIN.DATASETS_3D = [DATASET]
    cfg.TRAIN.DATASETS_IMG = []
    cfg.TRAIN.DATASET_EVAL = DATASET
    cfg.TRAIN.BATCH_SIZE_3D = 4
    cfg.TRAIN.END_EPOCH = 6
    cfg.TRAIN.NUM_ITERS_PER_EPOCH = 50
    cfg.TRAIN.OPTIM.WARMUP_EPOCH = 1
    cfg.TRAIN.OPTIM.MILESTONES = [5]
    cfg.EVAL.BATCH_SIZE = 4
    cfg.EVAL.INTERPOLATION = 1
    if flagship:
        # release model dims stay at the config defaults (6 blocks, 12
        # heads, KTD hidden 1024) EXCEPT the attention mode: the released
        # stage-2 model is ste-PARALLEL (configs/config_stage2.yaml) while
        # the config default is 'vanilla' — set it explicitly so the
        # on-chip acceptance exercises the same model bench.py measures
        cfg.MODEL.ENCODER.SPA_TEMP_MODE = "parallel"
        cfg.DATASET.SEQLEN = 16
        cfg.DATASET.SAMPLE_POOL = 32
        cfg.EVAL.SEQLEN = 16
        cfg.EVAL.SAMPLE_POOL = 32
        # flagship-scale learning rate (the 300-step learning soak used
        # 5e-5; the synthetic dot task tolerates a bit more)
        cfg.TRAIN.OPTIM.LR = 1e-4
    else:
        cfg.DATASET.SEQLEN = 4
        cfg.DATASET.SAMPLE_POOL = 8
        cfg.TRAIN.OPTIM.LR = 3e-4    # tiny model, tiny data: converge fast
        cfg.MODEL.ENCODER.NUM_BLOCKS = 1
        cfg.MODEL.ENCODER.NUM_HEADS = 2
        cfg.MODEL.DECODER.HIDDEN_DIM = 64
        cfg.EVAL.SEQLEN = 4
        cfg.EVAL.SAMPLE_POOL = 16
    path = osp.join(out, "accept.yaml")
    with open(path, "w") as f:
        f.write(cfg.dump())
    return path


# --------------------------------------------------------------------------- #
# phase A: GT-oracle through the full eval protocol
# --------------------------------------------------------------------------- #

class _IndexEncodedLoader:
    """Wrap the real eval loader: keep every target field (kp_3d/theta/valid/
    bbox/...) but swap 'images' for a (N, P, 1, 1, 3) tensor carrying each
    frame's DB row index, recovered from the dataset's chunk table. The
    Evaluator then strides/merges/dedups these exactly like real frames."""

    def __init__(self, loader, dataset):
        self.loader = loader
        self.dataset = dataset

    def __iter__(self):
        for target in self.loader:
            idx = np.stack([
                np.asarray(self.dataset.vid_indices[int(i)])
                for i in np.asarray(target["index"]).reshape(-1)
            ])  # (N, P) DB row ids
            enc = np.zeros(idx.shape + (1, 1, 3), np.float32)
            enc[..., 0, 0, 0] = idx
            out = dict(target)
            out["images"] = enc
            yield out


def oracle(out, tol_mm=0.1):
    """GT-perfect predictions through the REAL protocol must score ~0."""
    import jax
    import jax.numpy as jnp
    import joblib

    from maed_tpu.core.config import update_cfg
    from maed_tpu.core.evaluate import Evaluator
    from maed_tpu.data.dataset import VideoDataset
    from maed_tpu.data.loaders import ShardedLoader
    from maed_tpu.data.transforms import build_eval_transforms
    from maed_tpu.models.heads import regressor_output
    from maed_tpu.ops.geometry import rodrigues
    from maed_tpu.utils.smpl_io import find_smpl_model

    cfg = update_cfg(osp.join(out, "accept.yaml"))
    db_dir = osp.join(out, "data", "database")
    smpl = find_smpl_model()
    db = joblib.load(osp.join(db_dir, f"{DATASET}_val_db.pt"))

    dataset = VideoDataset(
        DATASET, "val", build_eval_transforms(cfg.DATASET.WIDTH, cfg.DATASET.HEIGHT),
        seqlen=0, sample_pool=cfg.EVAL.SAMPLE_POOL, overlap=0,
        random_sample=False, random_start=False, db_dir=db_dir,
    )
    loader = ShardedLoader(dataset, cfg.EVAL.BATCH_SIZE, shuffle=False,
                           drop_last=False)

    # GT tables as device constants inside the jit (small) — the apply runs
    # the REAL decoder-output path from the gathered GT pose/shape
    pose_tab = jnp.asarray(np.asarray(db["pose"], np.float32))
    shape_tab = jnp.asarray(np.asarray(db["shape"], np.float32))
    cam = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    def gt_apply(variables, images, J_regressor=None):
        N, T = images.shape[:2]
        idx = images[:, :, 0, 0, 0].astype(jnp.int32).reshape(-1)
        pose = pose_tab[idx]                       # (NT, 72)
        shape = shape_tab[idx]                     # (NT, 10)
        rotmat = rodrigues(pose.reshape(-1, 24, 3))  # (NT, 24, 3, 3)
        pose6d = rotmat[..., :, :2].reshape(N * T, 24 * 6)  # (3,2) row-major
        outs = regressor_output(smpl, pose6d, shape,
                                jnp.broadcast_to(cam, (N * T, 3)),
                                J_regressor=J_regressor)
        return {
            "theta": outs["theta"].reshape(N, T, -1),
            "verts": outs["verts"].reshape(N, T, -1, 3),
            "kp_2d": outs["kp_2d"].reshape(N, T, -1, 2),
            "kp_3d": outs["kp_3d"].reshape(N, T, -1, 3),
            "rotmat": outs["rotmat"].reshape(N, T, -1, 3, 3),
        }

    ev = Evaluator(smpl)
    eval_dict, num_pred = ev.run(
        gt_apply, _IndexEncodedLoader(loader, dataset),
        seqlen=cfg.EVAL.SEQLEN, interp=cfg.EVAL.INTERPOLATION,
        dataset_name=DATASET, batch_size=cfg.EVAL.BATCH_SIZE,
        variables={"params": {}},
    )
    print(f"[oracle] {num_pred} poses: {eval_dict}")
    for k in ("mpjpe", "pa-mpjpe", "pve", "accel_err"):
        assert eval_dict[k] < tol_mm, (
            f"GT-oracle {k} = {eval_dict[k]:.4f} mm >= {tol_mm} mm — a "
            "cross-component convention bug (crop cam / pelvis / joint bank / "
            "theta slicing / windowing) is live")
    print(f"[oracle] PASS — full protocol self-consistent below {tol_mm} mm")
    return eval_dict


# --------------------------------------------------------------------------- #
# phase B: train with the real CLIs, eval trained vs untrained
# --------------------------------------------------------------------------- #

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _cli_env():
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_eval_cli(out, checkpoint=""):
    cmd = [sys.executable, osp.join(_REPO, "eval.py"),
           "--cfg", osp.join(out, "accept.yaml"),
           "--eval_ds", DATASET, "--eval_set", "val",
           "--allow_synthetic_smpl"]
    if checkpoint:
        cmd += ["--checkpoint", checkpoint]
    r = subprocess.run(cmd, cwd=out, env=_cli_env(),
                       capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-2000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"eval.py failed rc={r.returncode}")
    m = {k.lower(): float(v) for k, v in
         re.findall(r"([A-Z_\-]+): ([0-9.]+),", r.stdout)}
    assert "pa-mpjpe" in m, r.stdout[-2000:]
    return m


def train_and_eval(out, margin=0.7):
    print("[train] evaluating UNTRAINED random init...")
    untrained = _run_eval_cli(out)

    print("[train] running train.py on the synthetic 3D dataset...")
    r = subprocess.run(
        [sys.executable, osp.join(_REPO, "train.py"),
         "--cfg", osp.join(out, "accept.yaml"), "--allow_synthetic_smpl"],
        cwd=out, env=_cli_env(), capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"train.py failed rc={r.returncode}")
    results_dir = osp.join(out, "results")
    # newest by mtime: the day-first timestamps in run-dir names sort
    # lexicographically, not chronologically, across month boundaries
    runs = sorted((osp.join(results_dir, d) for d in os.listdir(results_dir)),
                  key=os.path.getmtime)
    best = osp.join(runs[-1], "model_best")
    assert osp.isdir(best), f"no model_best under {runs[-1]}"

    print("[train] evaluating TRAINED model_best...")
    trained = _run_eval_cli(out, checkpoint=best)

    result = {"untrained": untrained, "trained": trained, "margin": margin,
              "pass": trained["pa-mpjpe"] < untrained["pa-mpjpe"] * margin}
    with open(osp.join(out, "accept_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(f"[train] untrained PA-MPJPE {untrained['pa-mpjpe']:.2f} mm -> "
          f"trained {trained['pa-mpjpe']:.2f} mm "
          f"({'PASS' if result['pass'] else 'FAIL'} at {margin}x)")
    assert result["pass"], (
        f"trained PA-MPJPE {trained['pa-mpjpe']:.2f} did not beat "
        f"{margin}x untrained {untrained['pa-mpjpe']:.2f}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["generate", "oracle", "train", "all"])
    ap.add_argument("--out", default="/tmp/synacc")
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--margin", type=float, default=0.7)
    ap.add_argument("--tol_mm", type=float, default=0.1)
    ap.add_argument("--flagship", action="store_true",
                    help="accept.yaml uses the REAL release model (6x768 "
                    "ste-parallel + KTD, seqlen 16) — pair with --size 224 "
                    "for the on-chip flagship acceptance + end-to-end "
                    "throughput run (tools/plans/r5_e2e.json)")
    args = ap.parse_args()

    if args.phase in ("generate", "all"):
        generate(args.out, n_videos=args.videos,
                 frames_per_video=args.frames, size=args.size, seed=args.seed,
                 flagship=args.flagship)
    if args.phase in ("oracle", "all"):
        oracle(args.out, tol_mm=args.tol_mm)
    if args.phase in ("train", "all"):
        train_and_eval(args.out, margin=args.margin)


if __name__ == "__main__":
    main()
