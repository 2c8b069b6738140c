"""CLI-level end-to-end: `python train.py` -> checkpoint -> `python eval.py`.

The in-process tests cover Trainer.fit and Evaluator.run directly; this is
the only test that exercises the actual entry-point wiring a user runs —
argparse -> yaml config -> output dir -> loaders from on-disk joblib DBs
(the reference's `data/database/<name>_<set>_db.pt` layout,
/root/reference/lib/dataset/dataset_video.py:126-136) -> trainer ->
orbax checkpoint -> eval CLI consuming that checkpoint. This is the exact
unattended path the real-data acceptance run (scripts/eval_released.sh)
flows through.
"""

import os
import os.path as osp
import subprocess
import sys

import joblib

from fixtures import cli_subprocess_env, make_image_db, make_video_db

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _write_dbs(root):
    dbdir = osp.join(root, "data", "database")
    os.makedirs(dbdir)
    vid = make_video_db(root, n_videos=2, frames_per_video=10, img_size=48)
    img = make_image_db(root, n_images=6, img_size=48)
    val = make_video_db(root, n_videos=1, frames_per_video=8, img_size=48,
                        seed=3)
    joblib.dump(vid, osp.join(dbdir, "syn2d_train_db.pt"))
    joblib.dump(vid, osp.join(dbdir, "syn3d_train_db.pt"))
    joblib.dump(img, osp.join(dbdir, "synimg_train_db.pt"))
    joblib.dump(val, osp.join(dbdir, "syn3d_val_db.pt"))
    joblib.dump(val, osp.join(dbdir, "syn3d_test_db.pt"))


def _write_cfg(root):
    from maed_tpu.core.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.NUM_WORKERS = 0
    cfg.SEED_VALUE = 0
    cfg.SAVE_FREQ = 1
    cfg.DATASET.WIDTH = cfg.DATASET.HEIGHT = 32
    cfg.DATASET.SEQLEN = 2
    cfg.DATASET.SAMPLE_POOL = 4
    cfg.DATASET.RANDOM_SAMPLE = True
    cfg.DATASET.RANDOM_START = False
    cfg.TRAIN.DATASETS_2D = ["syn2d"]
    cfg.TRAIN.DATASETS_3D = ["syn3d"]
    cfg.TRAIN.DATASETS_IMG = ["synimg"]
    cfg.TRAIN.DATASET_EVAL = "syn3d"
    cfg.TRAIN.BATCH_SIZE_2D = 1
    cfg.TRAIN.BATCH_SIZE_3D = 1
    cfg.TRAIN.BATCH_SIZE_IMG = 2
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.NUM_ITERS_PER_EPOCH = 2
    cfg.MODEL.ENCODER.NUM_BLOCKS = 1
    cfg.MODEL.ENCODER.NUM_HEADS = 2
    cfg.MODEL.DECODER.HIDDEN_DIM = 32
    cfg.EVAL.SEQLEN = 2
    cfg.EVAL.SAMPLE_POOL = 4
    cfg.EVAL.BATCH_SIZE = 2
    path = osp.join(root, "tiny.yaml")
    with open(path, "w") as f:
        f.write(cfg.dump())
    return path


def test_train_then_eval_cli(tmp_path):
    root = str(tmp_path)
    _write_dbs(root)
    cfg_path = _write_cfg(root)
    env = cli_subprocess_env()

    r = subprocess.run(
        [sys.executable, osp.join(REPO, "train.py"), "--cfg", cfg_path,
         "--allow_synthetic_smpl"],
        cwd=root, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"train.py failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"

    # the trainer must have produced a best checkpoint + best.txt in the
    # timestamped results dir (reference layout: lib/core/trainer.py:330-351)
    results = [d for d in os.listdir(osp.join(root, "results"))]
    assert len(results) == 1
    logdir = osp.join(root, "results", results[0])
    names = os.listdir(logdir)
    best = [n for n in names if n.startswith("model_best")]
    assert best, f"no best checkpoint in {names}"
    assert "best.txt" in names
    assert float(open(osp.join(logdir, "best.txt")).read().split()[0]) > 0

    r = subprocess.run(
        [sys.executable, osp.join(REPO, "eval.py"), "--cfg", cfg_path,
         "--checkpoint", osp.join(logdir, best[0]),
         "--eval_ds", "syn3d", "--eval_set", "test",
         "--output_path", osp.join(root, "evalout"),
         "--allow_synthetic_smpl"],
        cwd=root, env=env, capture_output=True, text=True, timeout=900,
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, f"eval.py failed:\n{out[-3000:]}"
    assert "pa-mpjpe" in out.lower(), out[-2000:]

    # stage-1 -> stage-2 handoff: a second training run initialized from the
    # first's checkpoint via --pretrained (encoder kept, decoder dropped —
    # the reference's two-stage recipe, /root/reference/train.py:97-111)
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "train.py"), "--cfg", cfg_path,
         "--pretrained", osp.join(logdir, best[0]),
         "--allow_synthetic_smpl"],
        cwd=root, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"pretrained train failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    runs = sorted(os.listdir(osp.join(root, "results")))
    assert len(runs) == 2
    log2 = open(osp.join(root, "results", runs[-1], "train_log.txt")).read()
    assert "loaded pretrained encoder" in log2

    # the eval result feeds visualize.py (reference flow: eval.py ->
    # inference.pkl -> visualize.py, /root/reference/visualize.py:13-63)
    pkl = osp.join(root, "evalout", "inference.pkl")
    assert osp.isfile(pkl), os.listdir(osp.join(root, "evalout"))
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "visualize.py"), "--input_file", pkl,
         "--output_folder", osp.join(root, "vis"), "--allow_synthetic_smpl"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"visualize.py failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    rendered = os.listdir(osp.join(root, "vis"))
    assert rendered and all(n.endswith(".jpg") for n in rendered)
