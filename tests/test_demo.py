"""demo.py CLI: image folder -> per-frame predictions -> rendered overlays.

GT-free inference over the windowed eval protocol (the Evaluator accumulates
predictions only when no valid GT joints exist), centered-bbox fallback and
explicit --bbox_file localization, inference.pkl in the visualize.py schema.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from fixtures import cli_subprocess_env

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def demo_inputs(tmp_path_factory):
    import cv2

    tmp = tmp_path_factory.mktemp("demo")
    imgs = tmp / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    for i in range(10):
        cv2.imwrite(str(imgs / f"{i:04d}.jpg"),
                    rng.randint(0, 255, (48, 48, 3), dtype=np.uint8))

    from maed_tpu.core.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.DATASET.WIDTH = cfg.DATASET.HEIGHT = 32
    cfg.MODEL.ENCODER.NUM_BLOCKS = 1
    cfg.MODEL.ENCODER.NUM_HEADS = 2
    cfg.MODEL.DECODER.HIDDEN_DIM = 32
    cfg.EVAL.SEQLEN = 2
    cfg.EVAL.SAMPLE_POOL = 4
    cfg.EVAL.BATCH_SIZE = 2
    cfg_path = tmp / "tiny.yaml"
    cfg_path.write_text(cfg.dump())
    return tmp, str(imgs), str(cfg_path)


def test_demo_cli_renders_overlays(demo_inputs):
    tmp, imgs, cfg_path = demo_inputs
    out = str(tmp / "out")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "demo.py"), "--image_folder", imgs,
         "--cfg", cfg_path, "--output_folder", out, "--render",
         "--allow_synthetic_smpl"],
        cwd=str(tmp), env=cli_subprocess_env(), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"

    import joblib

    data = joblib.load(osp.join(out, "inference.pkl"))
    assert np.asarray(data["pred_theta"]).shape == (10, 85)
    assert np.asarray(data["bboxes"]).shape == (10, 4)
    # centered-square fallback boxes on 48x48 frames
    np.testing.assert_allclose(np.asarray(data["bboxes"])[0], [24, 24, 48, 48])
    assert len(os.listdir(osp.join(out, "overlay"))) == 10


def test_demo_cli_bbox_file(demo_inputs):
    tmp, imgs, cfg_path = demo_inputs
    bboxes = np.tile(np.array([20.0, 26.0, 30.0, 30.0], np.float32), (10, 1))
    bbox_path = str(tmp / "boxes.npy")
    np.save(bbox_path, bboxes)
    out = str(tmp / "out_bb")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "demo.py"), "--image_folder", imgs,
         "--cfg", cfg_path, "--output_folder", out, "--bbox_file", bbox_path,
         "--allow_synthetic_smpl"],
        cwd=str(tmp), env=cli_subprocess_env(), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"

    import joblib

    data = joblib.load(osp.join(out, "inference.pkl"))
    np.testing.assert_allclose(np.asarray(data["bboxes"]), bboxes)


def test_resolve_bboxes_places_track_by_video_frame(monkeypatch):
    """STAF boxes must land on the track's VIDEO frame ids (tracks can start
    late and skip frames), with gaps filled from the nearest tracked box."""
    import types

    import maed_tpu.utils.pose_tracker as pt
    from demo import resolve_bboxes

    # 3 detections at video frames 4, 6, 7 (starts late, skips frame 5)
    kp = np.zeros((3, 5, 3), np.float32)
    for r, (cx, cy, s) in enumerate([(10, 10, 4), (20, 20, 4), (30, 30, 4)]):
        kp[r, 0] = (cx - s / 2, cy - s / 2, 1.0)
        kp[r, 1] = (cx + s / 2, cy + s / 2, 1.0)
    tracks = {0: {"joints2d": kp, "frames": np.array([4, 6, 7])}}
    monkeypatch.setattr(pt, "run_posetracker", lambda *a, **k: tracks)

    args = types.SimpleNamespace(bbox_file="", staf_dir="/fake",
                                 vid_file="v.mp4")
    paths = [f"f{i}.png" for i in range(10)]
    boxes = resolve_bboxes(args, paths)
    assert boxes.shape == (10, 4)
    # tracked frames hold their own (smoothed) boxes: centers ascend
    assert boxes[4, 0] < boxes[6, 0] < boxes[7, 0]
    # leading gap fills from the first tracked frame, trailing from the last
    np.testing.assert_allclose(boxes[0], boxes[4])
    np.testing.assert_allclose(boxes[9], boxes[7])
    # the skipped frame 5 fills from a neighbor
    assert boxes[5, 0] in (boxes[4, 0], boxes[6, 0])
