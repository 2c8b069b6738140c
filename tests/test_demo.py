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


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    return env


def test_demo_cli_renders_overlays(demo_inputs):
    tmp, imgs, cfg_path = demo_inputs
    out = str(tmp / "out")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "demo.py"), "--image_folder", imgs,
         "--cfg", cfg_path, "--output_folder", out, "--render",
         "--allow_synthetic_smpl"],
        cwd=str(tmp), env=_env(), capture_output=True, text=True, timeout=900,
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
        cwd=str(tmp), env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"

    import joblib

    data = joblib.load(osp.join(out, "inference.pkl"))
    np.testing.assert_allclose(np.asarray(data["bboxes"]), bboxes)
