"""Offline-tooling tests: bbox smoothing, crop-cam conversion, the software
rasterizer, and debug visualization grids."""

import numpy as np

from maed_tpu.utils.demo_utils import convert_crop_cam_to_orig_img
from maed_tpu.utils.renderer import Renderer, rasterize_mesh, weak_perspective_to_screen
from maed_tpu.utils.smooth_bbox import (
    get_all_bbox_params,
    get_single_bbox,
    smooth_bbox_params,
)
from maed_tpu.utils.vis import batch_grid, denormalize_image, draw_skeleton


def test_single_bbox_center_and_size():
    kp = np.array([[10.0, 20, 1], [30, 60, 1], [20, 40, 0.1]])  # last invisible
    b = get_single_bbox(kp, vis_thresh=0.3)
    np.testing.assert_allclose(b, [20, 40, 40])


def test_single_bbox_too_few_visible():
    kp = np.array([[10.0, 20, 0.1], [30, 60, 0.2]])
    assert get_single_bbox(kp) is None


def test_bbox_track_interpolates_gaps():
    T, K = 6, 5
    kps = np.zeros((T, K, 3))
    # detected at t=0 (center 10) and t=4 (center 50); gaps interpolate
    for t, c in [(0, 10.0), (4, 50.0)]:
        kps[t, :, 0] = [c - 5, c + 5, c, c, c]
        kps[t, :, 1] = [c - 5, c + 5, c, c, c]
        kps[t, :, 2] = 1.0
    params, start, end = get_all_bbox_params(kps)
    assert (start, end) == (0, 5)
    np.testing.assert_allclose(params[2, 0], 30.0)  # halfway center
    sm = smooth_bbox_params(params)
    assert sm.shape == params.shape


def test_convert_crop_cam_formula():
    cam = np.array([[1.0, 0.1, -0.2]])
    bbox = np.array([[100.0, 120.0, 50.0, 50.0]])
    out = convert_crop_cam_to_orig_img(cam, bbox, 200, 240)
    sx = 1.0 * 50 / 200
    sy = 1.0 * 50 / 240
    np.testing.assert_allclose(out[0, 0], sx)
    np.testing.assert_allclose(out[0, 1], sy)
    np.testing.assert_allclose(out[0, 2], (100 - 100) / 100 / sx + 0.1)
    np.testing.assert_allclose(out[0, 3], (120 - 120) / 120 / sy + (-0.2))


def test_rasterizer_draws_triangle_inside_bbox():
    verts = np.array([[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0]])
    screen = weak_perspective_to_screen(verts, np.array([1.0, 1.0, 0, 0]), 64, 64)
    mask, zbuf = rasterize_mesh(screen, np.array([[0, 1, 2]]), 64, 64)
    assert mask.any()
    ys, xs = np.where(mask)
    assert xs.min() >= 15 and xs.max() <= 49  # triangle spans ~[16, 48]
    assert ys.min() >= 15 and ys.max() <= 49


def test_renderer_composites(rng):
    img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    verts = rng.randn(50, 3) * 0.3
    faces = rng.randint(0, 50, (60, 3))
    out = Renderer(resolution=(64, 64)).render(
        img, verts, faces, np.array([1.0, 1.0, 0.0, 0.0])
    )
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()


def test_vis_grid_and_skeleton(rng):
    imgs = rng.randn(5, 32, 32, 3).astype(np.float32) * 0.5
    kp = rng.rand(5, 49, 3).astype(np.float32) * 2 - 1
    kp[..., 2] = 1.0
    grid = batch_grid(imgs, kp)
    assert grid.dtype == np.uint8
    assert grid.shape[0] % 32 == 0 and grid.shape[1] % 32 == 0
    one = draw_skeleton(denormalize_image(imgs[0]), kp[0])
    assert one.shape == (32, 32, 3)


def test_visualize_preds_panel_layout(rng):
    """Reference parity (vis.py:209-311): per-sample strip is
    [image | pred skel | target skel | render | side render] = 5 panels."""
    from maed_tpu.utils.vis import batch_visualize_preds, visualize_preds

    n, hw, V = 2, 32, 50
    images = rng.randn(n, hw, hw, 3).astype(np.float32) * 0.5
    faces = rng.randint(0, V, (60, 3))
    kp = rng.rand(n, 49, 3).astype(np.float32) * 2 - 1
    kp[..., 2] = 1.0
    preds = {
        "theta": np.concatenate(
            [np.tile([1.0, 0.0, 0.0], (n, 1)), np.zeros((n, 82))], axis=1
        ).astype(np.float32),
        "kp_2d": kp[..., :2],
        "verts": (rng.randn(n, V, 3) * 0.3).astype(np.float32),
    }
    target = {"kp_2d": kp}

    strip = visualize_preds(images[0], {k: v[0] for k, v in preds.items()},
                            faces, {"kp_2d": kp[0]})
    assert strip.shape == (hw, 5 * hw, 3) and strip.dtype == np.uint8
    # the side render draws the mesh on black: last panel must be non-empty
    assert strip[:, 4 * hw:].any()

    grid = batch_visualize_preds(images, preds, faces, target)
    assert grid.shape == (n * hw, 5 * hw, 3)


def test_batch_visualize_vid_preds_shapes(rng):
    from maed_tpu.utils.vis import batch_visualize_vid_preds

    n, t, hw, V = 2, 3, 32, 40
    video = rng.randn(n, t, hw, hw, 3).astype(np.float32) * 0.5
    faces = rng.randint(0, V, (50, 3))
    kp = rng.rand(n, t, 49, 2).astype(np.float32) * 2 - 1
    preds = {
        "theta": np.concatenate(
            [np.tile([1.0, 0.0, 0.0], (n, t, 1)), np.zeros((n, t, 82))], axis=2
        ).astype(np.float32),
        "kp_2d": kp,
        "verts": (rng.randn(n, t, V, 3) * 0.3).astype(np.float32),
    }
    vid = batch_visualize_vid_preds(video, preds, faces, max_video=2)
    assert vid.shape == (2, t, hw, 4 * hw, 3)  # no target -> 4 panels
    assert vid.dtype == np.uint8


def test_eval_released_preflight_contract(tmp_path):
    """scripts/eval_released.sh must list EVERY missing artifact with
    placement instructions and exit nonzero before touching the model."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "eval_released.sh")
    r = subprocess.run(["sh", script, str(tmp_path / "nope.pth.tar")],
                       capture_output=True, text=True, timeout=60,
                       cwd=str(tmp_path))
    assert r.returncode != 0
    out = r.stdout + r.stderr
    assert "nope.pth.tar" in out and "MISSING:" in out
    # artifacts the repo doesn't hold must each be reported with its path
    # (skip any a user may have really placed under data/)
    for rel, name in (("data/smpl_data/SMPL_NEUTRAL.pkl", "SMPL_NEUTRAL.pkl"),
                      ("data/smpl_data/J_regressor_extra.npy", "J_regressor_extra.npy"),
                      ("data/smpl_data/J_regressor_h36m.npy", "J_regressor_h36m.npy"),
                      ("data/database/3dpw_test_db.pt", "3dpw_test_db.pt")):
        if not os.path.exists(os.path.join(repo, rel)):
            assert name in out, name


def test_download_url_file_scheme(tmp_path):
    from maed_tpu.utils.demo_utils import download_url

    src = tmp_path / "artifact.bin"
    src.write_bytes(b"maed")
    outdir = tmp_path / "out"
    got = download_url(src.as_uri(), str(outdir))
    assert open(got, "rb").read() == b"maed"
    # idempotent: an existing file is not re-fetched
    src.write_bytes(b"changed")
    assert open(download_url(src.as_uri(), str(outdir)), "rb").read() == b"maed"


def test_download_youtube_clip_explains_missing_pytube(tmp_path):
    import pytest

    from maed_tpu.utils.demo_utils import download_youtube_clip

    try:
        import pytube  # noqa: F401
        pytest.skip("pytube installed; error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="pytube"):
        download_youtube_clip("https://youtu.be/x", str(tmp_path))


def test_trim_videos_cv2_fallback(tmp_path):
    import cv2
    import pytest

    from maed_tpu.utils.demo_utils import trim_videos

    src = str(tmp_path / "src.mp4")
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (32, 32))
    if not writer.isOpened():
        pytest.skip("cv2 has no mp4 encoder in this image")
    for i in range(20):  # 2 seconds at 10 fps, frame index painted in
        frame = np.full((32, 32, 3), i * 10, dtype=np.uint8)
        writer.write(frame)
    writer.release()

    out = str(tmp_path / "trim.mp4")
    trim_videos(src, 0.5, 1.5, out)  # frames [5, 15)
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 10


def test_draw_smpl_joints2d_default_kintree():
    from maed_tpu.utils.vis import draw_smpl_joints2d, get_colors

    img = np.zeros((64, 64, 3), np.uint8)
    rng = np.random.RandomState(0)
    joints = rng.uniform(8, 56, size=(24, 2))
    out = draw_smpl_joints2d(joints, img)
    assert out.sum() > 0  # bones drawn
    palette = get_colors()
    assert palette["red"].tolist() == [215, 48, 39]


def test_visualize_sequence_renders_frames():
    from maed_tpu.utils.vis import visualize_sequence

    rng = np.random.RandomState(1)
    seq = rng.randn(3, 17 * 3).astype(np.float32)
    frames = visualize_sequence(seq, radius=2.0)
    assert frames.shape[0] == 3 and frames.shape[-1] == 3
    assert frames.dtype == np.uint8
    # the skeleton actually lands on the canvas (not a blank figure)
    assert (frames.reshape(3, -1).min(axis=1) < 250).all()
