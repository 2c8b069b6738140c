"""Synthetic dataset fixtures: tiny on-disk image sequences + DB dicts with
the reference's joblib-DB schema, so every pipeline is testable without the
real (licensed) datasets."""

import os
import os.path as osp

import cv2
import numpy as np


def make_video_db(tmpdir, n_videos=2, frames_per_video=40, img_size=64, seed=0,
                  with_3d=True, with_smpl=True):
    rng = np.random.RandomState(seed)
    img_dir = osp.join(str(tmpdir), "imgs")
    os.makedirs(img_dir, exist_ok=True)

    vid_names, img_names, frame_ids = [], [], []
    for v in range(n_videos):
        for f in range(frames_per_video):
            name = f"vid{v:02d}"
            path = osp.join(img_dir, f"{name}_{f:04d}.jpg")
            img = rng.randint(0, 255, (img_size, img_size, 3), dtype=np.uint8)
            cv2.imwrite(path, img)
            vid_names.append(name)
            img_names.append(path)
            frame_ids.append(f)

    n = len(img_names)
    db = {
        "vid_name": np.array(vid_names),
        "img_name": np.array(img_names),
        "frame_id": np.array(frame_ids),
        "bbox": np.concatenate(
            [np.full((n, 2), img_size / 2), np.full((n, 2), img_size * 0.8)], axis=1
        ).astype(np.float32),
        "joints2D": np.concatenate(
            [rng.rand(n, 49, 2).astype(np.float32) * img_size,
             np.ones((n, 49, 1), np.float32)], axis=2,
        ),
    }
    if with_3d:
        db["joints3D"] = np.concatenate(
            [rng.randn(n, 49, 3).astype(np.float32) * 0.3,
             np.ones((n, 49, 1), np.float32)], axis=2,
        )
    if with_smpl:
        db["pose"] = (rng.randn(n, 72) * 0.2).astype(np.float32)
        db["shape"] = (rng.randn(n, 10) * 0.5).astype(np.float32)
    return db


def make_image_db(tmpdir, n_images=16, img_size=64, seed=1, with_smpl=True):
    rng = np.random.RandomState(seed)
    img_dir = osp.join(str(tmpdir), "imgs_single")
    os.makedirs(img_dir, exist_ok=True)

    img_names = []
    for i in range(n_images):
        path = osp.join(img_dir, f"img_{i:04d}.jpg")
        cv2.imwrite(path, rng.randint(0, 255, (img_size, img_size, 3), dtype=np.uint8))
        img_names.append(path)

    n = n_images
    db = {
        "img_name": np.array(img_names),
        "bbox": np.concatenate(
            [np.full((n, 2), img_size / 2), np.full((n, 2), img_size * 0.8)], axis=1
        ).astype(np.float32),
        "joints2D": np.concatenate(
            [rng.rand(n, 49, 2).astype(np.float32) * img_size,
             np.ones((n, 49, 1), np.float32)], axis=2,
        ),
        "joints3D": np.concatenate(
            [rng.randn(n, 49, 3).astype(np.float32) * 0.3,
             np.ones((n, 49, 1), np.float32)], axis=2,
        ),
    }
    if with_smpl:
        db["pose"] = (rng.randn(n, 72) * 0.2).astype(np.float32)
        db["shape"] = (rng.randn(n, 10) * 0.5).astype(np.float32)
    return db


def cli_subprocess_env():
    """Env for driving the CLIs as subprocesses: CPU backend, ONE device
    (the tiny CLI batches don't divide the conftest 8-device test mesh)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    return env
