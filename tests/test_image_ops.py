"""On-device crop+normalize vs the host cv2 path."""

import cv2
import numpy as np
import jax.numpy as jnp

from maed_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, gen_crop_trans
from maed_tpu.ops.image import (
    affine_crop_normalize,
    batch_crop_normalize,
    crop_trans_for_bbox,
    invert_affine,
    normalize_keypoints,
)


def test_invert_affine_roundtrip(rng):
    m = rng.randn(5, 2, 3).astype(np.float32)
    m[:, 0, 0] += 2.0
    m[:, 1, 1] += 2.0
    inv = np.asarray(invert_affine(jnp.asarray(m)))
    for i in range(5):
        full = np.vstack([m[i], [0, 0, 1]])
        want = np.linalg.inv(full)[:2]
        np.testing.assert_allclose(inv[i], want, rtol=1e-4, atol=1e-5)


def test_on_device_crop_matches_cv2(rng):
    frames = rng.randint(0, 255, (4, 64, 80, 3), dtype=np.uint8)
    bboxes = np.stack([
        np.array([40 + i, 30, 30, 30], np.float32) for i in range(4)
    ])
    trans = np.stack([
        gen_crop_trans(b, (1.3, 1.3), 0.0, (0.0, 0.0), 32, 32) for b in bboxes
    ]).astype(np.float32)

    got = np.asarray(affine_crop_normalize(jnp.asarray(frames), jnp.asarray(trans), 32, 32))

    for i in range(4):
        w = cv2.warpAffine(frames[i], trans[i], (32, 32), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT)
        want = ((w.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        # cv2 uses 5-bit fixed-point bilinear; our device path is exact float
        assert np.abs(got[i] - want).max() < 0.05, i


def test_crop_trans_for_bbox_matches_gen_crop_trans():
    bbox = np.array([50.0, 40.0, 30.0, 20.0])
    want = gen_crop_trans(bbox, (1.3, 1.3), 0.0, (0.0, 0.0), 32, 32)
    got = crop_trans_for_bbox(bbox, 32, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_separable_matches_gather_path(rng):
    """Axis-aligned crops: the MXU separable path == the bilinear gather path
    (the 300x-faster production route vs the general-affine fallback)."""
    frames = rng.randint(0, 255, (3, 50, 60, 3), dtype=np.uint8)
    bboxes = np.stack([np.array([30.0 + i, 25, 20, 20], np.float32) for i in range(3)])
    trans = crop_trans_for_bbox(bboxes, 32, 32).astype(np.float32)
    fast = np.asarray(affine_crop_normalize(
        jnp.asarray(frames), jnp.asarray(trans), 32, 32, separable=True))
    slow = np.asarray(affine_crop_normalize(
        jnp.asarray(frames), jnp.asarray(trans), 32, 32, separable=False))
    np.testing.assert_allclose(fast, slow, atol=1e-4)


def test_batch_crop_and_keypoints(rng):
    frames = rng.randint(0, 255, (2, 3, 48, 48, 3), dtype=np.uint8)
    bboxes = np.tile(np.array([24.0, 24.0, 30.0, 30.0]), (2, 3, 1))
    trans = crop_trans_for_bbox(bboxes, 32, 32).astype(np.float32)
    out = np.asarray(batch_crop_normalize(jnp.asarray(frames), jnp.asarray(trans), 32, 32))
    assert out.shape == (2, 3, 32, 32, 3)
    assert np.isfinite(out).all()

    kp = rng.rand(3, 49, 3).astype(np.float32) * 48
    kp_out = np.asarray(normalize_keypoints(jnp.asarray(kp), jnp.asarray(trans[0]), 32))
    assert kp_out.shape == (3, 49, 3)
    # confidences pass through
    np.testing.assert_allclose(kp_out[..., 2], kp[..., 2])
