"""Debug visualization: skeleton overlays and batch-inspection grids (cv2).

Parity target: /root/reference/lib/utils/vis.py:65-474 (skeleton/mesh grids
for eyeballing training batches), rebuilt on cv2 — no GL or torchvision.
"""

from __future__ import annotations

import numpy as np

from maed_tpu.data.keypoints import get_joint_names

SPIN_SKELETON = [
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (10, 11), (8, 12), (12, 13), (13, 14),
    (0, 15), (0, 16), (15, 17), (16, 18),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """ImageNet-normalized float (H, W, 3) -> uint8 RGB."""
    x = img * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def draw_skeleton(img: np.ndarray, kp_2d: np.ndarray, normalized: bool = True,
                  skeleton=SPIN_SKELETON, vis_thresh: float = 0.3) -> np.ndarray:
    """Draw keypoints + bones; kp in [-1,1] when normalized, else pixels."""
    import cv2

    out = img.copy()
    h, w = img.shape[:2]
    kp = kp_2d.copy()
    if normalized:
        kp[:, 0] = (kp[:, 0] + 1) * 0.5 * w
        kp[:, 1] = (kp[:, 1] + 1) * 0.5 * h
    conf = kp[:, 2] if kp.shape[1] > 2 else np.ones(len(kp))
    for a, b in skeleton:
        if a < len(kp) and b < len(kp) and conf[a] > vis_thresh and conf[b] > vis_thresh:
            cv2.line(out, tuple(kp[a, :2].astype(int)), tuple(kp[b, :2].astype(int)),
                     (0, 255, 0), 1)
    for i, p in enumerate(kp):
        if conf[i] > vis_thresh:
            cv2.circle(out, tuple(p[:2].astype(int)), 2, (255, 0, 0), -1)
    return out


def batch_grid(images: np.ndarray, kp_2d: np.ndarray | None = None,
               max_items: int = 16, normalized: bool = True) -> np.ndarray:
    """(N, H, W, 3) normalized batch -> one uint8 grid image for logging."""
    n = min(len(images), max_items)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = images.shape[1:3]
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        img = denormalize_image(images[i])
        if kp_2d is not None:
            img = draw_skeleton(img, kp_2d[i], normalized=normalized)
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    return grid


def joint_names(fmt: str = "spin"):
    return get_joint_names(fmt)
