"""Inference/visualization helpers: crop-cam -> original-image cam conversion,
video <-> frame extraction (ffmpeg, gated).

Parity target: /root/reference/lib/utils/demo_utils.py:22-135.
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
import subprocess

import numpy as np


def convert_crop_cam_to_orig_img(cam: np.ndarray, bbox: np.ndarray,
                                 img_width: int, img_height: int) -> np.ndarray:
    """Weak-perspective cam predicted in the 224-crop frame -> cam for the
    original image frame.

    cam (N, 3): (s, tx, ty) in crop coords; bbox (N, 4): (cx, cy, w, h).
    Returns (N, 4): (sx, sy, tx, ty) in original-image normalized coords.
    """
    cx, cy, w, h = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    hw, hh = img_width / 2.0, img_height / 2.0
    sx = cam[:, 0] * (1.0 / (img_width / w))
    sy = cam[:, 0] * (1.0 / (img_height / h))
    tx = ((cx - hw) / hw / sx) + cam[:, 1]
    ty = ((cy - hh) / hh / sy) + cam[:, 2]
    return np.stack([sx, sy, tx, ty]).T


def video_to_images(vid_file: str, img_folder: str | None = None,
                    return_info: bool = False):
    if img_folder is None:
        img_folder = osp.join("/tmp", osp.basename(vid_file).replace(".", "_"))
    os.makedirs(img_folder, exist_ok=True)
    if shutil.which("ffmpeg") is not None:
        command = [
            "ffmpeg", "-i", vid_file, "-f", "image2", "-v", "error",
            f"{img_folder}/%06d.png",
        ]
        subprocess.run(command, check=True)
    else:
        # ffmpeg-free fallback: decode with OpenCV (same %06d.png layout,
        # 1-based like ffmpeg's image2 muxer)
        import cv2

        cap = cv2.VideoCapture(vid_file)
        if not cap.isOpened():
            raise RuntimeError(f"cannot open video {vid_file} "
                               "(no ffmpeg and cv2 failed)")
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            i += 1
            cv2.imwrite(osp.join(img_folder, f"{i:06d}.png"), frame)
        cap.release()
        if i == 0:
            raise RuntimeError(f"no frames decoded from {vid_file}")
    if return_info:
        import cv2

        img_shape = cv2.imread(osp.join(img_folder, "000001.png")).shape
        return img_folder, len(os.listdir(img_folder)), img_shape
    return img_folder


def images_to_video(img_folder: str, output_vid_file: str, fps: int = 30,
                    pattern: str = "%06d.png"):
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg is not available in this environment")
    os.makedirs(osp.dirname(output_vid_file) or ".", exist_ok=True)
    command = [
        "ffmpeg", "-framerate", str(fps), "-y",
        "-i", f"{img_folder}/{pattern}",
        "-c:v", "libx264", "-pix_fmt", "yuv420p", "-v", "error", output_vid_file,
    ]
    subprocess.run(command, check=True)
