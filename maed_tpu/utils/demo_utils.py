"""Inference/visualization helpers: crop-cam -> original-image cam conversion,
video <-> frame extraction / trimming (ffmpeg with cv2 fallbacks), per-frame
render grouping, and optional downloads (URL, YouTube via pytube).

Parity target: /root/reference/lib/utils/demo_utils.py:22-135 (everything
except `download_ckpt`, which fetches VIBE — another project's — checkpoints
from hard-coded Dropbox URLs; use `download_url` directly for artifacts).
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


def download_youtube_clip(url: str, download_folder: str) -> str:
    """Fetch a YouTube video for the in-the-wild demo (parity:
    /root/reference/lib/utils/demo_utils.py:22-23). pytube is an optional
    dependency — absent (or with no network egress) this raises instead of
    failing deep inside the demo."""
    try:
        from pytube import YouTube
    except ImportError as e:
        raise RuntimeError(
            "download_youtube_clip needs the optional 'pytube' package "
            "(pip install pytube); alternatively download the video "
            "yourself and pass the local file to demo.py") from e
    os.makedirs(download_folder, exist_ok=True)
    return YouTube(url).streams.first().download(output_path=download_folder)


def trim_videos(filename: str, start_time: float, end_time: float,
                output_filename: str):
    """Cut [start_time, end_time) seconds out of a video (parity:
    /root/reference/lib/utils/demo_utils.py:26-37). ffmpeg when present;
    otherwise an OpenCV re-encode fallback."""
    os.makedirs(osp.dirname(output_filename) or ".", exist_ok=True)
    if shutil.which("ffmpeg") is not None:
        command = [
            "ffmpeg", "-y", "-i", filename,
            "-ss", str(start_time), "-t", str(end_time - start_time),
            "-c:v", "libx264", "-c:a", "copy", "-v", "error",
            output_filename,
        ]
        subprocess.run(command, check=True)
        return
    import cv2

    cap = cv2.VideoCapture(filename)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video {filename} "
                           "(no ffmpeg and cv2 failed)")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(output_filename,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        cap.release()
        raise RuntimeError("cv2.VideoWriter could not open "
                           f"{output_filename} (no mp4 codec?)")
    first, last = int(start_time * fps), int(end_time * fps)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok or i >= last:
            break
        if i >= first:
            writer.write(frame)
        i += 1
    cap.release()
    writer.release()


def download_url(url: str, outdir: str) -> str:
    """Download a file into outdir, resuming nothing but skipping files that
    already exist (parity: /root/reference/lib/utils/demo_utils.py:63-66,
    without the wget dependency). Returns the local path."""
    import urllib.parse
    import urllib.request

    os.makedirs(outdir, exist_ok=True)
    name = osp.basename(urllib.parse.urlparse(url).path) or "download"
    out = osp.join(outdir, name)
    if not osp.isfile(out):
        urllib.request.urlretrieve(url, out)
    return out


def prepare_rendering_results(results: dict, nframes: int):
    """Regroup per-person tracking results into per-frame render dicts,
    depth-ordered back-to-front by the weak-perspective y-scale (parity:
    /root/reference/lib/utils/demo_utils.py:118-135). `results` maps
    person_id -> {'frame_ids', 'verts', 'orig_cam'}; returns a list of
    nframes OrderedDicts person_id -> {'verts', 'cam'}."""
    from collections import OrderedDict

    frames = [dict() for _ in range(nframes)]
    for person_id, person in results.items():
        for idx, frame_id in enumerate(person["frame_ids"]):
            frames[frame_id][person_id] = {
                "verts": person["verts"][idx],
                "cam": person["orig_cam"][idx],
            }
    ordered = []
    for frame in frames:
        pids = list(frame.keys())
        order = np.argsort([frame[p]["cam"][1] for p in pids])
        ordered.append(OrderedDict((pids[i], frame[pids[i]]) for i in order))
    return ordered


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
