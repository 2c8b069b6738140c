"""In-the-wild demo: a video (or image folder) -> per-frame SMPL predictions
-> optional rendered overlay frames/video.

Beyond reference parity: the reference ships the pieces (pose_tracker,
smooth_bbox, demo_utils — vestigial, no entry point wires them); this CLI
composes this framework's implementations of those pieces with the windowed
eval protocol into one command:

    python demo.py --vid_file clip.mp4 --cfg configs/config_stage2.yaml \
        --checkpoint ckpt.pth.tar --output_folder demo_out --render

Person localization, in priority order:
  --bbox_file     per-frame (cx, cy, w, h) boxes, .npy (N, 4)
  --staf_dir      run the OpenPose STAF tracker (utils/pose_tracker.py) and
                  smooth its keypoint track into boxes (utils/smooth_bbox.py)
  (default)       a centered square box per frame — fine for person-centered
                  footage, wrong for off-center subjects (supply boxes)

Outputs <output_folder>/inference.pkl in the Evaluator's schema, so
visualize.py consumes it unchanged; --render does that inline (+ an mp4 when
ffmpeg is available).
"""

import argparse
import os
import os.path as osp
import shutil

import numpy as np

from maed_tpu.utils.platform import honor_env_platform

honor_env_platform()

from maed_tpu.core.builder import build_eval_model
from maed_tpu.core.config import get_cfg_defaults, update_cfg
from maed_tpu.core.evaluate import Evaluator
from maed_tpu.data.dataset import VideoDataset
from maed_tpu.data.loaders import ShardedLoader
from maed_tpu.data.transforms import build_eval_transforms
from maed_tpu.utils.demo_utils import images_to_video, video_to_images

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def collect_frames(args) -> list:
    if args.image_folder:
        paths = sorted(
            osp.join(args.image_folder, n) for n in os.listdir(args.image_folder)
            if n.lower().endswith(IMG_EXTS)
        )
        if not paths:
            raise SystemExit(f"no images found in {args.image_folder}")
        return paths
    frames_dir = osp.join(args.output_folder, "frames")
    if osp.isdir(frames_dir):  # stale frames from a previous (longer) run
        shutil.rmtree(frames_dir)
    folder = video_to_images(args.vid_file, frames_dir)
    return sorted(osp.join(folder, n) for n in os.listdir(folder))


def resolve_bboxes(args, paths) -> np.ndarray:
    if args.bbox_file:
        bboxes = np.asarray(np.load(args.bbox_file), np.float32)
        if bboxes.shape != (len(paths), 4):
            raise SystemExit(
                f"--bbox_file shape {bboxes.shape} != ({len(paths)}, 4)")
        return bboxes
    if args.staf_dir:
        if not args.vid_file:
            raise SystemExit("--staf_dir tracking needs --vid_file "
                             "(the tracker consumes the video directly)")
        from maed_tpu.utils.pose_tracker import run_posetracker
        from maed_tpu.utils.smooth_bbox import (
            get_all_bbox_params, smooth_bbox_params,
        )

        tracks = run_posetracker(args.vid_file, args.staf_dir,
                                 display=False)
        if not tracks:
            raise SystemExit("pose tracker found no people")
        # largest track -> smoothed square boxes, placed by the track's
        # VIDEO frame ids (detections can start late / have gaps)
        pid = max(tracks, key=lambda p: len(tracks[p]["frames"]))
        frames = np.asarray(tracks[pid]["frames"])
        bbox_params, start, end = get_all_bbox_params(
            tracks[pid]["joints2d"], vis_thresh=0.3)
        if end <= start:
            raise SystemExit("pose track has no frames with >=2 confident "
                             "keypoints — supply --bbox_file instead")
        bbox_params = smooth_bbox_params(bbox_params)
        boxes = np.zeros((len(paths), 4), np.float32)
        have = np.zeros(len(paths), bool)
        for r in range(start, end):  # row r detects video frame frames[r]
            f = int(frames[r])
            if 0 <= f < len(paths):
                cx, cy, size = bbox_params[r - start]
                boxes[f] = (cx, cy, size, size)
                have[f] = True
        if not have.any():
            raise SystemExit("pose track frames lie outside the video")
        tracked = np.where(have)[0]
        for i in np.where(~have)[0]:  # nearest tracked box for gaps/edges
            boxes[i] = boxes[tracked[np.abs(tracked - i).argmin()]]
        return boxes
    # centered square fallback
    import cv2

    h, w = cv2.imread(paths[0]).shape[:2]
    side = min(h, w)
    box = np.array([w / 2.0, h / 2.0, side, side], np.float32)
    return np.tile(box, (len(paths), 1))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--vid_file", default="")
    src.add_argument("--image_folder", default="")
    ap.add_argument("--cfg", default="")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--bbox_file", default="",
                    help=".npy of per-frame (cx, cy, w, h) person boxes")
    ap.add_argument("--staf_dir", default="",
                    help="OpenPose STAF build dir for automatic tracking")
    ap.add_argument("--output_folder", default="demo_output")
    ap.add_argument("--render", action="store_true",
                    help="render mesh overlays (+ mp4 when ffmpeg exists)")
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--allow_synthetic_smpl", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.output_folder, exist_ok=True)
    paths = collect_frames(args)
    bboxes = resolve_bboxes(args, paths)
    print(f"{len(paths)} frames")

    cfg = update_cfg(args.cfg) if args.cfg else get_cfg_defaults()
    model, variables, smpl = build_eval_model(
        cfg, checkpoint=args.checkpoint,
        allow_synthetic_smpl=args.allow_synthetic_smpl,
    )

    d = cfg.DATASET
    db = {
        "vid_name": np.array(["demo"] * len(paths)),
        "img_name": np.array(paths),
        "frame_id": np.arange(len(paths)),
        "bbox": bboxes,
    }
    dataset = VideoDataset(
        "demo", "test",
        build_eval_transforms(
            d.WIDTH, d.HEIGHT,
            device_normalize=bool(getattr(d, "DEVICE_PREPROC", False)),
            # single-video footage has uniform frame sizes — the DEVICE_CROP
            # pack (raw frames + affines, crop on the MXU) applies cleanly
            device_crop=bool(getattr(d, "DEVICE_CROP", False))),
        seqlen=0, sample_pool=cfg.EVAL.SAMPLE_POOL, overlap=0,
        random_sample=False, random_start=False, db=db, verbose=False,
    )
    loader = ShardedLoader(dataset, cfg.EVAL.BATCH_SIZE, shuffle=False,
                           drop_last=False)

    def eval_fwd(variables, images, J_regressor=None):
        from maed_tpu.ops.image import apply_device_preproc

        images = apply_device_preproc(images, d.HEIGHT, d.WIDTH)
        return model.apply(variables, images, smpl, J_regressor=J_regressor)

    evaluator = Evaluator(smpl)
    evaluator.inference(
        eval_fwd, loader, seqlen=cfg.EVAL.SEQLEN,
        interp=cfg.EVAL.INTERPOLATION, dataset_name="demo",
        batch_size=cfg.EVAL.BATCH_SIZE, variables=variables,
        allow_missing_regressor=True,  # 'demo' has no eval protocol
    )
    evaluator.save_result(args.output_folder)
    print(f"wrote {osp.join(args.output_folder, 'inference.pkl')}")

    if args.render:
        from visualize import render_inference_pkl

        frames_dir = osp.join(args.output_folder, "overlay")
        render_inference_pkl(
            osp.join(args.output_folder, "inference.pkl"), frames_dir,
            alpha=args.alpha, allow_synthetic_smpl=args.allow_synthetic_smpl,
        )
        if shutil.which("ffmpeg") is not None:
            # rendered names aren't a %06d sequence — re-sequence for the
            # muxer, KEEPING each file's real encoding/extension
            seq = osp.join(args.output_folder, "overlay_seq")
            if osp.isdir(seq):
                shutil.rmtree(seq)
            os.makedirs(seq)
            names = sorted(os.listdir(frames_dir))
            ext = osp.splitext(names[0])[1]
            for i, n in enumerate(names, start=1):
                shutil.copy(osp.join(frames_dir, n),
                            osp.join(seq, f"{i:06d}{ext}"))
            out_vid = osp.join(args.output_folder, "demo_overlay.mp4")
            images_to_video(seq, out_vid, pattern=f"%06d{ext}")
            print(f"wrote {out_vid}")
        else:
            print("ffmpeg not available — overlay frames only")


if __name__ == "__main__":
    main()
