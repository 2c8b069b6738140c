"""Visualization CLI: render predicted SMPL meshes over the source frames.

Parity target: /root/reference/visualize.py:13-63 — loads the Evaluator's
inference.pkl ({pred_theta, pred_verts, paths, bboxes}), converts the crop
camera to original-image coordinates, and composites each mesh (software
rasterizer; no GL required).

Usage: python visualize.py --input_file <dir>/inference.pkl --output_folder out/
"""

import argparse
import os
import os.path as osp

import joblib
import numpy as np

from maed_tpu.utils.platform import honor_env_platform

honor_env_platform()  # a host tool must not hang initializing a TPU backend

from maed_tpu.utils.demo_utils import convert_crop_cam_to_orig_img
from maed_tpu.utils.renderer import Renderer
from maed_tpu.utils.smpl_io import find_smpl_model


def render_inference_pkl(input_file: str, output_folder: str,
                         alpha: float = 0.8,
                         allow_synthetic_smpl: bool = False) -> int:
    """Render every frame of an Evaluator inference.pkl; returns the count.

    Shared by this CLI and demo.py. The missing-body-model policy follows
    eval.py: hard-fail with placement instructions unless the caller
    explicitly accepts a synthetic mesh (rendered with its synthetic
    triangulation)."""
    data = joblib.load(input_file)
    pred_verts = np.asarray(data["pred_verts"])
    bboxes = np.asarray(data["bboxes"])
    paths = list(np.asarray(data["paths"]).ravel())
    theta = np.asarray(data["pred_theta"])
    cams = theta[:, :3]

    smpl = find_smpl_model(allow_synthetic=allow_synthetic_smpl)
    faces = smpl.faces
    if faces is None:
        raise SystemExit("No SMPL faces available (real SMPL model required)")

    os.makedirs(output_folder, exist_ok=True)
    import cv2

    renderer = None
    for i, path in enumerate(paths):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        if renderer is None:
            renderer = Renderer(resolution=(w, h))
        orig_cam = convert_crop_cam_to_orig_img(
            cams[i:i + 1], bboxes[i:i + 1], w, h
        )[0]
        out = renderer.render(img, pred_verts[i], faces, orig_cam, alpha=alpha)
        name = f"{i:06d}_" + osp.basename(path)
        cv2.imwrite(osp.join(output_folder, name),
                    cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        if i % 50 == 0:
            print(f"rendered {i + 1}/{len(paths)}")
    print(f"wrote {len(paths)} frames to {output_folder}")
    return len(paths)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_file", type=str, required=True)
    parser.add_argument("--output_folder", type=str, default="vis_output")
    parser.add_argument("--alpha", type=float, default=0.8)
    parser.add_argument("--allow_synthetic_smpl", action="store_true",
                        help="render with a RANDOM body model when the real "
                        "SMPL artifacts are missing (smoke runs only)")
    args = parser.parse_args()
    render_inference_pkl(args.input_file, args.output_folder, args.alpha,
                         args.allow_synthetic_smpl)


if __name__ == "__main__":
    main()
