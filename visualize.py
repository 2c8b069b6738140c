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

from maed_tpu.utils.demo_utils import convert_crop_cam_to_orig_img
from maed_tpu.utils.renderer import Renderer
from maed_tpu.utils.smpl_io import find_smpl_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_file", type=str, required=True)
    parser.add_argument("--output_folder", type=str, default="vis_output")
    parser.add_argument("--alpha", type=float, default=0.8)
    args = parser.parse_args()

    data = joblib.load(args.input_file)
    pred_verts = np.asarray(data["pred_verts"])
    bboxes = np.asarray(data["bboxes"])
    paths = list(np.asarray(data["paths"]).ravel())
    theta = np.asarray(data["pred_theta"])
    cams = theta[:, :3]

    smpl = find_smpl_model()
    faces = smpl.faces
    if faces is None:
        raise SystemExit("No SMPL faces available (real SMPL model required)")

    os.makedirs(args.output_folder, exist_ok=True)
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
        out = renderer.render(img, pred_verts[i], faces, orig_cam, alpha=args.alpha)
        name = f"{i:06d}_" + osp.basename(path)
        cv2.imwrite(osp.join(args.output_folder, name),
                    cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        if i % 50 == 0:
            print(f"rendered {i + 1}/{len(paths)}")
    print(f"wrote {len(paths)} frames to {args.output_folder}")


if __name__ == "__main__":
    main()
