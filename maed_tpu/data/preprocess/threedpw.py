"""3DPW preprocessor: sequenceFiles pkl -> joblib DB (train/val/test).

Parity target: /root/reference/lib/data_utils/threedpw_utils.py:33-166,
re-expressed torch-free: the global orient is rotated into the camera frame
(Rc @ R), GT 3D joints come from the native SMPL forward (H36M J14 regressor
for test/val), bboxes from median/gaussian-smoothed 2D pose tracks, frames
with fewer than 6 visible keypoints dropped, keypoints converted to the
49-joint spin format.

Run: python -m maed_tpu.data.preprocess.threedpw --inp_dir data/3dpw
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle

import joblib
import numpy as np

VIS_THRESH = 0.3
MIN_KP = 6


def align_global_orient_to_camera(pose_aa: np.ndarray, cam_poses: np.ndarray) -> np.ndarray:
    """Rotate each frame's global orient into the camera frame: R <- Rc @ R."""
    import jax
    import jax.numpy as jnp

    from maed_tpu.ops.geometry import rodrigues, rotmat_to_aa

    R = rodrigues(jnp.asarray(pose_aa[:, :3], jnp.float32))
    Rc = jnp.asarray(cam_poses[:, :3, :3], jnp.float32)
    Rs = jnp.matmul(Rc, R, precision=jax.lax.Precision.HIGHEST)
    out = np.array(pose_aa, np.float32, copy=True)
    out[:, :3] = np.asarray(rotmat_to_aa(Rs))
    return out


def bbox_from_smooth_track(j2d: np.ndarray):
    """Square 1.1x bboxes from smoothed keypoint tracks; returns
    (bbox (T', 4), start, end)."""
    from maed_tpu.utils.smooth_bbox import get_all_bbox_params, smooth_bbox_params

    params, t0, t1 = get_all_bbox_params(j2d, vis_thresh=VIS_THRESH)
    params = smooth_bbox_params(params, sigma=8.0)
    if len(params) == 0:
        return np.zeros((0, 4)), t0, t1
    # params[:, 2] stores the square side (see smooth_bbox); 1.1x margin
    side = params[:, 2] * 1.1
    bbox = np.stack([params[:, 0], params[:, 1], side, side], axis=1)
    return bbox, t0, t1


def read_data(folder: str, set_name: str, smpl_model=None, data_dir="data/smpl_data"):
    import jax.numpy as jnp

    from maed_tpu.data.keypoints import convert_kps, get_perm_idxs
    from maed_tpu.ops.joints import H36M_TO_J14
    from maed_tpu.ops.smpl import smpl_forward
    from maed_tpu.utils.smpl_io import find_smpl_model

    smpl_model = smpl_model or find_smpl_model(data_dir)
    J_regressor = None
    if set_name in ("test", "validation"):
        jr_path = osp.join(data_dir, "J_regressor_h36m.npy")
        if osp.isfile(jr_path):
            J_regressor = np.load(jr_path).astype(np.float32)

    dataset = {k: [] for k in (
        "vid_name", "frame_id", "joints3D", "joints2D", "shape", "pose",
        "bbox", "img_name", "valid",
    )}

    seq_dir = osp.join(folder, "sequenceFiles", set_name)
    sequences = sorted(x.split(".")[0] for x in os.listdir(seq_dir))

    for seq in sequences:
        with open(osp.join(seq_dir, seq + ".pkl"), "rb") as f:
            data = pickle.load(f, encoding="latin1")
        img_dir = osp.join(folder, "imageFiles", seq)
        num_people = len(data["poses"])
        num_frames = len(data["img_frame_ids"])

        for p_id in range(num_people):
            pose = np.asarray(data["poses"][p_id], np.float32)
            shape = np.tile(np.asarray(data["betas"][p_id][:10], np.float32), (len(pose), 1))
            j2d = np.asarray(data["poses2d"][p_id]).transpose(0, 2, 1)
            campose_valid = np.asarray(data["campose_valid"][p_id])

            pose = align_global_orient_to_camera(pose, np.asarray(data["cam_poses"]))

            out = smpl_forward(
                smpl_model, jnp.asarray(shape), pose_axis_angle=jnp.asarray(pose)
            )
            if J_regressor is not None:
                verts = np.asarray(out["vertices"])
                j3d = np.einsum("jv,tvk->tjk", J_regressor, verts)[:, H36M_TO_J14]
            else:
                j3d = np.asarray(out["joints"])

            bbox, t0, t1 = bbox_from_smooth_track(j2d)
            if t1 <= t0:
                continue

            j2d[:, :, 2] = (j2d[:, :, 2] > VIS_THRESH).astype(np.float32)
            perm = get_perm_idxs("3dpw", "common") + [0, 0]  # no neck/headtop
            j2d = j2d[:, perm]
            j2d[:, 12:, 2] = 0.0

            img_paths = np.array(
                [osp.join(img_dir, f"image_{i:05d}.jpg") for i in range(num_frames)]
            )
            sl = slice(t0, t1)
            dataset["vid_name"].append(np.array([f"{seq}_{p_id}"] * num_frames)[sl])
            dataset["frame_id"].append(np.arange(num_frames)[sl])
            dataset["img_name"].append(img_paths[sl])
            dataset["joints3D"].append(j3d[sl])
            dataset["joints2D"].append(j2d[sl])
            dataset["shape"].append(shape[sl])
            dataset["pose"].append(pose[sl])
            dataset["bbox"].append(bbox)
            dataset["valid"].append(campose_valid[sl])

    for k in dataset:
        dataset[k] = np.concatenate(dataset[k])

    keep = np.where((dataset["joints2D"][:, :, 2] > VIS_THRESH).sum(-1) > MIN_KP)[0]
    for k in dataset:
        dataset[k] = dataset[k][keep]

    dataset["joints2D"] = convert_kps(dataset["joints2D"], src="common", dst="spin")
    valid = np.zeros([len(dataset["joints3D"]), 49, 1])
    valid[:, 25:39, :] = 1
    if set_name != "train":
        dataset["joints3D"] = convert_kps(dataset["joints3D"], src="common", dst="spin")
    dataset["joints3D"] = np.concatenate([dataset["joints3D"], valid], axis=-1)
    return dataset


def main():
    from maed_tpu.core import config as cfg_mod

    parser = argparse.ArgumentParser()
    parser.add_argument("--inp_dir", type=str, default=cfg_mod.THREEDPW_DIR)
    parser.add_argument("--out_dir", type=str, default=cfg_mod.DB_DIR)
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for set_name, out_name in (
        ("validation", "3dpw_val_db.pt"),
        ("train", "3dpw_train_db.pt"),
        ("test", "3dpw_test_db.pt"),
    ):
        db = read_data(args.inp_dir, set_name)
        joblib.dump(db, osp.join(args.out_dir, out_name))
        print(f"wrote {out_name}: {len(db['img_name'])} frames")


if __name__ == "__main__":
    main()
