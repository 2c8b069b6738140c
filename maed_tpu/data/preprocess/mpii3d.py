"""MPI-INF-3DHP preprocessor: annot.mat (train) / annot_data.mat (test) ->
joblib DBs.

Parity target: /root/reference/lib/data_utils/mpii3d_utils.py:85-290
(28-joint train / 17-joint test annotations to the spin 49 format, root
centering at joint 39, bbox from the 2D keypoint bound, segment splitting at
out-of-frame keypoints, valid mask over J14 + hip/spine/head).
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import joblib
import numpy as np

from maed_tpu.data.keypoints import convert_kps


def bbox_from_kp2d(kp_2d: np.ndarray) -> np.ndarray:
    """Square 1.1x bbox (cx, cy, w, h) around nonzero keypoints.
    (/root/reference/lib/data_utils/img_utils.py:12-30.)"""
    pts = kp_2d[~np.all(kp_2d == 0, axis=1)]
    ul = pts[:, :2].min(axis=0)
    lr = pts[:, :2].max(axis=0)
    w, h = lr - ul
    c = ul + np.array([w, h]) / 2
    side = (w if h == 0 or w / max(h, 1e-9) > 1 else h) * 1.1
    return np.array([c[0], c[1], side, side])


def _valid_mask(n: int) -> np.ndarray:
    valid = np.zeros([n, 49, 1])
    valid[:, 25:39, :] = 1
    valid[:, (39, 41, 43), :] = 1
    return valid


def read_data_train(dataset_path, user_list, seq_list, vid_list):
    import scipy.io as sio

    h = w = 2048
    dataset = {k: [] for k in (
        "vid_name", "frame_id", "joints3D", "joints2D", "bbox", "img_name",
    )}

    for user_i in user_list:
        for seq_i in seq_list:
            seq_path = osp.join(dataset_path, f"S{user_i}", f"Seq{seq_i}")
            annot_file = osp.join(seq_path, "annot.mat")
            annot2 = sio.loadmat(annot_file)["annot2"]
            annot3 = sio.loadmat(annot_file)["annot3"]
            for vid_i in vid_list:
                imgs_path = osp.join(seq_path, f"video_{vid_i}")
                if not os.path.isdir(imgs_path):
                    continue
                img_list = sorted(glob.glob(osp.join(imgs_path, "*.jpg")))
                vid_uniq_id = f"subj{user_i}_seq{seq_i}_vid{vid_i}_seg0"
                for i, img_i in enumerate(img_list):
                    j2d_raw = np.reshape(annot2[vid_i][0][i], (1, 28, 2))
                    j2d_raw = np.append(j2d_raw, np.ones((1, 28, 1)), axis=2)
                    j2d = convert_kps(j2d_raw, "mpii3d", "spin").reshape(-1, 3)

                    j3d_raw = np.reshape(annot3[vid_i][0][i], (1, 28, 3)) / 1000
                    j3d = convert_kps(j3d_raw, "mpii3d", "spin").reshape(-1, 3)
                    j3d = j3d - j3d[39]  # root-center at the pelvis slot

                    ok = (
                        (j2d[:, 0] >= 0) & (j2d[:, 0] < w)
                        & (j2d[:, 1] >= 0) & (j2d[:, 1] < h)
                    )
                    if ok.sum() < j2d.shape[0]:
                        # out-of-frame joints break the track into a new segment
                        last = int(dataset["vid_name"][-1].split("_")[-1][3:]) if dataset["vid_name"] else 0
                        vid_uniq_id = "_".join(vid_uniq_id.split("_")[:-1]) + f"_seg{last + 1}"
                        continue

                    dataset["vid_name"].append(vid_uniq_id)
                    dataset["frame_id"].append(osp.basename(img_i).split(".")[0])
                    dataset["img_name"].append(img_i)
                    dataset["joints2D"].append(j2d)
                    dataset["joints3D"].append(j3d)
                    dataset["bbox"].append(bbox_from_kp2d(j2d))

    for k in dataset:
        dataset[k] = np.array(dataset[k])
    dataset["joints3D"] = np.concatenate(
        [dataset["joints3D"], _valid_mask(len(dataset["joints3D"]))], axis=-1
    )
    return dataset


def read_test_data(dataset_path):
    import cv2
    import h5py

    dataset = {k: [] for k in (
        "vid_name", "frame_id", "joints3D", "joints2D", "bbox", "img_name",
        "valid_i",
    )}

    for user_i in range(1, 7):
        seq_path = osp.join(dataset_path, "mpi_inf_3dhp_test_set", f"TS{user_i}")
        with h5py.File(osp.join(seq_path, "annot_data.mat"), "r") as m:
            annot2 = np.array(m["annot2"])
            annot3 = np.array(m["univ_annot3"])
            valid = np.array(m["valid_frame"])

        vid_uniq_id = f"subj{user_i}_seg0"
        for frame_i, valid_i in enumerate(valid):
            img_i = osp.join(
                "mpi_inf_3dhp_test_set", f"TS{user_i}", "imageSequence",
                f"img_{frame_i + 1:06d}.jpg",
            )
            j2d_raw = np.append(
                annot2[frame_i, 0][None], np.ones((1, 17, 1)), axis=2
            )
            j2d = convert_kps(j2d_raw, "mpii3d_test", "spin").reshape(-1, 3)
            j3d = convert_kps(
                np.reshape(annot3[frame_i, 0], (1, 17, 3)) / 1000,
                "mpii3d_test", "spin",
            ).reshape(-1, 3)
            j3d = j3d - j3d[39]

            img_file = osp.join(dataset_path, img_i)
            im = cv2.imread(img_file)
            if im is None:
                continue
            h, w = im.shape[:2]
            ok = (
                (j2d[:, 0] >= 0) & (j2d[:, 0] < w)
                & (j2d[:, 1] >= 0) & (j2d[:, 1] < h)
            )
            if ok.sum() < j2d.shape[0]:
                last = int(dataset["vid_name"][-1].split("_")[-1][3:]) if dataset["vid_name"] else 0
                vid_uniq_id = "_".join(vid_uniq_id.split("_")[:-1]) + f"_seg{last + 1}"
                continue

            dataset["vid_name"].append(vid_uniq_id)
            dataset["frame_id"].append(osp.basename(img_file).split(".")[0])
            dataset["img_name"].append(img_file)
            dataset["joints2D"].append(j2d)
            dataset["joints3D"].append(j3d)
            dataset["bbox"].append(bbox_from_kp2d(j2d))
            dataset["valid_i"].append(valid_i)

    for k in dataset:
        dataset[k] = np.array(dataset[k])
    dataset["joints3D"] = np.concatenate(
        [dataset["joints3D"], _valid_mask(len(dataset["joints3D"]))], axis=-1
    )
    return dataset


def main():
    from maed_tpu.core import config as cfg_mod

    parser = argparse.ArgumentParser()
    parser.add_argument("--inp_dir", type=str, default=cfg_mod.MPII3D_DIR)
    parser.add_argument("--out_dir", type=str, default=cfg_mod.DB_DIR)
    parser.add_argument("--sub", nargs="+", type=int, default=[1, 2, 3, 4, 5, 6, 7, 8])
    parser.add_argument("--seq", nargs="+", type=int, default=[1, 2])
    parser.add_argument("--vid", nargs="+", type=int, default=list(range(9)))
    parser.add_argument("--test", action="store_true", help="build the test DB too")
    args = parser.parse_args()

    db = read_data_train(args.inp_dir, args.sub, args.seq, args.vid)
    joblib.dump(db, osp.join(args.out_dir, "mpii3d_train_db.pt"))
    print(f"wrote mpii3d_train_db.pt: {len(db['img_name'])} frames")
    if args.test:
        db = read_test_data(args.inp_dir)
        joblib.dump(db, osp.join(args.out_dir, "mpii3d_val_db.pt"))
        print(f"wrote mpii3d_val_db.pt: {len(db['img_name'])} frames")


if __name__ == "__main__":
    main()
