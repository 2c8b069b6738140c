"""Training losses in pure jnp with static-shape masked reductions.

Parity target: /root/reference/lib/core/loss.py:8-345. The reference's
boolean-mask indexing (`pred_pose[w_smpl]`, data-dependent shapes) is recast
as confidence/validity-weighted reductions with matching normalization, so a
single jitted train step covers every batch composition.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from maed_tpu.ops.geometry import rodrigues


class LossWeights(NamedTuple):
    kp_2d: float = 60.0
    kp_3d: float = 30.0
    shape: float = 0.001
    pose: float = 1.0
    norm: float = 1.0
    accl: float = 0.0


def _flatten_video(x):
    """(N, T, ...) -> (N*T, ...); passthrough for image batches."""
    if x.ndim > 3:
        return x.reshape((-1,) + x.shape[2:])
    return x


def keypoint_2d_loss(pred_kp2d, gt_kp2d):
    """Confidence-weighted MSE over 2D keypoints.

    pred: (..., K, 2); gt: (..., K, 3) with confidence in the last channel.
    """
    pred = _flatten_video(pred_kp2d)
    gt = _flatten_video(gt_kp2d)
    conf = gt[..., -1:]
    return (conf * (pred - gt[..., :-1]) ** 2).mean()


def keypoint_3d_loss(pred_kp3d, gt_kp3d):
    """Pelvis-centered confidence-weighted MSE on the 49-joint space.

    pred: (..., 49, 3); gt: (..., 49, 4). Pelvis = mean of joints 27, 28
    (25+2, 25+3 — the GT hips in the 49 convention).
    """
    pred = _flatten_video(pred_kp3d)
    gt = _flatten_video(gt_kp3d)
    conf = gt[..., -1:]
    gt = gt[..., :-1]
    gt_pelvis = (gt[:, 25 + 2] + gt[:, 25 + 3]) / 2
    pred_pelvis = (pred[:, 25 + 2] + pred[:, 25 + 3]) / 2
    gt = gt - gt_pelvis[:, None]
    pred = pred - pred_pelvis[:, None]
    return (conf * (pred - gt) ** 2).mean()


def smpl_losses(pred_pose, pred_shape, gt_pose, gt_shape, w_smpl=None):
    """Masked MSE on Rodrigues rotation matrices and betas.

    pred/gt pose: (..., 72); shapes: (..., 10); w_smpl: (...) validity or None
    for unmasked (all rows). Normalization matches the reference's mean over
    the *selected* rows. The reference only applies the w_smpl selection to
    video batches (the `len(pred_pose.shape) > 2` guard,
    /root/reference/lib/core/loss.py:75-81) — image batches pass w_smpl but it
    is silently ignored; callers reproduce that by passing w_smpl=None.
    """
    pose_p = pred_pose.reshape((-1, pred_pose.shape[-1]))
    pose_g = gt_pose.reshape((-1, gt_pose.shape[-1]))
    shape_p = pred_shape.reshape((-1, pred_shape.shape[-1]))
    shape_g = gt_shape.reshape((-1, gt_shape.shape[-1]))
    if w_smpl is None:
        w = jnp.ones((pose_p.shape[0],), pose_p.dtype)
    else:
        w = w_smpl.reshape(-1).astype(pose_p.dtype)

    X = pose_p.shape[0]
    rm_p = rodrigues(pose_p.reshape(X * 24, 3)).reshape(X, -1)
    rm_g = rodrigues(pose_g.reshape(X * 24, 3)).reshape(X, -1)

    n_sel = jnp.maximum(w.sum(), 1.0)
    loss_pose = (w[:, None] * (rm_p - rm_g) ** 2).sum() / (n_sel * rm_p.shape[1])
    loss_shape = (w[:, None] * (shape_p - shape_g) ** 2).sum() / (n_sel * shape_p.shape[1])
    return loss_pose, loss_shape


def accl_loss(pred_kp3d, gt_kp3d):
    """Second-difference acceleration MSE, confidence-gated.

    pred: (N, T, 49, 3); gt: (N, T, 49, 4).
    """
    conf = gt_kp3d[..., -1:]
    # reference gate: ((conf[:,1:])^2)[:,1:]^2 == conf[:,2:] ** 4
    conf_acc = conf[:, 2:] ** 4
    dd = lambda x: x[:, 2:] - 2 * x[:, 1:-1] + x[:, :-2]
    pred_acc = dd(pred_kp3d) * conf_acc
    gt_acc = dd(gt_kp3d[..., :3]) * conf_acc
    return ((pred_acc - gt_acc) ** 2).mean()


def theta_norm_loss(pred_theta):
    """Frobenius norm of (pose||shape) over the batch, / nt."""
    flat = pred_theta.reshape((-1, pred_theta.shape[-1]))[:, 3:]
    nt = flat.shape[0]
    return jnp.sqrt((flat ** 2).sum()) / nt


def video_loss(
    preds: Dict[str, jnp.ndarray],
    data_3d: Dict[str, jnp.ndarray],
    data_2d: Optional[Dict[str, jnp.ndarray]],
    w: LossWeights,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Video-batch loss: 2D kps over the whole (2D||3D) batch, 3D terms on the
    3D slice only. Slice boundary is the static 2D batch size."""
    if data_2d is not None:
        n2d = data_2d["kp_2d"].shape[0]
        gt_j2d = jnp.concatenate([data_2d["kp_2d"], data_3d["kp_2d"]], axis=0)
    else:
        n2d = 0
        gt_j2d = data_3d["kp_2d"]

    pred_j2d = preds["kp_2d"]
    pred_j3d = preds["kp_3d"][n2d:]
    pred_theta = preds["theta"][n2d:]

    loss_dict = {
        "loss_kp_2d": w.kp_2d * keypoint_2d_loss(pred_j2d, gt_j2d),
        "loss_kp_3d": w.kp_3d * keypoint_3d_loss(pred_j3d, data_3d["kp_3d"]),
    }

    gt_theta = data_3d["theta"]
    if w.shape > 0 and w.pose > 0:
        loss_pose, loss_shape = smpl_losses(
            pred_theta[..., 3:75], pred_theta[..., 75:],
            gt_theta[..., 3:75], gt_theta[..., 75:],
            data_3d["w_smpl"],
        )
        loss_dict["loss_shape"] = w.shape * loss_shape
        loss_dict["loss_pose"] = w.pose * loss_pose

    if w.norm > 0:
        loss_dict["loss_norm"] = w.norm * theta_norm_loss(pred_theta)

    if w.accl > 0:
        loss_dict["loss_accl"] = w.accl * accl_loss(pred_j3d, data_3d["kp_3d"])

    total = sum(loss_dict.values())
    return total, loss_dict


def image_loss(
    preds: Dict[str, jnp.ndarray],
    target: Dict[str, jnp.ndarray],
    w: LossWeights,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Image-batch loss; preds carry a fake T=1 axis that is squeezed.

    Parity notes vs /root/reference/lib/core/loss.py:214-282: the 3D keypoint
    weight is cfg.LOSS.KP_3D_W (the reference's Loss passes e_3d_loss_weight
    into LossImage, loss.py:305-310); smpl_losses runs UNMASKED on image
    batches (the reference's w_smpl selection only fires for video inputs)."""
    pred_j2d = preds["kp_2d"][:, 0]
    pred_j3d = preds["kp_3d"][:, 0]
    pred_theta = preds["theta"][:, 0]

    loss_dict = {
        "loss_kp_2d": w.kp_2d * keypoint_2d_loss(pred_j2d, target["kp_2d"]),
    }
    if "kp_3d" in target:
        loss_dict["loss_kp_3d"] = w.kp_3d * keypoint_3d_loss(pred_j3d, target["kp_3d"])

    gt_theta = target["theta"]
    if w.shape > 0 and w.pose > 0:
        loss_pose, loss_shape = smpl_losses(
            pred_theta[:, 3:75], pred_theta[:, 75:],
            gt_theta[:, 3:75], gt_theta[:, 75:],
            w_smpl=None,
        )
        loss_dict["loss_shape"] = w.shape * loss_shape
        loss_dict["loss_pose"] = w.pose * loss_pose

    if w.norm > 0:
        loss_dict["loss_norm"] = w.norm * theta_norm_loss(pred_theta)

    total = sum(loss_dict.values())
    return total, loss_dict


def encoder_disc_l2_loss(disc_value):
    """Generator-side LSGAN loss (kept for the adversarial-training variant;
    unused by the released recipe, like the reference's dead code at
    /root/reference/lib/core/loss.py:355-362)."""
    return jnp.sum((disc_value - 1.0) ** 2) / disc_value.shape[0]


def adv_disc_l2_loss(real_disc_value, fake_disc_value):
    la = jnp.sum((real_disc_value - 1.0) ** 2) / real_disc_value.shape[0]
    lb = jnp.sum(fake_disc_value ** 2) / fake_disc_value.shape[0]
    return la, lb, la + lb


def encoder_disc_wasserstein_loss(disc_value):
    return -jnp.sum(disc_value) / disc_value.shape[0]


def adv_disc_wasserstein_loss(real_disc_value, fake_disc_value):
    la = -jnp.sum(real_disc_value) / real_disc_value.shape[0]
    lb = jnp.sum(fake_disc_value) / fake_disc_value.shape[0]
    return la, lb, la + lb


def smooth_pose_loss(pred_theta):
    """Mean first-difference of the pose track (reference loss.py:398-401)."""
    pose = pred_theta[:, :, 3:75]
    return jnp.abs(jnp.mean(pose[:, 1:] - pose[:, :-1]))


def smooth_shape_loss(pred_theta):
    shape = pred_theta[:, :, 75:]
    return jnp.abs(jnp.mean(shape[:, 1:] - shape[:, :-1]))


def merge_loss(loss_vid, loss_vid_dict, loss_img, loss_img_dict, vid_w=1.0, img_w=1.0):
    """Weighted merge of the video and image loss terms (per-sample-count
    weighting computed by the trainer)."""
    keys = set(loss_vid_dict) | set(loss_img_dict)
    merged = {}
    for k in keys:
        v = 0.0
        if k in loss_vid_dict:
            v = v + loss_vid_dict[k] * vid_w
        if k in loss_img_dict:
            v = v + loss_img_dict[k] * img_w
        merged[k] = v
    return loss_vid * vid_w + loss_img * img_w, merged
