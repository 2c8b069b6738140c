"""On-device evaluation metrics: MPJPE / PA-MPJPE / PVE / ACCEL.

Parity targets:
  /root/reference/lib/core/evaluate.py:135-179  (metric assembly)
  /root/reference/lib/utils/eval_utils.py:10-89 (accel / accel_err / PVE)

All metrics are pure jnp and jit-able, so the whole eval loop (model forward +
Procrustes + metric reduction) runs on TPU; only final scalars come back to
host. Pelvis convention: joints [2] and [3] are the two hips in the J14/J17
eval spaces.
"""

from __future__ import annotations

import jax.numpy as jnp

from maed_tpu.ops.procrustes import batch_similarity_transform


def pelvis_center(joints: jnp.ndarray) -> jnp.ndarray:
    pelvis = (joints[..., 2:3, :] + joints[..., 3:4, :]) / 2.0
    return joints - pelvis


def mpjpe(pred_j3d: jnp.ndarray, gt_j3d: jnp.ndarray) -> jnp.ndarray:
    """Per-frame mean joint error, (N, K, 3) -> (N,). Inputs pre-centered."""
    return jnp.sqrt(((pred_j3d - gt_j3d) ** 2).sum(-1)).mean(-1)


def pa_mpjpe(pred_j3d: jnp.ndarray, gt_j3d: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned per-frame error, (N, K, 3) -> (N,)."""
    aligned = batch_similarity_transform(pred_j3d, gt_j3d)
    return jnp.sqrt(((aligned - gt_j3d) ** 2).sum(-1)).mean(-1)


def vert_error(pred_verts: jnp.ndarray, gt_verts: jnp.ndarray) -> jnp.ndarray:
    """PVE, (N, V, 3) -> (N,)."""
    return jnp.sqrt(((pred_verts - gt_verts) ** 2).sum(-1)).mean(-1)


def accel(joints: jnp.ndarray) -> jnp.ndarray:
    """Acceleration magnitude of a joint sequence, (N, K, 3) -> (N-2,)."""
    vel = joints[1:] - joints[:-1]
    acc = vel[1:] - vel[:-1]
    return jnp.linalg.norm(acc, axis=-1).mean(-1)


def accel_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Acceleration error between sequences, (N, K, 3) -> (N-2,)."""
    acc_gt = gt[:-2] - 2 * gt[1:-1] + gt[2:]
    acc_pred = pred[:-2] - 2 * pred[1:-1] + pred[2:]
    return jnp.linalg.norm(acc_pred - acc_gt, axis=-1).mean(-1)


def eval_metrics(pred_j3d, target_j3d, vis=None):
    """The reference's metric block: vis-mask, pelvis-center, MPJPE/PA-MPJPE.

    pred_j3d, target_j3d: (N, K, 3); vis: (N, K, 1) or None.
    Returns dict of per-frame arrays (meters); caller scales to mm / averages.

    Visibility semantics: joints with vis=0 are zeroed on both sides before
    centering/Procrustes (static shapes, same as the reference's `*= vis` at
    /root/reference/lib/core/evaluate.py:144-145) and then *excluded* from the
    per-frame joint mean — the select semantics of the reference's
    valid_joints filter (evaluate.py:69), kept per-frame here instead of
    dividing by a fixed K (which would deflate MPJPE whenever a joint is
    invisible mid-sequence, e.g. mpii3d). All-visible datasets (3dpw) are
    bit-identical either way. ACCEL keeps the reference's fixed-K mean.
    """
    if vis is not None:
        pred_j3d = pred_j3d * vis
        target_j3d = target_j3d * vis
        vis_k = vis[..., 0]  # (N, K)
    else:
        vis_k = jnp.ones(pred_j3d.shape[:-1], pred_j3d.dtype)
    pred_c = pelvis_center(pred_j3d)
    target_c = pelvis_center(target_j3d)
    n_vis = jnp.maximum(vis_k.sum(-1), 1.0)

    err = jnp.sqrt(((pred_c - target_c) ** 2).sum(-1))  # (N, K)
    aligned = batch_similarity_transform(pred_c, target_c)
    err_pa = jnp.sqrt(((aligned - target_c) ** 2).sum(-1))
    return {
        "mpjpe": (err * vis_k).sum(-1) / n_vis,
        "pa_mpjpe": (err_pa * vis_k).sum(-1) / n_vis,
        "accel": accel(pred_c),
        "accel_err": accel_error(pred_c, target_c),
    }
