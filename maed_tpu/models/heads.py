"""Shared decoder output head: 6D pose -> SMPL -> joints -> reprojection.

Parity target: /root/reference/lib/models/ktd.py:94-124 and
/root/reference/lib/models/spin.py:87-110 (`get_output`), as one pure function
shared by both decoders. Runs entirely on device inside the model jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maed_tpu.ops.geometry import rot6d_to_rotmat, rotmat_to_aa, weak_perspective_projection
from maed_tpu.ops.smpl import SMPLModel, smpl_forward

_einsum_hi = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def regressor_output(
    smpl_model: SMPLModel,
    pred_pose6d: jnp.ndarray,   # (nt, 24*6)
    pred_shape: jnp.ndarray,    # (nt, 10)
    pred_cam: jnp.ndarray,      # (nt, 3)
    J_regressor: jnp.ndarray | None = None,  # (J, V) eval-protocol regressor
):
    nt = pred_pose6d.shape[0]
    rotmat = rot6d_to_rotmat(pred_pose6d).reshape(nt, 24, 3, 3)

    out = smpl_forward(smpl_model, pred_shape, pose_rotmats=rotmat)
    verts = out["vertices"]
    joints = out["joints"]
    if J_regressor is not None:
        # Eval protocol: regress H36M-space joints from the posed mesh.
        joints = _einsum_hi("jv,bvk->bjk", J_regressor, verts)

    kp_2d = weak_perspective_projection(joints, pred_cam)
    pose_aa = rotmat_to_aa(rotmat.reshape(-1, 3, 3)).reshape(nt, -1)
    theta = jnp.concatenate([pred_cam, pose_aa, pred_shape], axis=1)  # (nt, 85)

    return {
        "theta": theta,
        "verts": verts,
        "kp_2d": kp_2d,
        "kp_3d": joints,
        "rotmat": rotmat,
    }
