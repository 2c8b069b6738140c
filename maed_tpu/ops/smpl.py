"""Native SMPL body model as a TPU-friendly vectorized kernel.

The reference delegates SMPL forward kinematics to the external `smplx==0.1.13`
package (/root/reference/lib/models/smpl.py:84-106 wraps it to emit 49 joints).
Here the whole pipeline — shape blendshapes, pose blendshapes, kinematic-chain
rigid transforms, linear blend skinning, surface-keypoint selection, and extra
joint regression — is one pure jnp function batched over N*T frames:

  * blendshape and skinning contractions are large matmuls that map onto the
    MXU ((B,10)x(10,3V), (B,207)x(207,3V), (V,24)x(B,24,16));
  * the 24-joint kinematic chain is a statically unrolled sequence of (B,4,4)
    matmuls (23 steps, compile-time constant tree);
  * everything traces under jit/vmap/grad with static shapes.

Numerics-critical contractions use HIGHEST matmul precision: the PVE parity
budget (0.5 mm on a ~1.7 m mesh) is well below the MXU's bf16 default pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from maed_tpu.ops.geometry import rodrigues
from maed_tpu.ops.joints import JOINT_SELECT, SMPL_PARENTS, VERTEX_JOINT_IDS

_HIGH = jax.lax.Precision.HIGHEST
_einsum = functools.partial(jnp.einsum, precision=_HIGH)

NUM_JOINTS = 24
NUM_BETAS = 10


class SMPLModel(NamedTuple):
    """Static SMPL model tensors (a pytree of jnp arrays).

    V = number of mesh vertices (6890 for the real model).
    """

    v_template: jnp.ndarray       # (V, 3)
    shapedirs: jnp.ndarray        # (V, 3, 10)
    posedirs: jnp.ndarray         # (207, V*3) — smplx layout (reshaped+transposed)
    J_regressor: jnp.ndarray      # (24, V)
    lbs_weights: jnp.ndarray      # (V, 24)
    parents: tuple                # static 24-tuple of ints
    vertex_joint_ids: jnp.ndarray  # (21,) int — surface keypoint vertex indices
    J_regressor_extra: jnp.ndarray  # (9, V)
    joint_select: jnp.ndarray     # (49,) int — 54-bank -> 49 output joints
    faces: np.ndarray | None = None  # (F, 3) int, host-side only (rendering)


def blend_shapes(betas: jnp.ndarray, shapedirs: jnp.ndarray) -> jnp.ndarray:
    """(B, 10) x (V, 3, 10) -> (B, V, 3)."""
    return _einsum("bl,mkl->bmk", betas, shapedirs)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return _einsum("bik,ji->bjk", vertices, J_regressor)


def batch_rigid_transform(rot_mats, joints, parents):
    """Rigid forward kinematics along the SMPL tree.

    rot_mats: (B, 24, 3, 3); joints: (B, 24, 3); parents: static tuple.
    Returns (posed_joints (B, 24, 3), rel_transforms (B, 24, 4, 4)).
    """
    rel_joints = joints.at[:, 1:].add(-joints[:, list(parents[1:])])

    # (B, 24, 4, 4) local transforms.
    tmat = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)
    pad = jnp.zeros_like(tmat[..., :1, :]).at[..., 0, 3].set(1.0)
    tmat = jnp.concatenate([tmat, pad], axis=-2)

    chain = [tmat[:, 0]]
    for i in range(1, len(parents)):
        chain.append(
            jnp.matmul(chain[parents[i]], tmat[:, i], precision=_HIGH)
        )
    transforms = jnp.stack(chain, axis=1)  # (B, 24, 4, 4)

    posed_joints = transforms[:, :, :3, 3]

    # Remove the rest-pose joint locations from the transforms so they act on
    # rest-pose vertices: A = T - [0 | T @ [j; 0]].
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    shifted = jnp.matmul(transforms, joints_h[..., None], precision=_HIGH)[..., 0]
    rel_transforms = transforms.at[:, :, :, 3].add(-shifted)
    return posed_joints, rel_transforms


def lbs(model: SMPLModel, betas: jnp.ndarray, rot_mats: jnp.ndarray):
    """Linear blend skinning.

    betas: (B, 10); rot_mats: (B, 24, 3, 3).
    Returns (vertices (B, V, 3), skeleton joints (B, 24, 3)).
    """
    B = betas.shape[0]
    V = model.v_template.shape[0]

    v_shaped = model.v_template[None] + blend_shapes(betas, model.shapedirs)
    J = vertices2joints(model.J_regressor, v_shaped)

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, 207)
    pose_offsets = jnp.matmul(pose_feature, model.posedirs, precision=_HIGH)
    v_posed = v_shaped + pose_offsets.reshape(B, V, 3)

    posed_joints, A = batch_rigid_transform(rot_mats, J, model.parents)

    # Skinning: T = sum_j w_vj A_j, applied to homogeneous rest vertices.
    from maed_tpu.ops.smpl_pallas import pallas_lbs_enabled, skinning_vjp

    if pallas_lbs_enabled():
        verts = skinning_vjp(v_posed, model.lbs_weights, A)
    else:
        T = _einsum("vj,bjpq->bvpq", model.lbs_weights, A)
        v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
        verts = _einsum("bvpq,bvq->bvp", T[..., :3, :], v_h)
    return verts, posed_joints


def smpl_forward(
    model: SMPLModel,
    betas: jnp.ndarray,
    global_orient: jnp.ndarray | None = None,
    body_pose: jnp.ndarray | None = None,
    pose_rotmats: jnp.ndarray | None = None,
    pose_axis_angle: jnp.ndarray | None = None,
):
    """Full SMPL forward to (vertices, 49 joints).

    Accepts either:
      * pose_rotmats (B, 24, 3, 3), or global_orient (B, 1, 3, 3) +
        body_pose (B, 23, 3, 3)  [the KTD/SPIN decoder path, pose2rot=False]
      * pose_axis_angle (B, 72)  [the GT-verts path, pose2rot=True]

    Returns dict with 'vertices' (B, V, 3), 'joints' (B, 49, 3),
    'joints24' (B, 24, 3).
    """
    if pose_rotmats is None:
        if pose_axis_angle is not None:
            B = pose_axis_angle.shape[0]
            pose_rotmats = rodrigues(pose_axis_angle.reshape(B, 24, 3))
        else:
            pose_rotmats = jnp.concatenate([global_orient, body_pose], axis=1)

    verts, joints24 = lbs(model, betas, pose_rotmats)

    # 54-joint bank: 24 skeleton + 21 surface keypoints + 9 extra regressed.
    vertex_joints = verts[:, model.vertex_joint_ids]
    extra_joints = vertices2joints(model.J_regressor_extra, verts)
    bank = jnp.concatenate([joints24, vertex_joints, extra_joints], axis=1)
    joints = bank[:, model.joint_select]

    return {"vertices": verts, "joints": joints, "joints24": joints24}


def make_model(
    v_template,
    shapedirs,
    posedirs_raw,
    J_regressor,
    lbs_weights,
    J_regressor_extra,
    faces=None,
    vertex_joint_ids=None,
    dtype=jnp.float32,
) -> SMPLModel:
    """Assemble an SMPLModel from raw (numpy) tensors.

    posedirs_raw: (V, 3, 207) as stored in the SMPL pickle; converted to the
    (207, 3V) matmul layout here. vertex_joint_ids defaults to the real-mesh
    indices; synthetic test models pass their own.
    """
    posedirs = np.asarray(posedirs_raw, np.float64).reshape(-1, posedirs_raw.shape[-1]).T
    if vertex_joint_ids is None:
        vertex_joint_ids = VERTEX_JOINT_IDS
    return SMPLModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(np.asarray(shapedirs)[..., :NUM_BETAS], dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(J_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=tuple(SMPL_PARENTS),
        vertex_joint_ids=jnp.asarray(vertex_joint_ids, jnp.int32),
        J_regressor_extra=jnp.asarray(J_regressor_extra, dtype),
        joint_select=jnp.asarray(JOINT_SELECT, jnp.int32),
        faces=None if faces is None else np.asarray(faces, np.int32),
    )
