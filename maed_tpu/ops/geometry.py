"""Rotation-representation kernels, vectorized over arbitrary leading axes.

Functional parity targets (see reference for the exact semantics being matched):
  /root/reference/lib/utils/geometry.py:12-24   (batch_rodrigues)
  /root/reference/lib/utils/geometry.py:27-55   (quat2mat)
  /root/reference/lib/utils/geometry.py:58-223  (rotmat<->quat<->axis-angle)
  /root/reference/lib/utils/geometry.py:298-333 (rot6d_to_rotmat)
  /root/reference/lib/models/spin.py:113-157    (weak-perspective projection)

All functions are pure jnp and trace cleanly under jit/vmap/grad. Everything is
computed in float32 by default; pass bfloat16 inputs for low-precision paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _norm(x, axis=-1, keepdims=False, eps=0.0):
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix.

    quat: (..., 4). Returns (..., 3, 3).
    """
    q = quat / _norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Matches the reference's epsilon placement: the angle is the norm of
    (axisang + 1e-8), so the zero rotation maps to (numerically) identity
    without NaNs and gradients stay finite.
    """
    angle = _norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def rotmat_to_quat(rotmat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (w, x, y, z) (..., 4).

    Branch-free port of the 4-case Shepperd-style algorithm (the same case
    selection and normalization as the reference), implemented with masked
    selects so it vectorizes on the VPU.
    """
    shape = rotmat.shape[:-2]
    m = rotmat.reshape((-1, 3, 3))
    # The reference operates on the transpose of the rotation matrix.
    t = jnp.swapaxes(m, -1, -2)
    t00, t01, t02 = t[:, 0, 0], t[:, 0, 1], t[:, 0, 2]
    t10, t11, t12 = t[:, 1, 0], t[:, 1, 1], t[:, 1, 2]
    t20, t21, t22 = t[:, 2, 0], t[:, 2, 1], t[:, 2, 2]

    mask_d2 = t22 < eps
    mask_d0_d1 = t00 > t11
    mask_d0_nd1 = t00 < -t11

    s0 = 1 + t00 - t11 - t22
    q0 = jnp.stack([t12 - t21, s0, t01 + t10, t20 + t02], axis=-1)

    s1 = 1 - t00 + t11 - t22
    q1 = jnp.stack([t20 - t02, t01 + t10, s1, t12 + t21], axis=-1)

    s2 = 1 - t00 - t11 + t22
    q2 = jnp.stack([t01 - t10, t20 + t02, t12 + t21, s2], axis=-1)

    s3 = 1 + t00 + t11 + t22
    q3 = jnp.stack([s3, t12 - t21, t20 - t02, t01 - t10], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)[:, None]
    c1 = (mask_d2 & ~mask_d0_d1)[:, None]
    c2 = (~mask_d2 & mask_d0_nd1)[:, None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[:, None]

    q = jnp.where(c0, q0, 0) + jnp.where(c1, q1, 0) + jnp.where(c2, q2, 0) + jnp.where(c3, q3, 0)
    s = (
        jnp.where(c0[:, 0], s0, 0)
        + jnp.where(c1[:, 0], s1, 0)
        + jnp.where(c2[:, 0], s2, 0)
        + jnp.where(c3[:, 0], s3, 0)
    )
    q = q / jnp.sqrt(s)[:, None] * 0.5
    return q.reshape(shape + (4,))


def quat_to_aa(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) (..., 4) -> axis-angle (..., 3) (ceres-style)."""
    q1, q2, q3 = quaternion[..., 1], quaternion[..., 2], quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(sin_sq)
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    # Avoid 0/0: where sin_sq == 0 use the small-angle limit k = 2.
    safe_sin = jnp.where(sin_sq > 0.0, sin_theta, 1.0)
    k = jnp.where(sin_sq > 0.0, two_theta / safe_sin, 2.0)
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def rotmat_to_aa(rotmat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3); NaNs mapped to 0."""
    aa = quat_to_aa(rotmat_to_quat(rotmat))
    return jnp.where(jnp.isnan(aa), 0.0, aa)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> rotation matrices.

    Zhou et al. CVPR'19 Gram-Schmidt construction. Matches the reference's
    `view(-1, 3, 2)` semantics: the input is flattened into consecutive
    6-tuples (row-major (3, 2) blocks), so (B, 6) -> (B, 3, 3) and a packed
    (nt, 24*6) pose -> (nt*24, 3, 3). Leading axes beyond the 6-tuple count
    are collapsed; callers reshape as needed.
    """
    assert x.size % 6 == 0, f"rot6d input size {x.shape} not divisible by 6"
    shape = x.shape[:-1] if x.shape[-1] == 6 else (x.size // 6,)
    m = x.reshape((-1, 3, 2))
    a1, a2 = m[:, :, 0], m[:, :, 1]
    # F.normalize(v, eps=1e-6): v / max(||v||, eps)
    n1 = jnp.maximum(_norm(a1, axis=-1, keepdims=True), 1e-6)
    b1 = a1 / n1
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    u2 = a2 - dot * b1
    n2 = jnp.maximum(_norm(u2, axis=-1, keepdims=True), 1e-6)
    b2 = u2 / n2
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1).reshape(shape + (3, 3))


def perspective_projection(
    points: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length: float = 5000.0,
    camera_center=None,
    rotation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pinhole projection of (..., N, 3) points given (..., 3) translation.

    Mirrors /root/reference/lib/models/spin.py:129-157 with identity rotation
    and zero camera center as the defaults used in the training/eval path.
    """
    if rotation is not None:
        points = jnp.einsum("...ij,...kj->...ki", rotation, points)
    points = points + translation[..., None, :]
    projected = points / points[..., -1:]
    xy = projected[..., :2] * focal_length
    if camera_center is not None:
        xy = xy + camera_center[..., None, :]
    return xy


def estimate_translation(
    S: jnp.ndarray,
    joints_2d: jnp.ndarray,
    focal_length: float = 5000.0,
    img_size: float = 224.0,
    use_joints_slice: bool = True,
) -> jnp.ndarray:
    """Least-squares camera translation bringing 3D joints onto 2D keypoints.

    Parity target: /root/reference/lib/utils/geometry.py:226-295, batched and
    solved on device (normal equations instead of a per-sample numpy loop).

    S: (B, K, 3) 3D joints; joints_2d: (B, K, 3) 2D keypoints with confidence.
    With use_joints_slice, only the GT joints 25:49 are used (the reference's
    convention for the 49-joint format). Returns (B, 3).
    """
    if use_joints_slice:
        S = S[:, 25:, :]
        joints_2d = joints_2d[:, 25:, :]
    conf = joints_2d[..., 2]
    xy = joints_2d[..., :2]

    B, K = S.shape[:2]
    f = focal_length
    center = img_size / 2.0

    # Rows: for each joint k two equations
    #   f * tx + (cx - u_k) * tz = (u_k - cx) * Z_k - f * X_k
    #   f * ty + (cy - v_k) * tz = (v_k - cy) * Z_k - f * Y_k
    # weighted by sqrt(conf_k).
    w = jnp.sqrt(jnp.maximum(conf, 0.0))[..., None]  # (B, K, 1)
    O = center
    Z = S[..., 2]

    rows_x = jnp.stack(
        [jnp.full((B, K), f), jnp.zeros((B, K)), O - xy[..., 0]], axis=-1
    )
    rows_y = jnp.stack(
        [jnp.zeros((B, K)), jnp.full((B, K), f), O - xy[..., 1]], axis=-1
    )
    Q = jnp.concatenate([rows_x * w, rows_y * w], axis=1)  # (B, 2K, 3)
    c_x = (xy[..., 0] - O) * Z - f * S[..., 0]
    c_y = (xy[..., 1] - O) * Z - f * S[..., 1]
    c = jnp.concatenate([c_x * w[..., 0], c_y * w[..., 0]], axis=1)  # (B, 2K)

    A = jnp.einsum("bki,bkj->bij", Q, Q, precision=jax.lax.Precision.HIGHEST)
    b = jnp.einsum("bki,bk->bi", Q, c, precision=jax.lax.Precision.HIGHEST)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def weak_perspective_projection(
    pred_joints: jnp.ndarray, pred_camera: jnp.ndarray, img_res: float = 224.0
) -> jnp.ndarray:
    """SPIN-style weak-perspective reprojection to [-1, 1] image coords.

    pred_joints: (..., N, 3); pred_camera: (..., 3) = (s, tx, ty).
    Equivalent to translating by (tx, ty, 2f/(img_res*s)) and projecting with
    focal length f=5000, then dividing by img_res/2.
    """
    s, tx, ty = pred_camera[..., 0], pred_camera[..., 1], pred_camera[..., 2]
    tz = 2.0 * 5000.0 / (img_res * s + 1e-9)
    translation = jnp.stack([tx, ty, tz], axis=-1)
    kp = perspective_projection(pred_joints, translation, focal_length=5000.0)
    return kp / (img_res / 2.0)
