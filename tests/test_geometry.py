import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from maed_tpu.ops import (
    rodrigues,
    quat_to_rotmat,
    rotmat_to_quat,
    quat_to_aa,
    rotmat_to_aa,
    rot6d_to_rotmat,
    weak_perspective_projection,
    batch_similarity_transform,
)


def random_rotmats(rng, n):
    return R.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_rodrigues_matches_scipy(rng):
    aa = rng.randn(256, 3).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(aa)))
    want = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rodrigues_zero_rotation_is_identity():
    got = np.asarray(rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(got, np.eye(3)[None].repeat(4, 0), atol=1e-5)


def test_quat_roundtrip(rng):
    mats = random_rotmats(rng, 256)
    q = rotmat_to_quat(jnp.asarray(mats))
    back = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_rotmat_to_quat_matches_scipy_up_to_sign(rng):
    mats = random_rotmats(rng, 128)
    got = np.asarray(rotmat_to_quat(jnp.asarray(mats)))  # (w, x, y, z)
    want = R.from_matrix(mats).as_quat()  # (x, y, z, w)
    want = np.concatenate([want[:, 3:], want[:, :3]], axis=1)
    sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-4)


def test_rotmat_aa_roundtrip(rng):
    mats = random_rotmats(rng, 256)
    aa = rotmat_to_aa(jnp.asarray(mats))
    back = np.asarray(rodrigues(aa))
    np.testing.assert_allclose(back, mats, atol=1e-4)


def test_rotmat_to_aa_matches_scipy(rng):
    mats = random_rotmats(rng, 128)
    got = np.asarray(rotmat_to_aa(jnp.asarray(mats)))
    want = R.from_matrix(mats).as_rotvec()
    # rotvec is unique up to 2*pi wrap; random rotations stay under pi.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rot6d_recovers_rotation(rng):
    mats = random_rotmats(rng, 128)
    # First two columns of a rotation matrix form a valid 6D representation.
    six = mats[:, :, :2].reshape(128, 6)
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(six)))
    np.testing.assert_allclose(got, mats, atol=1e-5)


def test_rot6d_is_rotation_for_random_input(rng):
    x = rng.randn(64, 6).astype(np.float32)
    m = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(64, 0), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(64), atol=1e-5)


def test_rot6d_matches_torch_reference(rng):
    """Bit-level parity with the reference rot6d (same eps, same reads)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    def ref(x):
        x = x.view(-1, 3, 2)
        b1 = F.normalize(x[:, :, 0], dim=1, eps=1e-6)
        dot = torch.sum(b1 * x[:, :, 1], dim=1, keepdim=True)
        b2 = F.normalize(x[:, :, 1] - dot * b1, dim=-1, eps=1e-6)
        b3 = torch.cross(b1, b2, dim=1)
        return torch.stack([b1, b2, b3], dim=-1)

    x = rng.randn(64, 6).astype(np.float32)
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_weak_perspective_projection_shape_and_center():
    joints = jnp.zeros((2, 49, 3))
    cam = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.5, -0.5]])
    kp = np.asarray(weak_perspective_projection(joints, cam))
    assert kp.shape == (2, 49, 2)
    # Points at origin project to the normalized camera translation offset.
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-6)


def test_weak_perspective_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")

    def ref_projection(pred_joints, pred_camera):
        pred_cam_t = torch.stack(
            [
                pred_camera[:, 1],
                pred_camera[:, 2],
                2 * 5000.0 / (224.0 * pred_camera[:, 0] + 1e-9),
            ],
            dim=-1,
        )
        points = pred_joints + pred_cam_t.unsqueeze(1)
        projected = points / points[:, :, -1].unsqueeze(-1)
        return projected[:, :, :2] * 5000.0 / (224.0 / 2.0)

    joints = rng.randn(8, 49, 3).astype(np.float32)
    cam = np.abs(rng.randn(8, 3)).astype(np.float32) + 0.5
    got = np.asarray(weak_perspective_projection(jnp.asarray(joints), jnp.asarray(cam)))
    want = ref_projection(torch.from_numpy(joints), torch.from_numpy(cam)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_estimate_translation_recovers_known_camera(rng):
    """Project joints with a known translation, then recover it."""
    from maed_tpu.ops import estimate_translation, perspective_projection
    import jax.numpy as jnp

    S = rng.randn(4, 24, 3).astype(np.float32) * 0.3
    t_true = np.stack([
        rng.uniform(-0.5, 0.5, 4), rng.uniform(-0.5, 0.5, 4), rng.uniform(4, 8, 4)
    ], axis=1).astype(np.float32)
    kp = np.asarray(perspective_projection(jnp.asarray(S), jnp.asarray(t_true))) + 112.0
    joints_2d = np.concatenate([kp, np.ones((4, 24, 1), np.float32)], axis=2)
    t_hat = np.asarray(estimate_translation(
        jnp.asarray(S), jnp.asarray(joints_2d), use_joints_slice=False
    ))
    np.testing.assert_allclose(t_hat, t_true, atol=1e-2)


def test_estimate_translation_matches_numpy_reference(rng):
    """Parity with the reference's per-sample numpy least squares."""
    from maed_tpu.ops import estimate_translation
    import jax.numpy as jnp

    def np_ref(S, joints_2d, joints_conf, focal_length=5000.0, img_size=224.0):
        num_joints = S.shape[0]
        f = np.array([focal_length, focal_length])
        center = np.array([img_size / 2.0, img_size / 2.0])
        Z = np.reshape(np.tile(S[:, 2], (2, 1)).T, -1)
        XY = np.reshape(S[:, 0:2], -1)
        O = np.tile(center, num_joints)
        F = np.tile(f, num_joints)
        weight2 = np.reshape(np.tile(np.sqrt(joints_conf), (2, 1)).T, -1)
        Q = np.array([
            F * np.tile(np.array([1, 0]), num_joints),
            F * np.tile(np.array([0, 1]), num_joints),
            O - np.reshape(joints_2d, -1),
        ]).T
        c = (np.reshape(joints_2d, -1) - O) * Z - F * XY
        W = np.diagflat(weight2)
        Q = W @ Q
        c = W @ c
        return np.linalg.solve(Q.T @ Q, Q.T @ c)

    S49 = rng.randn(3, 49, 3).astype(np.float32) * 0.3
    kp49 = np.concatenate([
        rng.rand(3, 49, 2).astype(np.float32) * 224,
        rng.rand(3, 49, 1).astype(np.float32),
    ], axis=2)
    got = np.asarray(estimate_translation(jnp.asarray(S49), jnp.asarray(kp49)))
    want = np.stack([
        np_ref(S49[i, 25:], kp49[i, 25:, :2], kp49[i, 25:, 2]) for i in range(3)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_procrustes_recovers_similarity(rng):
    """Applying a known similarity transform must be perfectly undone."""
    S2 = rng.randn(16, 14, 3).astype(np.float64)
    rot = random_rotmats(rng, 16).astype(np.float64)
    scale = (0.5 + rng.rand(16, 1, 1)).astype(np.float64)
    t = rng.randn(16, 1, 3).astype(np.float64)
    S1 = np.einsum("bij,bnj->bni", rot, S2) * scale + t
    S1_hat = np.asarray(batch_similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
    np.testing.assert_allclose(S1_hat, S2, atol=1e-5)


def test_procrustes_matches_numpy_reference(rng):
    """Parity with the classical Umeyama solution computed in numpy."""

    def np_similarity(S1, S2):
        S1, S2 = S1.T, S2.T
        mu1, mu2 = S1.mean(1, keepdims=True), S2.mean(1, keepdims=True)
        X1, X2 = S1 - mu1, S2 - mu2
        var1 = np.sum(X1 ** 2)
        K = X1 @ X2.T
        U, s, Vh = np.linalg.svd(K)
        V = Vh.T
        Z = np.eye(3)
        Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
        Rm = V @ Z @ U.T
        scale = np.trace(Rm @ K) / var1
        t = mu2 - scale * (Rm @ mu1)
        return (scale * Rm @ S1 + t).T

    S1 = rng.randn(8, 14, 3)
    S2 = rng.randn(8, 14, 3)
    got = np.asarray(batch_similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
    want = np.stack([np_similarity(a, b) for a, b in zip(S1, S2)])
    # jax runs in f32 (x64 disabled); numpy reference is f64.
    np.testing.assert_allclose(got, want, atol=1e-5)
