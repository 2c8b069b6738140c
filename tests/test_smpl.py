"""SMPL kernel tests: parity against an independent numpy implementation of
the published SMPL formulation (shape/pose blendshapes + kinematic chain +
LBS), written here from the paper/smplx semantics."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from maed_tpu.ops.joints import SMPL_PARENTS
from maed_tpu.ops.smpl import lbs, smpl_forward
from maed_tpu.utils.smpl_io import synthetic_smpl_model


def np_smpl_reference(model, betas, rot_mats):
    """Pure-numpy float64 SMPL forward (independent reimplementation)."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)  # (207, 3V)
    J_reg = np.asarray(model.J_regressor, np.float64)
    W = np.asarray(model.lbs_weights, np.float64)
    parents = SMPL_PARENTS

    B = betas.shape[0]
    V = v_template.shape[0]
    out_v, out_j = [], []
    for b in range(B):
        v_shaped = v_template + shapedirs @ betas[b]
        J = J_reg @ v_shaped  # (24, 3)
        pose_feat = (rot_mats[b, 1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(V, 3)

        # forward kinematics
        G = np.zeros((24, 4, 4))
        for j in range(24):
            T = np.eye(4)
            T[:3, :3] = rot_mats[b, j]
            T[:3, 3] = J[j] - (J[parents[j]] if parents[j] >= 0 else 0)
            G[j] = T if parents[j] < 0 else G[parents[j]] @ T
        posed_joints = G[:, :3, 3].copy()
        # remove rest-pose joint positions
        A = G.copy()
        for j in range(24):
            A[j, :3, 3] -= A[j, :3, :3] @ J[j]

        T_v = np.einsum("vj,jpq->vpq", W, A)
        v_h = np.concatenate([v_posed, np.ones((V, 1))], axis=1)
        verts = np.einsum("vpq,vq->vp", T_v[:, :3, :], v_h)
        out_v.append(verts)
        out_j.append(posed_joints)
    return np.stack(out_v), np.stack(out_j)


def test_lbs_matches_numpy_reference(rng):
    model = synthetic_smpl_model(num_verts=200)
    B = 4
    betas = rng.randn(B, 10).astype(np.float32) * 0.5
    rm = R.random(B * 24, random_state=rng).as_matrix().reshape(B, 24, 3, 3)
    # keep rotations mild so pose blendshapes stay in a realistic range
    aa = R.from_matrix(rm.reshape(-1, 3, 3)).as_rotvec() * 0.3
    rm = R.from_rotvec(aa).as_matrix().reshape(B, 24, 3, 3).astype(np.float32)

    got_v, got_j = lbs(model, jnp.asarray(betas), jnp.asarray(rm))
    want_v, want_j = np_smpl_reference(model, betas.astype(np.float64), rm.astype(np.float64))

    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_j), want_j, atol=2e-5)


def test_rest_pose_is_template_plus_shape(rng):
    model = synthetic_smpl_model(num_verts=150)
    betas = jnp.zeros((2, 10))
    eye = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
    verts, joints = lbs(model, betas, eye)
    np.testing.assert_allclose(
        np.asarray(verts), np.broadcast_to(np.asarray(model.v_template), (2, 150, 3)), atol=1e-5
    )


def test_forward_aa_matches_rotmat_path(rng):
    model = synthetic_smpl_model(num_verts=100)
    B = 3
    betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.3)
    aa = rng.randn(B, 72).astype(np.float32) * 0.2

    out_aa = smpl_forward(model, betas, pose_axis_angle=jnp.asarray(aa))

    rm = R.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(B, 24, 3, 3).astype(np.float32)
    out_rm = smpl_forward(
        model, betas,
        global_orient=jnp.asarray(rm[:, :1]),
        body_pose=jnp.asarray(rm[:, 1:]),
    )
    np.testing.assert_allclose(
        np.asarray(out_aa["vertices"]), np.asarray(out_rm["vertices"]), atol=1e-5
    )


def test_forward_output_shapes(rng):
    model = synthetic_smpl_model(num_verts=123)
    out = smpl_forward(
        model,
        jnp.zeros((5, 10)),
        pose_axis_angle=jnp.zeros((5, 72)),
    )
    assert out["vertices"].shape == (5, 123, 3)
    assert out["joints"].shape == (5, 49, 3)
    assert out["joints24"].shape == (5, 24, 3)


def test_forward_jits_and_grads(rng):
    model = synthetic_smpl_model(num_verts=80)

    @jax.jit
    def loss_fn(betas, aa):
        out = smpl_forward(model, betas, pose_axis_angle=aa)
        return jnp.sum(out["joints"] ** 2)

    g = jax.grad(loss_fn)(jnp.ones((2, 10)) * 0.1, jnp.ones((2, 72)) * 0.1)
    assert g.shape == (2, 10)
    assert bool(jnp.isfinite(g).all())

    # zero pose must have finite gradients too (rodrigues eps guard)
    g0 = jax.grad(loss_fn, argnums=1)(jnp.zeros((2, 10)), jnp.zeros((2, 72)))
    assert bool(jnp.isfinite(g0).all())


def test_joint_bank_selection(rng):
    """The 49 joints must be drawn from the 54-bank per JOINT_MAP."""
    from maed_tpu.ops.joints import JOINT_MAP, JOINT_NAMES, JOINT_SELECT

    assert len(JOINT_SELECT) == 49
    assert JOINT_SELECT == [JOINT_MAP[n] for n in JOINT_NAMES]
    # OP MidHip is SMPL pelvis (bank 0); LSP hips are extra-regressed joints.
    assert JOINT_SELECT[8] == 0
    assert JOINT_SELECT[27] == 45 and JOINT_SELECT[28] == 46
