"""KTD regressor-chain parity vs a torch oracle (weights copied): the
ancestor-conditioned sequential joint regression, shape/cam heads, and the
return_shape_cam path."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maed_tpu.models.ktd import ANCESTOR_INDEX, KTD
from maed_tpu.utils.smpl_io import synthetic_smpl_model


def linear(x, p):
    return F.linear(x, torch.from_numpy(np.asarray(p["kernel"]).T.copy()),
                    torch.from_numpy(np.asarray(p["bias"]).copy()))


def torch_ktd_trunk(feat, params):
    x = torch.from_numpy(feat.copy())
    x = linear(x, params["fc1"])
    x = linear(x, params["fc2"])
    pred_shape = linear(x, params["decshape"])
    pred_cam = linear(x, params["deccam"])
    pose = []
    for j, ancestors in enumerate(ANCESTOR_INDEX):
        inp = torch.cat([x] + [pose[a] for a in ancestors], dim=1)
        pose.append(linear(inp, params[f"joint_reg{j}"]))
    return torch.cat(pose, dim=1).numpy(), pred_shape.numpy(), pred_cam.numpy()


def test_ktd_chain_matches_torch(rng):
    smpl = synthetic_smpl_model(num_verts=64)
    feat = rng.randn(5, 24).astype(np.float32)
    ktd = KTD(hidden_dim=16)
    params = jax.tree.map(
        np.asarray, ktd.init(jax.random.PRNGKey(0), jnp.asarray(feat), smpl)["params"]
    )
    with jax.default_matmul_precision("highest"):
        got_shape, got_cam = ktd.apply(
            {"params": params}, jnp.asarray(feat), smpl, return_shape_cam=True
        )
    want_pose, want_shape, want_cam = torch_ktd_trunk(feat, params)
    np.testing.assert_allclose(np.asarray(got_shape), want_shape, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cam), want_cam, atol=1e-5)

    # the full output path consumes the same pose chain: check the rotmats
    # equal rot6d(want_pose)
    from maed_tpu.ops.geometry import rot6d_to_rotmat

    with jax.default_matmul_precision("highest"):
        out = ktd.apply({"params": params}, jnp.asarray(feat), smpl)
        want_rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(want_pose))).reshape(5, 24, 3, 3)
    np.testing.assert_allclose(np.asarray(out["rotmat"]), want_rotmat, atol=1e-5)
