"""Iterative (SPIN/HMR-style) decoder: 3-step residual SMPL refinement.

Parity target: /root/reference/lib/models/spin.py:17-110. The mean-parameter
initialization comes from `smpl_mean_params.npz` when available; without the
data file the init falls back to identity 6D rotations / zero shape / unit
camera, which only changes the starting point of the learned refinement.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from maed_tpu.models.heads import regressor_output
from maed_tpu.models.ktd import small_xavier
from maed_tpu.ops.smpl import SMPLModel


def load_mean_params(data_dir: str = "data/smpl_data") -> Tuple[tuple, tuple, tuple]:
    """Returns (pose6d(144,), shape(10,), cam(3,)) as hashable tuples."""
    path = osp.join(data_dir, "smpl_mean_params.npz")
    if osp.isfile(path):
        d = np.load(path)
        return (
            tuple(np.asarray(d["pose"], np.float32).ravel().tolist()),
            tuple(np.asarray(d["shape"], np.float32).ravel().tolist()),
            tuple(np.asarray(d["cam"], np.float32).ravel().tolist()),
        )
    ident6d = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
    return tuple(ident6d.tolist()), tuple([0.0] * 10), (0.9, 0.0, 0.0)


class IterativeRegressor(nn.Module):
    hidden_dim: int = 1024
    n_iter: int = 3
    drop: float = 0.5
    init_pose: tuple = load_mean_params()[0]
    init_shape: tuple = load_mean_params()[1]
    init_cam: tuple = load_mean_params()[2]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,                       # (nt, feat_dim)
        smpl_model: SMPLModel,
        J_regressor=None,
        deterministic: bool = True,
    ):
        nt = x.shape[0]
        pred_pose = jnp.broadcast_to(jnp.asarray(self.init_pose, x.dtype), (nt, 144))
        pred_shape = jnp.broadcast_to(jnp.asarray(self.init_shape, x.dtype), (nt, 10))
        pred_cam = jnp.broadcast_to(jnp.asarray(self.init_cam, x.dtype), (nt, 3))

        fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")
        decpose = nn.Dense(144, kernel_init=small_xavier, dtype=self.dtype, name="decpose")
        decshape = nn.Dense(10, kernel_init=small_xavier, dtype=self.dtype, name="decshape")
        deccam = nn.Dense(3, kernel_init=small_xavier, dtype=self.dtype, name="deccam")
        drop1 = nn.Dropout(self.drop)
        drop2 = nn.Dropout(self.drop)

        for _ in range(self.n_iter):
            xc = jnp.concatenate([x, pred_pose, pred_shape, pred_cam], axis=1)
            xc = drop1(fc1(xc), deterministic=deterministic)
            xc = drop2(fc2(xc), deterministic=deterministic)
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        return regressor_output(
            smpl_model,
            pred_pose.astype(jnp.promote_types(pred_pose.dtype, jnp.float32)),
            pred_shape.astype(jnp.promote_types(pred_shape.dtype, jnp.float32)),
            pred_cam.astype(jnp.promote_types(pred_cam.dtype, jnp.float32)),
            J_regressor,
        )
