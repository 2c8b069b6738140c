"""Kinematic-Topology-Decoder: ancestor-conditioned per-joint SMPL regression.

Parity target: /root/reference/lib/models/ktd.py:10-92. The ancestor table is
derived from the SMPL kinematic tree instead of hard-coded; each joint's 6D
pose is regressed from [trunk feature || 6D poses of its SMPL ancestors] in
topological order. The 24 tiny regressors are a statically unrolled chain —
the compute is negligible next to the encoder; the SMPL forward afterwards is
the real work (see heads.regressor_output).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from maed_tpu.models.heads import regressor_output
from maed_tpu.ops.joints import SMPL_PARENTS
from maed_tpu.ops.smpl import SMPLModel


def ancestor_index(parents=tuple(SMPL_PARENTS)):
    """Root-first ancestor chain of every SMPL joint."""
    table = []
    for j in range(len(parents)):
        chain = []
        p = parents[j]
        while p >= 0:
            chain.append(p)
            p = parents[p]
        table.append(list(reversed(chain)))
    return table


ANCESTOR_INDEX = ancestor_index()

small_xavier = nn.initializers.variance_scaling(
    scale=0.01 ** 2 * 3.0, mode="fan_avg", distribution="uniform"
)  # xavier_uniform with gain=0.01 (variance scales with gain^2)


class KTD(nn.Module):
    hidden_dim: int = 1024
    npose_per_joint: int = 6
    drop: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,                       # (nt, feat_dim)
        smpl_model: SMPLModel,
        J_regressor=None,
        deterministic: bool = True,
        return_shape_cam: bool = False,
    ):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)

        pred_shape = nn.Dense(10, kernel_init=small_xavier, dtype=self.dtype, name="decshape")(x)
        pred_cam = nn.Dense(3, kernel_init=small_xavier, dtype=self.dtype, name="deccam")(x)

        pose = []
        for j, ancestors in enumerate(ANCESTOR_INDEX):
            inp = jnp.concatenate([x] + [pose[a] for a in ancestors], axis=1)
            pose.append(
                nn.Dense(
                    self.npose_per_joint, kernel_init=small_xavier,
                    dtype=self.dtype, name=f"joint_reg{j}",
                )(inp)
            )
        pred_pose = jnp.concatenate(pose, axis=1)  # (nt, 144)

        if return_shape_cam:
            return pred_shape, pred_cam
        return regressor_output(
            smpl_model,
            pred_pose.astype(jnp.promote_types(pred_pose.dtype, jnp.float32)),
            pred_shape.astype(jnp.promote_types(pred_shape.dtype, jnp.float32)),
            pred_cam.astype(jnp.promote_types(pred_cam.dtype, jnp.float32)),
            J_regressor,
        )
