"""MAED: encoder (STE hybrid ViT or ResNet50) + decoder (KTD or iterative).

Parity target: /root/reference/lib/models/maed.py:9-67. Inputs are NHWC clips
(N, T, H, W, 3); frames are folded into the batch axis for the encoder (one
big MXU-friendly batch), the decoder regresses per-frame SMPL parameters, and
outputs are unfolded back to (N, T, ...).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from maed_tpu.models.ktd import KTD
from maed_tpu.models.resnet import ResNet50
from maed_tpu.models.spin import IterativeRegressor
from maed_tpu.models.vit import VisionTransformer
from maed_tpu.ops.smpl import SMPLModel

ENCODER_FEAT_DIM = {"ste": 768, "cnn": 2048}


class MAED(nn.Module):
    encoder: str = "ste"         # 'ste' | 'cnn'
    num_blocks: int = 6
    num_heads: int = 12
    st_mode: str = "parallel"
    decoder: str = "ktd"         # 'ktd' | 'iterative'
    hidden_dim: int = 1024
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # inference-only: skip in-graph weight standardization (use
    # utils.checkpoint.fold_weight_standardization on the params first)
    standardize_ws: bool = True
    # remat transformer blocks for O(depth) less training activation memory
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.encoder.lower() == "ste":
            self.enc = VisionTransformer(
                depth=self.num_blocks,
                num_heads=self.num_heads,
                st_mode=self.st_mode,
                hybrid=True,
                representation_size=768,
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=self.drop_path_rate,
                standardize=self.standardize_ws,
                remat=self.remat,
                dtype=self.dtype,
                name="encoder",
            )
        elif self.encoder.lower() == "cnn":
            self.enc = ResNet50(dtype=self.dtype, name="encoder")
        else:
            raise NotImplementedError(self.encoder)

        if self.decoder.lower() == "ktd":
            self.dec = KTD(hidden_dim=self.hidden_dim, dtype=self.dtype, name="decoder")
        elif self.decoder.lower() == "iterative":
            self.dec = IterativeRegressor(
                hidden_dim=self.hidden_dim, dtype=self.dtype, name="decoder"
            )
        else:
            raise NotImplementedError(self.decoder)

    def extract_feature(self, x, deterministic: bool = True):
        from maed_tpu.ops.image import device_normalize

        x = device_normalize(x)  # uint8 shipping contract; f32 = no-op
        N, T = x.shape[:2]
        frames = x.reshape((N * T,) + x.shape[2:])
        if self.encoder.lower() == "ste":
            feat = self.enc(frames, seqlen=T, deterministic=deterministic)
        else:
            feat = self.enc(frames, use_running_average=deterministic)
        return feat.reshape(N, T, -1)

    def __call__(
        self,
        x,                                  # (N, T, H, W, 3)
        smpl_model: SMPLModel,
        J_regressor: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        from maed_tpu.ops.image import device_normalize

        # uint8 clips are ImageNet-normalized ON DEVICE (fused by XLA into
        # the stem conv): hosts ship 1/4 the bytes. f32 inputs (the original
        # contract, every parity oracle) see an identical graph.
        x = device_normalize(x)
        N, T = x.shape[:2]
        frames = x.reshape((N * T,) + x.shape[2:])

        if self.encoder.lower() == "ste":
            feat = self.enc(frames, seqlen=T, deterministic=deterministic)
        else:
            feat = self.enc(frames, use_running_average=deterministic)

        out = self.dec(
            feat, smpl_model, J_regressor=J_regressor, deterministic=deterministic
        )

        return {
            "theta": out["theta"].reshape(N, T, -1),
            "verts": out["verts"].reshape(N, T, -1, 3),
            "kp_2d": out["kp_2d"].reshape(N, T, -1, 2),
            "kp_3d": out["kp_3d"].reshape(N, T, -1, 3),
            "rotmat": out["rotmat"].reshape(N, T, -1, 3, 3),
        }
