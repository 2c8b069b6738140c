"""Standard ResNet-50 (v1.5) feature extractor for the stage-1 'cnn' encoder.

Parity target: the torchvision resnet50 used at
/root/reference/lib/models/maed.py:35-37 (fc head removed -> 2048-d features).
NHWC/HWIO layout; BatchNorm keeps running statistics in the `batch_stats`
collection, updated only when deterministic=False.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BottleneckV1(nn.Module):
    out_chs: int
    stride: int = 1
    dtype: Any = jnp.float32
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        mid = self.out_chs // 4
        norm = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        shortcut = x
        if self.has_downsample:
            shortcut = conv(self.out_chs, 1, self.stride, "downsample_conv")(x)
            shortcut = norm("downsample_bn")(shortcut)
        y = nn.relu(norm("bn1")(conv(mid, 1, 1, "conv1")(x)))
        # v1.5: stride on the 3x3
        y = nn.relu(norm("bn2")(conv(mid, 3, self.stride, "conv2")(y)))
        y = norm("bn3")(conv(self.out_chs, 1, 1, "conv3")(y))
        return nn.relu(y + shortcut)


class ResNet50(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    channels: Sequence[int] = (256, 512, 1024, 2048)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=use_running_average, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")
        for si, (d, c) in enumerate(zip(self.layers, self.channels)):
            for bi in range(d):
                y = BottleneckV1(
                    out_chs=c,
                    stride=(1 if si == 0 else 2) if bi == 0 else 1,
                    has_downsample=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{si + 1}_{bi}",
                )(y, use_running_average)
        # global average pool -> (B, 2048)
        return y.mean(axis=(1, 2))
