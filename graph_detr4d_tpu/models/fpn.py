"""Feature Pyramid Network matching mmdet FPN semantics as configured at
configs/detr4d/...12e.py:42-49: start_level=1, add_extra_convs='on_output',
num_outs=4, relu_before_extra_convs=True.

Channels-last; nearest-neighbor top-down upsampling (mmdet default)."""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


def _upsample_nearest(x, target_hw):
    th, tw = target_hw
    B, H, W, C = x.shape
    ry, rx = th // H, tw // W
    x = jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    return x[:, :th, :tw]


class FPN(nn.Module):
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 4
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        used = list(inputs[self.start_level :])
        laterals = [
            nn.Conv(
                self.out_channels,
                (1, 1),
                dtype=self.dtype,
                name=f"lateral{i}",
            )(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(
                self.out_channels,
                (3, 3),
                padding=1,
                dtype=self.dtype,
                name=f"fpn_conv{i}",
            )(x)
            for i, x in enumerate(laterals)
        ]
        # extra levels from the last output ('on_output')
        for i in range(len(outs), self.num_outs):
            src = outs[-1]
            if self.relu_before_extra_convs:
                src = nn.relu(src)
            outs.append(
                nn.Conv(
                    self.out_channels,
                    (3, 3),
                    strides=(2, 2),
                    padding=1,
                    dtype=self.dtype,
                    name=f"fpn_conv{i}",
                )(src)
            )
        return outs
