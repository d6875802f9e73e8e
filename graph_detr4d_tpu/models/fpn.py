"""Feature Pyramid Network matching mmdet FPN semantics as configured at
configs/detr4d/...12e.py:42-49: start_level=1, add_extra_convs='on_output',
num_outs=4, relu_before_extra_convs=True.

`cp=True` is the reference's CPFPN (models/necks/cp_fpn.py:182-185): the
3x3 fpn conv is applied ONLY on level 0 and higher levels pass the
laterals through ("remove unused parameters" — the petr/petrv2 configs
use it over the backbone's last two levels with num_outs=2).

Channels-last; nearest-neighbor top-down upsampling (mmdet default).

mmdet quirk kept exactly (cp_fpn.py:203-208 / mmdet fpn.py): when extra
levels are added, the FIRST extra conv is applied to the raw source
WITHOUT relu; `relu_before_extra_convs` only inserts relu from the
second extra conv on.
"""

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
    cp: bool = False
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
            if (i == 0 or not self.cp)
            else x
            for i, x in enumerate(laterals)
        ]
        # extra levels from the last output ('on_output'); the first extra
        # conv sees the raw source, relu only from the second on
        for i in range(len(outs), self.num_outs):
            src = outs[-1]
            if self.relu_before_extra_convs and i > len(laterals):
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
