"""MobileNetV2 backbone (the reference's 'm2' distillation-student
backbone, configs/detr4d/detr4d_m2_deform_pe_testaug_320_fullset.py:51-52;
the class itself is mmdet's MobileNetV2).

Standard inverted-residual stack, NHWC, frozen-BN (matching how every
backbone in the reference trains with norm_eval), out_indices select the
stage outputs fed to the FPN.
"""

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm


# (expand_ratio, out_channels, num_blocks, stride) — mmdet arch settings
ARCH = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(
                hidden, (1, 1), use_bias=False, dtype=self.dtype,
                name="expand",
            )(y)
            y = FrozenBatchNorm(hidden, dtype=self.dtype, name="expand_bn")(y)
            y = nn.relu6(y)
        # explicit symmetric pad 1 (torch Conv2d padding=1): flax 'SAME'
        # places the pad asymmetrically for stride 2 — a 1-px shift
        y = nn.Conv(
            hidden,
            (3, 3),
            strides=self.stride,
            padding=1,
            feature_group_count=hidden,
            use_bias=False,
            dtype=self.dtype,
            name="dw",
        )(y)
        y = FrozenBatchNorm(hidden, dtype=self.dtype, name="dw_bn")(y)
        y = nn.relu6(y)
        y = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="project",
        )(y)
        y = FrozenBatchNorm(
            self.out_channels, dtype=self.dtype, name="project_bn"
        )(y)
        if self.stride == 1 and cin == self.out_channels:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    """out_indices index the 7 inverted-residual stages (0-6) plus the
    final 1280-channel conv as index 7, mirroring mmdet's layer list; the
    reference m2 config uses (2, 4, 7) -> channels (32, 96, 1280)."""

    out_indices: Tuple[int, ...] = (2, 4, 7)
    widen_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def c(ch):
            return max(int(ch * self.widen_factor), 8)

        y = nn.Conv(
            c(32), (3, 3), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, name="stem",
        )(x)
        y = FrozenBatchNorm(c(32), dtype=self.dtype, name="stem_bn")(y)
        y = nn.relu6(y)

        outs = []
        for si, (t, ch, n, s) in enumerate(ARCH):
            for bi in range(n):
                y = InvertedResidual(
                    out_channels=c(ch),
                    stride=s if bi == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(y)
            if si in self.out_indices:
                outs.append(y)
        if 7 in self.out_indices:
            y = nn.Conv(
                c(1280) if self.widen_factor > 1.0 else 1280,
                (1, 1),
                use_bias=False,
                dtype=self.dtype,
                name="conv2",
            )(y)
            y = FrozenBatchNorm(
                y.shape[-1], dtype=self.dtype, name="conv2_bn"
            )(y)
            y = nn.relu6(y)
            outs.append(y)
        return outs
