"""ResNet backbone (mmcv 'pytorch' style), channels-last, frozen BN.

Capability parity with the reference's external mmdet ResNet as configured
at configs/detr4d/...12e.py:32-41: depth 50, out_indices (0,1,2,3),
frozen_stages=1, BN frozen everywhere, DCNv2 on stages 3-4. 'pytorch' style
puts the stride on the bottleneck's 3x3 conv.

TPU-first choices: NHWC layout (native for TPU convs), frozen BN folded to
affine (no stat sync), optional `jax.checkpoint` rematerialisation per
stage, DCNv2 as the gather-based op in ops/deform_conv.py. Parameter
freezing (frozen_stages) is handled by the optimizer mask in
train/optim.py, mirroring requires_grad=False semantics.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm
from ..ops.deform_conv import deform_conv2d

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


class DeformConv(nn.Module):
    """DCNv2 layer: offset/mask conv (zero-init) + deformable gather-conv."""

    features: int
    stride: int = 1
    # large-grid tap-sampling variant (BackboneConfig.dcn_gather)
    gather_variant: str = "shift4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = 9
        om = nn.Conv(
            3 * K,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(x)
        off = om[..., : 2 * K].reshape(*om.shape[:-1], K, 2)
        mask = jax.nn.sigmoid(om[..., 2 * K :])
        cin = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (K, cin, self.features),
        )
        return deform_conv2d(
            x,
            off,
            mask,
            weight,
            stride=self.stride,
            padding=1,
            variant=self.gather_variant,
        )


class StemConvS2D(nn.Module):
    """The stem's 7x7/stride-2/pad-3 conv via 2x2 space-to-depth.

    Exact rewrite: out[i,j] = sum_{a,b,c} k[a,b,c] xpad[2i+a, 2j+b, c]
    with a = 2*alpha + p decomposes into a 4x4 stride-1 VALID conv over
    the space-to-depth (2x2 -> channel) transform of the padded input,
    with the kernel zero-padded 7->8 and re-indexed
    K2[alpha, beta, (p,q,c), o] = kpad[2*alpha+p, 2*beta+q, c, o]
    (the MLPerf ResNet space-to-depth stem). 30% more MACs (192 vs 147
    per output element) but the MXU sees 12 input channels instead of 3
    and a quarter of the spatial positions.

    The parameter is the SAME (7,7,3,64) 'kernel' the plain nn.Conv
    stem stores (module name 'stem_conv'), so checkpoints, the .pth
    converter, and the goldens are layout-identical; the rearrangement
    happens per forward on the tiny kernel tensor.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, C, 64),
        )
        kd = k.astype(self.dtype)
        xd = x.astype(self.dtype)
        kp = jnp.pad(kd, ((0, 1), (0, 1), (0, 0), (0, 0)))
        # (8,8,C,64) -> (alpha,p,beta,q,C,64) -> (alpha,beta,p*q*C,64)
        k2 = kp.reshape(4, 2, 4, 2, C, 64)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, 64)
        xp = jnp.pad(xd, ((0, 0), (3, 3), (3, 3), (0, 0)))
        Hp, Wp = H + 6, W + 6
        assert Hp % 2 == 0 and Wp % 2 == 0, (H, W)
        xs = xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, Hp // 2, Wp // 2, 4 * C
        )
        return jax.lax.conv_general_dilated(
            xs,
            k2,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    # use_dcn is accepted but ignored: mmdet's BasicBlock asserts
    # `dcn is None` ("Not implemented yet"), and the reference's r18/r34
    # configs keep DCN commented out accordingly
    # (configs/detr4d/detr4d_res18_deform_pe_testaug_320_2subset.py:40-41).
    features: int
    stride: int = 1
    use_dcn: bool = False
    dcn_gather: str = "shift4"  # accepted but unused, like use_dcn
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                self.features, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, maybe DCN) -> 1x1(x4) with frozen BN."""

    features: int  # width of the 3x3; output is 4x
    stride: int = 1
    use_dcn: bool = False
    dcn_gather: str = "shift4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        identity = x
        y = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.use_dcn:
            y = DeformConv(
                self.features,
                stride=self.stride,
                gather_variant=self.dcn_gather,
                dtype=self.dtype,
                name="conv2",
            )(y)
        else:
            y = nn.Conv(
                self.features,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=1,
                use_bias=False,
                dtype=self.dtype,
                name="conv2",
            )(y)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                out_ch, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    stage_with_dcn: Sequence[bool] = (False, False, True, True)
    use_dcn: bool = True
    dcn_gather: str = "shift4"
    remat: bool = False
    stem_s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) -> list of (B, H/4..H/32, ..., C) feature maps."""
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_type == "bottleneck" else BasicBlock

        if self.stem_s2d:
            x = StemConvS2D(dtype=self.dtype, name="stem_conv")(x)
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=3,
                use_bias=False,
                dtype=self.dtype,
                name="stem_conv",
            )(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        width = 64
        for stage, num_blocks in enumerate(stage_blocks):
            dcn = self.use_dcn and self.stage_with_dcn[stage]
            cls = nn.remat(block_cls) if self.remat else block_cls
            for b in range(num_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                kw = {"dcn_gather": self.dcn_gather} if dcn else {}
                x = cls(
                    features=width,
                    stride=stride,
                    use_dcn=dcn,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                    **kw,
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            width *= 2
        return outs
