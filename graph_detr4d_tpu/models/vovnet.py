"""VoVNet-V2 backbone (OSA modules + eSE attention), channels-last.

Capability parity with models/backbones/vovnet.py:276-383 (and vovnetcp.py,
whose only delta is torch.utils.checkpoint — here `remat=True` wraps OSA
blocks in jax.checkpoint). Frozen BN like the reference's norm_eval.

Specs follow the reference tables (vovnet.py:19-98): V-39/57/99-eSE share
stage_conv_ch [128,160,192,224] and stage_out_ch [256,512,768,1024].
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm

VOVNET_SPECS = {
    "V-19-slim-eSE": dict(
        stem=[64, 64, 128],
        stage_conv_ch=[64, 80, 96, 112],
        stage_out_ch=[112, 256, 384, 512],
        layer_per_block=3,
        block_per_stage=[1, 1, 1, 1],
    ),
    "V-19-eSE": dict(
        stem=[64, 64, 128],
        stage_conv_ch=[128, 160, 192, 224],
        stage_out_ch=[256, 512, 768, 1024],
        layer_per_block=3,
        block_per_stage=[1, 1, 1, 1],
    ),
    "V-39-eSE": dict(
        stem=[64, 64, 128],
        stage_conv_ch=[128, 160, 192, 224],
        stage_out_ch=[256, 512, 768, 1024],
        layer_per_block=5,
        block_per_stage=[1, 1, 2, 2],
    ),
    "V-57-eSE": dict(
        stem=[64, 64, 128],
        stage_conv_ch=[128, 160, 192, 224],
        stage_out_ch=[256, 512, 768, 1024],
        layer_per_block=5,
        block_per_stage=[1, 1, 4, 3],
    ),
    "V-99-eSE": dict(
        stem=[64, 64, 128],
        stage_conv_ch=[128, 160, 192, 224],
        stage_out_ch=[256, 512, 768, 1024],
        layer_per_block=5,
        block_per_stage=[1, 3, 9, 3],
    ),
}


def _conv_bn_relu(x, ch, name, stride=1, kernel=3, dtype=jnp.float32):
    x = nn.Conv(
        ch,
        (kernel, kernel),
        strides=(stride, stride),
        padding=kernel // 2,
        use_bias=False,
        dtype=dtype,
        name=f"{name}_conv",
    )(x)
    x = FrozenBatchNorm(ch, dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x)


class ESEModule(nn.Module):
    """Effective squeeze-excite: global-avg-pool -> 1x1 conv -> hsigmoid."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc")(s)
        hsig = jnp.clip(s + 3.0, 0.0, 6.0) / 6.0
        return x * hsig


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity_feat = x
        outputs = [x]
        for i in range(self.layer_per_block):
            x = _conv_bn_relu(
                x, self.stage_ch, f"layer{i}", dtype=self.dtype
            )
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        x = _conv_bn_relu(
            x, self.concat_ch, "concat", kernel=1, dtype=self.dtype
        )
        x = ESEModule(self.concat_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x


class VoVNet(nn.Module):
    spec_name: str = "V-99-eSE"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        spec = VOVNET_SPECS[self.spec_name]
        s1, s2, s3 = spec["stem"]
        x = _conv_bn_relu(x, s1, "stem1", stride=2, dtype=self.dtype)
        x = _conv_bn_relu(x, s2, "stem2", stride=1, dtype=self.dtype)
        x = _conv_bn_relu(x, s3, "stem3", stride=2, dtype=self.dtype)

        outs = []
        for stage in range(4):
            if stage > 0:
                # reference: nn.MaxPool2d(3, stride=2, ceil_mode=True), NO
                # padding (vovnet.py:249) — windows start at pixel 0 and the
                # last window is edge-clipped. For k=3/s=2 that is exactly
                # right/bottom-pad 1 with -inf fill (flax max_pool pads with
                # -inf), NOT the symmetric (1, 1) pad.
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1))
                )
            nblocks = spec["block_per_stage"][stage]
            for b in range(nblocks):
                kwargs = dict(
                    stage_ch=spec["stage_conv_ch"][stage],
                    concat_ch=spec["stage_out_ch"][stage],
                    layer_per_block=spec["layer_per_block"],
                    identity=b > 0,
                    dtype=self.dtype,
                    name=f"stage{stage + 2}_osa{b}",
                )
                if self.remat:
                    x = nn.remat(OSAModule)(**kwargs)(x)
                else:
                    x = OSAModule(**kwargs)(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs
