"""Camera-aware feature modulation (BEVDepth-style DepthNet).

Parity with Detr3DHeadPECAM's DepthNet
(models/dense_heads/detr3d_head_pe_camaware.py:59-105): per-camera pixel
size derived from the inverse intrinsics, scaled by the image-domain
augmentation factor (ida), embedded by a small MLP and applied as a
squeeze-excite gate after a 3x3 reduce conv.
"""

import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm, SELayer, TwoLayerMLP


class DepthNet(nn.Module):
    mid_channels: int
    context_channels: int
    scale_depth_factor: float = 1000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, intrinsics, ida_scale):
        """x (B, N, H, W, C); intrinsics (B, N, 4, 4); ida_scale (B, N)."""
        B, N, H, W, _ = x.shape
        y = nn.Conv(
            self.mid_channels,
            (3, 3),
            padding=1,
            dtype=self.dtype,
            name="reduce_conv",
        )(x)
        y = FrozenBatchNorm(
            self.mid_channels, dtype=self.dtype, name="reduce_bn"
        )(y)
        y = nn.relu(y)

        inv_k = jnp.linalg.inv(intrinsics.astype(jnp.float32))
        pixel_size = jnp.sqrt(
            inv_k[..., 0, 0] ** 2 + inv_k[..., 1, 1] ** 2
        )  # (B, N)
        scaled = (
            pixel_size * self.scale_depth_factor / jnp.maximum(ida_scale, 1e-6)
        )[..., None]
        se = TwoLayerMLP(
            self.mid_channels,
            self.mid_channels,
            act=nn.gelu,
            dtype=self.dtype,
            name="mlp",
        )(scaled.astype(self.dtype))  # (B, N, mid)
        se = se[:, :, None, None, :]
        y = SELayer(self.mid_channels, dtype=self.dtype, name="se")(
            y, jnp.broadcast_to(se, y.shape)
        )
        return y
