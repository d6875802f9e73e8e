"""Camera-aware feature modulation (BEVDepth-style DepthNet).

Parity with Detr3DHeadPECAM's DepthNet
(models/dense_heads/detr3d_head_pe_camaware.py:59-105): per-camera pixel
size derived from the inverse intrinsics, scaled by the image-domain
augmentation factor (ida), embedded by a small MLP and applied as a
squeeze-excite gate after a 3x3 reduce conv.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm, SELayer, TwoLayerMLP
from ..geometry.projection import inv4x4


class DepthNet(nn.Module):
    mid_channels: int
    context_channels: int
    scale_depth_factor: float = 1000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, intrinsics, ida_scale):
        """x (B, N, H, W, C); intrinsics (B, N, 4, 4); ida_scale (B, N).

        ida_scale carries the reference's aug_scale QUIRK upstream:
        `sqrt(ida[0,0]^2 + ida[0,0]^2)` — ida[0,0] twice, i.e.
        sqrt(2)*|ida00| (detr3d_head_pe_camaware.py:93-95); the pipeline
        computes it that way (data/pipeline.py build_batch)."""
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

        inv_k = inv4x4(intrinsics)
        pixel_size = jnp.sqrt(
            inv_k[..., 0, 0] ** 2 + inv_k[..., 1, 1] ** 2
        )  # (B, N)
        scaled = (
            pixel_size * self.scale_depth_factor / jnp.maximum(ida_scale, 1e-6)
        )[..., None]
        # reference Mlp default act_layer is ReLU
        # (detr3d_head_pe_camaware.py:35-48)
        se = TwoLayerMLP(
            self.mid_channels,
            self.mid_channels,
            act=nn.relu,
            dtype=self.dtype,
            name="mlp",
        )(scaled.astype(self.dtype))  # (B, N, mid)
        se = se[:, :, None, None, :]
        y = SELayer(self.mid_channels, dtype=self.dtype, name="se")(
            y, jnp.broadcast_to(se, y.shape)
        )
        return y


def cam_coord_channels(
    feat_h: int,
    feat_w: int,
    img_h: float,
    img_w: float,
    fx,
    fy,
    cx,
    cy,
    scale_centered_coord: float = 320.0,
    norm_coord_maps: bool = True,
    centered_coord: bool = True,
    fov_maps: bool = True,
):
    """CoordConv-style camera-aware coordinate channels
    (AddCAMCoords, detr3d_head_pe.py:22-163): normalized xy, FOV angles
    atan((u - cx)/fx), and scaled centered coordinates, computed on the
    full image grid then resized to the feature resolution.

    fx/fy/cx/cy: (B, N) per-camera intrinsics. Returns
    (B, N, feat_h, feat_w, C_extra) with stop_gradient applied.
    """
    import jax

    B, N = fx.shape
    w = int(img_w)
    h = int(img_h)
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, w)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]  # (h, 1)
    xx = jnp.broadcast_to(xx, (h, w))
    yy = jnp.broadcast_to(yy, (h, w))

    chans = []
    if norm_coord_maps:
        nx = (xx / (w - 1)) * 2.0 - 1.0
        ny = (yy / (h - 1)) * 2.0 - 1.0
        chans += [
            jnp.broadcast_to(nx[None, None], (B, N, h, w)),
            jnp.broadcast_to(ny[None, None], (B, N, h, w)),
        ]
    if centered_coord or fov_maps:
        cent_x = xx[None, None] - cx[..., None, None] + 0.5
        cent_y = yy[None, None] - cy[..., None, None] + 0.5
        if fov_maps:
            chans += [
                jnp.arctan(cent_x / fx[..., None, None]),
                jnp.arctan(cent_y / fy[..., None, None]),
            ]
        if centered_coord:
            chans += [
                cent_x / scale_centered_coord,
                cent_y / scale_centered_coord,
            ]
    full = jnp.stack(chans, axis=-1)  # (B, N, h, w, C)
    # nearest resize to feature resolution (the reference interpolates)
    import jax.image

    out = jax.image.resize(
        full,
        (B, N, feat_h, feat_w, full.shape[-1]),
        method="linear",
    )
    return jax.lax.stop_gradient(out)


class CAMConv(nn.Module):
    """1x1 conv over features with camera-aware coordinate channels
    appended (CAMConv, detr3d_head_pe.py:166-243) — the 'camconvfpe'
    config variant's PE adapter."""

    out_channels: int
    img_shape: tuple  # (img_h, img_w)
    scale_centered_coord: float = 320.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, intrinsics):
        """x (B, N, H, W, C); intrinsics (B, N, 4, 4) padded K."""
        B, N, H, W, _ = x.shape
        fx = intrinsics[..., 0, 0].astype(jnp.float32)
        fy = intrinsics[..., 1, 1].astype(jnp.float32)
        cx = intrinsics[..., 0, 2].astype(jnp.float32)
        cy = intrinsics[..., 1, 2].astype(jnp.float32)
        extra = cam_coord_channels(
            H,
            W,
            self.img_shape[0],
            self.img_shape[1],
            fx,
            fy,
            cx,
            cy,
            scale_centered_coord=self.scale_centered_coord,
        )
        y = jnp.concatenate([extra.astype(x.dtype), x], axis=-1)
        return nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, name="conv"
        )(y)


class SELayerCAMConv(nn.Module):
    """SE gate whose reduce conv is camera-aware (SELayerCAMConvV1,
    detr3d_head_pe.py:277-295): coordinate/intrinsic channels join the
    gating path so the PE modulation can depend on each camera's optics.
    Interface matches SELayer: gate(x_se(feat)) applied to `pe`."""

    channels: int
    img_shape: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pe, feat, intrinsics=None):
        B, N = feat.shape[:2]
        if intrinsics is None:
            intrinsics = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32), (B, N, 4, 4)
            )
        y = CAMConv(
            self.channels,
            img_shape=self.img_shape,
            dtype=self.dtype,
            name="conv_reduce",
        )(feat, intrinsics)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (1, 1), dtype=self.dtype, name="conv_expand"
        )(y)
        return pe * jax.nn.sigmoid(y.astype(jnp.float32)).astype(pe.dtype)
