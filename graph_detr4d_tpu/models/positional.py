"""Positional encodings.

`sine_positional_encoding_3d` reproduces SinePositionalEncoding3D
(projects/mmdet3d_plugin/models/utils/positional_encoding.py:15-100):
cumulative-sum embeddings over (camera index, y, x) with normalize=True,
offset=-0.5, temperature 10000; output (B, N, H, W, 3*num_feats).

Channels-last output; the head's adapt_pos3d 1x1 conv maps it to embed_dims.
"""

import math

import jax.numpy as jnp


def sine_positional_encoding_3d(
    mask: jnp.ndarray,
    num_feats: int = 128,
    temperature: float = 10000.0,
    offset: float = -0.5,
    eps: float = 1e-6,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """mask: (B, N, H, W) with 1 = padding (ignored), 0 = valid."""
    not_mask = 1.0 - mask.astype(jnp.float32)
    n_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    n_embed = (n_embed + offset) / (n_embed[:, -1:, :, :] + eps) * scale
    y_embed = (y_embed + offset) / (y_embed[:, :, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    def encode(e):
        p = e[..., None] / dim_t
        # REFERENCE QUIRK (checkpoint-parity load-bearing): the plugin's
        # 3D sine PE stacks at dim=4 then .view()s — a BLOCK layout
        # [sin(p0), sin(p2), ..., cos(p1), cos(p3), ...] per axis
        # (positional_encoding.py:93-101), unlike mmdet's 2D encoding
        # which interleaves [sin, cos, sin, cos, ...]. Trained
        # adapt_pos3d/positional weights bake this channel order in.
        return jnp.concatenate(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        )

    pos = jnp.concatenate(
        [encode(n_embed), encode(y_embed), encode(x_embed)], axis=-1
    )
    return pos.astype(dtype)


def sine_positional_encoding_2d(
    h: int,
    w: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    offset: float = -0.5,
    eps: float = 1e-6,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Standard 2-axis sine PE over an unmasked (h, w) grid
    (mmdet SinePositionalEncoding with normalize=True, the DGCNN head's
    `positional_encoding`, dgcnn3d_head.py:140-141).
    Returns (h, w, 2*num_feats) as [y-embed, x-embed]."""
    y_embed = (jnp.arange(1, h + 1, dtype=jnp.float32) + offset) / (
        h + eps
    ) * scale
    x_embed = (jnp.arange(1, w + 1, dtype=jnp.float32) + offset) / (
        w + eps
    ) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    def encode(e):
        p = e[..., None] / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*e.shape, num_feats)

    pos_y = jnp.broadcast_to(encode(y_embed)[:, None, :], (h, w, num_feats))
    pos_x = jnp.broadcast_to(encode(x_embed)[None, :, :], (h, w, num_feats))
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def lid_depth_bins(
    depth_num: int, depth_start: float, depth_max: float
) -> jnp.ndarray:
    """Linear-increasing-discretisation depth bin centers
    (detr3d_head_pe.py:452-455): d_i = start + bin * i * (i+1),
    bin = (max - start) / (D * (D + 1))."""
    index = jnp.arange(depth_num, dtype=jnp.float32)
    bin_size = (depth_max - depth_start) / (depth_num * (1 + depth_num))
    return depth_start + bin_size * index * (index + 1)


import flax.linen as _nn  # noqa: E402  (only this class needs flax)


class LearnedPositionalEncoding3D(_nn.Module):
    """Learned 3-axis PE (positional_encoding.py:103-167): separate
    row/col/cam embedding tables concatenated per position."""

    num_feats: int = 128
    row_num_embed: int = 50
    col_num_embed: int = 50
    cam_num_embed: int = 12

    @_nn.compact
    def __call__(self, bs: int, n: int, h: int, w: int):
        row = self.param(
            "row_embed",
            _nn.initializers.uniform(1.0),
            (self.row_num_embed, self.num_feats),
        )
        col = self.param(
            "col_embed",
            _nn.initializers.uniform(1.0),
            (self.col_num_embed, self.num_feats),
        )
        cam = self.param(
            "cam_embed",
            _nn.initializers.uniform(1.0),
            (self.cam_num_embed, self.num_feats),
        )
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(
                    cam[:n, None, None, :],
                    (n, h, w, self.num_feats),
                ),
                jnp.broadcast_to(
                    row[None, :h, None, :],
                    (n, h, w, self.num_feats),
                ),
                jnp.broadcast_to(
                    col[None, None, :w, :],
                    (n, h, w, self.num_feats),
                ),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(
            pos[None], (bs, n, h, w, 3 * self.num_feats)
        )
