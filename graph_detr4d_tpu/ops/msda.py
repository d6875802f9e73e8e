"""Multi-scale deformable attention sampling — pure-XLA formulation.

TPU-native replacement for mmcv's `MultiScaleDeformableAttnFunction` CUDA
kernel (invoked at deform3d_cross_attn.py:301-309). Semantics:

  * sampling locations are in [0, 1] per level; pixel coords follow
    `align_corners=False` (x_px = x * W - 0.5), bilinear, zero padding
    outside — identical to mmcv's im2col bilinear gather.
  * output = sum over (level, point) of attention_weight * sampled value,
    per head.

The formulation is four corner gathers per level (take_along_axis over the
flattened H*W axis) with corner weights folded into the attention weights,
which XLA fuses into a single gather+FMA chain. Differentiable for free
(gather has a scatter-add transpose). A fused Pallas kernel lives in
`msda_pallas.py`; this is the reference implementation it is tested against.
"""

from typing import Sequence

import jax.numpy as jnp


def _sample_level(value, loc, attn):
    """Gather + weight one pyramid level.

    Args:
      value: (B, H, W, nheads, hd) level features.
      loc:   (B, S, nheads, 2) sampling locations in [0, 1] (x, y).
      attn:  (B, S, nheads) attention weights (already include masks).

    Returns (B, S, nheads, hd) weighted samples.
    """
    B, H, W, nheads, hd = value.shape
    S = loc.shape[1]
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    vflat = value.reshape(B, H * W, nheads, hd)
    out = jnp.zeros((B, S, nheads, hd), dtype=value.dtype)
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        for dx, wx in ((0, 1.0 - lx), (1, lx)):
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = (
                jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            ).astype(jnp.int32)
            gathered = jnp.take_along_axis(vflat, idx[..., None], axis=1)
            w = (wy * wx * inb.astype(value.dtype) * attn)[..., None]
            out = out + gathered * w
    return out


def multi_scale_deformable_attention(
    values: Sequence[jnp.ndarray],
    locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention over a feature pyramid.

    Args:
      values: list of L arrays (B, H_l, W_l, nheads, hd), channels-last.
      locations: (B, Q, nheads, L, P, 2) sampling locations in [0, 1], (x, y).
      attention_weights: (B, Q, nheads, L, P); caller is responsible for any
        softmax/masking (the reference does softmax over L*P then multiplies
        the projection-validity mask, deform3d_cross_attn.py:284).

    Returns:
      (B, Q, nheads * hd) aggregated features.
    """
    B, Q, nheads, L, P, _ = locations.shape
    assert len(values) == L, (len(values), L)
    hd = values[0].shape[-1]
    out = jnp.zeros((B, Q * P, nheads, hd), dtype=values[0].dtype)
    for lvl in range(L):
        loc = locations[:, :, :, lvl].transpose(0, 1, 3, 2, 4).reshape(
            B, Q * P, nheads, 2
        )
        attn = attention_weights[:, :, :, lvl].transpose(0, 1, 3, 2).reshape(
            B, Q * P, nheads
        )
        out = out + _sample_level(values[lvl], loc, attn)
    # sum over points
    out = out.reshape(B, Q, P, nheads, hd).sum(axis=2)
    return out.reshape(B, Q, nheads * hd)
