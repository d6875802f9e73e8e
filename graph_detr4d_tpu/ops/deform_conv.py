"""Modulated deformable convolution (DCNv2) as XLA gathers + one matmul.

TPU-native replacement for mmcv's DCNv2 CUDA op, enabled on ResNet stages
3-4 in the reference (configs/detr4d/...12e.py:40-41). Semantics match
mmcv's ModulatedDeformConv2d: per output pixel and kernel tap, a learned
(dy, dx) offset shifts the tap's sampling point, sampled bilinearly with
zero padding, scaled by a sigmoid modulation mask, then contracted with the
conv weight.

Formulated as K taps x 4 corner gathers over the flattened H*W axis plus a
single (K*Cin, Cout) matmul that lands on the MXU.
"""

import jax.numpy as jnp


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 1,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """Args:
      x:       (B, H, W, Cin) input, channels-last.
      offsets: (B, Ho, Wo, K, 2) per-tap (dy, dx) offsets.
      mask:    (B, Ho, Wo, K) modulation (already sigmoid-ed).
      weight:  (K, Cin, Cout) tap-major conv weight.

    Returns (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    Ho = (H + 2 * padding - kernel_size) // stride + 1
    Wo = (W + 2 * padding - kernel_size) // stride + 1
    dtype = x.dtype

    ys = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    xs = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    base_y = ys[:, None]  # (Ho, 1)
    base_x = xs[None, :]  # (1, Wo)

    xflat = x.reshape(B, H * W, Cin)
    cols = []
    for k in range(K):
        ky, kx = divmod(k, kernel_size)
        py = base_y[None] + ky + offsets[..., k, 0].astype(jnp.float32)
        px = base_x[None] + kx + offsets[..., k, 1].astype(jnp.float32)
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ly = (py - y0).astype(dtype)
        lx = (px - x0).astype(dtype)
        acc = jnp.zeros((B, Ho, Wo, Cin), dtype=dtype)
        for dy, wy in ((0, 1.0 - ly), (1, ly)):
            for dx, wx in ((0, 1.0 - lx), (1, lx)):
                yi = y0 + dy
                xi = x0 + dx
                inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                idx = (
                    jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
                ).astype(jnp.int32)
                g = jnp.take_along_axis(
                    xflat, idx.reshape(B, Ho * Wo, 1), axis=1
                ).reshape(B, Ho, Wo, Cin)
                acc = acc + g * (wy * wx * inb.astype(dtype))[..., None]
        cols.append(acc * mask[..., k : k + 1].astype(dtype))
    patches = jnp.stack(cols, axis=3)  # (B, Ho, Wo, K, Cin)
    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        patches,
        weight.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)
