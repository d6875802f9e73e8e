"""GridMask structured-dropout augmentation, on-device.

Parity with models/utils/grid_mask.py:69-123 as used by the detector
(detectors/detr3d.py:36: GridMask(True, True, rotate=1, offset=False,
ratio=0.5, mode=1, prob=0.7)). rotate=1 means randint(1) == 0 — no actual
rotation — so the mask is pure modular striping, which maps to traced
elementwise ops on TPU (no dynamic shapes, no host round-trip).

mode=1 keeps the strip union: pixel kept iff it lies on an h-strip OR a
w-strip (~75% of pixels for ratio 0.5).
"""

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    images: jnp.ndarray,  # (B, N, H, W, 3)
    prob: float = 0.7,
    ratio: float = 0.5,
) -> jnp.ndarray:
    B, N, H, W, _ = images.shape
    k_apply, k_d, k_sth, k_stw = jax.random.split(rng, 4)

    d = jax.random.randint(k_d, (), 2, H)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sth, (), 0, d)
    st_w = jax.random.randint(k_stw, (), 0, d)

    ys = jnp.arange(H)
    xs = jnp.arange(W)
    strip_h = ((ys - st_h) % d) < l  # (H,)
    strip_w = ((xs - st_w) % d) < l  # (W,)
    keep = (strip_h[:, None] | strip_w[None, :]).astype(images.dtype)

    apply = jax.random.uniform(k_apply, ()) < prob
    mask = jnp.where(apply, keep, jnp.ones_like(keep))
    return images * mask[None, None, :, :, None]
