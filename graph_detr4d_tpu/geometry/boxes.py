"""3D box codec: 9-DoF boxes <-> 10-d regression codes.

Behavioral parity with the reference codec
(projects/mmdet3d_plugin/core/bbox/util.py:38-87):

  box    = (cx, cy, cz, w, l, h, yaw[, vx, vy])        gravity/bottom-center
  code   = (cx, cy, log w, log l, cz, log h, sin yaw, cos yaw[, vx, vy])

All functions are pure jnp and shape-polymorphic over leading axes, so they
vmap/jit cleanly and run identically on TPU and the CPU test backend.
"""

import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """Encode 9-DoF boxes (..., 7 or 9) into regression codes (..., 8 or 10).

    `pc_range` is accepted for interface parity but unused, exactly like the
    reference (util.py:38 takes it and never reads it).
    """
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(codes: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """Decode regression codes (..., 8 or 10) back to boxes (..., 7 or 9)."""
    rot = jnp.arctan2(codes[..., 6:7], codes[..., 7:8])
    cx = codes[..., 0:1]
    cy = codes[..., 1:2]
    cz = codes[..., 4:5]
    w = jnp.exp(codes[..., 2:3])
    l = jnp.exp(codes[..., 3:4])
    h = jnp.exp(codes[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if codes.shape[-1] > 8:
        parts += [codes[..., 8:9], codes[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)
