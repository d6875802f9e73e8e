"""Small numeric helpers shared across the framework."""

import jax.numpy as jnp


def inverse_sigmoid(x, eps: float = 1e-5):
    """Numerically-guarded logit.

    Matches the clamped inverse-sigmoid the reference uses everywhere for
    iterative box refinement (reference:
    projects/mmdet3d_plugin/models/utils/detr3d_transformer.py:33-43):
    clamp x to [0, 1], then log(clamp(x, eps) / clamp(1 - x, eps)).
    """
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, 1.0)
    x2 = jnp.clip(1.0 - x, eps, 1.0)
    return jnp.log(x1 / x2)
