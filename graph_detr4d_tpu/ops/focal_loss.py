"""Sigmoid focal loss, numerically matched to mmcv's CUDA implementation
(configured at projects/configs/detr4d/...12e.py:97-102: gamma=2, alpha=0.25,
loss_weight=2.0, use_sigmoid=True).

Pure JAX: stable BCE-with-logits form so bf16/fp32 both behave; labels equal
to `num_classes` denote background (all-zero one-hot), matching mmdet's
convention in DETR heads.
"""

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    *,
    alpha: float = 0.25,
    gamma: float = 2.0,
    avg_factor=None,
) -> jnp.ndarray:
    """Focal loss over (..., num_classes) logits.

    Args:
      logits: (..., C) class logits.
      labels: (...,) int labels in [0, C]; C means background.
      weights: optional (...,) per-sample weights.
      avg_factor: divide the summed loss by this (no clamping here; caller
        matches the reference's max(avg_factor, 1)).

    Returns scalar loss (if avg_factor given) or per-element loss summed.
    """
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    # stable bce with logits
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * target + (1.0 - p) * (1.0 - target)
    alpha_t = alpha * target + (1.0 - alpha) * (1.0 - target)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * bce
    if weights is not None:
        loss = loss * weights[..., None]
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss
