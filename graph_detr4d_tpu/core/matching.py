"""Hungarian matching for the set-prediction loss, on-device.

Parity with HungarianAssigner3D (core/bbox/assigners/hungarian_assigner_3d.py)
and its costs (core/bbox/match_costs/match_cost.py): FocalLossCost
(weight 2.0) + BBox3DL1Cost (weight 0.25) over the first 8 code dims vs
normalized GT, nan-clamped, solved exactly by the jittable JV solver.

GT is statically padded to max_gt with a validity mask; padded rows carry a
constant cost (provably neutral to the real rows' optimum) and their
assignments are masked out of the targets.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.boxes import normalize_bbox
from ..ops.hungarian import hungarian_assignment


def focal_cost(
    cls_logits: jnp.ndarray,  # (Q, C)
    gt_labels: jnp.ndarray,  # (G,)
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """mmdet FocalLossCost: (Q, G)."""
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * p**gamma
    pos = -jnp.log(p + eps) * alpha * (1.0 - p) ** gamma
    return (pos - neg)[:, gt_labels]


def bbox_l1_cost(bbox_pred: jnp.ndarray, gt_codes: jnp.ndarray) -> jnp.ndarray:
    """L1 cdist over the first 8 code dims: (Q, G)."""
    diff = bbox_pred[:, None, :8] - gt_codes[None, :, :8]
    return jnp.abs(diff).sum(-1)


def hungarian_match_cost(
    cls_logits: jnp.ndarray,  # (Q, C)
    bbox_pred: jnp.ndarray,  # (Q, 10)
    gt_bboxes: jnp.ndarray,  # (G, 9) padded
    gt_labels: jnp.ndarray,  # (G,) padded
    gt_valid: jnp.ndarray,  # (G,) bool
    *,
    cls_weight: float = 2.0,
    reg_weight: float = 0.25,
) -> jnp.ndarray:
    """(G, Q) cost matrix; padded GT rows get a constant."""
    gt_codes = normalize_bbox(gt_bboxes)
    gt_codes = jnp.where(jnp.isfinite(gt_codes), gt_codes, 0.0)
    cost = cls_weight * focal_cost(cls_logits, gt_labels)
    cost = cost + reg_weight * bbox_l1_cost(
        bbox_pred.astype(jnp.float32), gt_codes
    )
    cost = cost.T  # (G, Q)
    return jnp.where(gt_valid[:, None], cost, 1e4)


class MatchTargets(NamedTuple):
    labels: jnp.ndarray  # (Q,) int32, num_classes == background
    label_weights: jnp.ndarray  # (Q,)
    bbox_targets: jnp.ndarray  # (Q, 9)
    bbox_weights: jnp.ndarray  # (Q,)
    num_pos: jnp.ndarray  # () float


def match_targets(
    cls_logits: jnp.ndarray,
    bbox_pred: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    *,
    num_classes: int = 10,
    cls_weight: float = 2.0,
    reg_weight: float = 0.25,
) -> MatchTargets:
    """Match one image and build dense per-query targets
    (detr3d_head_pe.py:674-729 semantics with static shapes)."""
    Q = cls_logits.shape[0]
    cost = hungarian_match_cost(
        cls_logits,
        bbox_pred,
        gt_bboxes,
        gt_labels,
        gt_valid,
        cls_weight=cls_weight,
        reg_weight=reg_weight,
    )
    # only valid GT rows need augmenting paths. Rows are permuted
    # valid-first (a stable argsort — the hybrid one2many path tiles GT so
    # validity is NOT a prefix), solved with num_valid early exit, then
    # un-permuted. Unsolved rows return -1, remapped to Q (a genuinely
    # out-of-bounds index: JAX scatters DROP indices >= size but WRAP
    # negative ones).
    G = gt_valid.shape[0]
    order = jnp.argsort(~gt_valid.astype(bool), stable=True)
    q_sorted = hungarian_assignment(
        cost[order], num_valid=gt_valid.astype(jnp.int32).sum()
    )
    q_for_gt = (
        jnp.full((G,), -1, jnp.int32).at[order].set(q_sorted)
    )
    q_for_gt = jnp.where(q_for_gt < 0, Q, q_for_gt)

    valid_f = gt_valid.astype(jnp.float32)
    labels = jnp.full((Q,), num_classes, jnp.int32)
    labels = labels.at[q_for_gt].set(
        jnp.where(gt_valid, gt_labels.astype(jnp.int32), num_classes)
    )
    bbox_targets = jnp.zeros((Q, gt_bboxes.shape[-1]), jnp.float32)
    bbox_targets = bbox_targets.at[q_for_gt].set(
        gt_bboxes * valid_f[:, None]
    )
    bbox_weights = jnp.zeros((Q,), jnp.float32).at[q_for_gt].set(valid_f)
    return MatchTargets(
        labels=labels,
        label_weights=jnp.ones((Q,), jnp.float32),
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights,
        num_pos=valid_f.sum(),
    )
