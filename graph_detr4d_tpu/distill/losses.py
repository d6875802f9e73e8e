"""Distillation losses: soft-label matching cost, soft CE, feature MSE.

Parity targets:
  * DistillCrossEntropyLossCost (core/bbox/match_costs/match_cost.py:30-92):
    BCE cost matrix between student logits and teacher sigmoid scores.
  * DistillCrossEntropyLoss (models/losses/distill_cross_entropy_loss.py:
    151-250): soft-label binary CE on matched pairs.
  * DistillHungarianAssigner3D (core/bbox/assigners/
    distill_hungarian_assigner_3d.py): Hungarian over the soft costs; all
    teacher queries act as soft GT.
  * feature distill 'vanilla'/'attention' (distillers/detr4d_distiller.py:
    121-141): per-level MSE, optionally weighted by teacher spatial/channel
    softmax attention maps (T=0.5).
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.hungarian import hungarian_assignment


def bce_cost_matrix(student_logits: jnp.ndarray, teacher_scores: jnp.ndarray):
    """(Q_s, C) logits x (Q_t, C) soft scores -> (Q_s, Q_t) BCE cost.

    Summed (NOT averaged) over classes: the reference's
    DistillCrossEntropyLossCost computes `n = cls_pred.shape[1]` but never
    divides by it (match_cost.py:56-78), so the class-sum scale is what the
    configured cls/reg cost ratio (1.0 / 0.25) was tuned against.
    """
    s = student_logits.astype(jnp.float32)
    t = teacher_scores.astype(jnp.float32)
    # BCE(s_i, t_j) summed over classes, stable log terms
    log_p = jax.nn.log_sigmoid(s)  # (Qs, C)
    log_np = jax.nn.log_sigmoid(-s)
    return -(log_p @ t.T + log_np @ (1.0 - t).T)


def soft_binary_cross_entropy(
    student_logits: jnp.ndarray,  # (Q, C)
    soft_labels: jnp.ndarray,  # (Q, C) teacher sigmoid scores
    weights: jnp.ndarray,  # (Q,)
    avg_factor,
):
    s = student_logits.astype(jnp.float32)
    t = soft_labels.astype(jnp.float32)
    bce = -(
        t * jax.nn.log_sigmoid(s) + (1.0 - t) * jax.nn.log_sigmoid(-s)
    )
    return (bce * weights[:, None]).sum() / avg_factor


def match_soft_targets(
    student_logits: jnp.ndarray,  # (Qs, C)
    student_codes: jnp.ndarray,  # (Qs, 10)
    teacher_scores: jnp.ndarray,  # (Qt, C) sigmoid
    teacher_codes: jnp.ndarray,  # (Qt, 10) normalized codes
    *,
    cls_weight: float = 1.0,
    reg_weight: float = 0.25,
):
    """Hungarian over soft costs; returns teacher index per student query
    plus a one-to-one validity mask (all teacher queries are used)."""
    reg = jnp.abs(
        student_codes[:, None, :8].astype(jnp.float32)
        - teacher_codes[None, :, :8]
    ).sum(-1)
    cost = cls_weight * bce_cost_matrix(student_logits, teacher_scores)
    cost = cost + reg_weight * reg
    # square Qt x Qs problem, teacher queries as rows
    t_for_s = hungarian_assignment(cost.T)  # (Qt,) -> student idx
    return t_for_s


def feat_distill_loss(
    teacher_feats: Sequence[jnp.ndarray],
    student_feats_adapted: Sequence[jnp.ndarray],
    kind: str = "vanilla",
    temperature: float = 0.5,
):
    """Per-level MSE (optionally attention-weighted) averaged over levels."""
    if len(teacher_feats) != len(student_feats_adapted):
        # zip would silently truncate and the divisor below would deflate
        # the loss — a neck num_outs mismatch must fail at trace time
        raise ValueError(
            f"feature-distill level mismatch: teacher has "
            f"{len(teacher_feats)} levels, student "
            f"{len(student_feats_adapted)}"
        )
    total = 0.0
    for t, s in zip(teacher_feats, student_feats_adapted):
        t = t.astype(jnp.float32)
        s = s.astype(jnp.float32)
        B, N, H, W, C = t.shape
        tf = t.reshape(B * N, H * W, C)
        sf = s.reshape(B * N, H * W, C)
        if kind == "vanilla":
            total = total + jnp.mean((tf - sf) ** 2)
        elif kind == "attention":
            g_c = jnp.abs(tf).mean(-1)  # (BN, HW) spatial saliency
            a_c = (H * W) * jax.nn.softmax(g_c / temperature, axis=1)
            g_s = jnp.abs(tf).mean(1)  # (BN, C) channel saliency
            a_s = C * jax.nn.softmax(g_s / temperature, axis=1)
            mse = (tf - sf) ** 2
            total = total + jnp.mean(
                a_c[:, :, None] * a_s[:, None, :] * mse
            )
        else:
            raise ValueError(kind)
    return total / len(teacher_feats)
