"""NMS-free set-prediction loss over all decoder layers.

Parity with Detr3DHeadPE.loss / loss_single (detr3d_head_pe.py:782-849):
focal classification (gamma 2, alpha 0.25, weight 2.0) with
`sync_cls_avg_factor` cross-replica mean, weighted L1 regression
(weight 0.25, code_weights, non-finite-target masking), per-decoder-layer
losses logged as d{i}.loss_cls / d{i}.loss_bbox.

The two `reduce_mean` sync points (:824-826, :834-835) become `lax.pmean`
over the data mesh axis — the behavioral requirement for multi-host loss
parity (SURVEY §2.10).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import LossConfig, HeadConfig
from ..geometry.boxes import normalize_bbox
from ..ops.focal_loss import sigmoid_focal_loss
from .matching import match_targets


def _pmean(x, axis_name):
    return jax.lax.pmean(x, axis_name) if axis_name is not None else x


def loss_single_layer(
    cls_scores: jnp.ndarray,  # (B, Q, C)
    bbox_preds: jnp.ndarray,  # (B, Q, 10)
    gt_bboxes: jnp.ndarray,  # (B, G, 9)
    gt_labels: jnp.ndarray,  # (B, G)
    gt_valid: jnp.ndarray,  # (B, G)
    loss_cfg: LossConfig,
    head_cfg: HeadConfig,
    axis_name: Optional[str] = None,
):
    B, Q, C = cls_scores.shape
    t = jax.vmap(
        lambda c, b, gb, gl, gv: match_targets(
            c,
            b,
            gb,
            gl,
            gv,
            num_classes=head_cfg.num_classes,
            cls_weight=loss_cfg.match_cls_weight,
            reg_weight=loss_cfg.match_reg_weight,
        )
    )(cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_valid)

    num_total_pos = t.num_pos.sum()
    # classification: avg factor = pos + bg_weight * neg, synced (:822-828)
    cls_avg = num_total_pos + loss_cfg.bg_cls_weight * (
        B * Q - num_total_pos
    )
    if loss_cfg.sync_cls_avg_factor:
        cls_avg = _pmean(cls_avg, axis_name)
    cls_avg = jnp.maximum(cls_avg, 1.0)
    loss_cls = loss_cfg.cls_weight * sigmoid_focal_loss(
        cls_scores.reshape(B * Q, C).astype(jnp.float32),
        t.labels.reshape(-1),
        t.label_weights.reshape(-1),
        alpha=loss_cfg.focal_alpha,
        gamma=loss_cfg.focal_gamma,
        avg_factor=cls_avg,
    )

    # regression: weighted L1 on normalized targets (:837-845)
    num_pos_sync = jnp.maximum(_pmean(num_total_pos, axis_name), 1.0)
    codes = normalize_bbox(t.bbox_targets.reshape(B * Q, -1))
    finite = jnp.isfinite(codes).all(-1, keepdims=True)
    codes = jnp.where(finite, codes, 0.0)
    code_w = jnp.asarray(head_cfg.code_weights, jnp.float32)
    w = (
        t.bbox_weights.reshape(B * Q, 1)
        * finite.astype(jnp.float32)
        * code_w[None, :]
    )
    diff = jnp.abs(bbox_preds.reshape(B * Q, -1).astype(jnp.float32) - codes)
    loss_bbox = loss_cfg.bbox_weight * (diff * w).sum() / num_pos_sync

    loss_cls = jnp.nan_to_num(loss_cls)
    loss_bbox = jnp.nan_to_num(loss_bbox)
    return loss_cls, loss_bbox, num_total_pos


def detr3d_loss(
    preds: dict,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    loss_cfg: LossConfig,
    head_cfg: HeadConfig,
    axis_name: Optional[str] = None,
):
    """Sum of per-decoder-layer losses + a metrics dict (:1013-1094).

    Layers are vmapped: the Hungarian matching's sequential
    augmenting-path loops across the 6 decoder stages run in lockstep
    instead of back-to-back (6x fewer serialized device loop trips)."""
    all_cls = preds["all_cls_scores"]
    all_bbox = preds["all_bbox_preds"]
    num_layers = all_cls.shape[0]

    lcs, lbs, nposs = jax.vmap(
        lambda c, b: loss_single_layer(
            c,
            b,
            gt_bboxes,
            gt_labels,
            gt_valid,
            loss_cfg,
            head_cfg,
            axis_name,
        )
    )(all_cls, all_bbox)

    total = lcs.sum() + lbs.sum()
    metrics = {}
    for lid in range(num_layers):
        tag = "" if lid == num_layers - 1 else f"d{lid}."
        metrics[f"{tag}loss_cls"] = lcs[lid]
        metrics[f"{tag}loss_bbox"] = lbs[lid]
    metrics["num_pos"] = nposs[-1]
    metrics["loss"] = total
    return total, metrics


def hybrid_detr3d_loss(
    preds: dict,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    loss_cfg: LossConfig,
    head_cfg: HeadConfig,
    axis_name: Optional[str] = None,
):
    """H-DETR hybrid loss: one2one set loss + lambda * one2many set loss
    with GT repeated k_one2many times (h_detr3d_head_pe.py:616-668)."""
    total, metrics = detr3d_loss(
        preds, gt_bboxes, gt_labels, gt_valid, loss_cfg, head_cfg, axis_name
    )
    k = head_cfg.k_one2many
    rep_bboxes = jnp.tile(gt_bboxes, (1, k, 1))
    rep_labels = jnp.tile(gt_labels, (1, k))
    rep_valid = jnp.tile(gt_valid, (1, k))
    o2m_preds = {
        "all_cls_scores": preds["all_cls_scores_one2many"],
        "all_bbox_preds": preds["all_bbox_preds_one2many"],
    }
    o2m_total, o2m_metrics = detr3d_loss(
        o2m_preds,
        rep_bboxes,
        rep_labels,
        rep_valid,
        loss_cfg,
        head_cfg,
        axis_name,
    )
    lam = head_cfg.lambda_one2many
    total = total + lam * o2m_total
    for key, v in o2m_metrics.items():
        if key.endswith("loss_cls") or key.endswith("loss_bbox"):
            metrics[f"o2m.{key}"] = lam * v
    metrics["loss"] = total
    return total, metrics
