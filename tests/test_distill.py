"""Distillation subsystem + hybrid matching head."""

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import replace

from graph_detr4d_tpu.config import tiny_test_config
from graph_detr4d_tpu.models import GraphDETR4D
from graph_detr4d_tpu.core.losses import hybrid_detr3d_loss
from graph_detr4d_tpu.distill import Distiller, DistillConfig, distill_loss
from graph_detr4d_tpu.distill.losses import (
    bce_cost_matrix,
    feat_distill_loss,
    match_soft_targets,
)
from graph_detr4d_tpu.data.synthetic import synthetic_batch

CFG = tiny_test_config()
RNG = np.random.RandomState(0)


def test_bce_cost_matrix_prefers_matching_scores():
    logits = jnp.asarray([[8.0, -8.0], [-8.0, 8.0]])
    t = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    cost = np.asarray(bce_cost_matrix(logits, t))
    assert cost[0, 0] < cost[0, 1]
    assert cost[1, 1] < cost[1, 0]


def test_match_soft_targets_identity():
    Q, C = 6, 4
    logits = jnp.asarray(RNG.randn(Q, C) * 4, jnp.float32)
    scores = jax.nn.sigmoid(logits)
    codes = jnp.asarray(RNG.randn(Q, 10), jnp.float32)
    t_for_s = np.asarray(match_soft_targets(logits, codes, scores, codes))
    np.testing.assert_array_equal(np.sort(t_for_s), np.arange(Q))
    # self-matching should be optimal
    np.testing.assert_array_equal(t_for_s, np.arange(Q))


def test_feat_distill_zero_when_identical():
    f = [jnp.asarray(RNG.randn(1, 2, 4, 4, 8), jnp.float32)]
    assert float(feat_distill_loss(f, f, "vanilla")) == 0.0
    assert float(feat_distill_loss(f, f, "attention")) < 1e-6


def test_distiller_end_to_end_loss():
    teacher = GraphDETR4D(CFG)
    batch = synthetic_batch(CFG, 1, num_gt=3)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    tv = teacher.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)
    t_feats = teacher.apply(
        tv, imgs, False, None, method=GraphDETR4D.extract_feats
    )
    t_outs = teacher.apply(tv, imgs, l2i)

    dist = Distiller(
        student_cfg=CFG, teacher_feat_channels=CFG.neck.out_channels
    )
    dv = dist.init({"params": jax.random.PRNGKey(1)}, imgs, l2i)
    s_outs, adapted = dist.apply(dv, imgs, l2i)

    dcfg = DistillConfig(feat_distill_kind="attention")
    total, metrics = distill_loss(
        s_outs,
        adapted,
        t_outs,
        t_feats,
        jnp.asarray(batch["gt_bboxes"]),
        jnp.asarray(batch["gt_labels"]),
        jnp.asarray(batch["gt_valid"]),
        CFG,
        dcfg,
    )
    assert np.isfinite(float(total))
    for k in ("distill_loss_cls", "distill_loss_reg", "feat_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_hybrid_head_and_loss():
    cfg = replace(
        CFG,
        head=replace(
            CFG.head, num_query_one2many=16, k_one2many=2, lambda_one2many=2.0
        ),
    )
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, 1, num_gt=3)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    v = model.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)
    out = model.apply(v, imgs, l2i)
    L, Q = cfg.head.num_decoder_layers, cfg.head.num_query
    assert out["all_cls_scores"].shape[2] == Q
    assert out["all_cls_scores_one2many"].shape[2] == 16
    total, metrics = hybrid_detr3d_loss(
        out,
        jnp.asarray(batch["gt_bboxes"]),
        jnp.asarray(batch["gt_labels"]),
        jnp.asarray(batch["gt_valid"]),
        cfg.loss,
        cfg.head,
    )
    assert np.isfinite(float(total))
    assert any(k.startswith("o2m.") for k in metrics)


def test_mix_distill_guided_decode():
    """MixDistill: student decodes with the teacher's query table and the
    guided outputs enter the distill loss (mix_distill.py:102)."""
    teacher = GraphDETR4D(CFG)
    batch = synthetic_batch(CFG, 1, num_gt=3)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    tv = teacher.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)
    t_feats = teacher.apply(
        tv, imgs, False, None, method=GraphDETR4D.extract_feats
    )
    t_outs = teacher.apply(tv, imgs, l2i)
    t_qe = tv["params"]["head"]["query_embedding"]

    dist = Distiller(
        student_cfg=CFG, teacher_feat_channels=CFG.neck.out_channels
    )
    dv = dist.init(
        {"params": jax.random.PRNGKey(1)}, imgs, l2i,
        teacher_query_embed=t_qe,
    )
    s_outs, adapted = dist.apply(
        dv, imgs, l2i, teacher_query_embed=t_qe
    )
    assert "all_cls_scores_guided" in s_outs
    assert (
        s_outs["all_cls_scores_guided"].shape[2] == t_qe.shape[0]
    )

    dcfg = DistillConfig(mix=True)
    total, metrics = distill_loss(
        s_outs,
        adapted,
        t_outs,
        t_feats,
        jnp.asarray(batch["gt_bboxes"]),
        jnp.asarray(batch["gt_labels"]),
        jnp.asarray(batch["gt_valid"]),
        CFG,
        dcfg,
    )
    assert np.isfinite(float(total))
    assert np.isfinite(float(metrics["mix_loss_cls"]))

    # guided params must be the same modules (no duplicate decoder params)
    flat = jax.tree_util.tree_leaves(dv)
    dv2 = dist.init({"params": jax.random.PRNGKey(1)}, imgs, l2i)
    assert len(flat) == len(jax.tree_util.tree_leaves(dv2))
