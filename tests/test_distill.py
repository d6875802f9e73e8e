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


def test_teacher_top_k_parity_and_reduction():
    """teacher_top_k >= Qt is exactly the full path; a smaller K matches a
    scipy brute-force solve of the reduced (top-K teacher rows) problem."""
    from scipy.optimize import linear_sum_assignment

    from graph_detr4d_tpu.distill.distiller import instance_distill_loss

    Qs = Qt = 12
    C = 4
    t_cls = jnp.asarray(RNG.randn(2, 1, Qt, C) * 3, jnp.float32)
    t_box = jnp.asarray(RNG.randn(2, 1, Qt, 10), jnp.float32)
    s_cls = jnp.asarray(RNG.randn(2, 1, Qs, C) * 3, jnp.float32)
    s_box = jnp.asarray(RNG.randn(2, 1, Qs, 10), jnp.float32)
    t_outs = {"all_cls_scores": t_cls, "all_bbox_preds": t_box}
    s_outs = {"all_cls_scores": s_cls, "all_bbox_preds": s_box}

    full = instance_distill_loss(t_outs, s_outs, None, DistillConfig())
    same = instance_distill_loss(
        t_outs, s_outs, None, DistillConfig(teacher_top_k=Qt)
    )
    np.testing.assert_allclose(
        float(full[0]), float(same[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(full[1]), float(same[1]), rtol=1e-6
    )

    # K < Qt: verify the matching equals scipy on the reduced cost
    K = 5
    red = instance_distill_loss(
        t_outs, s_outs, None, DistillConfig(teacher_top_k=K)
    )
    assert np.isfinite(float(red[0])) and np.isfinite(float(red[1]))

    # independent oracle for one stage/image
    sc = np.asarray(s_cls[0, 0])
    sb = np.asarray(s_box[0, 0])
    t_scores = 1.0 / (1.0 + np.exp(-np.asarray(t_cls[0, 0])))
    idx = np.argsort(-t_scores.max(-1))[:K]
    ts, tb_k = t_scores[idx], np.asarray(t_box[0, 0])[idx]
    log_p = -np.logaddexp(0, -sc)
    log_np = -np.logaddexp(0, sc)
    cost = -(log_p @ ts.T + log_np @ (1 - ts).T)
    cost += 0.25 * np.abs(
        sb[:, None, :8] - tb_k[None, :, :8]
    ).sum(-1)
    rows, cols = linear_sum_assignment(cost.T)  # rows=teacher, cols=student
    from graph_detr4d_tpu.distill.losses import match_soft_targets

    t_for_s = np.asarray(
        match_soft_targets(
            jnp.asarray(sc), jnp.asarray(sb), jnp.asarray(ts), jnp.asarray(tb_k)
        )
    )
    oracle_cost = cost.T[rows, cols].sum()
    ours_cost = cost.T[np.arange(K), t_for_s].sum()
    np.testing.assert_allclose(ours_cost, oracle_cost, rtol=1e-5)


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


def test_teacher_split_forward_matches_full_apply():
    """The distill CLIs run the teacher as extract_feats + forward_feats
    (ONE backbone pass; tools/distill_train.py) instead of a full
    __call__ next to a separate extract_feats — the split must be
    semantically identical to the monolithic forward."""
    model = GraphDETR4D(CFG)
    batch = synthetic_batch(CFG, batch_size=1, seed=3)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    vs = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs, l2i)

    full = jax.jit(lambda v: model.apply(v, imgs, l2i))(vs)

    def split(v):
        feats = model.apply(
            v, imgs, False, None, method=GraphDETR4D.extract_feats
        )
        feats = [jax.lax.stop_gradient(f) for f in feats]
        return model.apply(
            v, feats, l2i, method=GraphDETR4D.forward_feats
        )

    got = jax.jit(split)(vs)
    for k in ("all_cls_scores", "all_bbox_preds"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(full[k]), rtol=1e-5, atol=1e-5
        )
