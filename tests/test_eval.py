"""nuScenes metric protocol sanity tests."""

import numpy as np

from graph_detr4d_tpu.eval import DetectionEvaluator, DetectionConfig


def box(x, y, z=0.0, w=2.0, l=4.0, h=1.5, yaw=0.0, vx=0.0, vy=0.0):
    return [x, y, z, w, l, h, yaw, vx, vy]


def test_perfect_predictions_give_map_one():
    ev = DetectionEvaluator(
        DetectionConfig(class_names=("car", "pedestrian"))
    )
    gts = np.array([box(10, 0), box(-5, 3), box(0, 20)])
    labels = np.array([0, 0, 8])
    ev.add_sample(gts, labels, np.array([0.9, 0.8, 0.95]), gts, labels)
    res = ev.evaluate()
    # only classes present can score; per-class AP for car & pedestrian = 1
    assert res["per_class_ap"]["car"] > 0.99
    assert res["per_class_ap"]["pedestrian"] > 0.99
    assert res["mATE"] < 1e-6
    assert res["mASE"] < 1e-6
    assert res["mAOE"] < 1e-6


def test_no_predictions_zero_ap():
    ev = DetectionEvaluator()
    gts = np.array([box(10, 0)])
    ev.add_sample(
        np.zeros((0, 9)), np.zeros((0,)), np.zeros((0,)), gts, np.array([0])
    )
    res = ev.evaluate()
    assert res["per_class_ap"]["car"] == 0.0
    assert res["mAP"] == 0.0


def test_distance_threshold_matters():
    """A prediction 1.5 m off matches at th=2,4 but not 0.5,1 -> AP ~ 0.5."""
    ev = DetectionEvaluator()
    gt = np.array([box(10, 0)])
    pred = np.array([box(10, 1.5)])
    ev.add_sample(pred, np.array([0]), np.array([0.9]), gt, np.array([0]))
    res = ev.evaluate()
    ap = res["per_class_ap"]["car"]
    assert 0.4 < ap < 0.6


def test_range_filter_drops_far_boxes():
    ev = DetectionEvaluator()
    gt = np.array([box(100, 0)])  # beyond car range (50 m)
    pred = np.array([box(100, 0)])
    ev.add_sample(pred, np.array([0]), np.array([0.9]), gt, np.array([0]))
    res = ev.evaluate()
    assert res["per_class_ap"]["car"] == 0.0  # no GT in range -> empty


def test_duplicate_predictions_hurt_precision():
    ev_dup = DetectionEvaluator()
    ev_clean = DetectionEvaluator()
    gt = np.array([box(10, 0)])
    dup = np.array([box(10, 0), box(10.2, 0), box(9.8, 0.2)])
    ev_dup.add_sample(
        dup, np.zeros(3, int), np.array([0.9, 0.85, 0.8]), gt, np.array([0])
    )
    ev_clean.add_sample(
        dup[:1], np.zeros(1, int), np.array([0.9]), gt, np.array([0])
    )
    assert (
        ev_dup.evaluate()["per_class_ap"]["car"]
        <= ev_clean.evaluate()["per_class_ap"]["car"] + 1e-9
    )


def test_orientation_error_period_for_barrier():
    ev = DetectionEvaluator(DetectionConfig(class_names=("barrier",)))
    gt = np.array([box(10, 0, yaw=0.0)])
    pred = np.array([box(10, 0, yaw=np.pi)])  # barrier: period pi -> err 0
    ev.add_sample(pred, np.array([5]), np.array([0.9]), gt, np.array([5]))
    res = ev.evaluate()
    assert res["mAOE"] < 1e-6


def test_velocity_error_measured():
    ev = DetectionEvaluator(DetectionConfig(class_names=("car",)))
    gt = np.array([box(10, 0, vx=2.0, vy=0.0)])
    pred = np.array([box(10, 0, vx=0.0, vy=0.0)])
    ev.add_sample(pred, np.array([0]), np.array([0.9]), gt, np.array([0]))
    res = ev.evaluate()
    assert abs(res["mAVE"] - 2.0) < 1e-6


def test_nds_formula():
    ev = DetectionEvaluator(DetectionConfig(class_names=("car",)))
    gts = np.array([box(10, 0)])
    ev.add_sample(gts, np.array([0]), np.array([0.9]), gts, np.array([0]))
    res = ev.evaluate()
    # single-class config: mAP = 1, all TP errors 0 => NDS = (5+5)/10
    expect = (5 * res["mAP"] + 5.0) / 10.0
    assert abs(res["NDS"] - expect) < 1e-9


def test_submission_formatting():
    """Box lidar->global conversion + attribute rules + range filter
    (multi_nuscenes_dataset.py:123-196, 368-446)."""
    from graph_detr4d_tpu.eval.submission import (
        boxes_to_nusc_annos,
        select_attribute,
        write_submission,
    )

    # identity lidar2ego; ego rotated 90deg about z and translated
    yaw90 = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    info = {
        "token": "tok0",
        "lidar2ego_rotation": [1.0, 0, 0, 0],
        "lidar2ego_translation": [0.0, 0, 0],
        "ego2global_rotation": yaw90,
        "ego2global_translation": [100.0, 50.0, 0.0],
    }
    boxes = np.array(
        [
            [10.0, 0.0, 1.0, 2.0, 4.0, 1.5, 0.0, 3.0, 0.0],  # moving car
            [49.0, 30.0, 0.0, 1.0, 1.0, 2.0, 0.0, 0.0, 0.0],  # out of range
        ],
        np.float32,
    )
    annos = boxes_to_nusc_annos(
        boxes, np.array([0.9, 0.8]), np.array([0, 9]), info
    )
    # traffic_cone at 57m BEV radius > 30m range -> filtered
    assert len(annos) == 1
    a = annos[0]
    # 90deg ego yaw sends lidar (10, 0) to global (100, 50) + (0, 10)
    np.testing.assert_allclose(
        a["translation"], [100.0, 60.0, 1.0], atol=1e-6
    )
    # velocity rotates with the frame
    np.testing.assert_allclose(a["velocity"], [0.0, 3.0], atol=1e-6)
    assert a["detection_name"] == "car"
    assert a["attribute_name"] == "vehicle.moving"
    assert a["sample_token"] == "tok0"

    assert select_attribute("car", (0.0, 0.0)) == "vehicle.parked"
    assert select_attribute("bus", (0.0, 0.0)) == "vehicle.stopped"
    assert select_attribute("bicycle", (1.0, 0.0)) == "cycle.with_rider"
    assert select_attribute("pedestrian", (0.0, 0.0)) == (
        "pedestrian.standing"
    )

    import tempfile, json, os

    with tempfile.TemporaryDirectory() as d:
        path = write_submission({"tok0": annos}, d)
        with open(path) as f:
            data = json.load(f)
        assert data["meta"]["use_camera"]
        assert len(data["results"]["tok0"]) == 1


def test_attribute_error_aae():
    """AAE (devkit attr_err): 1 - attribute accuracy among TPs; predicted
    attributes follow the formatter speed rule
    (multi_nuscenes_dataset.py:149-170); GT attrs enable the metric and
    its NDS slot."""
    from graph_detr4d_tpu.eval.nuscenes_metrics import DetectionEvaluator

    from graph_detr4d_tpu.eval.nuscenes_metrics import DetectionConfig

    cfg = DetectionConfig(class_names=("car",))
    ev = DetectionEvaluator(cfg)
    # two cars: one moving (speed > 0.2 -> pred attr vehicle.moving),
    # one parked (pred attr vehicle.parked); GT attrs swapped -> every
    # attribute prediction wrong -> car attr_err exactly 1
    boxes = np.array(
        [
            [1.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 5.0, 0.0],
            [10.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 0.0, 0.0],
        ]
    )
    labels = np.array([0, 0])
    scores = np.array([0.9, 0.8])
    gt_attrs = np.asarray(["vehicle.parked", "vehicle.moving"], object)
    ev.add_sample(boxes, labels, scores, boxes, labels, gt_attrs=gt_attrs)
    m = ev.evaluate()
    assert "mAAE" in m
    assert abs(m["mAAE"] - 1.0) < 1e-6
    # perfect matching -> mAP 1 for car
    assert m["per_class_ap"]["car"] > 0.99

    # without attrs: no mAAE key, NDS uses the best-case slot
    ev2 = DetectionEvaluator(DetectionConfig(class_names=("car",)))
    ev2.add_sample(boxes, labels, scores, boxes, labels)
    m2 = ev2.evaluate()
    assert "mAAE" not in m2

    # all-correct attributes -> mAAE 0 and NDS above the all-wrong case
    ev3 = DetectionEvaluator(DetectionConfig(class_names=("car",)))
    ev3.add_sample(
        boxes,
        labels,
        scores,
        boxes,
        labels,
        gt_attrs=np.asarray(["vehicle.moving", "vehicle.parked"], object),
    )
    m3 = ev3.evaluate()
    assert m3["mAAE"] == 0.0
    assert m3["NDS"] > m["NDS"]
    # NDS gap is exactly the AAE slot: (1 - mAAE) / 10
    assert abs((m3["NDS"] - m["NDS"]) - 0.1) < 1e-6


def test_tp_metric_class_skips_match_devkit():
    """traffic_cone contributes no orient/vel/attr metric, barrier no
    vel/attr (devkit evaluate.py skip table)."""
    from graph_detr4d_tpu.eval.nuscenes_metrics import DetectionEvaluator

    from graph_detr4d_tpu.eval.nuscenes_metrics import DetectionConfig

    ev = DetectionEvaluator(
        DetectionConfig(class_names=("car", "traffic_cone"))
    )
    # one cone with a deliberately wrong yaw (would blow up mAOE if
    # counted) and one car with perfect yaw
    boxes_gt = np.array(
        [
            [1.0, 0.0, 0.0, 0.3, 0.3, 0.7, 0.0, 0.0, 0.0],  # cone
            [8.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.5, 1.0, 0.0],  # car
        ]
    )
    preds = boxes_gt.copy()
    preds[0, 6] = 3.0  # wrong cone yaw
    labels = np.array([9, 0])  # traffic_cone, car
    scores = np.array([0.9, 0.9])
    ev.add_sample(
        preds,
        labels,
        scores,
        boxes_gt,
        labels,
        gt_attrs=np.asarray(["", "vehicle.moving"], object),
    )
    m = ev.evaluate()
    # cone's wrong yaw must not leak into mAOE
    assert m["mAOE"] < 1e-6


def test_nms_free_decode_matches_torch_oracle():
    """decode_single oracle (nms_free_coder.py:48-98): sigmoid -> flat
    topk over query x class -> index decomposition -> denormalize ->
    post-center-range + score-threshold filter. Locks the (Q, C)
    row-major flattening (labels = idx % C, query = idx // C) and the
    fixed-size validity-mask formulation against the reference's
    dynamic-shape filter."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from graph_detr4d_tpu.core.coder import nms_free_decode

    rng = np.random.RandomState(3)
    Q, C, K = 40, 10, 12
    logits = rng.randn(Q, C).astype(np.float32) * 2
    codes = rng.randn(Q, 10).astype(np.float32)
    codes[:, 2:4] = rng.rand(Q, 2) * 0.5  # log sizes stay sane
    pcr = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    thr = 0.3

    det = nms_free_decode(
        jnp.asarray(logits),
        jnp.asarray(codes),
        max_num=K,
        post_center_range=pcr,
        score_threshold=thr,
    )

    t_scores = torch.sigmoid(torch.from_numpy(logits)).view(-1)
    scores_t, idx_t = t_scores.topk(K)
    labels_t = idx_t % C
    q_t = idx_t // C
    # same denormalization math as the framework (goldens elsewhere)
    from graph_detr4d_tpu.geometry.boxes import denormalize_bbox

    boxes_t = np.asarray(denormalize_bbox(jnp.asarray(codes)))[
        q_t.numpy()
    ]
    keep = (
        (boxes_t[:, :3] >= np.asarray(pcr[:3])).all(1)
        & (boxes_t[:, :3] <= np.asarray(pcr[3:])).all(1)
        & (scores_t.numpy() > thr)
    )

    np.testing.assert_allclose(
        np.asarray(det.scores), scores_t.numpy(), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(det.labels), labels_t.numpy())
    np.testing.assert_allclose(np.asarray(det.bboxes), boxes_t, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(det.valid), keep)
