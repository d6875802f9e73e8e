"""nuScenes metric protocol sanity tests."""

import numpy as np

from graph_detr4d_tpu.eval import DetectionEvaluator, DetectionConfig


def box(x, y, z=0.0, w=2.0, l=4.0, h=1.5, yaw=0.0, vx=0.0, vy=0.0):
    return [x, y, z, w, l, h, yaw, vx, vy]


def test_perfect_predictions_give_map_one():
    # labels index cfg.class_names (the detector's label space): with a
    # custom 2-class list, pedestrian is label 1 — NOT the canonical
    # nuScenes id 8 (add_sample and evaluate must agree on this)
    ev = DetectionEvaluator(
        DetectionConfig(class_names=("car", "pedestrian"))
    )
    gts = np.array([box(10, 0), box(-5, 3), box(0, 20)])
    labels = np.array([0, 0, 1])
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


def test_range_filter_uses_ego_distance():
    """The devkit's per-class range cut is on distance from the EGO, not
    the sensor origin: with the nuScenes lidar ~0.94 m ahead of the ego
    center, a car GT 49.5 m from the lidar can be >50 m from the ego.
    add_sample(ego_xy=...) must apply the offset."""
    gt = np.array([box(49.5, 0)])
    pred = np.array([box(49.5, 0)])
    # ego sits 0.94 m behind the lidar origin (lidar frame)
    ego_xy = np.array([-0.94, 0.0])

    ev_lidar = DetectionEvaluator()
    ev_lidar.add_sample(pred, [0], [0.9], gt, [0])
    assert ev_lidar.evaluate()["per_class_ap"]["car"] > 0.99

    ev_ego = DetectionEvaluator()
    ev_ego.add_sample(pred, [0], [0.9], gt, [0], ego_xy=ego_xy)
    # 49.5 + 0.94 > 50 m from the ego -> filtered on both sides
    assert ev_ego.evaluate()["per_class_ap"]["car"] == 0.0


def test_cummean_devkit_nan_semantics():
    """Leading-NaN TP-error entries must contribute 0 over the full
    confidence grid (devkit cummean: nancumsum / cumsum(valid) with
    where=count!=0), not left-clamp to the first valid mean. Two matched
    cars: the high-confidence one has attribute-less GT (NaN attr err),
    the low-confidence one mismatches (err 1) -> devkit mAAE averages
    the [0, 0.5]-ish curve, the dropped-NaN variant would report ~1."""
    ev = DetectionEvaluator()
    gt = np.array([box(10, 0, vx=1.0), box(-10, 0, vx=1.0)])
    pred = np.array([box(10, 0, vx=1.0), box(-10, 0, vx=1.0)])
    ev.add_sample(
        pred,
        [0, 0],
        [0.95, 0.4],
        gt,
        [0, 0],
        gt_attrs=np.asarray(["", "vehicle.parked"], object),
    )
    # pred attr for a moving car is vehicle.moving -> mismatch err 1 on
    # the second match only; devkit cummean = [0 (no valid yet), 1/1]
    # -> attr curve is 0 up to recall 0.5 then rises to 1; averaged over
    # the recall grid [0.11, 1.0] that is 25.5/90
    md = ev._accumulate(0, "car", 2.0)
    got = ev._calc_tp(md, "attr_err")
    np.testing.assert_allclose(got, 25.5 / 90.0, atol=1e-9)
    # the dropped-NaN variant reported a constant 1.0 here
    assert got < 0.5
    res = ev.evaluate()
    assert "mAAE" in res  # classes with no data contribute their 1.0
    np.testing.assert_allclose(res["mAAE"], (got + 7.0) / 8.0, atol=1e-9)


def test_select_attribute_unknown_class_is_neutral():
    from graph_detr4d_tpu.eval.submission import select_attribute

    assert select_attribute("van", (0.0, 0.0)) == ""
    assert select_attribute("van", (3.0, 0.0)) == ""


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
    # label 0 = barrier in THIS config's label space (labels index
    # cfg.class_names, not the canonical 10-class ids)
    ev.add_sample(pred, np.array([0]), np.array([0.9]), gt, np.array([0]))
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


def test_bike_rack_filter_devkit_semantics():
    """filter_eval_boxes bike-rack rule: bicycle/motorcycle boxes whose
    center falls inside a static_object.bicycle_rack box are removed from
    BOTH predictions and GT; other classes are untouched (devkit
    filter_eval_boxes, driven from multi_nuscenes_dataset.py:196-260)."""
    names = ("car", "bicycle", "motorcycle")
    # rack at (10, 0), 4 x 6 footprint, rotated 90 deg: local x-extent
    # (w=4) lies along world Y, local y-extent (l=6) along world X
    rack = np.array([[10.0, 0.0, 0.5, 4.0, 6.0, 2.0, np.pi / 2]])

    bike_in = box(11.5, 0.5, 0.5)  # inside (|dx|=1.5 <= 6/2, |dy|=0.5 <= 4/2)
    bike_out = box(14.0, 0.0, 0.5)  # outside along rotated l/2=3 extent
    car_in = box(10.0, 0.0, 0.5)  # inside but not a bike class
    moto_in = box(9.0, -1.0, 0.5)

    gts = np.array([bike_in, bike_out, car_in, moto_in])
    labels = np.array([1, 1, 0, 2])
    scores = np.array([0.9, 0.8, 0.95, 0.85])

    ev = DetectionEvaluator(DetectionConfig(class_names=names))
    ev.add_sample(gts, labels, scores, gts, labels, bike_racks=rack)
    # stored sets lost exactly the in-rack bike + moto (pred and gt alike)
    assert len(ev.preds[-1]) == 2 and len(ev.gts[-1]) == 2
    assert list(ev.gts[-1].label) == [1, 0]
    res = ev.evaluate()
    assert res["per_class_ap"]["bicycle"] > 0.99  # out-of-rack bike kept
    assert res["per_class_ap"]["car"] > 0.99

    # default off: no racks -> nothing filtered
    ev2 = DetectionEvaluator(DetectionConfig(class_names=names))
    ev2.add_sample(gts, labels, scores, gts, labels)
    assert len(ev2.preds[-1]) == 4

    # yaw matters: unrotated rack has w=4 along X -> bike at (14, 0) is
    # outside (|dx|=4 > 4/2), bike at (11.5, .5) needs |dy| <= 6/2 - ok
    rack0 = rack.copy()
    rack0[0, 6] = 0.0
    ev3 = DetectionEvaluator(DetectionConfig(class_names=names))
    ev3.add_sample(gts, labels, scores, gts, labels, bike_racks=rack0)
    assert len(ev3.gts[-1]) == 2  # bike_in dropped (|dx|=1.5<2, |dy|=.5<3)


def test_bike_rack_filter_z_convention():
    """cz is CENTER-z for boxes and racks (devkit Box.translation; this
    repo's coder regresses center-z). The vertical containment test is
    |box_cz - rack_cz| <= rack_h/2 — a fixture where the convention
    matters: a rack with center z=1.0, h=2.0 spans z in [0, 2]."""
    names = ("car", "bicycle")
    rack = np.array([[10.0, 0.0, 1.0, 4.0, 6.0, 2.0, 0.0]])

    bike_inside = box(10.0, 0.0, z=1.5)  # |dz|=0.5 <= 1.0 -> filtered
    bike_above = box(10.0, 0.0, z=2.5)  # |dz|=1.5 > 1.0 -> kept
    # a BOTTOM-center caller would describe bike_inside as z=0.75
    # (1.5 - h/2); fed unconverted, |dz|=0.25 still filters here, but a
    # bike sitting ON TOP of the rack (center 2.5, bottom 1.75) would
    # wrongly filter: |1.75 - 1.0| = 0.75 <= 1.0. The test pins the
    # CENTER-z reading: 2.5 stays, 1.5 goes.
    gts = np.array([bike_inside, bike_above])
    labels = np.array([1, 1])
    scores = np.array([0.9, 0.8])

    ev = DetectionEvaluator(DetectionConfig(class_names=names))
    ev.add_sample(gts, labels, scores, gts, labels, bike_racks=rack)
    assert len(ev.gts[-1]) == 1
    assert float(ev.gts[-1].xyz[0][2]) == 2.5  # the above-rack bike
