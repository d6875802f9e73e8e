"""LiDAR branch (ObjDGCNN/DGCNN3DHead/voxelize), PETR seg head, IoU3D."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_detr4d_tpu.config import HeadConfig
from graph_detr4d_tpu.ops.voxelize import (
    pillar_center_offsets,
    pillar_indices,
    pillar_scatter,
)
from graph_detr4d_tpu.models.dgcnn import DGCNNAttn, DGCNN3DHead, ObjDGCNN
from graph_detr4d_tpu.models.petr_seg import (
    PETRHeadSeg,
    maps_to_patches,
    patches_to_map,
    lane_mask_loss,
    seg_iou,
    lane_grid,
)
from graph_detr4d_tpu.core.iou3d import (
    bbox_overlaps_nearest_3d,
    bbox_overlaps_3d,
    rotated_overlap_bev,
)

RNG = np.random.RandomState(7)
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def small_head_cfg(**kw):
    base = dict(
        num_query=16,
        num_classes=10,
        embed_dims=32,
        num_reg_fcs=2,
        num_decoder_layers=2,
        num_heads=4,
        num_levels=2,
        num_points=2,
        num_cams=3,
        ffn_dims=64,
        depth_num=8,
        pe_num_feats=16,
        pc_range=PC,
    )
    base.update(kw)
    return HeadConfig(**base)


# ---------------------------------------------------------------- voxelize
def test_pillar_indices_and_scatter():
    pts = jnp.asarray(
        [
            [-51.2 + 0.1, -51.2 + 0.1, 0.0],  # cell (0, 0)
            [51.2 - 0.1, 51.2 - 0.1, 0.0],  # cell (H-1, W-1)
            [0.0, 0.0, 0.0],  # center cell
            [999.0, 0.0, 0.0],  # out of range -> trash
        ]
    )
    mask = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    H = W = 8
    ids, inb = pillar_indices(pts, mask, PC, (H, W))
    assert int(ids[0]) == 0
    assert int(ids[1]) == H * W - 1
    assert int(ids[3]) == H * W  # trash cell
    assert not bool(inb[3])

    feats = jnp.eye(4)
    grid = pillar_scatter(feats, ids, (H, W), reduce="max")
    assert grid.shape == (H, W, 4)
    # the out-of-range point must not appear anywhere
    assert float(grid[..., 3].max()) == 0.0
    assert float(grid.reshape(-1, 4)[0, 0]) == 1.0


def test_pillar_scatter_mean_matches_numpy():
    P, C, H, W = 64, 5, 4, 4
    feats = RNG.randn(P, C).astype(np.float32)
    ids = RNG.randint(0, H * W, size=P).astype(np.int32)
    got = pillar_scatter(jnp.asarray(feats), jnp.asarray(ids), (H, W), "mean")
    want = np.zeros((H * W, C), np.float32)
    for cell in range(H * W):
        sel = feats[ids == cell]
        if len(sel):
            want[cell] = sel.mean(0)
    np.testing.assert_allclose(np.asarray(got).reshape(H * W, C), want, atol=1e-5)


def test_pillar_center_offsets_cluster_features():
    """PFN augmentation parity (PillarFeatureNet _with_cluster_center +
    _with_voxel_center): [points..., dx_c, dy_c, dx_m, dy_m, dz_m] where
    the cluster offsets subtract the mean xyz of the points sharing the
    pillar — verified against a per-cell numpy oracle. Invalid points go
    to the trash cell and must not shift any real pillar's mean."""
    P, F = 48, 4  # xyz + intensity
    H = W = 8
    pts = RNG.randn(P, F).astype(np.float32) * 20.0
    mask = (RNG.rand(P) > 0.2).astype(np.float32)
    ids, _ = pillar_indices(jnp.asarray(pts), jnp.asarray(mask), PC, (H, W))
    aug = pillar_center_offsets(jnp.asarray(pts), ids, PC, (H, W))
    assert aug.shape == (P, F + 5)
    got = np.asarray(aug)
    np.testing.assert_allclose(got[:, :F], pts, atol=1e-6)

    ids_np = np.asarray(ids)
    sx = (PC[3] - PC[0]) / H
    sy = (PC[4] - PC[1]) / W
    for p in range(P):
        cell = ids_np[p]
        # geometric pillar-center offsets (also defined for trash points)
        cx = PC[0] + (cell // W + 0.5) * sx
        cy = PC[1] + (cell % W + 0.5) * sy
        np.testing.assert_allclose(got[p, F], pts[p, 0] - cx, atol=1e-4)
        np.testing.assert_allclose(got[p, F + 1], pts[p, 1] - cy, atol=1e-4)
        # cluster-mean offsets vs the numpy per-cell mean
        sel = pts[ids_np == cell, :3]
        np.testing.assert_allclose(
            got[p, F + 2 :], pts[p, :3] - sel.mean(0), atol=1e-4
        )


# ------------------------------------------------------------------ dgcnn
def test_dgcnn_attn_shapes_and_k_semantics():
    B, N, C = 2, 20, 16
    x = jnp.asarray(RNG.randn(B, N, C), jnp.float32)
    attn = DGCNNAttn(embed_dims=C, k=4)
    vs = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(vs, x)
    assert y.shape == (B, N, C)
    assert np.all(np.isfinite(np.asarray(y)))

    # neighbor selection takes the K *largest* distances (the reference's
    # topk-of-cdist quirk, dgcnn_attn.py:85-87)
    m = DGCNNAttn(embed_dims=2, k=2)
    q = jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [10.0, 0.0]]])
    ef = m.edge_feats(q, 2)  # (1, 3, 2, 4): [neighbor, center]
    # for point 0 the farthest two are points 2 and 1 (in that order)
    np.testing.assert_allclose(np.asarray(ef[0, 0, 0, :2]), [10.0, 0.0])
    np.testing.assert_allclose(np.asarray(ef[0, 0, 1, :2]), [1.0, 0.0])


def test_obj_dgcnn_forward():
    cfg = small_head_cfg(num_levels=3)
    model = ObjDGCNN(head_cfg=cfg, grid_hw=(32, 32), pillar_channels=16)
    P = 256
    pts = RNG.uniform(-50, 50, size=(2, P, 4)).astype(np.float32)
    mask = (RNG.rand(2, P) > 0.1).astype(np.float32)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask)
    )
    out = model.apply(vs, jnp.asarray(pts), jnp.asarray(mask))
    assert out["all_cls_scores"].shape == (2, 2, cfg.num_query, 10)
    assert out["all_bbox_preds"].shape == (2, 2, cfg.num_query, 10)
    # metric cx/cy must land inside pc_range via the sigmoid denorm
    cx = np.asarray(out["all_bbox_preds"][..., 0])
    assert cx.min() >= PC[0] and cx.max() <= PC[3]
    assert np.all(np.isfinite(np.asarray(out["all_bbox_preds"])))


def test_dgcnn_head_loss_integration():
    """DGCNN head output plugs into the shared set-prediction loss."""
    from graph_detr4d_tpu.core.losses import detr3d_loss
    from graph_detr4d_tpu.config import LossConfig

    cfg = small_head_cfg(num_levels=2)
    head = DGCNN3DHead(cfg=cfg, knn_k=4)
    levels = [
        jnp.asarray(RNG.randn(1, 16, 16, cfg.embed_dims), jnp.float32),
        jnp.asarray(RNG.randn(1, 8, 8, cfg.embed_dims), jnp.float32),
    ]
    vs = head.init(jax.random.PRNGKey(0), levels)
    out = head.apply(vs, levels)
    gt_boxes = jnp.zeros((1, 4, 9))
    gt_boxes = gt_boxes.at[:, :, 3:6].set(1.0)
    gt_labels = jnp.zeros((1, 4), jnp.int32)
    gt_mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    loss, logs = detr3d_loss(
        out,
        gt_boxes,
        gt_labels,
        gt_mask,
        LossConfig(max_gt=4),
        cfg,
    )
    assert np.isfinite(float(loss))


# --------------------------------------------------------------- petr seg
def test_lane_grid_and_patch_roundtrip():
    g = lane_grid(100)
    assert g.shape == (100, 2)
    assert g.min() > 0 and g.max() < 1

    gt = (RNG.rand(3, 256, 256) > 0.5).astype(np.float32)
    patches = maps_to_patches(gt)
    assert patches.shape == (256, 768)
    back = np.asarray(patches_to_map(jnp.asarray(patches)))
    np.testing.assert_array_equal(back, gt)


def test_lane_mask_loss_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = RNG.randn(16, 48).astype(np.float32)
    targets = (RNG.rand(16, 48) > 0.7).astype(np.float32)
    got = float(lane_mask_loss(jnp.asarray(logits), jnp.asarray(targets)))

    t_in = torch.from_numpy(logits)
    t_tg = torch.from_numpy(targets)
    pos_weight = (t_tg == 0).float().sum(dim=1) / (t_tg == 1).float().sum(
        dim=1
    ).clamp(min=1.0)
    w = t_tg * pos_weight.unsqueeze(1) + (1 - t_tg)
    want = float(
        F.binary_cross_entropy_with_logits(t_in, t_tg, weight=w)
    )
    assert abs(got - want) < 1e-5


def test_seg_iou():
    p = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    t = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    iou = float(seg_iou(p, t)[0])
    want = (2 * 1 + 0.01) / (2 + 1 + 0.01)
    assert abs(iou - want) < 1e-6


def test_petr_head_seg_forward():
    cfg = small_head_cfg()
    head = PETRHeadSeg(
        cfg=cfg,
        img_shape=(64, 128),
        num_lane=16,
        lane_out=48,
    )
    feats = [
        jnp.asarray(RNG.randn(1, 3, 8, 16, cfg.embed_dims), jnp.float32)
    ]
    from graph_detr4d_tpu.data.synthetic import synthetic_camera_rig

    l2i = jnp.asarray(
        synthetic_camera_rig(3, (64, 128), 0)[None], jnp.float32
    )
    vs = head.init(jax.random.PRNGKey(0), feats, l2i)
    out = head.apply(vs, feats, l2i)
    assert out["all_cls_scores"].shape == (2, 1, cfg.num_query, 10)
    assert out["all_lane_preds"].shape == (2, 1, 16, 48)
    assert np.all(np.isfinite(np.asarray(out["all_lane_preds"])))


# ------------------------------------------------------------------ iou3d
def _box(cx, cy, cz, w, l, h, yaw):
    return [cx, cy, cz, w, l, h, yaw]


def test_nearest_iou_axis_aligned():
    b1 = jnp.asarray([_box(0, 0, 0, 2, 2, 2, 0.0)])
    b2 = jnp.asarray([_box(1, 0, 0, 2, 2, 2, 0.0)])
    iou = float(bbox_overlaps_nearest_3d(b1, b2)[0, 0])
    # BEV overlap 1x2=2, areas 4 each -> 2/6
    assert abs(iou - 2.0 / 6.0) < 1e-6


def test_nearest_iou_yaw_snap():
    # yaw ~ pi/2 swaps extents in the nearest-aligned approximation
    b1 = jnp.asarray([_box(0, 0, 0, 4, 2, 2, math.pi / 2)])
    b2 = jnp.asarray([_box(0, 0, 0, 2, 4, 2, 0.0)])
    iou = float(bbox_overlaps_nearest_3d(b1, b2)[0, 0])
    assert abs(iou - 1.0) < 1e-6


def test_rotated_overlap_exact():
    sq = jnp.asarray(_box(0, 0, 0, 2, 2, 2, 0.0))
    rot = jnp.asarray(_box(0, 0, 0, 2, 2, 2, math.pi / 4))
    area = float(rotated_overlap_bev(sq, rot))
    # unit(2)-square vs itself rotated 45 deg: regular octagon,
    # area = 8 * (sqrt(2) - 1) for side 2
    want = 8.0 * (math.sqrt(2.0) - 1.0)
    assert abs(area - want) < 1e-4

    # identical boxes -> full overlap, iou 1
    iou = float(bbox_overlaps_3d(sq[None], sq[None])[0, 0])
    assert abs(iou - 1.0) < 1e-5

    # disjoint boxes -> 0
    far = jnp.asarray(_box(10, 10, 0, 2, 2, 2, 0.3))
    iou0 = float(bbox_overlaps_3d(sq[None], far[None])[0, 0])
    assert iou0 == 0.0


def test_rotated_iou_matches_nearest_when_axis_aligned():
    boxes1 = jnp.asarray(
        [_box(0, 0, 0, 2, 3, 2, 0.0), _box(1, 1, 0, 2, 2, 4, 0.0)]
    )
    boxes2 = jnp.asarray([_box(0.5, 0, 0, 2, 3, 2, 0.0)])
    exact = np.asarray(bbox_overlaps_3d(boxes1, boxes2))
    # compute expected by hand for the first pair:
    # x overlap 1.5, y overlap 3, z overlap 2 -> inter 9; vol 12 each
    assert abs(exact[0, 0] - 9.0 / (12 + 12 - 9)) < 1e-5
