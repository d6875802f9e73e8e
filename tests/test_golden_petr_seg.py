"""Golden test: the COMPLETE PETRHeadseg forward vs a torch oracle.

The oracle re-implements the reference seg head end to end
(petr_head_seg.py:108-905): the PETR detection stream (3D-coordinate PE
over LID bins, sine PE + adapt_pos3d, pos2posemb3d query embedding,
PETRTransformer decoder with per-intermediate post_norm, SHARED cls/reg
branches — the reference repeats the SAME module object per layer,
:330-336) PLUS the segmentation stream: `num_lane` lane queries on a
sqrt(num_lane)^2 BEV grid (:365-369), embedded via pos2posemb2d
(Y-first concat, :43-55) through `query_embedding_lane` (:369-374),
decoded by a SECOND PETRTransformer over the same camera memory with its
own decoder post_norm (:546-548), and a lane branch shared across layers
mapping each lane query to patch logits (:313-318, 573).  Options: the
`with_se` SELayer gate on the coords PE (se(coords_pe, x), :507-508,
petrv2_BEVseg.py:50) and `with_time` velocity division (:566-576).

Weights flow through tools/convert_checkpoint.convert_state_dict's PETR
branch (extended with the lane stream), so this test also locks the .pth
mapping for the seg family.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_checkpoint import convert_state_dict  # noqa: E402

from test_golden_petr import (  # noqa: E402
    B,
    N,
    H,
    W,
    CIN,
    C,
    NFEATS,
    NLAYERS,
    NCLS,
    CODE,
    NQ,
    PAD_H,
    PAD_W,
    PC,
    PETRHeadOracle,
    SELayerOracle,
    TransformerOracle,
    _head_cfg,
    _lidar2img,
    inverse_sigmoid_t,
    pos2posemb3d_t,
    sine_pe_3d_t,
)

NLANE = 9  # 3x3 BEV grid
LANE_OUT = 12


def pos2posemb2d_t(pos, num_pos_feats=NFEATS, temperature=10000):
    """petr_head_seg.py:43-55 — (pos_y, pos_x) concat, Y first."""
    import math

    pos = pos * (2 * math.pi)
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = pos[..., 0, None] / dim_t
    py = pos[..., 1, None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(-2)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(-2)
    return torch.cat((py, px), dim=-1)


class PETRHeadSegOracle(PETRHeadOracle):
    """PETRHeadOracle (v1 mode: shared branches) + the lane stream."""

    def __init__(self, with_se=False):
        super().__init__(v2=False)
        self.with_se = with_se
        if with_se:
            self.se = SELayerOracle()
        # lane grid (petr_head_seg.py:365-369): meshgrid(x, y) 'ij', x first
        import math

        n = round(math.sqrt(NLANE))
        ax = (torch.arange(n).float() + 0.5) / n
        xv, yv = torch.meshgrid(ax, ax)
        self.reference_points_lane = torch.cat(
            [xv.reshape(-1)[..., None], yv.reshape(-1)[..., None]], -1
        )
        self.query_embedding_lane = tnn.Sequential(
            tnn.Linear(2 * NFEATS, C), tnn.ReLU(), tnn.Linear(C, C)
        )
        self.transformer_lane = TransformerOracle()
        # shared lane branch: [Linear, ReLU] x num_reg_fcs + Linear(out)
        lane_branch = tnn.Sequential(
            tnn.Linear(C, C),
            tnn.ReLU(),
            tnn.Linear(C, C),
            tnn.ReLU(),
            tnn.Linear(C, LANE_OUT),
        )
        self.lane_branches = tnn.ModuleList(
            [lane_branch for _ in range(NLAYERS)]
        )

    def forward(self, feat, lidar2img, mean_time_stamp=None):
        x = self.input_proj(feat.flatten(0, 1)).view(B, N, C, H, W)
        pos_embed = self.position_embeding(feat, lidar2img, lid=True)
        if self.with_se:
            # se(coords_pe, x) — petr_head_seg.py:507-508
            pos_embed = self.se(
                pos_embed.flatten(0, 1), x.flatten(0, 1)
            ).view(x.size())
        masks = torch.zeros((B, N, H, W), dtype=torch.bool)
        sin_embed = sine_pe_3d_t(masks)
        sin_embed = self.adapt_pos3d(sin_embed.flatten(0, 1)).view(x.size())
        pos_embed = pos_embed + sin_embed

        reference_points = self.reference_points.weight
        query_det = self.query_embedding(pos2posemb3d_t(reference_points))
        query_lane = self.query_embedding_lane(
            pos2posemb2d_t(self.reference_points_lane)
        )
        reference_points = reference_points.unsqueeze(0).repeat(B, 1, 1)

        memory = x.permute(1, 3, 4, 0, 2).reshape(-1, B, C)
        pos_embed = pos_embed.permute(1, 3, 4, 0, 2).reshape(-1, B, C)
        qd = query_det.unsqueeze(1).repeat(1, B, 1)
        ql = query_lane.unsqueeze(1).repeat(1, B, 1)
        outs_dec = self.transformer.decoder(
            torch.zeros_like(qd), qd, memory, pos_embed
        ).transpose(1, 2)
        outs_lane = self.transformer_lane.decoder(
            torch.zeros_like(ql), ql, memory, pos_embed
        ).transpose(1, 2)

        cls_list, box_list, lane_list = [], [], []
        for lvl in range(NLAYERS):
            reference = inverse_sigmoid_t(reference_points.clone())
            cls = self.cls_branches[lvl](outs_dec[lvl])
            tmp = self.reg_branches[lvl](outs_dec[lvl])
            lane = self.lane_branches[lvl](outs_lane[lvl])
            tmp[..., 0:2] += reference[..., 0:2]
            tmp[..., 0:2] = tmp[..., 0:2].sigmoid()
            tmp[..., 4:5] += reference[..., 2:3]
            tmp[..., 4:5] = tmp[..., 4:5].sigmoid()
            if mean_time_stamp is not None:
                tmp[..., 8:] = tmp[..., 8:] / mean_time_stamp
            cls_list.append(cls)
            box_list.append(tmp)
            lane_list.append(lane)
        all_cls = torch.stack(cls_list)
        all_bbox = torch.stack(box_list)
        all_lane = torch.stack(lane_list)
        all_bbox[..., 0:1] = all_bbox[..., 0:1] * (PC[3] - PC[0]) + PC[0]
        all_bbox[..., 1:2] = all_bbox[..., 1:2] * (PC[4] - PC[1]) + PC[1]
        all_bbox[..., 4:5] = all_bbox[..., 4:5] * (PC[5] - PC[2]) + PC[2]
        return all_cls, all_bbox, all_lane


@pytest.mark.parametrize("with_se,with_time", [(False, False), (True, True)])
def test_petr_seg_head_matches_torch_oracle(with_se, with_time):
    from graph_detr4d_tpu.models.petr_seg import PETRHeadSeg

    torch.manual_seed(5)
    oracle = PETRHeadSegOracle(with_se=with_se).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            if p.dim() == 1:
                p.add_(torch.randn_like(p) * 0.05)
        oracle.reference_points.weight.uniform_(0.05, 0.95)

    feat = torch.randn(B, N, CIN, H, W)
    l2i = torch.from_numpy(_lidar2img())
    mts = torch.tensor([0.5]) if with_time else None
    with torch.no_grad():
        ref_cls, ref_bbox, ref_lane = oracle(feat, l2i, mean_time_stamp=mts)

    sd = {
        "pts_bbox_head." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = convert_state_dict(
        sd, num_decoder_layers=NLAYERS, nheads=oracle_nheads()
    )
    head_params = variables["params"]["head"]

    head = PETRHeadSeg(
        cfg=_head_cfg(),
        img_shape=(PAD_H, PAD_W),
        num_lane=NLANE,
        lane_out=LANE_OUT,
        position_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
        lid=True,
        with_time=with_time,
        with_se=with_se,
    )
    feats_j = jnp.asarray(feat.numpy().transpose(0, 1, 3, 4, 2))
    mts_j = jnp.asarray([0.5]) if with_time else None
    init = head.init(
        jax.random.PRNGKey(0),
        [feats_j],
        jnp.asarray(l2i.numpy()),
        mean_time_stamp=mts_j,
    )
    flat_init = set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(init["params"])
    )
    flat_conv = set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(head_params)
    )
    assert flat_init == flat_conv, (
        sorted(flat_init - flat_conv),
        sorted(flat_conv - flat_init),
    )

    out = head.apply(
        {"params": head_params},
        [feats_j],
        jnp.asarray(l2i.numpy()),
        mean_time_stamp=mts_j,
    )
    np.testing.assert_allclose(
        np.asarray(out["all_cls_scores"]), ref_cls.numpy(), rtol=1e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["all_bbox_preds"]), ref_bbox.numpy(), rtol=1e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["all_lane_preds"]), ref_lane.numpy(), rtol=1e-4,
        atol=2e-4,
    )


def oracle_nheads():
    from test_golden_petr import NHEADS

    return NHEADS
