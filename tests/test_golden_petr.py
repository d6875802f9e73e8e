"""Golden test: the COMPLETE PETR / PETRv2 head forward vs a torch oracle.

The oracle re-implements the reference head math end to end —
3D-coordinate position embedding over LID depth bins
(petr_head.py:283-330), SinePositionalEncoding3D (multiview, offset=0 —
petr configs keep the class default, petr_r50dcn_gridmask_p4.py:92),
adapt_pos3d / position_encoder Conv-1x1 MLPs, query embedding from
pos2posemb3d of the learned reference points (:265-276, 482-484),
the PETRTransformer decoder (self-attn -> norm -> dense cross-attn ->
norm -> FFN -> norm per layer, petr_transformer.py:114-185, plus the
decoder-level post_norm applied to EVERY intermediate, :443-445),
SHARED cls/reg branches (:240-243), sigmoid xy/z refinement against the
inverse-sigmoid reference points and pc_range (NOT position_range)
denormalization (:436-442), and PETRv2's velocity / mean-timestamp
division (petrv2_head.py:509-510).

Weights flow through tools/convert_checkpoint.convert_state_dict's PETR
branch, so this test also locks the .pth mapping for the PETR family.

Note: the reference divides velocity as `tmp[..., 8:] /= mean_time_stamp`
with mean_time_stamp of shape (B,) — which only broadcasts correctly at
B == 1 (PETRv2 trains with samples_per_gpu=1). We implement the
per-batch-element semantics, so the oracle runs at B == 1.
"""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_detr4d_tpu.config import HeadConfig  # noqa: E402
from graph_detr4d_tpu.models.petr_head import PETRHead  # noqa: E402
from tools.convert_checkpoint import convert_state_dict  # noqa: E402

# tiny-but-structured dims
B, N, H, W = 1, 2, 4, 5
CIN, C, NHEADS, FFN = 16, 32, 4, 64
NQ, NLAYERS, NCLS, CODE = 12, 2, 3, 10
DNUM = 4
NFEATS = C // 2  # sine num_feats; 3*NFEATS == C*3//2 == query-emb input
PAD_H, PAD_W = 16, 20
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
PRANGE = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
DEPTH_START = 1.0


def inverse_sigmoid_t(x, eps=1e-5):
    x = x.clamp(min=0, max=1)
    x1 = x.clamp(min=eps)
    x2 = (1 - x).clamp(min=eps)
    return torch.log(x1 / x2)


def pos2posemb3d_t(pos, num_pos_feats=NFEATS, temperature=10000):
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = pos[..., 0, None] / dim_t
    pos_y = pos[..., 1, None] / dim_t
    pos_z = pos[..., 2, None] / dim_t
    pos_x = torch.stack(
        (pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    pos_y = torch.stack(
        (pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    pos_z = torch.stack(
        (pos_z[..., 0::2].sin(), pos_z[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    return torch.cat((pos_x, pos_y, pos_z), dim=-1)


def sine_pe_3d_t(mask, num_feats=NFEATS, temperature=10000, offset=0.0):
    """SinePositionalEncoding3D(normalize=True), positional_encoding.py:58-104."""
    not_mask = 1 - mask.to(torch.int)
    n_embed = not_mask.cumsum(1, dtype=torch.float32)
    y_embed = not_mask.cumsum(2, dtype=torch.float32)
    x_embed = not_mask.cumsum(3, dtype=torch.float32)
    eps, scale = 1e-6, 2 * math.pi
    n_embed = (n_embed + offset) / (n_embed[:, -1:, :, :] + eps) * scale
    y_embed = (y_embed + offset) / (y_embed[:, :, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    def enc(e):
        p = e[..., None] / dim_t
        return torch.stack(
            (p[..., 0::2].sin(), p[..., 1::2].cos()), dim=4
        ).view(*e.shape, -1)

    pos = torch.cat((enc(n_embed), enc(y_embed), enc(x_embed)), dim=4)
    return pos.permute(0, 1, 4, 2, 3)  # (B, N, 3*num_feats, H, W)


class FFNOracle(tnn.Module):
    """mmcv FFN naming: layers.0.0 (Linear) / layers.1 (Linear)."""

    def __init__(self):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, FFN), tnn.ReLU()),
            tnn.Linear(FFN, C),
        )

    def forward(self, x):
        return x + self.layers(x)


class AttnOracle(tnn.Module):
    """PETRMultiheadAttention: wraps nn.MultiheadAttention under .attn."""

    def __init__(self):
        super().__init__()
        self.attn = tnn.MultiheadAttention(C, NHEADS)


class LayerOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attentions = tnn.ModuleList([AttnOracle(), AttnOracle()])
        self.ffns = tnn.ModuleList([FFNOracle()])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])

    def forward(self, query, query_pos, memory, key_pos,
                key_padding_mask=None):
        # tokens-first (num_tokens, B, C) like the reference
        q = query + query_pos
        out = self.attentions[0].attn(q, q, query)[0]
        query = self.norms[0](query + out)
        out = self.attentions[1].attn(
            query + query_pos, memory + key_pos, memory,
            key_padding_mask=key_padding_mask,
        )[0]
        query = self.norms[1](query + out)
        return self.norms[2](self.ffns[0](query))


class DecoderOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList([LayerOracle() for _ in range(NLAYERS)])
        self.post_norm = tnn.LayerNorm(C)

    def forward(self, query, query_pos, memory, key_pos,
                key_padding_mask=None):
        intermediate = []
        for layer in self.layers:
            query = layer(query, query_pos, memory, key_pos,
                          key_padding_mask)
            intermediate.append(self.post_norm(query))
        return torch.stack(intermediate)


class TransformerOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.decoder = DecoderOracle()


class SELayerOracle(tnn.Module):
    """petrv2_head.py:44-56: x * sigmoid(expand(relu(reduce(x_se))))."""

    def __init__(self):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(C, C, 1)
        self.conv_expand = tnn.Conv2d(C, C, 1)

    def forward(self, x, x_se):
        x_se = self.conv_expand(torch.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(x_se)


class RegLayerOracle(tnn.Module):
    """petrv2_head.py:58-88 (with_multi): shared Linear+ReLU+Dropout
    trunk, grouped task heads concatenated in order."""

    def __init__(self, groups=(2, 1, 3, 2, 2)):
        super().__init__()
        trunk = []
        for _ in range(2):
            trunk += [tnn.Linear(C, C), tnn.ReLU(), tnn.Dropout(0.0)]
        self.reg_branch = tnn.Sequential(*trunk)
        self.task_heads = tnn.ModuleList(
            [
                tnn.Sequential(tnn.Linear(C, C), tnn.ReLU(), tnn.Linear(C, g))
                for g in groups
            ]
        )

    def forward(self, x):
        x = self.reg_branch(x)
        return torch.cat([h(x) for h in self.task_heads], -1)


class PETRHeadOracle(tnn.Module):
    def __init__(self, v2=False):
        super().__init__()
        self.v2 = v2
        self.input_proj = tnn.Conv2d(CIN, C, 1)
        self.position_encoder = tnn.Sequential(
            tnn.Conv2d(DNUM * 3, C * 4, 1), tnn.ReLU(), tnn.Conv2d(C * 4, C, 1)
        )
        self.adapt_pos3d = tnn.Sequential(
            tnn.Conv2d(NFEATS * 3, C * 4, 1),
            tnn.ReLU(),
            tnn.Conv2d(C * 4, C, 1),
        )
        self.reference_points = tnn.Embedding(NQ, 3)
        self.query_embedding = tnn.Sequential(
            tnn.Linear(NFEATS * 3, C), tnn.ReLU(), tnn.Linear(C, C)
        )
        self.transformer = TransformerOracle()
        cls_branch = tnn.Sequential(
            tnn.Linear(C, C),
            tnn.LayerNorm(C),
            tnn.ReLU(),
            tnn.Linear(C, C),
            tnn.LayerNorm(C),
            tnn.ReLU(),
            tnn.Linear(C, NCLS),
        )
        reg_branch = tnn.Sequential(
            tnn.Linear(C, C),
            tnn.ReLU(),
            tnn.Linear(C, C),
            tnn.ReLU(),
            tnn.Linear(C, CODE),
        )
        if v2:
            # PETRv2: fpe SE gate + per-layer DEEPCOPIED branches +
            # grouped RegLayer (petrv2_head.py:297-300, 287, 327-328)
            import copy

            self.fpe = SELayerOracle()
            self.cls_branches = tnn.ModuleList(
                [copy.deepcopy(cls_branch) for _ in range(NLAYERS)]
            )
            self.reg_branches = tnn.ModuleList(
                [RegLayerOracle() for _ in range(NLAYERS)]
            )
        else:
            # PETRv1: SHARED branch modules repeated per layer
            # (petr_head.py:240-243)
            self.cls_branches = tnn.ModuleList(
                [cls_branch for _ in range(NLAYERS)]
            )
            self.reg_branches = tnn.ModuleList(
                [reg_branch for _ in range(NLAYERS)]
            )

    def position_embeding(self, feat, lidar2img, lid):
        eps = 1e-5
        _, _, _, h, w = feat.shape
        coords_h = torch.arange(h).float() * PAD_H / h
        coords_w = torch.arange(w).float() * PAD_W / w
        index = torch.arange(DNUM).float()
        if lid:
            bin_size = (PRANGE[3] - DEPTH_START) / (DNUM * (1 + DNUM))
            coords_d = DEPTH_START + bin_size * index * (index + 1)
        else:
            bin_size = (PRANGE[3] - DEPTH_START) / DNUM
            coords_d = DEPTH_START + bin_size * index
        coords = torch.stack(
            torch.meshgrid([coords_w, coords_h, coords_d])
        ).permute(1, 2, 3, 0)  # (W, H, D, 3)
        coords = torch.cat((coords, torch.ones_like(coords[..., :1])), -1)
        coords[..., :2] = coords[..., :2] * torch.maximum(
            coords[..., 2:3], torch.ones_like(coords[..., 2:3]) * eps
        )
        img2lidars = torch.from_numpy(
            np.linalg.inv(lidar2img.numpy())
        ).float()  # (B, N, 4, 4)
        coords = coords.view(1, 1, w, h, DNUM, 4, 1).repeat(
            B, N, 1, 1, 1, 1, 1
        )
        i2l = img2lidars.view(B, N, 1, 1, 1, 4, 4).repeat(
            1, 1, w, h, DNUM, 1, 1
        )
        coords3d = torch.matmul(i2l, coords).squeeze(-1)[..., :3]
        for a in range(3):
            coords3d[..., a : a + 1] = (coords3d[..., a : a + 1] - PRANGE[a]) / (
                PRANGE[a + 3] - PRANGE[a]
            )
        coords3d = (
            coords3d.permute(0, 1, 4, 5, 3, 2)
            .contiguous()
            .view(B * N, -1, h, w)
        )
        coords3d = inverse_sigmoid_t(coords3d)
        pe = self.position_encoder(coords3d)
        return pe.view(B, N, C, h, w)

    def forward(self, feat, lidar2img, lid=True, mean_time_stamp=None,
                img_valid_hw=None):
        # feat: (B, N, CIN, H, W)
        x = self.input_proj(feat.flatten(0, 1)).view(B, N, C, H, W)
        pos_embed = self.position_embeding(feat, lidar2img, lid)
        if self.v2:
            pos_embed = self.fpe(
                pos_embed.flatten(0, 1), x.flatten(0, 1)
            ).view(x.size())
        if img_valid_hw is None:
            masks = torch.zeros((B, N, H, W), dtype=torch.bool)
        else:
            # reference mask build (petr_head.py:377-387): ones at pad
            # res, zero over each cam's true image, nearest-interpolate
            # to the feature grid
            masks = torch.ones((B, N, PAD_H, PAD_W))
            for b in range(B):
                for n in range(N):
                    ih, iw = img_valid_hw[b][n]
                    masks[b, n, :ih, :iw] = 0
            masks = (
                tnn.functional.interpolate(masks, size=(H, W))
                .to(torch.bool)
            )
        sin_embed = sine_pe_3d_t(masks)  # (B, N, 3*NFEATS, H, W)
        sin_embed = self.adapt_pos3d(sin_embed.flatten(0, 1)).view(x.size())
        pos_embed = pos_embed + sin_embed

        reference_points = self.reference_points.weight
        query_embeds = self.query_embedding(pos2posemb3d_t(reference_points))
        reference_points = reference_points.unsqueeze(0).repeat(B, 1, 1)

        memory = x.permute(1, 3, 4, 0, 2).reshape(-1, B, C)
        pos_embed = pos_embed.permute(1, 3, 4, 0, 2).reshape(-1, B, C)
        query_embeds = query_embeds.unsqueeze(1).repeat(1, B, 1)
        target = torch.zeros_like(query_embeds)
        outs_dec = self.transformer.decoder(
            target, query_embeds, memory, pos_embed,
            key_padding_mask=(
                None if img_valid_hw is None else masks.view(B, -1)
            ),
        ).transpose(1, 2)  # (L, B, Q, C)

        outputs_classes, outputs_coords = [], []
        for lvl in range(NLAYERS):
            reference = inverse_sigmoid_t(reference_points.clone())
            outputs_class = self.cls_branches[lvl](outs_dec[lvl])
            tmp = self.reg_branches[lvl](outs_dec[lvl])
            tmp[..., 0:2] += reference[..., 0:2]
            tmp[..., 0:2] = tmp[..., 0:2].sigmoid()
            tmp[..., 4:5] += reference[..., 2:3]
            tmp[..., 4:5] = tmp[..., 4:5].sigmoid()
            if mean_time_stamp is not None:
                tmp[..., 8:] = tmp[..., 8:] / mean_time_stamp
            outputs_classes.append(outputs_class)
            outputs_coords.append(tmp)
        all_cls = torch.stack(outputs_classes)
        all_bbox = torch.stack(outputs_coords)
        all_bbox[..., 0:1] = all_bbox[..., 0:1] * (PC[3] - PC[0]) + PC[0]
        all_bbox[..., 1:2] = all_bbox[..., 1:2] * (PC[4] - PC[1]) + PC[1]
        all_bbox[..., 4:5] = all_bbox[..., 4:5] * (PC[5] - PC[2]) + PC[2]
        return all_cls, all_bbox


def _lidar2img():
    """Well-conditioned pinhole projections for N cameras."""
    rng = np.random.RandomState(0)
    mats = np.zeros((B, N, 4, 4), np.float32)
    for b in range(B):
        for n in range(N):
            yaw = 2 * math.pi * n / N + 0.3
            rot = np.array(
                [
                    [math.cos(yaw), -math.sin(yaw), 0],
                    [math.sin(yaw), math.cos(yaw), 0],
                    [0, 0, 1],
                ],
                np.float32,
            )
            # camera axes: x right, y down, z forward
            axes = np.array(
                [[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32
            )
            ext = np.eye(4, dtype=np.float32)
            ext[:3, :3] = axes @ rot
            ext[:3, 3] = rng.uniform(-1, 1, 3)
            K = np.eye(4, dtype=np.float32)
            K[0, 0] = K[1, 1] = 12.0
            K[0, 2] = PAD_W / 2
            K[1, 2] = PAD_H / 2
            mats[b, n] = K @ ext
    return mats


def _head_cfg():
    return HeadConfig(
        num_query=NQ,
        num_classes=NCLS,
        embed_dims=C,
        num_reg_fcs=2,
        num_decoder_layers=NLAYERS,
        num_heads=NHEADS,
        num_cams=N,
        ffn_dims=FFN,
        dropout=0.0,
        code_size=CODE,
        pc_range=PC,
        depth_num=DNUM,
        depth_start=DEPTH_START,
        pe_num_feats=NFEATS,
    )


@pytest.mark.parametrize(
    "lid,with_time,v2",
    [
        (True, False, False),
        (False, False, False),
        (True, True, False),
        # PETRv2 structural mode: fpe SE gate + per-layer deepcopied
        # branches + grouped RegLayer, all through the converter
        (True, True, True),
    ],
)
def test_petr_head_matches_torch_oracle(lid, with_time, v2):
    torch.manual_seed(3)
    oracle = PETRHeadOracle(v2=v2).eval()
    # non-degenerate weights everywhere
    with torch.no_grad():
        for p in oracle.parameters():
            if p.dim() == 1:
                p.add_(torch.randn_like(p) * 0.05)
        oracle.reference_points.weight.uniform_(0.05, 0.95)

    feat = torch.randn(B, N, CIN, H, W)
    l2i = torch.from_numpy(_lidar2img())
    mts = torch.tensor([0.5]) if with_time else None
    with torch.no_grad():
        ref_cls, ref_bbox = oracle(feat, l2i, lid=lid, mean_time_stamp=mts)

    sd = {
        "pts_bbox_head." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = convert_state_dict(sd, num_decoder_layers=NLAYERS, nheads=NHEADS)
    head_params = variables["params"]["head"]

    head = PETRHead(
        cfg=_head_cfg(),
        img_shape=(PAD_H, PAD_W),
        position_range=PRANGE,
        lid=lid,
        with_time=with_time,
        with_fpe=v2,
        with_multi=v2,
        per_layer_branches=v2,
    )
    feats_j = jnp.asarray(feat.numpy().transpose(0, 1, 3, 4, 2))
    # structure check: converted tree must exactly match a fresh init
    init = head.init(
        jax.random.PRNGKey(0),
        [feats_j],
        jnp.asarray(l2i.numpy()),
        mean_time_stamp=jnp.asarray([0.5]) if with_time else None,
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
        mean_time_stamp=jnp.asarray([0.5]) if with_time else None,
    )
    got_cls = np.asarray(out["all_cls_scores"])
    got_bbox = np.asarray(out["all_bbox_preds"])
    np.testing.assert_allclose(
        got_cls, ref_cls.numpy(), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        got_bbox, ref_bbox.numpy(), rtol=1e-4, atol=2e-4
    )


def test_pos2posemb2d_matches_torch_oracle():
    """Locks the 2D variant's (pos_y, pos_x) concat order — Y first
    (petr_head_seg.py:43-55), unlike pos2posemb3d's (x, y, z)."""
    from graph_detr4d_tpu.models.petr_seg import pos2posemb2d

    rng = np.random.RandomState(2)
    pos = rng.rand(5, 2).astype(np.float32)
    got = np.asarray(pos2posemb2d(jnp.asarray(pos), num_pos_feats=8))

    p = torch.from_numpy(pos) * (2 * math.pi)
    dim_t = torch.arange(8, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / 8)
    px = p[..., 0, None] / dim_t
    py = p[..., 1, None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(-2)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(-2)
    want = torch.cat((py, px), dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_petr_head_padding_mask_matches_torch_oracle():
    """The padding-mask path (petr_head.py:377-387 mask build +
    key_padding_mask, petr_transformer.py:95-105) vs the oracle with
    non-÷32 per-camera image extents: the masked sine-PE cumsum AND the
    excluded cross-attention keys must both match."""
    torch.manual_seed(7)
    oracle = PETRHeadOracle(v2=False).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            if p.dim() == 1:
                p.add_(torch.randn_like(p) * 0.05)
        oracle.reference_points.weight.uniform_(0.05, 0.95)

    feat = torch.randn(B, N, CIN, H, W)
    l2i = torch.from_numpy(_lidar2img())
    # camera 0: image 12x20 (padded rows at the bottom); camera 1:
    # 16x15 (padded cols at the right) — both non-trivial at the 4x5
    # feature grid
    valid_hw = [[(12, 20), (16, 15)]]
    with torch.no_grad():
        ref_cls, ref_bbox = oracle(
            feat, l2i, lid=True, img_valid_hw=valid_hw
        )
        # sanity: masked forward differs from unmasked
        ref_cls_nm, _ = oracle(feat, l2i, lid=True)
        assert not torch.allclose(ref_cls, ref_cls_nm)

    sd = {
        "pts_bbox_head." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = convert_state_dict(
        sd, num_decoder_layers=NLAYERS, nheads=NHEADS
    )
    head = PETRHead(
        cfg=_head_cfg(),
        img_shape=(PAD_H, PAD_W),
        position_range=PRANGE,
        lid=True,
    )
    feats_j = jnp.asarray(feat.numpy().transpose(0, 1, 3, 4, 2))
    out = head.apply(
        {"params": variables["params"]["head"]},
        [feats_j],
        jnp.asarray(l2i.numpy()),
        img_valid_hw=jnp.asarray(valid_hw, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out["all_cls_scores"]), ref_cls.numpy(),
        rtol=1e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["all_bbox_preds"]), ref_bbox.numpy(),
        rtol=1e-4, atol=2e-4,
    )
