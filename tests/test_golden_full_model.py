"""FULL-MODEL golden parity: torch oracle of the complete Detr3DHeadPE
forward vs the flax head loaded with the same weights.

The oracle reimplements, in torch and faithfully to the reference's math:
  * LID-bin 3D position embedding + SE gate + 3-axis sine PE
    (detr3d_head_pe.py:427-491, 541-553; positional_encoding.py:14-100),
  * the full decoder stack: mmcv DetrTransformerDecoderLayer order
    (self_attn MHA -> norm -> Deform3DCrossAttn -> norm -> FFN -> norm,
    configs/detr4d/...12e.py:83-84),
  * graph-offset cross attention with the mmcv MSDA pytorch semantics
    (deform3d_cross_attn.py:195-339; grid_sample align_corners=False),
  * iterative box refinement with detach (detr3d_transformer.py:201-214),
  * per-layer cls/reg branches + pc_range decode (detr3d_head_pe.py:572-608).

Weights are random, named with the reference's state_dict keys
(pts_bbox_head.*), pushed through tools/convert_checkpoint.convert_state_dict
and grafted into the flax head. Any drift in PE math, projection, sampling,
masking, refinement, branch wiring, or the converter's layout mapping fails
the fp32 assertion (<= 2e-4 on raw head outputs, box-level agreement after
decode).
"""

import math
import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_checkpoint import convert_state_dict

from graph_detr4d_tpu.config import HeadConfig
from graph_detr4d_tpu.models.head import Detr3DHeadPE

torch.manual_seed(0)

# test-sized head: structurally the flagship (PE + fpe + deform3d attn +
# refine), tiny dims for CPU
B, N, C, Q = 1, 3, 32, 8
HEADS, LEVELS, POINTS, LAYERS = 4, 2, 2, 2
DEPTH_NUM, PE_FEATS, FFN_DIMS, NUM_CLASSES = 4, 16, 64, 10
IMG_H, IMG_W = 64, 128
PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
FEAT_SHAPES = ((16, 32), (8, 16))


def inverse_sigmoid_t(x, eps=1e-5):
    x = x.clamp(min=0, max=1)
    x1 = x.clamp(min=eps)
    x2 = (1 - x).clamp(min=eps)
    return torch.log(x1 / x2)


def sine_pe_3d_t(mask, num_feats, temperature=10000, offset=-0.5,
                 eps=1e-6, scale=2 * math.pi):
    """SinePositionalEncoding3D (positional_encoding.py:58-100),
    normalize=True, offset=-0.5 (configs/...12e.py:92-96)."""
    mask = mask.to(torch.int)
    not_mask = 1 - mask
    n_embed = not_mask.cumsum(1, dtype=torch.float32)
    y_embed = not_mask.cumsum(2, dtype=torch.float32)
    x_embed = not_mask.cumsum(3, dtype=torch.float32)
    n_embed = (n_embed + offset) / (n_embed[:, -1:, :, :] + eps) * scale
    y_embed = (y_embed + offset) / (y_embed[:, :, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    def enc(e):
        p = e[:, :, :, :, None] / dim_t
        Bs, Nc, H, W = e.shape
        # the reference stacks at dim=4 then .view()s -> BLOCK layout
        # [all sins | all coses] (positional_encoding.py:93-101), NOT
        # the mmdet-2D interleave
        return torch.stack(
            (p[..., 0::2].sin(), p[..., 1::2].cos()), dim=4
        ).view(Bs, Nc, H, W, -1)

    pos = torch.cat((enc(n_embed), enc(y_embed), enc(x_embed)), dim=4)
    return pos.permute(0, 1, 4, 2, 3)  # (B, N, 3*num_feats, H, W)


def msda_pytorch(value, spatial_shapes, sampling_locations,
                 attention_weights):
    """mmcv multi_scale_deformable_attn_pytorch: per-level grid_sample
    (align_corners=False, zeros padding), weights over L*P."""
    bs, _, num_heads, hd = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split(
        [int(h) * int(w) for h, w in spatial_shapes], dim=1
    )
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for level, (h, w) in enumerate(spatial_shapes):
        v = (
            value_list[level]
            .flatten(2)
            .transpose(1, 2)
            .reshape(bs * num_heads, hd, int(h), int(w))
        )
        grid = (
            sampling_grids[:, :, :, level]
            .transpose(1, 2)
            .flatten(0, 1)
        )  # (bs*heads, Q, P, 2)
        sampled = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )  # (bs*heads, hd, Q, P)
        out.append(sampled)
    attn = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_queries, num_levels * num_points
    )
    output = (
        (torch.stack(out, dim=-2).flatten(-2) * attn)
        .sum(-1)
        .view(bs, num_heads * hd, num_queries)
    )
    return output.transpose(1, 2).contiguous()  # (bs, Q, C)


class TorchDeform3DCrossAttn(nn.Module):
    """deform3d_cross_attn.py:33-339 in plain torch."""

    def __init__(self):
        super().__init__()
        self.cam_attention_weights = nn.Linear(C, N)
        self.output_proj = nn.Linear(C, C)
        self.position_encoder = nn.Sequential(
            nn.Linear(3, C), nn.LayerNorm(C), nn.ReLU(inplace=True),
            nn.Linear(C, C), nn.LayerNorm(C), nn.ReLU(inplace=True),
        )
        self.deform_sampling_offsets = nn.Linear(C, HEADS * 1 * POINTS * 3)
        self.attention_weights = nn.Linear(C, HEADS * LEVELS * POINTS)
        self.value_proj = nn.Linear(C, C)

    def forward(self, query, value, query_pos, reference_points, lidar2img):
        # query: (Q, B, C); value: list of (B, N, C, H, W); ref: (B, Q, 3)
        inp_residual = query
        query = query + query_pos
        query = query.permute(1, 0, 2)  # (B, Q, C)
        bs, num_query, _ = query.size()

        cam_attention_weights = self.cam_attention_weights(query).view(
            bs, N, num_query, 1
        )

        reference_points = reference_points.clone()
        reference_points_3d = reference_points.clone()
        pc = PC_RANGE
        reference_points[..., 0:1] = (
            reference_points[..., 0:1] * (pc[3] - pc[0]) + pc[0]
        )
        reference_points[..., 1:2] = (
            reference_points[..., 1:2] * (pc[4] - pc[1]) + pc[1]
        )
        reference_points[..., 2:3] = (
            reference_points[..., 2:3] * (pc[5] - pc[2]) + pc[2]
        )

        sampling_offsets = self.deform_sampling_offsets(query).view(
            bs, num_query, HEADS, 1, POINTS, 3
        ).repeat(1, 1, 1, LEVELS, 1, 1)
        reference_points = (
            reference_points.view(bs, num_query, 1, 1, 1, 3)
            + sampling_offsets
        )
        reference_points = reference_points.view(
            bs, num_query * HEADS * LEVELS * POINTS, 3
        )
        reference_points = torch.cat(
            (reference_points, torch.ones_like(reference_points[..., :1])),
            -1,
        )
        num_query_fake = reference_points.size(1)
        reference_points = (
            reference_points.view(bs, 1, num_query_fake, 4)
            .repeat(1, N, 1, 1)
            .unsqueeze(-1)
        )
        l2i = lidar2img.view(bs, N, 1, 4, 4).repeat(1, 1, num_query_fake, 1, 1)
        reference_points_cam = torch.matmul(l2i, reference_points).squeeze(-1)
        eps = 1e-5
        mask = reference_points_cam[..., 2:3] > eps
        reference_points_cam = reference_points_cam[..., 0:2] / torch.max(
            reference_points_cam[..., 2:3],
            torch.ones_like(reference_points_cam[..., 2:3]) * eps,
        )
        reference_points_cam[..., 0] /= IMG_W
        reference_points_cam[..., 1] /= IMG_H
        mask = (
            mask
            & (reference_points_cam[..., 0:1] > 0.0)
            & (reference_points_cam[..., 0:1] < 1.0)
            & (reference_points_cam[..., 1:2] > 0.0)
            & (reference_points_cam[..., 1:2] < 1.0)
        )
        mask = mask.float()

        src_flattens, spatial_shapes = [], []
        for i in range(len(value)):
            bsv, n, c, h, w = value[i].shape
            spatial_shapes.append((h, w))
            src_flattens.append(
                value[i].view(bsv * n, c, h, w).flatten(2).transpose(1, 2)
            )
        value_flatten = torch.cat(src_flattens, 1)
        spatial_shapes_t = torch.as_tensor(spatial_shapes, dtype=torch.long)

        reference_points_cam = reference_points_cam.view(
            bs * N, num_query, HEADS, LEVELS, POINTS, 2
        )
        query_cam = query.repeat(N, 1, 1)
        value_flatten = self.value_proj(value_flatten)
        num_value = value_flatten.size(1)
        value_flatten = value_flatten.view(bs * N, num_value, HEADS, -1)
        attention_weights = self.attention_weights(query_cam).view(
            bs * N, num_query, HEADS, LEVELS * POINTS
        )
        mask = mask.view(bs * N, num_query, HEADS, LEVELS * POINTS)
        attention_weights = attention_weights.softmax(-1) * mask

        output = msda_pytorch(
            value_flatten,
            spatial_shapes_t,
            reference_points_cam,
            attention_weights.view(bs * N, num_query, HEADS, LEVELS, POINTS),
        )

        cam_attention_weights = cam_attention_weights.sigmoid()
        output = output.view(bs, N, num_query, -1)
        output = (output * cam_attention_weights).sum(1)
        output = self.output_proj(output)
        output = output.permute(1, 0, 2)  # (Q, B, C)
        pos_feat = self.position_encoder(
            inverse_sigmoid_t(reference_points_3d)
        ).permute(1, 0, 2)
        return output + inp_residual + pos_feat


class TorchDecoderLayer(nn.Module):
    """mmcv DetrTransformerDecoderLayer, order self_attn/norm/cross/norm/
    ffn/norm; all dropouts 0 (eval parity)."""

    def __init__(self):
        super().__init__()
        self.attentions = nn.ModuleList(
            [SelfAttnWrap(), TorchDeform3DCrossAttn()]
        )
        self.ffns = nn.ModuleList([TorchFFN()])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])

    def forward(self, query, query_pos, value, reference_points, lidar2img,
                attn_mask=None):
        q = self.attentions[0](query, query_pos, attn_mask=attn_mask)
        q = self.norms[0](q)
        q = self.attentions[1](q, value, query_pos, reference_points,
                               lidar2img)
        q = self.norms[1](q)
        q = self.ffns[0](q)
        q = self.norms[2](q)
        return q


class SelfAttnWrap(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn = nn.MultiheadAttention(C, HEADS, dropout=0.0)

    def forward(self, query, query_pos, attn_mask=None):
        # mmcv MultiheadAttention: q = k = query + pos, v = query,
        # out = query + attn_out; attn_mask True = BLOCKED (torch bool
        # semantics; H-DETR passes the group-isolation mask,
        # h_detr3d_head_pe.py:299-304)
        qk = query + query_pos
        out, _ = self.attn(qk, qk, query, need_weights=False,
                           attn_mask=attn_mask)
        return query + out


class TorchFFN(nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                nn.Sequential(nn.Linear(C, FFN_DIMS), nn.ReLU(inplace=True)),
                nn.Linear(FFN_DIMS, C),
            ]
        )

    def forward(self, x):
        return x + self.layers[1](self.layers[0](x))


class TorchTransformer(nn.Module):
    def __init__(self):
        super().__init__()
        self.reference_points = nn.Linear(C, 3)
        self.decoder = nn.Module()
        self.decoder.layers = nn.ModuleList(
            [TorchDecoderLayer() for _ in range(LAYERS)]
        )

    def forward(self, mlvl_feats, query_embed, reg_branches, lidar2img,
                attn_mask=None):
        bs = mlvl_feats[0].size(0)
        query_pos, query = torch.split(query_embed, C, dim=1)
        query_pos = query_pos.unsqueeze(0).expand(bs, -1, -1)
        query = query.unsqueeze(0).expand(bs, -1, -1)
        reference_points = self.reference_points(query_pos).sigmoid()
        init_reference_out = reference_points

        query = query.permute(1, 0, 2)
        query_pos = query_pos.permute(1, 0, 2)
        output = query
        intermediate, inter_refs = [], []
        for lid, layer in enumerate(self.decoder.layers):
            output = layer(output, query_pos, mlvl_feats, reference_points,
                           lidar2img, attn_mask=attn_mask)
            out_b = output.permute(1, 0, 2)
            tmp = reg_branches[lid](out_b)
            new_ref = torch.zeros_like(reference_points)
            new_ref[..., :2] = tmp[..., :2] + inverse_sigmoid_t(
                reference_points[..., :2]
            )
            new_ref[..., 2:3] = tmp[..., 4:5] + inverse_sigmoid_t(
                reference_points[..., 2:3]
            )
            reference_points = new_ref.sigmoid().detach()
            intermediate.append(out_b)
            inter_refs.append(reference_points)
        return (
            torch.stack(intermediate),
            init_reference_out,
            torch.stack(inter_refs),
        )


class TorchSELayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_reduce = nn.Conv2d(C, C, 1, bias=True)
        self.conv_expand = nn.Conv2d(C, C, 1, bias=True)

    def forward(self, x, x_se):
        x_se = self.conv_expand(F.relu(self.conv_reduce(x_se)))
        return x * x_se.sigmoid()


class TorchDetr3DHeadPE(nn.Module):
    """detr3d_head_pe.py:302-1118 forward path (eval mode)."""

    def __init__(self):
        super().__init__()
        self.query_embedding = nn.Embedding(Q, C * 2)
        self.transformer = TorchTransformer()
        self.position_encoder = nn.Sequential(
            nn.Conv2d(DEPTH_NUM * 3, C * 4, 1), nn.ReLU(inplace=True),
            nn.Conv2d(C * 4, C, 1),
        )
        self.adapt_pos3d = nn.Sequential(
            nn.Conv2d(PE_FEATS * 3, C * 4, 1), nn.ReLU(inplace=True),
            nn.Conv2d(C * 4, C, 1),
        )
        self.fpe = TorchSELayer()
        def cls_branch():
            return nn.Sequential(
                nn.Linear(C, C), nn.LayerNorm(C), nn.ReLU(inplace=True),
                nn.Linear(C, C), nn.LayerNorm(C), nn.ReLU(inplace=True),
                nn.Linear(C, NUM_CLASSES),
            )
        def reg_branch():
            return nn.Sequential(
                nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C), nn.ReLU(),
                nn.Linear(C, 10),
            )
        self.cls_branches = nn.ModuleList(
            [cls_branch() for _ in range(LAYERS)]
        )
        self.reg_branches = nn.ModuleList(
            [reg_branch() for _ in range(LAYERS)]
        )

    def position_embeding(self, img_feats, lidar2img):
        """LID bins (:452-455), img2lidar back-projection (:462-491)."""
        eps = 1e-5
        outs = []
        img2lidars = torch.inverse(lidar2img)  # (B, N, 4, 4)
        for feat in img_feats:
            Bs, Nc, _, H, W = feat.shape
            coords_h = torch.arange(H).float() * IMG_H / H
            coords_w = torch.arange(W).float() * IMG_W / W
            index = torch.arange(DEPTH_NUM).float()
            bin_size = (PC_RANGE[3] - 1.0) / (DEPTH_NUM * (1 + DEPTH_NUM))
            coords_d = 1.0 + bin_size * index * (index + 1)
            D = DEPTH_NUM
            coords = torch.stack(
                torch.meshgrid([coords_w, coords_h, coords_d],
                               indexing="ij")
            ).permute(1, 2, 3, 0)  # (W, H, D, 3)
            coords = torch.cat(
                (coords, torch.ones_like(coords[..., :1])), -1
            )
            coords[..., :2] = coords[..., :2] * torch.maximum(
                coords[..., 2:3], torch.ones_like(coords[..., 2:3]) * eps
            )
            coords = coords.view(1, 1, W, H, D, 4, 1).repeat(
                Bs, Nc, 1, 1, 1, 1, 1
            )
            i2l = img2lidars.view(Bs, Nc, 1, 1, 1, 4, 4).repeat(
                1, 1, W, H, D, 1, 1
            )
            coords3d = torch.matmul(i2l, coords).squeeze(-1)[..., :3]
            for ax in range(3):
                coords3d[..., ax : ax + 1] = (
                    coords3d[..., ax : ax + 1] - PC_RANGE[ax]
                ) / (PC_RANGE[ax + 3] - PC_RANGE[ax])
            coords3d = (
                coords3d.permute(0, 1, 4, 5, 3, 2)
                .contiguous()
                .view(Bs * Nc, -1, H, W)
            )
            coords3d = inverse_sigmoid_t(coords3d)
            pe = self.position_encoder(coords3d)
            outs.append(pe.view(Bs, Nc, C, H, W))
        return outs

    def forward(self, mlvl_feats, lidar2img):
        pes = self.position_embeding(mlvl_feats, lidar2img)
        feats = []
        for level_id in range(len(mlvl_feats)):
            feat = mlvl_feats[level_id]
            Bs, Nc, _, H, W = feat.shape
            pe = self.fpe(
                pes[level_id].flatten(0, 1), feat.flatten(0, 1)
            ).view(feat.size())
            mask = torch.zeros((Bs, Nc, H, W))
            sin = sine_pe_3d_t(mask, PE_FEATS)
            sin = self.adapt_pos3d(sin.flatten(0, 1)).view(feat.size())
            feats.append(feat + pe + sin)

        query_embeds = self.query_embedding.weight
        hs, init_reference, inter_references = self.transformer(
            feats, query_embeds, self.reg_branches, lidar2img
        )
        outputs_classes, outputs_coords = [], []
        for lvl in range(hs.shape[0]):
            reference = (
                init_reference if lvl == 0 else inter_references[lvl - 1]
            )
            reference = inverse_sigmoid_t(reference)
            outputs_class = self.cls_branches[lvl](hs[lvl])
            tmp = self.reg_branches[lvl](hs[lvl])
            tmp = tmp.clone()
            tmp[..., 0:2] = (tmp[..., 0:2] + reference[..., 0:2]).sigmoid()
            tmp[..., 4:5] = (tmp[..., 4:5] + reference[..., 2:3]).sigmoid()
            pc = PC_RANGE
            tmp[..., 0:1] = tmp[..., 0:1] * (pc[3] - pc[0]) + pc[0]
            tmp[..., 1:2] = tmp[..., 1:2] * (pc[4] - pc[1]) + pc[1]
            tmp[..., 4:5] = tmp[..., 4:5] * (pc[5] - pc[2]) + pc[2]
            outputs_classes.append(outputs_class)
            outputs_coords.append(tmp)
        return torch.stack(outputs_classes), torch.stack(outputs_coords)


def _head_cfg():
    return HeadConfig(
        num_query=Q,
        num_classes=NUM_CLASSES,
        embed_dims=C,
        num_reg_fcs=2,
        num_decoder_layers=LAYERS,
        num_heads=HEADS,
        num_levels=LEVELS,
        num_points=POINTS,
        num_cams=N,
        ffn_dims=FFN_DIMS,
        dropout=0.0,
        depth_num=DEPTH_NUM,
        depth_start=1.0,
        pe_num_feats=PE_FEATS,
        with_detach=False,
        num_frame_cams=N,
    )


def _camera_rig():
    """Plausible lidar2img matrices: pinhole intrinsics + per-cam yaw."""
    mats = []
    for i in range(N):
        yaw = 2 * math.pi * i / N
        Rz = np.array(
            [
                [math.cos(yaw), -math.sin(yaw), 0],
                [math.sin(yaw), math.cos(yaw), 0],
                [0, 0, 1],
            ]
        )
        # lidar x-forward -> camera z-forward
        swap = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
        Rcam = swap @ Rz.T
        t = -Rcam @ np.array([2.0 * math.cos(yaw), 2.0 * math.sin(yaw), 1.0])
        K = np.array(
            [[80.0, 0, IMG_W / 2], [0, 80.0, IMG_H / 2], [0, 0, 1.0]]
        )
        P = np.eye(4)
        P[:3, :3] = K @ Rcam
        P[:3, 3] = K @ t
        mats.append(P)
    return np.stack(mats).astype(np.float32)


def test_full_head_matches_torch_oracle():
    oracle = TorchDetr3DHeadPE().eval()

    rng = np.random.RandomState(0)
    feats_np = [
        rng.randn(B, N, C, h, w).astype(np.float32) * 0.5
        for h, w in FEAT_SHAPES
    ]
    l2i_np = np.broadcast_to(_camera_rig(), (B, N, 4, 4)).copy()

    with torch.no_grad():
        t_cls, t_box = oracle(
            [torch.from_numpy(f) for f in feats_np],
            torch.from_numpy(l2i_np),
        )

    # reference-named state dict -> converter -> flax head
    sd = {
        "pts_bbox_head." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    converted = convert_state_dict(sd, num_decoder_layers=LAYERS,
                                   nheads=HEADS)

    cfg = _head_cfg()
    head = Detr3DHeadPE(cfg, img_shape=(IMG_H, IMG_W))
    feats_j = [
        jnp.asarray(np.transpose(f, (0, 1, 3, 4, 2))) for f in feats_np
    ]
    l2i_j = jnp.asarray(l2i_np)
    variables = head.init(jax.random.PRNGKey(0), feats_j, l2i_j)

    # graft converted head params; require IDENTICAL tree structure
    conv_head = converted["params"]["head"]
    init_params = variables["params"]

    def graft(dst, src, path=""):
        out = {}
        for k in dst:
            assert k in src, f"converter missing {path}/{k}"
            if isinstance(dst[k], dict):
                out[k] = graft(dst[k], src[k], path + "/" + k)
            else:
                assert (
                    np.asarray(src[k]).shape == np.asarray(dst[k]).shape
                ), f"shape mismatch at {path}/{k}"
                out[k] = jnp.asarray(np.asarray(src[k], np.float32))
        extra = set(src) - set(dst)
        assert not extra, f"converter extra keys at {path}: {extra}"
        return out

    params = graft(init_params, conv_head)
    j_out = head.apply({"params": params}, feats_j, l2i_j,
                       deterministic=True)

    j_cls = np.asarray(j_out["all_cls_scores"])
    j_box = np.asarray(j_out["all_bbox_preds"])
    np.testing.assert_allclose(
        j_cls, t_cls.numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        j_box, t_box.numpy(), atol=2e-4, rtol=1e-4
    )

    # box-level: decode both final layers and compare top boxes
    from graph_detr4d_tpu.core.coder import decode_batch

    det_j = decode_batch(
        {"all_cls_scores": jnp.asarray(j_cls),
         "all_bbox_preds": jnp.asarray(j_box)},
        max_num=4,
    )
    det_t = decode_batch(
        {"all_cls_scores": jnp.asarray(t_cls.numpy()),
         "all_bbox_preds": jnp.asarray(t_box.numpy())},
        max_num=4,
    )
    np.testing.assert_allclose(
        np.asarray(det_j.bboxes), np.asarray(det_t.bboxes), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(det_j.labels), np.asarray(det_t.labels)
    )


Q2M = 5  # one2many group size for the hybrid test


class TorchHDetr3DHeadPE(TorchDetr3DHeadPE):
    """HDetr3DHeadPE (h_detr3d_head_pe.py:40-693): the PE head with
    num_queries_one2one + num_queries_one2many queries, a self-attn mask
    isolating the two groups (True = blocked, :299-304), and outputs
    split into one2one / one2many streams (:361-364)."""

    def __init__(self):
        super().__init__()
        self.query_embedding = nn.Embedding(Q + Q2M, C * 2)

    def forward(self, mlvl_feats, lidar2img):
        pes = self.position_embeding(mlvl_feats, lidar2img)
        feats = []
        for level_id in range(len(mlvl_feats)):
            feat = mlvl_feats[level_id]
            Bs, Nc, _, H, W = feat.shape
            pe = self.fpe(
                pes[level_id].flatten(0, 1), feat.flatten(0, 1)
            ).view(feat.size())
            mask = torch.zeros((Bs, Nc, H, W))
            sin = sine_pe_3d_t(mask, PE_FEATS)
            sin = self.adapt_pos3d(sin.flatten(0, 1)).view(feat.size())
            feats.append(feat + pe + sin)

        nq = Q + Q2M
        self_attn_mask = torch.zeros([nq, nq]).bool()
        self_attn_mask[Q:, 0:Q] = True
        self_attn_mask[0:Q, Q:] = True

        query_embeds = self.query_embedding.weight
        hs, init_reference, inter_references = self.transformer(
            feats, query_embeds, self.reg_branches, lidar2img,
            attn_mask=self_attn_mask,
        )
        outputs_classes, outputs_coords = [], []
        for lvl in range(hs.shape[0]):
            reference = (
                init_reference if lvl == 0 else inter_references[lvl - 1]
            )
            reference = inverse_sigmoid_t(reference)
            outputs_class = self.cls_branches[lvl](hs[lvl])
            tmp = self.reg_branches[lvl](hs[lvl])
            tmp = tmp.clone()
            tmp[..., 0:2] = (tmp[..., 0:2] + reference[..., 0:2]).sigmoid()
            tmp[..., 4:5] = (tmp[..., 4:5] + reference[..., 2:3]).sigmoid()
            pc = PC_RANGE
            tmp[..., 0:1] = tmp[..., 0:1] * (pc[3] - pc[0]) + pc[0]
            tmp[..., 1:2] = tmp[..., 1:2] * (pc[4] - pc[1]) + pc[1]
            tmp[..., 4:5] = tmp[..., 4:5] * (pc[5] - pc[2]) + pc[2]
            outputs_classes.append(outputs_class)
            outputs_coords.append(tmp)
        all_cls = torch.stack(outputs_classes)
        all_box = torch.stack(outputs_coords)
        return (
            all_cls[:, :, :Q],
            all_box[:, :, :Q],
            all_cls[:, :, Q:],
            all_box[:, :, Q:],
        )


def test_hybrid_head_matches_torch_oracle():
    """HDetr3DHeadPE golden: group-isolating self-attn mask + one2one /
    one2many output split, through the converter."""
    import dataclasses

    torch.manual_seed(1)
    oracle = TorchHDetr3DHeadPE().eval()

    rng = np.random.RandomState(1)
    feats_np = [
        rng.randn(B, N, C, h, w).astype(np.float32) * 0.5
        for h, w in FEAT_SHAPES
    ]
    l2i_np = np.broadcast_to(_camera_rig(), (B, N, 4, 4)).copy()

    with torch.no_grad():
        t_cls, t_box, t_cls2m, t_box2m = oracle(
            [torch.from_numpy(f) for f in feats_np],
            torch.from_numpy(l2i_np),
        )

    sd = {
        "pts_bbox_head." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    converted = convert_state_dict(sd, num_decoder_layers=LAYERS,
                                   nheads=HEADS)

    cfg = dataclasses.replace(_head_cfg(), num_query_one2many=Q2M)
    head = Detr3DHeadPE(cfg, img_shape=(IMG_H, IMG_W))
    feats_j = [
        jnp.asarray(np.transpose(f, (0, 1, 3, 4, 2))) for f in feats_np
    ]
    l2i_j = jnp.asarray(l2i_np)
    variables = head.init(jax.random.PRNGKey(0), feats_j, l2i_j)

    conv_head = converted["params"]["head"]
    init_params = variables["params"]

    def graft(dst, src, path=""):
        out = {}
        for k in dst:
            assert k in src, f"converter missing {path}/{k}"
            if isinstance(dst[k], dict):
                out[k] = graft(dst[k], src[k], path + "/" + k)
            else:
                assert (
                    np.asarray(src[k]).shape == np.asarray(dst[k]).shape
                ), f"shape mismatch at {path}/{k}"
                out[k] = jnp.asarray(np.asarray(src[k], np.float32))
        return out

    params = graft(init_params, conv_head)
    j_out = head.apply({"params": params}, feats_j, l2i_j,
                       deterministic=True)
    np.testing.assert_allclose(
        np.asarray(j_out["all_cls_scores"]), t_cls.numpy(),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["all_bbox_preds"]), t_box.numpy(),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["all_cls_scores_one2many"]), t_cls2m.numpy(),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["all_bbox_preds_one2many"]), t_box2m.numpy(),
        atol=2e-4, rtol=1e-4,
    )
