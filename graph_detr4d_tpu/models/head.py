"""Detr3DHeadPE — the Graph-DETR4D detection head.

Parity with projects/mmdet3d_plugin/models/dense_heads/detr3d_head_pe.py:
  * PETR-style 3D position embedding: LID depth bins back-projected through
    img2lidar, MLP-encoded, gated by an SE layer (`fpe`), summed with a
    3-axis sine PE (:427-491, :541-553).
  * temporal detach: past-frame cameras of the *first* FPN level are
    stop-gradiented (:512-516 — the reference detaches only level 0; we
    mirror that exactly).
  * 900 learned queries -> 6-layer decoder with iterative refinement;
    per-layer cls/reg branches (box-refine mode = untied weights, :406-408).
  * decode math: xy/z offsets added in inverse-sigmoid space, then
    sigmoid + denorm to pc_range (:587-600).

All shapes static; the decoder loop is unrolled; cls bias initialised to
focal-prior -log((1-p)/p), p=0.01 (:419-425).
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import HeadConfig
from .layers import SELayer, TwoLayerMLP
from .positional import sine_positional_encoding_3d, lid_depth_bins
from .transformer import DecoderLayer
from ..utils.math import inverse_sigmoid
from ..geometry.projection import inv4x4


def _bias_init_prob(p: float):
    b = -math.log((1.0 - p) / p)
    return nn.initializers.constant(b)


class ClsBranch(nn.Module):
    embed_dims: int
    num_classes: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.num_classes,
            bias_init=_bias_init_prob(0.01),
            dtype=self.dtype,
            name="out",
        )(x)


class RegBranch(nn.Module):
    embed_dims: int
    code_size: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.code_size, dtype=self.dtype, name="out")(x)


class Detr3DHeadPE(nn.Module):
    cfg: HeadConfig
    img_shape: tuple  # static network input (H, W) == pad_shape
    dtype: jnp.dtype = jnp.float32

    def _position_embedding(self, feats, lidar2img):
        """LID-bin 3D position embedding for one level (:427-491)."""
        cfg = self.cfg
        B, N, H, W, C = feats.shape
        pad_h, pad_w = self.img_shape
        eps = 1e-5

        coords_h = jnp.arange(H, dtype=jnp.float32) * pad_h / H
        coords_w = jnp.arange(W, dtype=jnp.float32) * pad_w / W
        coords_d = lid_depth_bins(
            cfg.depth_num, cfg.depth_start, cfg.pc_range[3]
        )
        D = cfg.depth_num
        # (H, W, D, 4) homogeneous image points (x*d, y*d, d, 1)
        x = coords_w[None, :, None]
        y = coords_h[:, None, None]
        d = jnp.maximum(coords_d[None, None, :], eps)
        ones = jnp.ones((H, W, D), jnp.float32)
        coords = jnp.stack(
            [
                jnp.broadcast_to(x * d, (H, W, D)),
                jnp.broadcast_to(y * d, (H, W, D)),
                d * ones,
                ones,
            ],
            axis=-1,
        )  # (H, W, D, 4)

        img2lidar = inv4x4(lidar2img)
        p3d = jnp.einsum("bnij,hwdj->bnhwdi", img2lidar, coords)[..., :3]
        lo = jnp.asarray(cfg.pc_range[:3])
        hi = jnp.asarray(cfg.pc_range[3:])
        p3d = (p3d - lo) / (hi - lo)
        p3d = inverse_sigmoid(p3d)
        return p3d.reshape(B, N, H, W, D * 3)

    @nn.compact
    def __call__(
        self,
        mlvl_feats: Sequence[jnp.ndarray],  # L x (B, N, H, W, C)
        lidar2img: jnp.ndarray,  # (B, N, 4, 4)
        deterministic: bool = True,
        depth_factors: Optional[jnp.ndarray] = None,  # (B,) for scale_pred
        intrinsics: Optional[jnp.ndarray] = None,  # (B, N, 4, 4) cam_aware
        ida_scale: Optional[jnp.ndarray] = None,  # (B, N) cam_aware
        teacher_query_embed: Optional[jnp.ndarray] = None,  # (Qt, 2C) Mix
    ):
        cfg = self.cfg
        C = cfg.embed_dims
        B, N = mlvl_feats[0].shape[:2]

        # ---- camera-aware DepthNet modulation applied per level
        # (Detr3DHeadPECAM, detr3d_head_pe_camaware.py:315-319)
        if cfg.cam_aware:
            from .camera_aware import DepthNet

            depth_net = DepthNet(
                mid_channels=C, context_channels=C, dtype=self.dtype,
                name="depth_net",
            )
            if intrinsics is None:
                intrinsics = jnp.broadcast_to(
                    jnp.eye(4, dtype=jnp.float32), (B, N, 4, 4)
                )
            if ida_scale is None:
                ida_scale = jnp.ones((B, N), jnp.float32)
            mlvl_feats = [
                depth_net(f, intrinsics, ida_scale) for f in mlvl_feats
            ]

        # ---- temporal detach of past-frame cameras, level 0 only (:512-516)
        if cfg.with_detach and N > cfg.num_frame_cams:
            cur = mlvl_feats[0][:, : cfg.num_frame_cams]
            past = jax.lax.stop_gradient(
                mlvl_feats[0][:, cfg.num_frame_cams :]
            )
            mlvl_feats = [jnp.concatenate([cur, past], axis=1)] + list(
                mlvl_feats[1:]
            )

        # ---- shared PE modules (one instance across levels, :386-396)
        position_encoder = TwoLayerMLP(
            C * 4, C, dtype=self.dtype, name="position_encoder"
        )
        adapt_pos3d = TwoLayerMLP(
            C * 4, C, dtype=self.dtype, name="adapt_pos3d"
        )
        if cfg.fpe_type == "camconv":
            from .camera_aware import SELayerCAMConv

            fpe = SELayerCAMConv(
                C, img_shape=self.img_shape, dtype=self.dtype, name="fpe"
            )
        else:
            fpe = SELayer(C, dtype=self.dtype, name="fpe")

        if cfg.with_pe:
            feats_pe = []
            for feat in mlvl_feats:
                _, _, H, W, _ = feat.shape
                pe3d = self._position_embedding(feat, lidar2img)
                pe = position_encoder(pe3d.astype(self.dtype))
                if cfg.with_fpe:
                    if cfg.fpe_type == "camconv":
                        pe = fpe(pe, feat, intrinsics)
                    else:
                        pe = fpe(pe, feat)
                # all-valid masks: the fused input pipeline always pads to
                # the exact network size, so mask == 0 everywhere (:524-539)
                mask = jnp.zeros((B, N, H, W), jnp.float32)
                sin = sine_positional_encoding_3d(
                    mask, num_feats=cfg.pe_num_feats, dtype=jnp.float32
                )
                pe = pe + adapt_pos3d(sin.astype(self.dtype))
                feats_pe.append(feat + pe)
        else:
            # plain Detr3DHead: raw FPN features, no position embedding
            # (detr3d_head.py:16-166)
            feats_pe = list(mlvl_feats)

        # ---- queries and initial reference points
        # hybrid matching adds a one2many query group isolated from the
        # one2one group by a block-diagonal self-attn mask
        # (h_detr3d_head_pe.py:300-304)
        num_q = cfg.num_query + cfg.num_query_one2many
        query_embed = self.param(
            "query_embedding",
            nn.initializers.normal(1.0),
            (num_q, C * 2),
        )
        self_attn_mask = None
        if cfg.num_query_one2many > 0:
            g = jnp.zeros((num_q,), jnp.int32)
            g = g.at[cfg.num_query :].set(1)
            self_attn_mask = (g[:, None] == g[None, :])[None, None]
        ref_proj = nn.Dense(
            3,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=jnp.float32,
            name="reference_points",
        )

        # module instances created once, callable on both the student's own
        # queries and (MixDistill) the teacher's query embeddings
        layers = [
            DecoderLayer(
                embed_dims=C,
                num_heads=cfg.num_heads,
                num_levels=cfg.num_levels,
                num_points=cfg.num_points,
                num_cams=cfg.num_cams,
                ffn_dims=cfg.ffn_dims,
                pc_range=cfg.pc_range,
                dropout=cfg.dropout,
                attn_type=cfg.attn_type,
                num_neighbors=cfg.num_neighbors,
                cam_capacity=cfg.cam_capacity,
                fix_offset=cfg.fix_offset,
                depth_encode=cfg.depth_encode,
                msda_impl=cfg.msda_impl,
                msda_late_proj=cfg.msda_late_proj,
                dtype=self.dtype,
                name=f"decoder_layer{lid}",
            )
            for lid in range(cfg.num_decoder_layers)
        ]
        cls_branches = [
            ClsBranch(
                C,
                cfg.num_classes,
                cfg.num_reg_fcs,
                dtype=self.dtype,
                name=f"cls_branch{lid}",
            )
            for lid in range(cfg.num_decoder_layers)
        ]
        reg_branches = [
            RegBranch(
                C,
                cfg.code_size,
                cfg.num_reg_fcs,
                dtype=self.dtype,
                name=f"reg_branch{lid}",
            )
            for lid in range(cfg.num_decoder_layers)
        ]

        def run_decoder(query_embed_2c, attn_mask):
            """Full decoder stack on a (Qx, 2C) query embedding table."""
            nq = query_embed_2c.shape[0]
            query_pos, query = jnp.split(query_embed_2c, 2, axis=-1)
            query_pos = jnp.broadcast_to(
                query_pos[None].astype(self.dtype), (B, nq, C)
            )
            query = jnp.broadcast_to(
                query[None].astype(self.dtype), (B, nq, C)
            )
            reference_points = jax.nn.sigmoid(
                ref_proj(query_pos.astype(jnp.float32))
            )

            cls_scores, bbox_preds = [], []
            for lid in range(cfg.num_decoder_layers):
                query = layers[lid](
                    query,
                    query_pos,
                    feats_pe,
                    reference_points,
                    lidar2img,
                    self.img_shape,
                    deterministic=deterministic,
                    self_attn_mask=attn_mask,
                )
                score = cls_branches[lid](query)
                tmp = reg_branches[lid](query).astype(jnp.float32)

                # decode w.r.t. the reference entering this layer (:587-600)
                ref = inverse_sigmoid(reference_points)
                xy = jax.nn.sigmoid(tmp[..., 0:2] + ref[..., 0:2])
                z = jax.nn.sigmoid(tmp[..., 4:5] + ref[..., 2:3])

                pc = cfg.pc_range
                cx = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
                cy = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
                cz = z * (pc[5] - pc[2]) + pc[2]
                if cfg.scale_pred and depth_factors is not None:
                    df = depth_factors[:, None, None]
                    cx, cy, cz = cx * df, cy * df, cz * df
                coord = jnp.concatenate(
                    [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], axis=-1
                )
                cls_scores.append(score.astype(jnp.float32))
                bbox_preds.append(coord)

                # iterative refinement, detached (:201-214)
                reference_points = jax.lax.stop_gradient(
                    jnp.concatenate([xy, z], axis=-1)
                )
            return jnp.stack(cls_scores), jnp.stack(bbox_preds)

        all_cls, all_bbox = run_decoder(query_embed, self_attn_mask)
        if cfg.num_query_one2many > 0:
            # split output groups (h_detr3d_head_pe.py:361-364)
            out = {
                "all_cls_scores": all_cls[:, :, : cfg.num_query],
                "all_bbox_preds": all_bbox[:, :, : cfg.num_query],
                "all_cls_scores_one2many": all_cls[:, :, cfg.num_query :],
                "all_bbox_preds_one2many": all_bbox[:, :, cfg.num_query :],
            }
        else:
            out = {"all_cls_scores": all_cls, "all_bbox_preds": all_bbox}

        if teacher_query_embed is not None:
            # MixDistill: decode a second time with the teacher's query
            # embedding table (mix_distill.py:102, detr3d_head_pe.py:617-671)
            g_cls, g_bbox = run_decoder(
                jax.lax.stop_gradient(teacher_query_embed), None
            )
            out["all_cls_scores_guided"] = g_cls
            out["all_bbox_preds_guided"] = g_bbox
        return out
