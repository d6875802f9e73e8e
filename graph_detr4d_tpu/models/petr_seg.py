"""PETR + BEV-map segmentation head (the Petr3D_seg variant).

Parity targets:
  * `PETRHeadseg` (models/dense_heads/petr_head_seg.py:108-905): the PETR
    detection stream plus `num_lane` lane queries on a sqrt(num_lane)^2
    BEV grid (:365-369), embedded via pos2posemb2d (:540), decoded by a
    *second* decoder stack over the same camera memory (:546-548); a lane
    branch shared across layers maps each lane query to a 768-logit
    16x16x3 map patch (:313-318, 573).
  * `Sigmoid_ce_loss` (models/losses/Sigmoid_ce_loss.py:19-43):
    positive-class-balanced BCE over the patch logits.
  * `IOU` metric + map assembly (detectors/petr3d_seg.py:25-29) and the
    patchification of the (3, 256, 256) GT map into (256, 768)
    (datasets/pipelines/loading.py:11-25).
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..config import HeadConfig
from .positional import sine_positional_encoding_3d, lid_depth_bins
from .petr_head import PETRDecoderLayer, pos2posemb3d
from .head import ClsBranch, RegBranch
from .layers import MLP, SELayer, TwoLayerMLP
from ..utils.math import inverse_sigmoid
from ..geometry.projection import inv4x4


def pos2posemb2d(pos, num_pos_feats=128, temperature=10000.0):
    """Sine embedding of normalized 2D positions (petr_head_seg.py:43-55)."""
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def enc(p):
        p = p[..., None] / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], num_pos_feats)

    # REFERENCE QUIRK: the 2D variant concatenates (pos_y, pos_x) — Y
    # first (petr_head_seg.py:54), unlike pos2posemb3d's (x, y, z) order
    return jnp.concatenate([enc(pos[..., 1]), enc(pos[..., 0])], axis=-1)


def lane_grid(num_lane: int) -> np.ndarray:
    """(num_lane, 2) BEV grid of normalized lane reference points
    (petr_head_seg.py:365-369)."""
    n = round(math.sqrt(num_lane))
    x = (np.arange(n, dtype=np.float32) + 0.5) / n
    xv, yv = np.meshgrid(x, x, indexing="ij")
    return np.stack([xv.reshape(-1), yv.reshape(-1)], -1)


def maps_to_patches(gt_map: np.ndarray, patch: int = 16) -> np.ndarray:
    """(C, H, W) map mask -> (num_patches, C*patch*patch) lane targets,
    matching LoadMapsFromFiles (loading.py:19-24): row-major patch grid,
    channel-major within a patch."""
    c, h, w = gt_map.shape
    gh, gw = h // patch, w // patch
    x = gt_map.reshape(c, gh, patch, gw, patch)
    x = x.transpose(1, 3, 0, 2, 4)  # (gh, gw, c, patch, patch)
    return x.reshape(gh * gw, c * patch * patch)


def patches_to_map(patches: jnp.ndarray, channels: int = 3, patch: int = 16):
    """Inverse of maps_to_patches: (P, C*p*p) -> (C, H, W)."""
    P = patches.shape[0]
    g = round(math.sqrt(P))
    x = patches.reshape(g, g, channels, patch, patch)
    x = x.transpose(2, 0, 3, 1, 4)
    return x.reshape(channels, g * patch, g * patch)


def lane_mask_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Positive-balanced BCE (Sigmoid_ce_loss.py:26-43): per-row
    pos_weight = #neg/#pos, mean reduction."""
    pos = (targets == 1).astype(jnp.float32).sum(axis=1)
    neg = (targets == 0).astype(jnp.float32).sum(axis=1)
    pos_weight = (neg / jnp.maximum(pos, 1.0))[:, None]
    w = targets * pos_weight + (1.0 - targets)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return (w * ce).mean()


def seg_iou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Soft dice-style IoU metric (petr3d_seg.py:25-29), per class row."""
    num = 2.0 * (pred * target).sum(axis=1)
    den = pred.sum(axis=1) + target.sum(axis=1)
    return (num + 0.01) / (den + 0.01)


class PETRHeadSeg(nn.Module):
    """PETR detection + BEV-map segmentation head (petr_head_seg.py:108-905).

    Adds to the PETR stream: `num_lane` lane queries from a BEV grid,
    a second `num_decoder_layers`-deep decoder over the same memory, and a
    lane branch (2xDense+ReLU -> Dense(lane_out)) shared across layers.
    """

    cfg: HeadConfig
    img_shape: Tuple[int, int]
    # None -> cfg.num_lane (single source of truth; the module field only
    # exists for direct-construction tests)
    num_lane: Optional[int] = None
    lane_out: int = 768  # 3 channels x 16 x 16 patch
    position_range: Tuple[float, ...] = (-65.0, -65.0, -8.0, 65.0, 65.0, 8.0)
    lid: bool = True  # every shipped config sets LID=True
    with_time: bool = False
    # SE gate on the 3D coordinate PE, modulated by the projected
    # features (petr_head_seg.py:362-363, 507-508; petrv2_BEVseg.py:50
    # sets with_se=True). Same SELayer shape as the flagship's fpe.
    with_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        mlvl_feats: Sequence[jnp.ndarray],
        lidar2img: jnp.ndarray,
        deterministic: bool = True,
        mean_time_stamp: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        num_lane = (
            self.num_lane if self.num_lane is not None else cfg.num_lane
        )
        C = cfg.embed_dims
        feat = mlvl_feats[0]
        B, N, H, W, _ = feat.shape
        pad_h, pad_w = self.img_shape

        x = nn.Conv(C, (1, 1), dtype=self.dtype, name="input_proj")(feat)

        # ---- 3D coordinate PE, identical to PETRHead (petr_head.py:282-345)
        eps = 1e-5
        coords_h = jnp.arange(H, dtype=jnp.float32) * pad_h / H
        coords_w = jnp.arange(W, dtype=jnp.float32) * pad_w / W
        D = cfg.depth_num
        if self.lid:
            coords_d = lid_depth_bins(
                D, cfg.depth_start, self.position_range[3]
            )
        else:
            bin_size = (self.position_range[3] - cfg.depth_start) / D
            coords_d = cfg.depth_start + bin_size * jnp.arange(
                D, dtype=jnp.float32
            )
        d = jnp.maximum(coords_d, eps)[None, None, :]
        xs = coords_w[None, :, None]
        ys = coords_h[:, None, None]
        ones = jnp.ones((H, W, D), jnp.float32)
        coords = jnp.stack(
            [
                jnp.broadcast_to(xs * d, (H, W, D)),
                jnp.broadcast_to(ys * d, (H, W, D)),
                d * ones,
                ones,
            ],
            -1,
        )
        img2lidar = inv4x4(lidar2img)
        p3d = jnp.einsum("bnij,hwdj->bnhwdi", img2lidar, coords)[..., :3]
        pr = self.position_range
        lo = jnp.asarray(pr[:3])
        hi = jnp.asarray(pr[3:])
        p3d = (p3d - lo) / (hi - lo)
        p3d = inverse_sigmoid(p3d).reshape(B, N, H, W, D * 3)
        pos3d = TwoLayerMLP(
            C * 4, C, dtype=self.dtype, name="position_encoder"
        )(p3d.astype(self.dtype))
        if self.with_se:
            # PE gated by an SE of the projected features
            # (petr_head_seg.py:507-508: se(coords_pe, x))
            pos3d = SELayer(C, dtype=self.dtype, name="se")(pos3d, x)

        mask = jnp.zeros((B, N, H, W), jnp.float32)
        # sine offset=0: petrv2_BEVseg.py:87 keeps the class default
        sin = sine_positional_encoding_3d(
            mask, num_feats=cfg.pe_num_feats, offset=0.0, dtype=jnp.float32
        )
        sin = TwoLayerMLP(C * 4, C, dtype=self.dtype, name="adapt_pos3d")(
            sin.astype(self.dtype)
        )
        key_pos = (pos3d + sin).reshape(B, N * H * W, C)
        memory = x.reshape(B, N * H * W, C)

        # ---- detection queries (petr_head_seg.py:355-361)
        ref = self.param(
            "reference_points",
            nn.initializers.uniform(scale=1.0),
            (cfg.num_query, 3),
        )
        ref = jnp.broadcast_to(ref[None], (B, cfg.num_query, 3))
        query_pos = TwoLayerMLP(
            C, C, dtype=self.dtype, name="query_embedding"
        )(pos2posemb3d(ref, cfg.pe_num_feats).astype(self.dtype))
        query = jnp.zeros((B, cfg.num_query, C), self.dtype)

        # ---- lane queries on the BEV grid (:365-369, 540)
        lane_ref = jnp.asarray(lane_grid(num_lane))
        lane_pos = TwoLayerMLP(
            C, C, dtype=self.dtype, name="query_embedding_lane"
        )(
            pos2posemb2d(lane_ref, cfg.pe_num_feats).astype(self.dtype)
        )
        lane_pos = jnp.broadcast_to(lane_pos[None], (B, num_lane, C))
        lane_query = jnp.zeros((B, num_lane, C), self.dtype)

        cls_branch = ClsBranch(
            C, cfg.num_classes, cfg.num_reg_fcs, dtype=self.dtype,
            name="cls_branch",
        )
        reg_branch = RegBranch(
            C, cfg.code_size, cfg.num_reg_fcs, dtype=self.dtype,
            name="reg_branch",
        )
        # one lane branch instance shared across layers
        # (petr_head_seg.py:334-336); MLP gives the Denses a proper child
        # scope — inline nn.Sequential would leak them into the head's
        # top-level scope with fragile auto-names (see layers.TwoLayerMLP)
        lane_branch = MLP(
            C,
            self.lane_out,
            num_hidden_layers=cfg.num_reg_fcs,
            dtype=self.dtype,
            name="lane_branch",
        )

        ref_is = inverse_sigmoid(ref.astype(jnp.float32))
        # decoder-level post-norms on every intermediate output, one per
        # transformer (petr_transformer.py:443-445; both the det and lane
        # decoders are PETRTransformers, petr_head_seg.py:544-547)
        post_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="post_norm"
        )
        lane_post_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="lane_post_norm"
        )
        # box denorm uses pc_range, not position_range
        # (petr_head_seg.py:591-593)
        pc = cfg.pc_range
        cls_scores, bbox_preds, lane_preds = [], [], []
        for lid in range(cfg.num_decoder_layers):
            query = PETRDecoderLayer(
                embed_dims=C,
                num_heads=cfg.num_heads,
                ffn_dims=cfg.ffn_dims,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"layer{lid}",
            )(query, query_pos, memory, key_pos, deterministic)
            lane_query = PETRDecoderLayer(
                embed_dims=C,
                num_heads=cfg.num_heads,
                ffn_dims=cfg.ffn_dims,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"lane_layer{lid}",
            )(lane_query, lane_pos, memory, key_pos, deterministic)

            inter = post_norm(query)
            score = cls_branch(inter).astype(jnp.float32)
            tmp = reg_branch(inter).astype(jnp.float32)
            lane = lane_branch(lane_post_norm(lane_query)).astype(
                jnp.float32
            )
            xy = jax.nn.sigmoid(tmp[..., 0:2] + ref_is[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + ref_is[..., 2:3])
            cx = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
            cy = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
            cz = z * (pc[5] - pc[2]) + pc[2]
            vel = tmp[..., 8:10]
            if self.with_time and mean_time_stamp is not None:
                vel = vel / mean_time_stamp[:, None, None]
            coord = jnp.concatenate(
                [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:8], vel], axis=-1
            )
            cls_scores.append(score)
            bbox_preds.append(coord)
            lane_preds.append(lane)

        return {
            "all_cls_scores": jnp.stack(cls_scores),
            "all_bbox_preds": jnp.stack(bbox_preds),
            "all_lane_preds": jnp.stack(lane_preds),
        }
