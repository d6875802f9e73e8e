"""PETR / PETRv2 heads: dense-attention multi-view 3D detection.

Parity targets:
  * PETRHead (models/dense_heads/petr_head.py:44-733): single FPN level,
    per-pixel 3D coordinate position embedding (LID or linear depth bins,
    position_range not pc_range), queries from a learned (num_query, 3)
    uniform reference-point embedding whose sine embedding feeds a small
    MLP (:265-270, pos2posemb3d :29-42); encoder-free decoder with dense
    cross-attention over all camera pixels; shared cls/reg branches across
    layers; decode adds to inverse-sigmoid reference (no iterative refine).
  * PETRv2Head (petrv2_head.py:91-815): temporal tokens are simply the 12
    cameras' pixels; `with_time=True` divides predicted velocity by the
    mean timestamp delta between frames (:488-510).

Two load-bearing reference quirks (guarded by tests/test_golden_petr.py):
  * the decoder applies a POST-NORM LayerNorm to every intermediate layer
    output before the branches (PETRTransformerDecoder.post_norm,
    petr_transformer.py:418-422, 443-445) — on top of each layer's own
    final norm, so layer outputs are LayerNorm'd twice;

Padding-mask path: the reference threads a padding mask (non-÷32 image
tails) into the cross-attention key_padding_mask and the sine PE cumsum
(petr_head.py:377-387, petr_transformer.py:95-105). Implemented here via
the optional `img_valid_hw` argument (per-camera valid image extents);
None — every shipped config's final_dim is ÷32-exact, mask all-zero —
takes the unmasked path, which coincides exactly.
  * box denormalization uses `pc_range` (from the bbox coder,
    petr_head.py:210, 440-442), NOT `position_range` (which only scales
    the 3D position embedding, :317-320) — the two differ in every PETR
    config (e.g. 61.2 vs 51.2).

Dense attention is the trivially XLA-friendly path — all tokens live in one
(B, N*H*W, C) einsum-attention, no gathers at all.
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import HeadConfig
from .positional import sine_positional_encoding_3d, lid_depth_bins
from .head import ClsBranch, RegBranch
from .layers import SELayer, TwoLayerMLP
from ..utils.math import inverse_sigmoid
from ..geometry.projection import inv4x4


def pos2posemb3d(pos, num_pos_feats=128, temperature=10000.0):
    """Sine embedding of normalized 3D positions (petr_head.py:29-42)."""
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def enc(p):
        p = p[..., None] / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], num_pos_feats)

    return jnp.concatenate(
        [enc(pos[..., 0]), enc(pos[..., 1]), enc(pos[..., 2])], axis=-1
    )


class PETRDecoderLayer(nn.Module):
    embed_dims: int
    num_heads: int
    ffn_dims: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        query_pos,
        memory,
        key_pos,
        deterministic=True,
        key_valid=None,  # (B, K) bool, False = padded token (excluded)
    ):
        q = query + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="self_attn",
        )(q, q, query, deterministic=deterministic)
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            query
            + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        )
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="cross_attn",
        )(
            query + query_pos,
            memory + key_pos,
            memory,
            deterministic=deterministic,
            # torch key_padding_mask parity: padded pixels never attended
            mask=(
                None
                if key_valid is None
                else key_valid[:, None, None, :]
            ),
        )
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            query
            + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        )
        y = nn.Dense(self.ffn_dims, dtype=self.dtype)(query)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(query + y)


class RegLayer(nn.Module):
    """PETRv2's grouped regression branch (petrv2_head.py:58-88,
    with_multi=True in every petrv2 det config): a shared
    `num_fcs`-deep Linear+ReLU trunk, then one small MLP per group of
    code dims (2, 1, 3, 2, 2), outputs concatenated in group order.
    The loss/decode define the code semantics; the grouping only
    shapes the parameters."""

    embed_dims: int
    groups: Tuple[int, ...] = (2, 1, 3, 2, 2)
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(
                self.embed_dims, dtype=self.dtype, name=f"fc{i}"
            )(x)
            x = nn.relu(x)
        outs = []
        for t, g in enumerate(self.groups):
            y = nn.Dense(
                self.embed_dims, dtype=self.dtype, name=f"task{t}_fc"
            )(x)
            y = nn.relu(y)
            outs.append(
                nn.Dense(g, dtype=self.dtype, name=f"task{t}_out")(y)
            )
        return jnp.concatenate(outs, axis=-1)


class PETRHead(nn.Module):
    cfg: HeadConfig
    img_shape: Tuple[int, int]
    position_range: Tuple[float, ...] = (-65.0, -65.0, -8.0, 65.0, 65.0, 8.0)
    lid: bool = False
    with_time: bool = False  # PETRv2 (petrv2_head.py:488-510)
    # PETRv2 structural deltas (class defaults = PETRv1):
    # SELayer gate on the coords PE before the sine add
    # (petrv2_head.py:327-328, 453-454; with_fpe=True in every petrv2
    # det config)
    with_fpe: bool = False
    # grouped RegLayer reg branch (petrv2_head.py:287, with_multi=True)
    with_multi: bool = False
    # PETRv1 SHARES one cls/reg branch across layers (petr_head.py:
    # 240-243 repeats the same module); PETRv2 deepcopies per layer
    # (petrv2_head.py:297-300 — independent trained weights)
    per_layer_branches: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        mlvl_feats: Sequence[jnp.ndarray],  # uses level 0: (B, N, H, W, Cin)
        lidar2img: jnp.ndarray,
        deterministic: bool = True,
        mean_time_stamp: Optional[jnp.ndarray] = None,  # (B,) seconds
        img_valid_hw: Optional[jnp.ndarray] = None,  # (B, N, 2) see below
    ):
        """`img_valid_hw` (optional): per-camera valid (img_h, img_w) in
        padded-image pixels, for inputs whose true image is smaller than
        the ÷32-padded canvas. Enables the reference's padding-mask path
        (petr_head.py:377-387 mask build + F.interpolate,
        petr_transformer.py:95-105 key_padding_mask, and the masked sine
        PE cumsum). Omit (None) for ÷32-exact inputs — every shipped
        config — where the mask is all-zero and the paths coincide."""
        cfg = self.cfg
        C = cfg.embed_dims
        feat = mlvl_feats[0]
        B, N, H, W, _ = feat.shape
        pad_h, pad_w = self.img_shape

        x = nn.Conv(C, (1, 1), dtype=self.dtype, name="input_proj")(feat)

        # ---- per-pixel 3D coordinate embedding (petr_head.py:282-345)
        eps = 1e-5
        coords_h = jnp.arange(H, dtype=jnp.float32) * pad_h / H
        coords_w = jnp.arange(W, dtype=jnp.float32) * pad_w / W
        D = cfg.depth_num
        if self.lid:
            coords_d = lid_depth_bins(
                D, cfg.depth_start, self.position_range[3]
            )
        else:
            bin_size = (
                self.position_range[3] - cfg.depth_start
            ) / D
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
        if self.with_fpe:
            # fpe(coords_pe, x): SE of the projected features gates the
            # PE (petrv2_head.py:453-454)
            pos3d = SELayer(C, dtype=self.dtype, name="fpe")(pos3d, x)

        if img_valid_hw is None:
            mask = jnp.zeros((B, N, H, W), jnp.float32)
            key_valid = None
        else:
            # reference mask build: ones on the pad canvas, zero over each
            # camera's true image, then F.interpolate(mode='nearest') to
            # the feature grid — output pixel i samples input
            # floor(i * pad/H), so feature cell (y, x) is VALID iff
            # floor(y*pad_h/H) < img_h and floor(x*pad_w/W) < img_w
            ys = jnp.floor(
                jnp.arange(H, dtype=jnp.float32) * pad_h / H
            )
            xs = jnp.floor(
                jnp.arange(W, dtype=jnp.float32) * pad_w / W
            )
            vy = ys[None, None, :] < img_valid_hw[..., 0:1]  # (B, N, H)
            vx = xs[None, None, :] < img_valid_hw[..., 1:2]  # (B, N, W)
            valid = vy[..., :, None] & vx[..., None, :]  # (B, N, H, W)
            mask = 1.0 - valid.astype(jnp.float32)
            key_valid = valid.reshape(B, N * H * W)
        # petr configs use the sine default offset=0 (the flagship detr4d
        # config sets offset=-0.5; petr_r50dcn_gridmask_p4.py:92 does not)
        sin = sine_positional_encoding_3d(
            mask, num_feats=cfg.pe_num_feats, offset=0.0, dtype=jnp.float32
        )
        sin = TwoLayerMLP(
            C * 4, C, dtype=self.dtype, name="adapt_pos3d"
        )(sin.astype(self.dtype))
        key_pos = (pos3d + sin).reshape(B, N * H * W, C)
        memory = x.reshape(B, N * H * W, C)

        # ---- queries (petr_head.py:265-276)
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

        # ---- decoder + branches (no iterative refinement)
        def make_cls(name):
            return ClsBranch(
                C, cfg.num_classes, cfg.num_reg_fcs, dtype=self.dtype,
                name=name,
            )

        def make_reg(name):
            if self.with_multi:
                return RegLayer(
                    C, num_fcs=cfg.num_reg_fcs, dtype=self.dtype, name=name
                )
            return RegBranch(
                C, cfg.code_size, cfg.num_reg_fcs, dtype=self.dtype,
                name=name,
            )

        if self.per_layer_branches:
            cls_branches = [
                make_cls(f"cls_branch{l}")
                for l in range(cfg.num_decoder_layers)
            ]
            reg_branches = [
                make_reg(f"reg_branch{l}")
                for l in range(cfg.num_decoder_layers)
            ]
        else:
            cls_branches = [make_cls("cls_branch")] * cfg.num_decoder_layers
            reg_branches = [make_reg("reg_branch")] * cfg.num_decoder_layers
        ref_is = inverse_sigmoid(ref.astype(jnp.float32))
        # decoder-level post-norm, applied to EVERY intermediate output
        # before the branches (petr_transformer.py:443-445) but NOT fed
        # back into the next layer
        post_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="post_norm"
        )
        # box denorm range is pc_range, not position_range
        # (petr_head.py:210, 440-442)
        pc = cfg.pc_range
        cls_scores, bbox_preds = [], []
        for lid_ in range(cfg.num_decoder_layers):
            query = PETRDecoderLayer(
                embed_dims=C,
                num_heads=cfg.num_heads,
                ffn_dims=cfg.ffn_dims,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"layer{lid_}",
            )(query, query_pos, memory, key_pos, deterministic, key_valid)
            inter = post_norm(query)
            score = cls_branches[lid_](inter).astype(jnp.float32)
            tmp = reg_branches[lid_](inter).astype(jnp.float32)
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

        return {
            "all_cls_scores": jnp.stack(cls_scores),
            "all_bbox_preds": jnp.stack(bbox_preds),
        }
