"""Cross-attention variants.

* Detr3DCrossAtten — the original DETR3D attention: one 3D reference point
  per query, bilinear-sampled in every camera and FPN level, combined by a
  sigmoid weight over (cams x levels x points) (reference:
  models/utils/detr3d_transformer.py:229-438; note grid_sample there uses
  [-1, 1] locations, i.e. the same align_corners=False bilinear our MSDA
  op implements, and masks use the [-1,1] bounds :395-411).

* Deform3DCrossAttnMP — graph multi-point variant: in addition to the
  center-point deformable sampling (same math as Deform3DCrossAttn), 8
  precomputed graph-neighbor reference points per query are projected and
  sampled WITHOUT learned offsets using num_points//4 points, per-camera
  gated, summed over cameras and neighbors, then fused with the center
  branch through a learned global 2-way softmax weight
  (models/utils/deform3d_cross_attn_multi_point.py:34-453; neighbor branch
  :369-439, fusion :436-439).
"""

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.msda import multi_scale_deformable_attention
from ..geometry.projection import denormalize_points
from ..utils.math import inverse_sigmoid
from .attention import _offset_bias_init


def project_to_cams(pts, lidar2img, img_shape, eps=1e-5):
    """pts (B, S, 3) metric -> loc (B, N, S, 2) in [0,1], mask (B, N, S)."""
    img_h, img_w = img_shape
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    cam = jnp.einsum("bnij,bsj->bnsi", lidar2img, hom)
    z = cam[..., 2:3]
    xy = cam[..., 0:2] / jnp.maximum(z, eps)
    loc = xy / jnp.asarray([img_w, img_h], dtype=xy.dtype)
    valid = (
        (z > eps)
        & (loc[..., 0:1] > 0.0)
        & (loc[..., 0:1] < 1.0)
        & (loc[..., 1:2] > 0.0)
        & (loc[..., 1:2] < 1.0)
    )[..., 0]
    return loc, valid.astype(jnp.float32)


class PositionEncoderMLP(nn.Module):
    """Linear-LN-ReLU x2 positional MLP shared by all variants."""

    embed_dims: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref01):
        x = inverse_sigmoid(ref01.astype(jnp.float32)).astype(self.dtype)
        x = nn.Dense(self.embed_dims, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dims, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class Detr3DCrossAtten(nn.Module):
    embed_dims: int = 256
    num_levels: int = 4
    num_points: int = 1
    num_cams: int = 6
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # MSDA sampling layout (HeadConfig.msda_impl); 'gather4' = pure-gather
    msda_impl: str = "shift4h"

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C)
        value_levels: Sequence[jnp.ndarray],  # L x (B, N, H, W, C)
        query_pos,
        reference_points,  # (B, Q, 3) in [0,1]
        lidar2img,  # (B, N, 4, 4)
        img_shape,
        deterministic: bool = True,
    ):
        B, Q, C = query.shape
        N, L, P = self.num_cams, self.num_levels, self.num_points
        residual = query
        q = query + query_pos

        w = nn.Dense(
            N * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(q).reshape(B, Q, N, P, L)
        w = jax.nn.sigmoid(w.astype(jnp.float32))

        ref_metric = denormalize_points(
            reference_points.astype(jnp.float32), self.pc_range
        )
        loc, mask = project_to_cams(ref_metric, lidar2img, img_shape)
        # (B, N, Q) -> weight mask over all (P, L)
        w = w * mask.transpose(0, 2, 1)[..., None, None]

        # sample each level at the single projected point per cam
        samples = []
        for lvl, feat in enumerate(value_levels):
            _, _, h, wd, _ = feat.shape
            v = feat.reshape(B * N, h, wd, 1, C)
            ll = loc.reshape(B * N, Q, 1, 1, 1, 2).astype(self.dtype)
            ones = jnp.ones((B * N, Q, 1, 1, 1), self.dtype)
            s = multi_scale_deformable_attention(
                [v], ll, ones, impl=self.msda_impl
            )
            samples.append(s.reshape(B, N, Q, C))
        sampled = jnp.stack(samples, axis=-1)  # (B, N, Q, C, L)
        sampled = jnp.nan_to_num(sampled)

        # weighted sum over cams, points(=1), levels
        wsum = w.sum(3)  # (B, Q, N, L)
        out = jnp.einsum(
            "bnqcl,bqnl->bqc", sampled.astype(jnp.float32), wsum
        )
        out = nn.Dense(
            C,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="output_proj",
        )(out.astype(self.dtype))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        pos_feat = PositionEncoderMLP(
            C, dtype=self.dtype, name="position_encoder"
        )(reference_points)
        return out + residual + pos_feat


class Deform3DCrossAttnMP(nn.Module):
    """Graph multi-point deformable cross-attention
    (deform3d_cross_attn_multi_point.py:34-453): center branch identical
    to Deform3DCrossAttn plus `num_neighbors` precomputed graph-neighbor
    reference points per query sampled WITHOUT offsets at P//4 taps,
    fused by a learned 2-way softmax.

    Reference quirks replicated: no query_pos added anywhere (:220-221),
    raw (unsigmoided) neighbor cam gate (:424-429), cam-gate
    view-scramble. Deliberate deviations (documented inline): per-sample
    fusion weights instead of sample-0's (:439, identical at B=1), and a
    CONSISTENT neighbor-major (j*Q + q) layout for neighbor points,
    gates, and attention logits — the reference mixes query-major
    attention logits (:373-375) with neighbor-major gates/points
    (:421-424), and its own MP decoder class is absent from the checkout
    (no config can build it, transformer.py:108-114 note), so there is
    no runnable ground truth for the mixed layout."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_cams: int = 12
    num_neighbors: int = 8
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # MSDA sampling layout (HeadConfig.msda_impl); 'gather4' = pure-gather
    msda_impl: str = "shift4h"

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C)
        value_levels,
        query_pos,
        reference_points,  # (B, Q*(1+num_neighbors), 3): center + neighbors
        lidar2img,
        img_shape,
        deterministic: bool = True,
    ):
        B, QT, C = query.shape
        Q = reference_points.shape[1] // (1 + self.num_neighbors)
        assert QT == Q, (QT, Q)
        HH, L, P, N, K = (
            self.num_heads,
            self.num_levels,
            self.num_points,
            self.num_cams,
            self.num_neighbors,
        )
        hd = C // HH
        residual = query
        # REFERENCE QUIRK: the MP variant does NOT add query_pos — the
        # `query = query + query_pos` line is commented out in its
        # forward (multi_point.py:220-221); every linear sees the raw
        # query (the standard variant adds it, deform3d_cross_attn.py:
        # 203-204).
        q = query

        ref_center = reference_points[:, :Q]
        ref_neighbor = reference_points[:, Q:]  # (B, Q*K, 3)

        cam_gate = nn.Dense(
            N,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="cam_attention_weights",
        )

        vproj = nn.Dense(
            C,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="value_proj",
        )
        values = [
            vproj(v).reshape(B * N, v.shape[2], v.shape[3], HH, hd)
            for v in value_levels
        ]

        # ---- center branch: identical to Deform3DCrossAttn
        offsets = nn.Dense(
            HH * P * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_bias_init(HH, P), dtype
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(q).reshape(B, Q, HH, 1, P, 3)
        ref_metric = denormalize_points(
            ref_center.astype(jnp.float32), self.pc_range
        )
        pts = ref_metric[:, :, None, None, None, :] + jnp.broadcast_to(
            offsets.astype(jnp.float32), (B, Q, HH, L, P, 3)
        )
        loc, mask = project_to_cams(
            pts.reshape(B, Q * HH * L * P, 3), lidar2img, img_shape
        )
        loc = loc.reshape(B * N, Q, HH, L, P, 2)
        mask = mask.reshape(B, N, Q, HH, L, P)

        attn = nn.Dense(
            HH * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(q).reshape(B, Q, HH, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).reshape(
            B, 1, Q, HH, L, P
        ) * mask
        center = multi_scale_deformable_attention(
            values,
            loc.astype(self.dtype),
            attn.reshape(B * N, Q, HH, L, P).astype(self.dtype),
            impl=self.msda_impl,
        ).reshape(B, N, Q, C)
        # reference view-scramble parity: (B, Q, N) reinterpreted as
        # (B, N, Q) by `.view` (multi_point.py:227-228), not transposed
        gate_c = jax.nn.sigmoid(
            cam_gate(q).astype(jnp.float32)
        ).reshape(B, N, Q)[..., None]
        center = (center.astype(jnp.float32) * gate_c).sum(1)  # (B, Q, C)

        # ---- neighbor branch: no offsets, P//4 points (:369-433)
        Pn = max(P // 4, 1)
        qn = jnp.tile(q, (1, K, 1))  # (B, Q*K, C)
        attn_n = nn.Dense(
            HH * L * Pn,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights_neighbor",
        )(qn).reshape(B, Q * K, HH, L * Pn)
        ref_n = denormalize_points(
            ref_neighbor.astype(jnp.float32), self.pc_range
        )
        pts_n = jnp.broadcast_to(
            ref_n[:, :, None, None, None, :], (B, Q * K, HH, L, Pn, 3)
        )
        loc_n, mask_n = project_to_cams(
            pts_n.reshape(B, Q * K * HH * L * Pn, 3), lidar2img, img_shape
        )
        loc_n = loc_n.reshape(B * N, Q * K, HH, L, Pn, 2)
        mask_n = mask_n.reshape(B, N, Q * K, HH, L, Pn)
        attn_n = jax.nn.softmax(attn_n.astype(jnp.float32), -1).reshape(
            B, 1, Q * K, HH, L, Pn
        ) * mask_n
        nb = multi_scale_deformable_attention(
            values,
            loc_n.astype(self.dtype),
            attn_n.reshape(B * N, Q * K, HH, L, Pn).astype(self.dtype),
            impl=self.msda_impl,
        ).reshape(B, N, Q * K, C)
        # same view-scramble on the neighbor gate (multi_point.py:424-425).
        # REFERENCE QUIRK: the neighbor gate is the RAW cam_attention_
        # weights output — no sigmoid (multi_point.py:424-429; only the
        # center branch sigmoids at :357). With the reference's zero
        # init the neighbor branch therefore starts exactly OFF.
        gate_n = cam_gate(qn).astype(jnp.float32).reshape(B, N, Q * K)[
            ..., None
        ]
        nb = (nb.astype(jnp.float32) * gate_n).sum(1)  # (B, Q*K, C)
        nb = nb.reshape(B, K, Q, C).sum(1)  # sum over neighbors

        # ---- learned global 2-way fusion (:436-439). Deliberate
        # deviation: the reference indexes `output_weight[0]` — sample
        # 0's fused weights applied to the whole batch — which couples
        # samples across the data-parallel axis. We keep per-sample
        # weights (identical at B=1, i.e. for all eval/checkpoint-parity
        # paths, and shard-safe under pjit).
        fuse = nn.Dense(2, dtype=self.dtype, name="output_weight")(
            jnp.concatenate([center, nb], -1).astype(self.dtype)
        )
        fuse = jax.nn.softmax(
            fuse.astype(jnp.float32).sum(axis=1), axis=-1
        )  # (B, 2)
        out = (
            center * fuse[:, None, 0:1] + nb * fuse[:, None, 1:2]
        )

        out = nn.Dense(
            C,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="output_proj",
        )(out.astype(self.dtype))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        pos_feat = PositionEncoderMLP(
            C, dtype=self.dtype, name="position_encoder"
        )(ref_center)
        return out + residual + pos_feat


class Detr3DCrossAttenV2(nn.Module):
    """DETR3D cross-attention + learned 2D image-plane offsets
    (detr3d_transformer.py:441-710).

    Per (camera, head, level, point) a learned 2D offset (circular-bias
    deformable-DETR init, :527-541) perturbs the projected reference point
    in normalized [-1, 1] image coordinates, scaled by each level's own
    (W, H) (:699-702); attention logits softmax over (levels*points) per
    (cam, head) (:603-604) then multiply the center-projection validity
    mask; sampled features sum over points/levels/cams.
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_cams: int = 6
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # MSDA sampling layout (HeadConfig.msda_impl); 'gather4' = pure-gather
    msda_impl: str = "shift4h"

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C)
        value_levels,  # L x (B, N, H, W, C)
        query_pos,
        reference_points,  # (B, Q, 3) in [0,1]
        lidar2img,  # (B, N, 4, 4)
        img_shape,
        deterministic: bool = True,
    ):
        B, Q, C = query.shape
        N, HH, L, P = (
            self.num_cams,
            self.num_heads,
            self.num_levels,
            self.num_points,
        )
        hd = C // HH
        residual = query
        q = query + query_pos

        def _v2_offset_bias(key, shape, dtype=jnp.float32):
            import numpy as np

            thetas = np.arange(HH, dtype=np.float32) * (
                2.0 * math.pi / HH
            )
            grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
            grid = grid / np.abs(grid).max(-1, keepdims=True)
            grid = np.tile(grid[None, :, None, None, :], (N, 1, L, P, 1))
            for i in range(P):
                grid[:, :, :, i, :] *= i + 1
            return jnp.asarray(grid.reshape(-1), dtype)

        attn = nn.Dense(
            N * HH * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(q).reshape(B, Q, N, HH, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).reshape(
            B, Q, N, HH, L, P
        )
        offsets = nn.Dense(
            N * HH * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_v2_offset_bias,
            dtype=self.dtype,
            name="sampling_offsets",
        )(q).reshape(B, Q, N, HH, L, P, 2).astype(jnp.float32)

        # center projection in [0, 1] + per-cam validity (:666-685)
        ref_metric = denormalize_points(
            reference_points.astype(jnp.float32), self.pc_range
        )
        center01, mask = project_to_cams(ref_metric, lidar2img, img_shape)
        # (B, N, Q, ...) -> (B, Q, N, ...)
        center01 = center01.transpose(0, 2, 1, 3)
        mask = mask.transpose(0, 2, 1)  # (B, Q, N)
        attn = attn * mask[..., None, None, None]

        # per-level sampling locations: center + off / (2*W_l, 2*H_l)
        # (the reference's [-1,1]-space offset/(W,H), :699-702, halves in
        # [0,1] space)
        vproj_levels = []
        loc_levels = []
        for lvl, v in enumerate(value_levels):
            Wl, Hl = v.shape[3], v.shape[2]
            norm = jnp.asarray([2.0 * Wl, 2.0 * Hl], jnp.float32)
            loc_levels.append(
                center01[:, :, :, None, None, :]
                + offsets[:, :, :, :, lvl] / norm
            )  # (B, Q, N, HH, P, 2)
            vproj_levels.append(
                v.reshape(B * N, v.shape[2], v.shape[3], HH, hd)
            )
        loc = jnp.stack(loc_levels, axis=4)  # (B, Q, N, HH, L, P, 2)

        loc_flat = (
            loc.transpose(0, 2, 1, 3, 4, 5, 6)
            .reshape(B * N, Q, HH, L, P, 2)
            .astype(self.dtype)
        )
        attn_flat = (
            attn.transpose(0, 2, 1, 3, 4, 5)
            .reshape(B * N, Q, HH, L, P)
            .astype(self.dtype)
        )
        sampled = multi_scale_deformable_attention(
            vproj_levels, loc_flat, attn_flat, impl=self.msda_impl
        ).reshape(B, N, Q, C)
        out = sampled.astype(jnp.float32).sum(axis=1)  # (B, Q, C)

        out = nn.Dense(
            C,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="output_proj",
        )(out.astype(self.dtype))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        pos_feat = PositionEncoderMLP(
            C, dtype=self.dtype, name="position_encoder"
        )(reference_points)
        return out + residual + pos_feat
