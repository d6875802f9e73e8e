"""DETR3D decoder stack with iterative box refinement.

Parity targets:
  * DetrTransformerDecoderLayer with operation order
    (self_attn, norm, cross_attn, norm, ffn, norm) — post-norm, as set at
    configs/detr4d/...12e.py:83-84.
  * Detr3DTransformer / Detr3DTransformerDecoder
    (models/utils/detr3d_transformer.py:46-225): query embedding split into
    (query_pos, query), reference points = sigmoid(Linear(query_pos)),
    per-layer refinement in inverse-sigmoid space with stop_gradient
    (:201-214), intermediate outputs returned from every layer.

The 6-layer loop is a static Python loop (separate params per layer because
with_box_refine=True clones branches); XLA unrolls and pipelines it.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import Deform3DCrossAttn
from ..utils.math import inverse_sigmoid


class FFN(nn.Module):
    hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        residual = x
        y = nn.Dense(self.hidden, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(x.shape[-1], dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return residual + y


class DecoderLayer(nn.Module):
    embed_dims: int
    num_heads: int
    num_levels: int
    num_points: int
    num_cams: int
    ffn_dims: int
    pc_range: Tuple[float, ...]
    dropout: float = 0.1
    # 'deform3d' | 'deform3d_mp' | 'detr3d' (HeadConfig.attn_type)
    attn_type: str = "deform3d"
    num_neighbors: int = 8
    cam_capacity: float = 1.0
    fix_offset: bool = False  # deform3d_cross_attn.py:64 (freeze offsets)
    depth_encode: bool = False  # deform3d_cross_attn.py:65 (rho PE input)
    msda_impl: str = "shift4h"  # HeadConfig.msda_impl
    msda_late_proj: bool = False  # HeadConfig.msda_late_proj
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        query_pos,
        value_levels,
        reference_points,
        lidar2img,
        img_shape,
        deterministic=True,
        self_attn_mask=None,  # (Q, Q) True = attend (H-DETR group mask)
    ):
        # self attention (q = k = query + pos, v = query) + residual
        q = query + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="self_attn",
        )(q, q, query, mask=self_attn_mask, deterministic=deterministic)
        query = query + nn.Dropout(self.dropout)(
            attn, deterministic=deterministic
        )
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(query)

        # graph cross attention (handles its own residual/pos MLP)
        if self.attn_type == "deform3d":
            query = Deform3DCrossAttn(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.num_points,
                num_cams=self.num_cams,
                pc_range=self.pc_range,
                dropout=self.dropout,
                cam_capacity=self.cam_capacity,
                fix_offset=self.fix_offset,
                depth_encode=self.depth_encode,
                msda_impl=self.msda_impl,
                msda_late_proj=self.msda_late_proj,
                dtype=self.dtype,
                name="cross_attn",
            )(
                query,
                value_levels,
                query_pos,
                reference_points,
                lidar2img,
                img_shape,
                deterministic=deterministic,
            )
        elif self.attn_type == "deform3d_mp":
            from .attention_variants import Deform3DCrossAttnMP

            # graph construction: each query's K nearest *other* queries'
            # reference points become its precomputed neighbor nodes.
            # (The reference's MP decoder class is absent from its checkout
            # — Detr3DTransformerDecoderMP is referenced by
            # configs/detr4d/detr4d_res50_mp.py:60 but never defined — so
            # the neighbor source is reconstructed from the Graph-DETR3D
            # paper's query-graph definition.)
            ref = reference_points  # (B, Q, 3)
            d2 = jnp.sum(
                (ref[:, :, None, :] - ref[:, None, :, :]) ** 2, -1
            )
            Q = ref.shape[1]
            d2 = d2 + jnp.eye(Q, dtype=d2.dtype) * 1e9  # exclude self
            _, nbr_idx = jax.lax.top_k(-d2, self.num_neighbors)  # nearest
            nbrs = jnp.take_along_axis(
                ref[:, None, :, :],
                nbr_idx[..., None].repeat(3, axis=-1)[:, :, :, :],
                axis=2,
            )  # (B, Q, K, 3)
            nbrs = nbrs.transpose(0, 2, 1, 3).reshape(
                ref.shape[0], -1, 3
            )  # (B, K*Q, 3) — neighbor-major, matching ref[:, Q:] layout
            ref_all = jnp.concatenate([ref, nbrs], axis=1)
            query = Deform3DCrossAttnMP(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.num_points,
                num_cams=self.num_cams,
                num_neighbors=self.num_neighbors,
                pc_range=self.pc_range,
                dropout=self.dropout,
                msda_impl=self.msda_impl,
                dtype=self.dtype,
                name="cross_attn",
            )(
                query,
                value_levels,
                query_pos,
                ref_all,
                lidar2img,
                img_shape,
                deterministic=deterministic,
            )
        elif self.attn_type in ("detr3d", "detr3d_v2"):
            from .attention_variants import (
                Detr3DCrossAtten,
                Detr3DCrossAttenV2,
            )

            if self.attn_type == "detr3d":
                attn_mod = Detr3DCrossAtten(
                    embed_dims=self.embed_dims,
                    num_levels=self.num_levels,
                    num_points=1,
                    num_cams=self.num_cams,
                    pc_range=self.pc_range,
                    dropout=self.dropout,
                    msda_impl=self.msda_impl,
                    dtype=self.dtype,
                    name="cross_attn",
                )
            else:
                attn_mod = Detr3DCrossAttenV2(
                    embed_dims=self.embed_dims,
                    num_heads=self.num_heads,
                    num_levels=self.num_levels,
                    num_points=self.num_points,
                    num_cams=self.num_cams,
                    pc_range=self.pc_range,
                    dropout=self.dropout,
                    msda_impl=self.msda_impl,
                    dtype=self.dtype,
                    name="cross_attn",
                )
            query = attn_mod(
                query,
                value_levels,
                query_pos,
                reference_points,
                lidar2img,
                img_shape,
                deterministic=deterministic,
            )
        else:
            raise ValueError(f"unknown attn_type {self.attn_type!r}")
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(query)

        query = FFN(
            self.ffn_dims, self.dropout, dtype=self.dtype, name="ffn"
        )(query, deterministic=deterministic)
        query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(query)
        return query


# NOTE: the full decoder loop (reference-point projection + per-layer
# refinement, Detr3DTransformer/Detr3DTransformerDecoder in the reference)
# is inlined in Detr3DHeadPE.__call__ — linen scoping makes passing the
# head's reg branches into a child transformer module fragile, and the
# unrolled loop compiles identically either way.
