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
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)

        # graph deformable cross attention (handles its own residual/pos MLP)
        query = Deform3DCrossAttn(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points,
            num_cams=self.num_cams,
            pc_range=self.pc_range,
            dropout=self.dropout,
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
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)

        query = FFN(
            self.ffn_dims, self.dropout, dtype=self.dtype, name="ffn"
        )(query, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query)
        return query


# NOTE: the full decoder loop (reference-point projection + per-layer
# refinement, Detr3DTransformer/Detr3DTransformerDecoder in the reference)
# is inlined in Detr3DHeadPE.__call__ — linen scoping makes passing the
# head's reg branches into a child transformer module fragile, and the
# unrolled loop compiles identically either way.
