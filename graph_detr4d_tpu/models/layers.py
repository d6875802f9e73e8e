"""Shared building-block layers (flax.linen, channels-last)."""

from typing import Callable

import jax.numpy as jnp
import flax.linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with fixed statistics.

    The reference trains with every backbone BN in eval mode and
    requires_grad=False (`norm_cfg=dict(type='BN2d', requires_grad=False),
    norm_eval=True`, configs/...12e.py:37-38), i.e. BN degenerates to a
    per-channel affine from frozen (mean, var, gamma, beta). On TPU this is
    the ideal form: no cross-replica stat sync, folds into the adjacent conv.

    Parameters live under 'frozen' collections so the optimizer can skip
    them; a checkpoint converter writes pretrained stats into them.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.variable(
            "batch_stats", "gamma", lambda: jnp.ones((self.features,))
        ).value
        beta = self.variable(
            "batch_stats", "beta", lambda: jnp.zeros((self.features,))
        ).value
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        scale = gamma / jnp.sqrt(var + self.eps)
        bias = beta - mean * scale
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class SELayer(nn.Module):
    """Squeeze-excite gate used as `fpe` in the PE head
    (detr3d_head_pe.py:231-243): x * sigmoid(conv(relu(conv(x_se))))."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        se = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="reduce")(
            x_se
        )
        se = nn.relu(se)
        se = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="expand")(
            se
        )
        return x * nn.sigmoid(se)


class MLP(nn.Module):
    """Linear -> act stack with a final linear projection."""

    hidden: int
    out: int
    num_hidden_layers: int = 1
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_hidden_layers):
            x = nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(x)
            x = self.act(x)
        return nn.Dense(self.out, dtype=self.dtype, name="out")(x)


class TwoLayerMLP(nn.Module):
    """Dense -> relu -> Dense with stable child names Dense_0 / Dense_1
    (the converter relies on these; plain nn.Sequential would leak its
    children into the parent scope with fragile auto-names)."""

    hidden: int
    out: int
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="Dense_0")(x)
        x = self.act(x)
        return nn.Dense(self.out, dtype=self.dtype, name="Dense_1")(x)


class LNMLP(nn.Module):
    """(Dense -> LayerNorm -> relu) x2 — the cross-attention positional
    MLP layout (deform3d_cross_attn.py:104-111). Child names match the
    checkpoint converter: layers_0/1 and layers_3/4 (torch Sequential
    indices, relu at 2 and 5 holds no params)."""

    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out, dtype=self.dtype, name="layers_0")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layers_1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="layers_3")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layers_4")(x)
        return nn.relu(x)
