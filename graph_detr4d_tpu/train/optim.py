"""Optimizer: AdamW + param groups + cosine schedule + grad clip.

Parity with the reference's optimizer config (configs/detr4d/...12e.py:
201-216): AdamW lr 2e-4, weight_decay 0.01, backbone lr x0.1, grad clip
max_norm 35 (L2), CosineAnnealing to min_lr_ratio 1e-3 with 500-iter linear
warmup from ratio 1/3. Frozen-stage parameters (frozen_stages=1: stem +
layer1, plus DCN-less BN handled separately as non-trainable collections)
get zero updates via an optax mask, mirroring requires_grad=False.
"""

from typing import Callable

import jax.numpy as jnp
import optax

from ..config import TrainConfig


def build_lr_schedule(cfg: TrainConfig) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * (
            step / cfg.warmup_iters
        )
        warm = jnp.minimum(warm_frac, 1.0)
        progress = jnp.clip(step / cfg.total_steps, 0.0, 1.0)
        cos = cfg.min_lr_ratio + 0.5 * (1.0 - cfg.min_lr_ratio) * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        return cfg.lr * warm * cos

    return schedule


def _path_has(path, *keys) -> bool:
    names = [getattr(p, "key", str(p)) for p in path]
    return any(any(k in n for n in names) for k in keys)


def param_label_fn(path, _value) -> str:
    """Label params: 'frozen' (stem/layer1), 'backbone' (lr x0.1), 'main'."""
    if _path_has(path, "backbone"):
        if _path_has(path, "stem", "layer1"):
            return "frozen"
        return "backbone"
    return "main"


def build_optimizer(cfg: TrainConfig):
    schedule = build_lr_schedule(cfg)

    def adamw(lr_mult):
        return optax.adamw(
            learning_rate=lambda s: schedule(s) * lr_mult,
            weight_decay=cfg.weight_decay,
        )

    import jax

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            param_label_fn, params
        )

    tx = optax.multi_transform(
        {
            "main": adamw(1.0),
            "backbone": adamw(cfg.backbone_lr_mult),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
