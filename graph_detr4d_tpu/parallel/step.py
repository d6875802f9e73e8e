"""Jitted train/eval steps, data-parallel over a device mesh.

The train step corresponds to one iteration of the reference's
EpochBasedRunner loop (SURVEY §3.1): forward -> set loss -> backward ->
clipped AdamW update. Here it is a single pjit'd function: batch sharded on
the mesh 'data' axis, params replicated, GSPMD inserting the gradient
all-reduce over ICI (replacing DDP/NCCL, apis/mmdet_distill_train.py:74-82).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..config import ModelConfig
from ..core.losses import detr3d_loss, hybrid_detr3d_loss
from ..core.coder import decode_batch
from ..train.optim import build_optimizer
from .mesh import batch_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_state(model, cfg: ModelConfig, rng) -> TrainState:
    B, N = 1, cfg.head.num_cams
    H, W = cfg.img_size
    imgs = jnp.zeros((B, N, H, W, 3), jnp.float32)
    l2i = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, N, 4, 4))
    # jitted init: one compiled program instead of eager per-op dispatch
    variables = jax.jit(model.init)({"params": rng}, imgs, l2i)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(cfg.train)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def build_train_step(model, cfg: ModelConfig, mesh: Optional[Mesh] = None):
    tx = build_optimizer(cfg.train)

    def train_step(state: TrainState, batch, rng):
        rng_gm, rng_do = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                batch["lidar2img"],
                train=True,
                rng=rng_gm,
                depth_factors=batch.get("depth_factors"),
                mean_time_stamp=batch.get("mean_time_stamp"),
                intrinsics=batch.get("intrinsics"),
                ida_scale=batch.get("ida_scale"),
                rngs={"dropout": rng_do},
            )
            # hybrid H-DETR heads emit a one2many query group that gets
            # its own k-repeated-GT set loss (h_detr3d_head_pe.py:616-668)
            loss_impl = (
                hybrid_detr3d_loss
                if cfg.head.num_query_one2many > 0
                else detr3d_loss
            )
            total, metrics = loss_impl(
                out,
                batch["gt_bboxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                cfg.loss,
                cfg.head,
            )
            # PETR-seg: per-layer positive-balanced BCE on lane-patch
            # logits against the patchified GT map
            # (petr_head_seg.py loss_single + Sigmoid_ce_loss)
            if "all_lane_preds" in out and "maps" in batch:
                from ..models.petr_seg import lane_mask_loss

                lane = 0.0
                for lid in range(out["all_lane_preds"].shape[0]):
                    lane = lane + jax.vmap(lane_mask_loss)(
                        out["all_lane_preds"][lid], batch["maps"]
                    ).mean()
                metrics["loss_mask"] = lane
                total = total + lane
                metrics["loss"] = total
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            metrics,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    # on a (data, cam) mesh the batch arrives per-key sharded via
    # shard_batch (camera axis split over 'cam'); leave its in_sharding
    # to the committed placement and let the model's constrain() points
    # drive GSPMD
    data = None if "cam" in mesh.axis_names else batch_sharding(mesh)
    jitted = jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    return _with_mesh(jitted, mesh)


def _with_mesh(fn, mesh: Mesh):
    """Run a jitted step under jax.set_mesh so in-model constrain()
    annotations resolve against the ambient mesh."""

    def wrapped(*args, **kwargs):
        with jax.set_mesh(mesh):
            return fn(*args, **kwargs)

    def lower(*a, **k):
        with jax.set_mesh(mesh):
            return fn.lower(*a, **k)

    wrapped.lower = lower
    return wrapped


def build_tta_eval_step(model, cfg: ModelConfig):
    """Test-time-augmentation eval step (detr3d.py aug_test :192-216 via
    GraphDETR4D.aug_forward): per-level features are averaged across A
    augmented image copies, the head runs once on the FIRST copy's
    calibration, then the NMS-free decode. `images` is (A, B, N, H, W, 3)."""

    def tta_step(params, batch_stats, images, lidar2img, extras):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            list(images),
            lidar2img,
            method=model.aug_forward,
            mean_time_stamp=extras.get("mean_time_stamp"),
            intrinsics=extras.get("intrinsics"),
            ida_scale=extras.get("ida_scale"),
            depth_factors=extras.get("depth_factors"),
        )
        return decode_batch(
            out,
            max_num=cfg.coder.max_num,
            post_center_range=cfg.coder.post_center_range,
            score_threshold=cfg.coder.score_threshold,
        )

    return jax.jit(tta_step)


def build_eval_step(model, cfg: ModelConfig, mesh: Optional[Mesh] = None):
    def eval_step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            batch["lidar2img"],
            train=False,
            depth_factors=batch.get("depth_factors"),
            mean_time_stamp=batch.get("mean_time_stamp"),
            intrinsics=batch.get("intrinsics"),
            ida_scale=batch.get("ida_scale"),
        )
        return decode_batch(
            out,
            max_num=cfg.coder.max_num,
            post_center_range=cfg.coder.post_center_range,
            score_threshold=cfg.coder.score_threshold,
        )

    if mesh is None:
        return jax.jit(eval_step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    if "cam" in mesh.axis_names:
        jitted = jax.jit(
            eval_step,
            in_shardings=(repl, repl, None),
            out_shardings=data,
        )
        return _with_mesh(jitted, mesh)
    return jax.jit(
        eval_step,
        in_shardings=(repl, repl, data),
        out_shardings=data,
    )
