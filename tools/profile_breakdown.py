"""Ablation timing: which stage dominates the TPU forward pass.

Times backbone+neck alone, the full forward, and full forward + NMS-free
decode on the bench config, plus ablations (no DCN, cam_capacity off,
one-hot sampling off) to direct kernel optimization effort.

Timing uses the chained-device-scalar protocol (CLAUDE.md: on this
runtime block_until_ready can return early; every measurement chains
iterations through a scalar data dependency and ends with a host fetch).

Committed results: PROFILE.md at the repo root.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_detr4d_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

from graph_detr4d_tpu.config import ModelConfig, HeadConfig, BackboneConfig
from graph_detr4d_tpu.models import GraphDETR4D
from graph_detr4d_tpu.core.coder import decode_batch
from graph_detr4d_tpu.data.synthetic import synthetic_batch


def chained_time(fn, iters=15):
    """fn: scalar carry -> scalar carry, jitted. Returns ms/iter."""
    acc = fn(jnp.float32(0.0))
    float(acc)  # compile + sync
    for _ in range(3):
        acc = fn(acc)
    float(acc)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc)
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def build(H, W, N, use_dcn=True, cam_capacity=0.5, batch_size=1,
          cam_chunk=None, batch_chunk=None, msda_impl="shift4h"):
    cfg = ModelConfig(
        backbone=BackboneConfig(use_dcn=use_dcn, cam_chunk=cam_chunk),
        head=HeadConfig(
            num_cams=N, with_detach=False, cam_capacity=cam_capacity,
            batch_chunk=batch_chunk, msda_impl=msda_impl,
        ),
        img_size=(H, W),
        bf16=True,
    )
    # CLI-layer kernel-variant knobs (GRD4D_DCN_GATHER / GRD4D_MSDA_IMPL
    # / GRD4D_MSDA_LATEPROJ) must steer the profiled program exactly as
    # they steer bench.py — without this the env A/B silently profiles
    # the default variant (round-5 finding: an "int8 trace" reproduced
    # the default trace to 0.01 ms because the knob never applied)
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    cfg = apply_env_kernel_overrides(cfg)
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=batch_size)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs, l2i
    )
    return cfg, model, variables, imgs, l2i


def _filters():
    # Parsed lazily so importing this module never swallows another
    # process's argv (advisor finding, round 2).
    return [a for a in sys.argv[1:] if not a.startswith("-")]


def measure(tag, H=640, W=1600, N=6, **kw):
    # Optional substring filters: `profile_breakdown.py batch-4` runs only
    # the matching measurements (saves chip time for targeted A/Bs).
    filters = _filters()
    if filters and not any(f in tag for f in filters):
        return None
    cfg, model, variables, imgs, l2i = build(H, W, N, **kw)

    # variables/imgs MUST be jit arguments, not closure captures: captured
    # arrays embed as HLO constants (140+ MB of params), and the axon
    # tunnel's remote_compile endpoint rejects the oversized program
    # proto with HTTP 413.
    @jax.jit
    def feats_fn(v, i, carry):
        feats = model.apply(
            v,
            i + carry * 1e-12,
            train=False,
            rng=None,
            method=lambda m, im, train, rng: m.extract_feats(im, train, rng),
        )
        return sum(f.sum() for f in feats).astype(jnp.float32)

    @jax.jit
    def full_fn(v, i, l, carry):
        out = model.apply(v, i + carry * 1e-12, l)
        return out["all_cls_scores"].sum().astype(jnp.float32)

    @jax.jit
    def full_decode_fn(v, i, l, carry):
        out = model.apply(v, i + carry * 1e-12, l)
        det = decode_batch(
            out,
            max_num=cfg.coder.max_num,
            post_center_range=cfg.coder.post_center_range,
        )
        return det.bboxes.sum() + det.scores.sum()

    t_feats = chained_time(lambda c: feats_fn(variables, imgs, c))
    t_full = chained_time(lambda c: full_fn(variables, imgs, l2i, c))
    t_dec = chained_time(lambda c: full_decode_fn(variables, imgs, l2i, c))
    print(
        f"{tag:28s} feats {t_feats:6.1f} ms | full {t_full:6.1f} ms "
        f"(head ~{t_full - t_feats:5.1f}) | +decode {t_dec:6.1f} ms",
        flush=True,
    )
    return t_feats, t_full, t_dec


def main():
    print("devices:", jax.devices(), flush=True)
    measure("bench (dcn, cap .5)")
    measure("cam_capacity off", cam_capacity=1.0)
    measure("no dcn", use_dcn=False)

    # one-hot MXU sampling off (pure gather formulation)
    from graph_detr4d_tpu.ops import msda as _msda
    from graph_detr4d_tpu.ops import deform_conv as _dcn

    saved = (_msda.ONEHOT_MAX_PIXELS, _dcn.ONEHOT_MAX_PIXELS)
    try:
        _msda.ONEHOT_MAX_PIXELS = 0
        _dcn.ONEHOT_MAX_PIXELS = 0
        measure("one-hot sampling off")
    finally:
        _msda.ONEHOT_MAX_PIXELS, _dcn.ONEHOT_MAX_PIXELS = saved

    # 12-cam flagship shape
    measure("12-cam (dcn, cap .5)", N=12)

    # batch scaling: bench r2 found batch-4 per-frame fps WORSE than
    # batch-1 (7.41 vs 9.32); localize which stage scales superlinearly
    measure("batch-2 (dcn, cap .5)", batch_size=2)
    measure("batch-4 (dcn, cap .5)", batch_size=4)

    # batch-4 head superlinearity suspects (PROFILE.md: head 41.9 ->
    # 227.2 ms at B=4, 5.4x): isolate the compaction one-hot einsums
    # (B*N-scaled select/expand matmuls) vs the one-hot MSDA sampling of
    # levels 1-3 vs the gather fast path falling off at larger tables
    measure("batch-4 cap off", batch_size=4, cam_capacity=1.0)
    try:
        _msda.ONEHOT_MAX_PIXELS = 0
        measure("batch-4 msda one-hot off", batch_size=4)
    finally:
        _msda.ONEHOT_MAX_PIXELS = saved[0]
    # MSDA layout is a config field now (HeadConfig.msda_impl)
    measure("batch-4 msda 'pair'", batch_size=4, msda_impl="pair")

    # camera-chunked conv stack (BackboneConfig.cam_chunk): re-runs the
    # well-tuned 6-image program per chunk to undo the B*N>6 fusion
    # degradation
    measure("chunk6 12-cam", N=12, cam_chunk=6)
    measure("chunk6 batch-4", batch_size=4, cam_chunk=6)
    measure("chunk6 batch-2", batch_size=2, cam_chunk=6)

    # batch-chunked head (HeadConfig.batch_chunk): re-runs the B=1 head
    # program per sample to undo the residual B>1 head degradation
    # (XLA cost analysis is exactly linear; the slowdown is scheduling)
    measure("bchunk1 batch-4", batch_size=4, cam_chunk=6, batch_chunk=1)
    measure("bchunk1 batch-2", batch_size=2, cam_chunk=6, batch_chunk=1)


if __name__ == "__main__":
    main()
