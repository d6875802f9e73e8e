"""Attribute train-iter wall-clock: host batch gen vs host->device
transfer vs device step vs full-loop steady state.

smoke500 logged 5.2-8.8 s/iter against a ~289 ms device step (CLAUDE.md);
this tool isolates where the other ~95% goes on the real chip at the same
12-cam 320x800 shape. Timing uses host fetches (block_until_ready returns
early on this runtime).

    python tools/time_train_phases.py [--h 320 --w 800 --n 12 --iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_detr4d_tpu.utils.platform import (
    apply_platform_override,
    enable_compile_cache,
)

# CPU escape for smoke tests (the axon sitecustomize force-selects TPU
# programmatically; the env var alone is not enough — CLAUDE.md)
apply_platform_override()
enable_compile_cache()

import jax.numpy as jnp
import ml_dtypes
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=320)
    ap.add_argument("--w", type=int, default=800)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--dn",
        action="store_true",
        help="device_normalize: ship RAW uint8 pixels, normalize on "
        "device (1/4 the h2d bytes of f32)",
    )
    args = ap.parse_args()

    from graph_detr4d_tpu.config import ModelConfig, BackboneConfig, HeadConfig
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.parallel import make_mesh, shard_batch, replicate
    from graph_detr4d_tpu.parallel import build_train_step
    from graph_detr4d_tpu.parallel.step import init_state

    cfg = ModelConfig(
        backbone=BackboneConfig(remat=True),
        head=HeadConfig(num_cams=args.n, with_detach=False,
                        cam_capacity=0.5),
        img_size=(args.h, args.w),
        bf16=True,
        device_normalize=args.dn,
    )
    model = GraphDETR4D(cfg)
    mesh = make_mesh()
    state = replicate(init_state(model, cfg, jax.random.PRNGKey(0)), mesh)
    step = build_train_step(model, cfg, mesh)
    rng = jax.device_put(
        jax.random.PRNGKey(1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )

    print(f"shape: {args.n}-cam {args.h}x{args.w}", flush=True)

    # --- phase a: host synthetic gen
    t0 = time.perf_counter()
    batches = [synthetic_batch(cfg, 1, seed=s) for s in range(args.iters)]
    t_gen = (time.perf_counter() - t0) / args.iters
    mb = batches[0]["images"].nbytes / 1e6
    img_dtype = batches[0]["images"].dtype
    print(
        f"host gen: {t_gen*1e3:8.0f} ms/iter "
        f"({mb:.1f} MB {img_dtype} images)",
        flush=True,
    )

    # tiny consumer to force transfer completion without a fresh compile
    @jax.jit
    def consume(im):
        return im.astype(jnp.float32).ravel()[0]

    # --- phase b: host->device transfer, f32 vs bf16 images (uint8 is
    # what --dn ships natively — its row is the `native` one below)
    casts = (
        [("u8", None)]
        if args.dn
        else [("f32", None), ("bf16", ml_dtypes.bfloat16)]
    )
    for tag, cast in casts:
        b0 = dict(batches[0])
        if cast is not None:
            b0["images"] = b0["images"].astype(cast)
        d = shard_batch(b0, mesh)
        float(consume(d["images"]))  # compile + settle
        t0 = time.perf_counter()
        for i in range(args.iters):
            bi = dict(batches[i % len(batches)])
            if cast is not None:
                bi["images"] = bi["images"].astype(cast)
            d = shard_batch(bi, mesh)
            float(consume(d["images"]))
        t_put = (time.perf_counter() - t0) / args.iters
        eff = (mb if cast is None else mb / 2) / t_put
        print(f"h2d {tag}: {t_put*1e3:8.0f} ms/iter ({eff:.1f} MB/s)",
              flush=True)

    # --- phase c: device step alone (batch resident on device)
    # NOTE: the train step DONATES its state argument, so a state handle
    # is dead after its first use — phases thread one live `s` through
    dbatch = shard_batch(batches[0], mesh)
    s, m = step(state, dbatch, rng)
    float(m["loss"])  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s, m = step(s, dbatch, rng)
    float(m["loss"])
    t_step = (time.perf_counter() - t0) / args.iters
    print(f"device step: {t_step*1e3:6.0f} ms/iter", flush=True)

    # --- phase d: full SERIAL loop (transfer then step, no overlap)
    for tag, cast in casts:
        # warm this input dtype's step compile OUT of the timed region
        # (a bf16-image step is a fresh program; without this the first
        # serial row absorbs a multi-minute XLA compile)
        bw = dict(batches[0])
        if cast is not None:
            bw["images"] = bw["images"].astype(cast)
        s, m = step(s, shard_batch(bw, mesh), rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            bi = dict(batches[i % len(batches)])
            if cast is not None:
                bi["images"] = bi["images"].astype(cast)
            d = shard_batch(bi, mesh)
            s, m = step(s, d, rng)
        float(m["loss"])
        t_loop = (time.perf_counter() - t0) / args.iters
        print(
            f"serial loop {tag}: {t_loop*1e3:6.0f} ms/iter "
            f"({t_loop/t_step:.2f}x device step)",
            flush=True,
        )

    # --- phase e: OVERLAPPED loop — the Trainer's transfer-ahead
    # prefetch (PrefetchIterator ships cast+shard on a worker thread);
    # steady state should be max(h2d, step), not their sum
    from graph_detr4d_tpu.train.trainer import PrefetchIterator

    for tag, cast in casts:

        def dev_batches():
            for i in range(args.iters):
                bi = dict(batches[i % len(batches)])
                if cast is not None:
                    bi["images"] = bi["images"].astype(cast)
                yield shard_batch(bi, mesh)

        it = PrefetchIterator(dev_batches(), depth=2)
        t0 = time.perf_counter()
        for d in it:
            s, m = step(s, d, rng)
        float(m["loss"])
        t_loop = (time.perf_counter() - t0) / args.iters
        print(
            f"overlap loop {tag}: {t_loop*1e3:6.0f} ms/iter "
            f"({t_loop/t_step:.2f}x device step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
