"""Micro-benchmark: multi-scale deformable sampling variants on TPU.

Bench shapes (640x1600, 6 cams, 900 queries, 8 heads, 4 levels, 4 points)
to decide the fastest gather formulation before/alongside the Pallas
kernel. Run: python tools/msda_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_detr4d_tpu.ops.msda import multi_scale_deformable_attention


def timeit(f, *args, iters=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_inputs(dtype, BN=6, Q=900, Hh=8, hd=32, P=4):
    rng = np.random.RandomState(0)
    shapes = [(80, 200), (40, 100), (20, 50), (10, 25)]
    values = [
        jnp.asarray(rng.randn(BN, h, w, Hh, hd), dtype) for h, w in shapes
    ]
    loc = jnp.asarray(rng.rand(BN, Q, Hh, len(shapes), P, 2), dtype)
    attn = jnp.asarray(rng.rand(BN, Q, Hh, len(shapes), P), dtype)
    return values, loc, attn


def variant_fullrow_diag(values, locations, attention_weights):
    B, Q, Hh, L, P, _ = locations.shape
    hd = values[0].shape[-1]
    C = Hh * hd
    acc = jnp.zeros((B, Q, Hh, hd), dtype=jnp.float32)
    for lvl in range(L):
        v = values[lvl]
        Hl, Wl = v.shape[1], v.shape[2]
        vflat = v.reshape(B, Hl * Wl, C)
        loc = locations[:, :, :, lvl].reshape(B, Q * Hh * P, 2)
        attn = attention_weights[:, :, :, lvl].reshape(B, Q * Hh * P)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        samp = jnp.zeros((B, Q * Hh * P, C), dtype=jnp.float32)
        for dy, wy in ((0, 1.0 - ly), (1, ly)):
            for dx, wx in ((0, 1.0 - lx), (1, lx)):
                xi = x0 + dx
                yi = y0 + dy
                inb = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
                idx = (
                    jnp.clip(yi, 0, Hl - 1) * Wl + jnp.clip(xi, 0, Wl - 1)
                ).astype(jnp.int32)
                g = jnp.take_along_axis(vflat, idx[..., None], axis=1)
                w = (wy * wx * inb.astype(jnp.float32) * attn)[..., None]
                samp = samp + g.astype(jnp.float32) * w
        samp = samp.reshape(B, Q, Hh, P, Hh, hd)
        # pick each head's own slice of the gathered full row
        idxh = jnp.arange(Hh)
        diag = samp[:, :, idxh, :, idxh, :].transpose(1, 2, 0, 3, 4).sum(3)
        acc = acc + diag
    return acc.reshape(B, Q, Hh * hd)


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        values, loc, attn = make_inputs(dtype)
        for name, fn in (
            ("baseline", multi_scale_deformable_attention),
            ("fullrow ", variant_fullrow_diag),
        ):
            t = timeit(jax.jit(fn), values, loc, attn)
            print(
                f"{name} msda {dtype.__name__}: {t*1e3:.2f} ms"
                f"  (x6 layers = {6*t*1e3:.1f} ms)"
            )


if __name__ == "__main__":
    main()
