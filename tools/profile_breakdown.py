"""Ablation timing: which stage dominates the TPU forward pass.

Times backbone-only, backbone+neck, PE-only, full head on the bench config
to direct kernel optimization effort.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from graph_detr4d_tpu.config import ModelConfig, HeadConfig, BackboneConfig
from graph_detr4d_tpu.models import GraphDETR4D
from graph_detr4d_tpu.data.synthetic import synthetic_batch


def timeit(f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(H=640, W=1600, N=6, use_dcn=True):
    cfg = ModelConfig(
        backbone=BackboneConfig(use_dcn=use_dcn),
        head=HeadConfig(num_cams=N, with_detach=False),
        img_size=(H, W),
        bf16=True,
    )
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=1)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs, l2i)

    feats_fn = jax.jit(
        lambda i: model.apply(
            variables, i, train=False, rng=None, method=lambda m, i, train, rng: m.extract_feats(i, train, rng)
        )
    )
    full_fn = jax.jit(lambda i, l: model.apply(variables, i, l))

    t_feats = timeit(feats_fn, imgs)
    t_full = timeit(full_fn, imgs, l2i)
    print(f"dcn={use_dcn} feats: {t_feats*1e3:.1f} ms")
    print(f"dcn={use_dcn} full:  {t_full*1e3:.1f} ms  head≈{(t_full-t_feats)*1e3:.1f} ms")


if __name__ == "__main__":
    main(use_dcn=True)
    main(use_dcn=False)
