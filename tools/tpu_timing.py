"""One-shot TPU timing sweep with trustworthy chained-fetch protocol.

On this runtime block_until_ready can return before execution completes, so
every measurement chains iterations through a scalar data dependency and
ends with a host value fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_detr4d_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from graph_detr4d_tpu.config import ModelConfig, HeadConfig
from graph_detr4d_tpu.models import GraphDETR4D
from graph_detr4d_tpu.data.synthetic import synthetic_batch


def chained_time(fn, iters=10):
    """fn: carry -> carry (device scalar). Returns ms/iter."""
    acc = fn(jnp.float32(0.0))
    _ = float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc)
    _ = float(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)

    # 1. matmul sanity
    n = 4096
    a = jnp.asarray(rng.randn(n, n) * 0.05, jnp.bfloat16)
    mm = jax.jit(lambda a, c: ((a + c * 1e-12) @ a).sum())
    ms = chained_time(lambda c: mm(a, c), 30)
    print(f"matmul4k: {ms:.3f} ms  {2*n**3/(ms/1e3)/1e12:.1f} TFLOPs", flush=True)

    # 2. full flagship forward (6 cam, 640x1600)
    cfg = ModelConfig(
        head=HeadConfig(num_cams=6, with_detach=False),
        img_size=(640, 1600),
        bf16=True,
    )
    model = GraphDETR4D(cfg)
    b = synthetic_batch(cfg, 1)
    imgs, l2i = jnp.asarray(b["images"]), jnp.asarray(b["lidar2img"])
    v = model.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)

    fwd = jax.jit(
        lambda c: model.apply(v, imgs + c * 1e-12, l2i)[
            "all_cls_scores"
        ].sum()
    )
    ms = chained_time(fwd, 10)
    print(f"full fwd 6cam: {ms:.1f} ms  {1000/ms:.2f} fps", flush=True)

    # 3. backbone+neck only
    feats_fn = jax.jit(
        lambda c: sum(
            f.astype(jnp.float32).sum()
            for f in model.apply(
                v,
                imgs + c * 1e-12,
                False,
                None,
                method=GraphDETR4D.extract_feats,
            )
        )
    )
    ms = chained_time(feats_fn, 10)
    print(f"backbone+fpn: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
