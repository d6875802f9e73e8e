"""FLOP counting via XLA cost analysis (reference:
tools/analysis_tools/get_flops.py, which uses mmcv's hook-based counter).

  python tools/get_flops.py [--img-h 640 --img-w 1600 --cams 6] [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-h", type=int, default=640)
    p.add_argument("--img-w", type=int, default=1600)
    p.add_argument("--cams", type=int, default=6)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from graph_detr4d_tpu.config import (
        ModelConfig,
        HeadConfig,
        tiny_test_config,
    )
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    cfg = (
        tiny_test_config()
        if args.tiny
        else ModelConfig(
            head=HeadConfig(num_cams=args.cams, with_detach=False),
            img_size=(args.img_h, args.img_w),
            bf16=False,
        )
    )
    model = GraphDETR4D(cfg)
    b = synthetic_batch(cfg, 1)
    imgs, l2i = jnp.asarray(b["images"]), jnp.asarray(b["lidar2img"])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs, l2i)

    lowered = jax.jit(
        lambda v, i, l: model.apply(v, i, l)
    ).lower(variables, imgs, l2i)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    nparams = sum(
        x.size for x in jax.tree.leaves(variables["params"])
    )
    print(f"input: {args.cams} cams x {args.img_h}x{args.img_w}")
    print(f"params: {nparams/1e6:.2f} M")
    print(f"flops:  {flops/1e9:.2f} GFLOPs")
    print(f"bytes:  {bytes_/1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
