"""Benchmark: 6-camera inference frames/sec on TPU.

Mirrors the reference's measurement protocol
(tools/analysis_tools/benchmark.py:60-91): warmup iterations, synchronized
timed loop, "Overall fps". Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the PyTorch-CPU 6-cam fps measured by
tools/torch_cpu_baseline.py (cached in BASELINE_CPU.json; driver target is
>=5x, BASELINE.md).
"""

import json
import os
import time


def load_cpu_baseline():
    path = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["value"]
    return None


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import numpy as np
    from graph_detr4d_tpu.config import ModelConfig, HeadConfig
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    H, W = 640, 1600  # reference test resolution (ida final_dim)
    N = 6  # metric is 6-camera frames/sec
    # cam_capacity=0.5: each camera samples only its in-view queries —
    # verified bit-exact vs capacity 1.0 on this rig (overflow counter 0;
    # overflow would be sown as intermediates 'cam_overflow')
    cfg = ModelConfig(
        head=HeadConfig(num_cams=N, with_detach=False, cam_capacity=0.5),
        img_size=(H, W),
        bf16=True,
    )
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=1)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    # jitted init: one compiled program instead of thousands of eager op
    # dispatches over the device tunnel
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs, l2i
    )

    # NOTE: timing protocol chains iterations through a device scalar and
    # ends with a host value fetch. On this runtime block_until_ready can
    # return before execution finishes, so the reference's synchronize-
    # then-time protocol (benchmark.py:69-74) is realized via a data
    # dependency instead — each iteration consumes the previous scalar, and
    # the final float() forces the whole chain.
    # params and data are jit ARGUMENTS (not closure constants) so the
    # persistent compilation cache hits across runs
    @jax.jit
    def forward_chained(variables, images, lidar2img, carry):
        out = model.apply(variables, images + carry * 1e-12, lidar2img)
        return out["all_cls_scores"].sum()

    carry = forward_chained(variables, imgs, l2i, jnp.float32(0.0))
    float(carry)  # compile + sync
    for _ in range(5):
        carry = forward_chained(variables, imgs, l2i, carry)
    float(carry)  # warmup sync

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = forward_chained(variables, imgs, l2i, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    baseline = load_cpu_baseline()
    vs = fps / baseline if baseline else None
    print(
        json.dumps(
            {
                "metric": "6cam_inference_fps_640x1600",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
