"""Op-level trace of the flagship TRAIN step: forward / backward /
optimizer attribution from the XLA op scope metadata.

VERDICT r3 item 7: the 926 ms flagship train step (12 cams, 640x1600,
remat, cam_capacity 0.5) has loop-level attribution but no op-level
fwd/bwd/optimizer split. This traces 2 steady-state steps with
jax.profiler, parses the xplane proto's synchronous 'XLA Ops' line (the
same protocol as tools/profile_ops.py — Async XLA Ops overlap compute
and would multiple-count), and classifies each op by its JAX scope
string ('tf_op' stat): 'transpose(' marks backward ops (jax transposes
the jvp for reverse-mode), optimizer update scopes come from optax, the
rest is forward. Remat recompute executes inside the backward under
'rematted_computation'/'checkpoint' scopes and is reported separately.

Usage:
    python tools/profile_train_ops.py                 # flagship, 2 steps
    python tools/profile_train_ops.py --dump-stats    # show stat keys
    GRD4D_PLATFORM=cpu python tools/profile_train_ops.py --tiny  # parse
                                                      # path shape-check
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_detr4d_tpu.utils.platform import (
    apply_platform_override,
    enable_compile_cache,
)

apply_platform_override()
enable_compile_cache()

import jax.numpy as jnp


def bucket(name: str) -> str:
    for key in (
        "fusion",
        "gather",
        "scatter",
        "convolution",
        "dot",
        "copy",
        "reshape",
        "transpose",
        "reduce",
        "dynamic-slice",
        "dynamic-update-slice",
        "concatenate",
        "broadcast",
        "iota",
        "all-reduce",
        "select",
    ):
        if key in name:
            return key
    return "other"


def phase(tf_op: str) -> str:
    """Classify an op's pipeline phase from its JAX scope string."""
    s = tf_op or ""
    low = s.lower()
    if "rematted" in low or "checkpoint" in low or "remat" in low:
        # remat recompute runs during the backward; report it on its own
        # so the recompute share of the bwd is visible
        if "transpose" in low:
            return "bwd:remat-transpose"
        return "bwd:remat-recompute"
    if "transpose(" in low:
        return "bwd"
    for k in (
        "adam",
        "scale_by",
        "apply_updates",
        "add_decayed",
        "clip_by_global_norm",
        "global_norm",
        "inject_hyperparam",
        "tx.update",
    ):
        if k in low:
            return "optimizer"
    return "fwd"


def trace_train(out_dir: str, config: str, cfg_options, steps: int, tiny: bool):
    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides, get_config
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.parallel.step import build_train_step, init_state

    if tiny:
        cfg = tiny_test_config()
    else:
        cfg = apply_env_kernel_overrides(get_config(config, cfg_options))
    model = GraphDETR4D(cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, batch_size=1, seed=0).items()
    }
    train_step = build_train_step(model, cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    # compile + warm: 2 steps, force via host fetch (block_until_ready is
    # unreliable under the axon tunnel — CLAUDE.md)
    for _ in range(2):
        state, metrics = train_step(state, batch, rng)
    print(f"warm loss {float(metrics['loss']):.3f}", flush=True)

    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, metrics = train_step(state, batch, rng)
    float(metrics["loss"])
    jax.profiler.stop_trace()
    return float(metrics["loss"])


def parse_xplane(out_dir: str, dump_stats: bool = False):
    """Yield (hlo_name, tf_op, duration_us) from the device 'XLA Ops' line."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {out_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    rows = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                tf_op = ""
                for st in list(ev.stats) + list(md.stats):
                    nm = stat_names.get(st.metadata_id, "")
                    if nm in ("tf_op", "tf_op_name", "op_name"):
                        val = st.str_value or stat_names.get(
                            st.ref_value, ""
                        )
                        if val:
                            tf_op = val
                if dump_stats and len(rows) < 3:
                    print("  event stats:", {
                        stat_names.get(st.metadata_id, st.metadata_id): (
                            st.str_value
                            or stat_names.get(st.ref_value, st.ref_value)
                        )
                        for st in list(ev.stats) + list(md.stats)
                    }, flush=True)
                rows.append((md.name, tf_op, ev.duration_ps / 1e6))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default="detr4d_res50_deform_pe_testaug_2subset_12e"
    )
    ap.add_argument(
        "--cfg-options",
        nargs="*",
        default=["backbone.remat=true", "head.cam_capacity=0.5"],
    )
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dump-stats", action="store_true")
    ap.add_argument("--out", default="/tmp/train_optrace")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    os.makedirs(args.out, exist_ok=True)
    trace_train(args.out, args.config, args.cfg_options, args.steps, args.tiny)
    rows = parse_xplane(args.out, dump_stats=args.dump_stats)
    n = args.steps

    total = sum(us for _, _, us in rows)
    print(
        f"\n== device op total {total / n / 1e3:.1f} ms/step "
        f"over {n} steps ({len(rows)} events)",
        flush=True,
    )

    # phase x bucket table
    agg = {}
    for name, tf_op, us in rows:
        key = (phase(tf_op), bucket(name))
        agg[key] = agg.get(key, 0.0) + us
    phases = {}
    for (ph, _), us in agg.items():
        phases[ph] = phases.get(ph, 0.0) + us
    print("\n== per phase (ms/step)")
    for ph, us in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {ph:22s} {us / n / 1e3:8.2f}")
    print("\n== phase x op-kind (ms/step, top rows)")
    for (ph, bk), us in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ph:22s} {bk:14s} {us / n / 1e3:8.2f}")

    # top individual scopes: aggregate by the trailing scope component so
    # repeated fusions of one module sum together
    scopes = {}
    for name, tf_op, us in rows:
        key = (tf_op.split("/")[-1][:80] if tf_op else name.split(" ")[0][:60])
        scopes[key] = scopes.get(key, 0.0) + us
    print(f"\n== top {args.top} scopes (ms/step)")
    for key, us in sorted(scopes.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {us / n / 1e3:8.2f}  {key}")

    print(
        json.dumps(
            {
                "what": "train_step_optrace",
                "config": args.config,
                "total_ms_per_step": round(total / n / 1e3, 1),
                "phase_ms": {
                    ph: round(us / n / 1e3, 1) for ph, us in phases.items()
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
