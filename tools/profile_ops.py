"""Op-level trace diff: aggregate device op durations from a jax.profiler
trace of the full forward at two batch sizes to localize superlinear ops.

Parses the xplane proto with tensorflow's profiler protobuf (baked in via
the jax profiler plugin) — no TensorBoard needed. Usage:

    python tools/profile_ops.py            # B=1 vs B=4, bench config
    python tools/profile_ops.py --b 1 2    # custom batch list
"""

import argparse
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_detr4d_tpu.utils.platform import (
    apply_platform_override,
    enable_compile_cache,
)

# CPU escape for shape-checking the trace/parse path while the tunnel is
# down (the axon sitecustomize force-selects TPU programmatically)
apply_platform_override()
enable_compile_cache()

import jax.numpy as jnp


def trace_forward(batch_size: int, out_dir: str, H=640, W=1600, N=6):
    from tools.profile_breakdown import build

    # cam_chunk=6 matches the serving default (bench.py) so the trace
    # diff attributes what remains AFTER the conv-stack chunk fix
    cfg, model, variables, imgs, l2i = build(
        H, W, N, batch_size=batch_size, cam_chunk=6
    )

    @jax.jit
    def full_fn(v, i, l, carry):
        out = model.apply(v, i + carry * 1e-12, l)
        return out["all_cls_scores"].sum().astype(jnp.float32)

    acc = full_fn(variables, imgs, l2i, jnp.float32(0.0))
    float(acc)  # compile + sync
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        acc = full_fn(variables, imgs, l2i, acc)
    float(acc)
    jax.profiler.stop_trace()


def parse_xplane(out_dir: str):
    """Aggregate per-op-name total duration (us) from the device plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {out_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    agg = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # EXACTLY the synchronous op line: 'Async XLA Ops' (DMA /
            # prefetch engines) overlaps compute and is measured by
            # wall duration — folding it in multiple-counts the step
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e6
    return agg  # name -> us total over the traced steps


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
        "concatenate",
        "broadcast",
        "iota",
        "all-reduce",
    ):
        if key in name:
            return key
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", nargs="*", type=int, default=[1, 4])
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    aggs = {}
    for b in args.b:
        out = f"/tmp/optrace_b{b}"
        # a stale trace from a previous (possibly different-variant) run
        # in the same dir would be silently re-parsed — clear it
        if os.path.isdir(out):
            import shutil

            shutil.rmtree(out)
        os.makedirs(out, exist_ok=True)
        trace_forward(b, out)
        aggs[b] = parse_xplane(out)
        total = sum(aggs[b].values())
        print(f"\n== B={b}: device op total {total/1e3:.1f} ms over 3 steps")
        buckets = {}
        for n, us in aggs[b].items():
            buckets[bucket(n)] = buckets.get(bucket(n), 0.0) + us
        for k, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"  {k:14s} {us/3e3:7.2f} ms/step")
        # per-op top list (also for single-b runs — variant A/Bs diff
        # these against each other)
        print(f"  -- top {args.top} ops --")
        for n, us in sorted(aggs[b].items(), key=lambda kv: -kv[1])[
            : args.top
        ]:
            print(f"  {us/3e3:7.3f} ms/step  {n[:140]}")

    if len(args.b) == 2:
        b0, b1 = args.b
        # fusion numbering differs between programs, so key on a
        # batch-normalized SHAPE SIGNATURE: op kind + output type/shape
        # with any leading dim equal to k*B (k in 1..24) rewritten to
        # 'B*k'. Ops of the same signature then pair across batch sizes.
        import re

        def signature(name: str, b: int):
            m = re.match(r"%([a-zA-Z_\-]+)[\.\d]* = ([a-z0-9]+)\[([\d,]*)\]", name)
            if not m:
                return name.split(" ")[0].rstrip("0123456789.")
            kind, dt, dims = m.groups()
            out = []
            for i, d in enumerate(x for x in dims.split(",") if x):
                d = int(d)
                if i == 0 and d % b == 0 and d // b <= 32:
                    out.append(f"B*{d // b}")
                else:
                    out.append(str(d))
            return f"{kind} {dt}[{','.join(out)}]"

        def by_sig(agg, b):
            out = {}
            for n, us in agg.items():
                s = signature(n, b)
                out[s] = out.get(s, 0.0) + us
            return out

        s0, s1 = by_sig(aggs[b0], b0), by_sig(aggs[b1], b1)
        ratio = b1 / b0
        print(
            f"\n== top signatures by (B={b1} - {ratio:.0f}*B={b0}) excess ms/step"
        )
        rows = []
        for n, us1 in s1.items():
            us0 = s0.get(n, 0.0)
            rows.append(
                (us1 / 3e3 - ratio * us0 / 3e3, us1 / 3e3, us0 / 3e3, n)
            )
        for ex, t1, t0, n in sorted(rows, reverse=True)[: args.top]:
            print(
                f"  +{ex:7.2f} ms  (B{b1} {t1:7.2f} vs B{b0} {t0:6.2f})  {n[:100]}"
            )


if __name__ == "__main__":
    main()
