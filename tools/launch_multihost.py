"""Multi-host launcher (replaces tools/dist_train.sh / slurm_train.sh).

The reference spawns one torch.distributed process per GPU
(dist_train.sh:8-9) or srun tasks (slurm_train.sh:26-37). On TPU pods the
equivalent is ONE process per host with `jax.distributed.initialize()`;
inside, pjit over a global Mesh handles every collective over ICI/DCN —
there is no per-chip process or NCCL backend to configure.

Single-controller semantics: each host runs the same script; jax arrays
are globally sharded; the data loader shards the batch by
`jax.process_index()`.

  # on every host of the pod slice (TPU VMs discover peers automatically):
  python tools/launch_multihost.py train -- --config detr4d_..._12e --synthetic

  # explicit coordination (GPU clusters / CPU testing):
  python tools/launch_multihost.py train \
      --coordinator 10.0.0.1:1234 --num-processes 4 --process-id 0 -- \
      --config detr4d_..._12e
"""

import argparse
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("entry", choices=["train", "test", "distill_train"])
    p.add_argument("--coordinator", default=None, help="host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    # NOT argparse.REMAINDER: that would swallow --coordinator & friends
    # when they appear after the entry positional
    args, rest = p.parse_known_args()
    args.rest = rest

    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        # TPU pods: peers come from the metadata server / env
        jax.distributed.initialize()
    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{jax.local_device_count()} local of "
        f"{len(jax.devices())} global devices"
    )

    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    sys.argv = [f"tools/{args.entry}.py"] + rest
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), f"{args.entry}.py"),
        run_name="__main__",
    )


if __name__ == "__main__":
    main()
