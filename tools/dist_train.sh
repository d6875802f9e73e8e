#!/usr/bin/env bash
# Multi-host training launcher (parity: reference tools/dist_train.sh,
# which spawns torch.distributed.launch with one process per GPU).
#
# On TPU there is ONE process per host; jax.distributed.initialize()
# discovers peers from the TPU metadata server, and pjit over the global
# mesh replaces NCCL. Run this same command on every host of the slice:
#
#   tools/dist_train.sh CONFIG [extra train.py args...]
#
# For explicit coordination (CPU/GPU clusters), set:
#   COORDINATOR=host:port NUM_PROCESSES=4 PROCESS_ID=<rank>
set -euo pipefail

CONFIG=$1
shift || true

ARGS=(train)
if [[ -n "${COORDINATOR:-}" ]]; then
  ARGS+=(--coordinator "$COORDINATOR" --num-processes "${NUM_PROCESSES:?}" \
         --process-id "${PROCESS_ID:?}")
fi

PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
python "$(dirname "$0")/launch_multihost.py" "${ARGS[@]}" -- \
    --config "$CONFIG" "$@"
