#!/usr/bin/env bash
# Multi-host eval launcher (parity: reference tools/dist_test.sh).
# Same model as dist_train.sh: one process per host, pjit shards eval
# batches over the global mesh; results gather via jax process 0.
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2 || true
ARGS=(test)
if [[ -n "${COORDINATOR:-}" ]]; then
  ARGS+=(--coordinator "$COORDINATOR" --num-processes "${NUM_PROCESSES:?}" \
         --process-id "${PROCESS_ID:?}")
fi
PYTHONPATH="$(dirname "$0")/..":${PYTHONPATH:-} \
python "$(dirname "$0")/launch_multihost.py" "${ARGS[@]}" -- \
    --config "$CONFIG" --checkpoint "$CHECKPOINT" "$@"
