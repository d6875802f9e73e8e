#!/usr/bin/env bash
# Slurm training launcher (parity: reference tools/slurm_train.sh, which
# srun-launches GPUS tasks with --kill-on-bad-exit=1).
#
# On TPU each slurm task is one HOST process; the coordinator is the
# first node in the allocation. Usage:
#
#   GPUS_PER_NODE=1 tools/slurm_train.sh PARTITION JOB_NAME CONFIG [args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3 || true

NODES=${NODES:-1}
PORT=${PORT:-29511}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NODES" \
    --ntasks="$NODES" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    bash -c '
      MASTER=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
      COORDINATOR="$MASTER:'"$PORT"'" \
      NUM_PROCESSES="$SLURM_NTASKS" PROCESS_ID="$SLURM_PROCID" \
      PYTHONPATH="'"$(dirname "$0")/.."'":${PYTHONPATH:-} \
      python "'"$(dirname "$0")"'/launch_multihost.py" train \
          --coordinator "$COORDINATOR" \
          --num-processes "$SLURM_NTASKS" --process-id "$SLURM_PROCID" -- \
          --config "'"$CONFIG"'" '"$*"'
    '
