#!/usr/bin/env bash
# Slurm launcher — TPU-native analog of the reference's tools/slurm_train.sh
# (srun over NCCL). On a Slurm-managed TPU pod slice, each task is one host
# of the same SPMD program; jax picks up the pod topology from the runtime,
# so the launcher only schedules one task per host.
#
# Usage: GPUS_PER_NODE is meaningless on TPU; NODES = number of hosts.
#   ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG [EXTRA_ARGS...]
set -e
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-}
srun -p "$PARTITION" \
  --job-name="$JOB_NAME" \
  --nodes="$NODES" \
  --ntasks="$NODES" \
  --ntasks-per-node=1 \
  --kill-on-bad-exit=1 \
  $SRUN_ARGS \
  python "$(dirname "$0")"/train.py "$CONFIG" "$@"
