#!/usr/bin/env bash
# Slurm eval launcher (reference tools/slurm_test.sh analog): each host
# evaluates a disjoint whole-video shard (DistributedVideoSampler split via
# --num-shards/--shard), results merged by the caller.
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
  bash -c "python $(dirname "$0")/test.py $CONFIG --num-shards $NODES --shard \$SLURM_PROCID $*"
