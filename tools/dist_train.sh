#!/usr/bin/env bash
# Multi-host TPU training launcher — the TPU-native analog of the
# reference's tools/dist_train.sh (torch.distributed.launch over NCCL).
# On TPU pods, jax initializes the DCN mesh from the pod runtime; one process
# per host runs the SAME program (SPMD), so the launcher is just per-host
# process start (e.g. with `gcloud compute tpus tpu-vm ssh --worker=all`).
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" "$@"
