#!/usr/bin/env bash
# Multi-host TPU eval launcher (reference: tools/dist_test.sh). Test videos
# shard per host via distributed_video_split; results gather over DCN.
CONFIG=$1
shift
python "$(dirname "$0")"/test.py "$CONFIG" "$@"
