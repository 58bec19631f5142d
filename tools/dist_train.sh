#!/usr/bin/env bash
# Multi-host launcher (reference tools/dist_train.sh equivalent).
# On TPU pods each host runs the same command; jax.distributed.initialize()
# picks up the pod runtime. Usage: bash tools/dist_train.sh CONFIG [args...]
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
