#!/usr/bin/env bash
# Multi-host training launcher (reference surface: tools/dist_train.sh).
# On TPU pods each host runs the same program; jax.distributed.initialize()
# picks up the pod topology from the environment (no torchrun equivalent
# needed). For single-host multi-chip, the mesh covers all local devices
# automatically.
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" "$@"
