#!/bin/sh
# Multi-host training launcher (reference: tools/dist_train.sh via torchrun).
# On TPU pods, run this on every host; JAX discovers peers via the TPU
# runtime. Cross-host coordination (orbax barriers, DCN clusters) needs
# jax.distributed.initialize(): set PRV2_DIST=1 (or the standard
# JAX_COORDINATOR_ADDRESS env) and the CLI calls it before any backend use.
CONFIG=$1
shift
python tools/train.py "$CONFIG" "$@"
