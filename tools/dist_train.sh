#!/bin/sh
# Multi-host training launcher (reference: tools/dist_train.sh via torchrun).
# On TPU pods, run this on every host; JAX discovers peers via the TPU
# runtime (jax.distributed initializes from the environment).
CONFIG=$1
shift
python tools/train.py "$CONFIG" "$@"
