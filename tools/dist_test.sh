#!/bin/sh
# Multi-host evaluation launcher (reference: tools/dist_test.sh). The eval
# dataset shards by process index; metrics gather via process_allgather.
CONFIG=$1
shift
python tools/test.py "$CONFIG" "$@"
