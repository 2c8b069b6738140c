#!/bin/bash
# Multi-host training launch over Slurm (TPU pod slices).
# Usage: scripts/run.sh <nodes> <cfg> [pretrained]
#
# One process per host: jax.distributed.initialize() picks up the Slurm env
# (train.py), each process drives its local TPU chips, collectives ride ICI.
set -e

export PYTHONPATH="./:$PYTHONPATH"
export MAED_MULTIHOST=1

srun \
    --nodes="$1" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    python train.py --cfg="$2" ${3:+--pretrained="$3"}
