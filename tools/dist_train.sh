#!/usr/bin/env bash
# Multi-host TPU training launcher (reference: tools/dist_train.sh used
# torch.distributed.launch; on TPU pods every host runs the same command
# and jax.distributed auto-rendezvouses).
# Usage: ./tools/dist_train.sh CONFIG [extra args...]
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
