#!/usr/bin/env bash
# BONAI test launcher (reference: tools/bonai/bonai_dist_test.sh).
# Usage: ./tools/bonai/bonai_dist_test.sh CONFIG CHECKPOINT OUT_PKL [args...]
CONFIG=$1; CKPT=$2; OUT=$3
shift 3
python "$(dirname "$0")/bonai_test.py" "$CONFIG" "$CKPT" --out "$OUT" "$@"
