#!/usr/bin/env bash
# Pinned synthetic-BONAI generator invocation (VERDICT r4 weak #3: the
# dataset scale/seed must be reproducible across rounds so quality
# numbers stay comparable).  This is the exact invocation behind
# data/synth_bonai used by the round-4/5 2x-recipe runs:
#   800 train tiles (1024²) + 40 true 2048² val scenes cropped into
#   160 1024² __x_y-named tiles, seed 0.
set -euo pipefail
OUT=${1:-data/synth_bonai}
python tools/make_synthetic_bonai.py \
    --out "$OUT" \
    --train 800 \
    --val-scenes 40 \
    --size 1024 \
    --seed 0
