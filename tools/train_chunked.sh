#!/usr/bin/env bash
# Restart-resilient training wrapper (round-5 post-mortem: the tunneled
# TPU platform can leak host transfer buffers; tools/train.py exits 75
# after a clean checkpoint when host RSS passes BONAI_MAX_RSS_GB).
# Re-launches training, resuming from the latest checkpoint, until the
# run completes (exit 0) or fails with a real error.
#
#   tools/train_chunked.sh CONFIG WORK_DIR [extra tools/train.py args...]
set -uo pipefail
CONFIG=$1; WORK_DIR=$2; shift 2

for attempt in $(seq 1 40); do
    LATEST=$(python - "$WORK_DIR" <<'EOF'
import sys
from bonai_tpu.engine import latest_checkpoint
p = latest_checkpoint(sys.argv[1])
print(p or "")
EOF
)
    RESUME=()
    [ -n "$LATEST" ] && RESUME=(--resume-from "$LATEST")
    echo "[train_chunked] attempt $attempt resume='${LATEST:-none}'"
    python -u tools/train.py "$CONFIG" --work-dir "$WORK_DIR" \
        "${RESUME[@]}" "$@"
    rc=$?
    if [ $rc -eq 0 ]; then
        echo "[train_chunked] complete"
        exit 0
    elif [ $rc -eq 75 ]; then
        echo "[train_chunked] RSS-limit restart (rc=75)"
        sleep 10
        continue
    else
        echo "[train_chunked] failed rc=$rc"
        exit $rc
    fi
done
echo "[train_chunked] too many restarts"
exit 1
