#!/usr/bin/env bash
# Full-hugewiki driver: one ALS iteration per python process.
#
# The axon tunnel's client leaks ~1 byte of host RSS per byte streamed
# host->device (measured; see docs/PERFORMANCE.md). A full-hugewiki
# iteration streams ~50 GB even with compact transports, so a 10-
# iteration single-process run cannot fit host RAM. Each invocation of
# hugewiki_full.py --state-dir runs exactly one iteration and persists
# (x_host bf16, theta, history); this loop re-invokes until done.
# Startup per process is bounded: dataset + plans mmap-load from cache.
#
# Usage: scripts/hugewiki_full_driver.sh [ITERS] [SCALE] [STATE_DIR]
set -u
ITERS="${1:-10}"
SCALE="${2:-1.0}"
STATE="${3:-round2_logs/hugewiki_state}"
mkdir -p "$STATE"
for i in $(seq 1 "$ITERS"); do
    next=$(python -c "import json,sys,os
p='$STATE/state.json'
print(json.load(open(p))['next_iter'] if os.path.exists(p) else 0)")
    if [ "$next" -ge "$ITERS" ]; then
        echo "[driver] all $ITERS iterations done"
        break
    fi
    echo "[driver] starting iteration $next (pass $i)"
    python scripts/hugewiki_full.py --scale "$SCALE" --iters "$ITERS" \
        --state-dir "$STATE" || {
        echo "[driver] iteration $next failed (exit $?)"; exit 1; }
done
cat "$STATE/state.json"
