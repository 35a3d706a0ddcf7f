#!/usr/bin/env bash
# Round-3 chip-bound measurement batch, gated on the full-scale hugewiki
# driver: waits for /tmp/hugewiki.pid to exit so the measurements never
# contend with the flagship run, then measures in expected-value order.
# Results land in round3_logs/; one JSON line per bench appends to
# round3_logs/summary.jsonl.
set -u
cd "$(dirname "$0")/.."
mkdir -p round3_logs
SUM=round3_logs/summary.jsonl

if [ -f /tmp/hugewiki.pid ]; then
    HW=$(cat /tmp/hugewiki.pid)
    while kill -0 "$HW" 2>/dev/null; do
        sleep 60
    done
fi
echo "[post] hugewiki driver gone; starting measurements at $(date -u)"

run() { # name timeout json-out args...
    local name=$1 to=$2 out=$3; shift 3
    echo "=== $name ==="
    timeout "$to" python bench.py "$@" \
        > "round3_logs/$out.json" 2> "round3_logs/$out.log" \
        && cat "round3_logs/$out.json" | tee -a "$SUM"
}

# 1. the headline A/B: augmented-lane Gram on (auto) vs off, median of 3
run "netflix aug=auto"  3000 netflix        --repeat 3
run "netflix aug=off"   3000 netflix_augoff --repeat 3 --aug-gram off

# 2. sharded on one chip (VERDICT r2 #3 target: <= 1.10 s/iter)
run "netflix --mesh 1"  3000 netflix_mesh1  --mesh 1

# 3. yahoo, preserved this time (VERDICT r2 #4)
run "yahoo"             4800 yahoo          --workload yahoo

# 4. ml10m
run "ml10m"             1800 ml10m          --workload ml10m

# 5. F-sweep at the FULL Netflix shape (reference test_als.sh surface)
NF=.bench_cache/netflix_dir
if [ -d "$NF" ]; then
    echo "=== F-sweep, full Netflix shape ==="
    timeout 9000 bash scripts/test_als.sh "$NF" 17770 480189 \
        99077413 1408586 0.048 round3_logs/sweep \
        > round3_logs/sweep_run.log 2>&1
    python scripts/sweep_steady.py round3_logs/sweep \
        | tee round3_logs/sweep_table.txt
else
    echo "[post] $NF missing — skipping sweep"
fi

echo "[post] done at $(date -u)"
