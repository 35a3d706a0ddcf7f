#!/usr/bin/env bash
# Round-5 measurement battery, part B. Waits for part A (battery.log
# "battery done"), then: netflix split A/B, ml10m phase decomposition,
# hugewiki scale-0.25 device-resident stability run, full-shape F-sweep.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=round5_logs
export JAX_LOG_COMPILES=1

until grep -q "battery done" "$OUT/battery.log" 2>/dev/null; do
    sleep 120
done

run() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/summary_run.log"
    timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
    local rc=$?
    tail -c 2000 "$OUT/$name.json" | tail -1 >> "$OUT/summary.jsonl"
    echo "--- rc=$rc" | tee -a "$OUT/summary_run.log"
}

# 7. Netflix X-phase via the r5 split plan (expansion 1.099 at 79
#    shapes, fast-tier gathers, no accumulator RMW) vs the panel path
run netflix_split 3600 python bench.py --split-gather force

# 8. ml10m with device-synced phase timing (decompose the 17 ns/nnz)
run ml10m_dbg 1800 python bench.py --workload ml10m --debug-timing

# 9. hugewiki scale 0.25: fully device-resident plain ALS — no
#    per-iteration streaming, so iterations must be flat (VERDICT r4
#    #5 stability criterion: max/median <= 1.3)
run hugewiki_025 7200 python bench.py --workload hugewiki --scale 0.25

# 10. F-sweep, full Netflix shape, 5 iters/point (reference
#     test_als.sh:5-28 surface)
NF=.bench_cache/netflix_dir
if [ -d "$NF" ]; then
    echo "=== F-sweep ($(date +%H:%M:%S))" | tee -a "$OUT/summary_run.log"
    SKIP_DONE=1 timeout 10800 bash scripts/test_als.sh "$NF" 17770 480189 \
        99077413 1408586 0.048 "$OUT/sweep" --iters 5 \
        > "$OUT/sweep_run.log" 2>&1
    python scripts/sweep_steady.py "$OUT/sweep" | tee "$OUT/sweep_table.txt"
fi

echo "battery-b done $(date +%H:%M:%S)" | tee -a "$OUT/summary_run.log"
