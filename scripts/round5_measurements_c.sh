#!/usr/bin/env bash
# Round-5 part C: hugewiki. (1) scale-0.15 fully device-resident plain
# ALS — the stability demonstration (VERDICT r4 #5: max/median warm
# iteration <= 1.3); (2) full-scale state-dir driver iterations with
# the r5 recompile classification (n_compiles must be 0 on a warmed
# cache).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=round5_logs
export JAX_LOG_COMPILES=1

until grep -q "battery-b done" "$OUT/battery_b.log" 2>/dev/null; do
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

run hugewiki_015 7200 python bench.py --workload hugewiki --scale 0.15

# Full scale: one iteration per process (tunnel leak bound). First
# process pays plan+stream-cache build; subsequent are the steady
# points that decide repeatability. 3 iterations.
for i in 1 2 3; do
    run hugewiki_full_$i 14000 python scripts/hugewiki_full.py \
        --scale 1.0 --iters 3 --state-dir "$OUT/hugewiki_state"
done
cat "$OUT/hugewiki_state/state.json" >> "$OUT/summary.jsonl" 2>/dev/null

echo "battery-c done $(date +%H:%M:%S)" | tee -a "$OUT/summary_run.log"
