#!/usr/bin/env bash
# Round-4 measurement batch: run with the chip free and the host idle
# (host-contention-discipline). Results land in round4_logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p round4_logs
SUM=round4_logs/summary.jsonl

echo "=== cg matvec ablation ==="
timeout 1800 python scripts/bench_cg_matvec.py \
    > round4_logs/cg_matvec.json 2> round4_logs/cg_matvec.log \
    && cat round4_logs/cg_matvec.json >> "$SUM"

echo "=== netflix headline (repeat 3, defaults) ==="
timeout 3000 python bench.py --repeat 3 \
    > round4_logs/netflix.json 2> round4_logs/netflix.log \
    && tail -1 round4_logs/netflix.json >> "$SUM"

echo "=== yahoo (split auto) ==="
timeout 4800 python bench.py --workload yahoo \
    > round4_logs/yahoo.json 2> round4_logs/yahoo.log \
    && cat round4_logs/yahoo.json >> "$SUM"

echo "=== ml10m ==="
timeout 1800 python bench.py --workload ml10m \
    > round4_logs/ml10m.json 2> round4_logs/ml10m.log \
    && cat round4_logs/ml10m.json >> "$SUM"

echo "=== accuracy contract (netflix_cal, full scale) ==="
timeout 4800 python bench.py --workload netflix_cal --accuracy-check \
    > round4_logs/netflix_cal.json 2> round4_logs/netflix_cal.log \
    && cat round4_logs/netflix_cal.json >> "$SUM"

echo "=== F-sweep, FULL Netflix shape (reference test_als.sh surface) ==="
NF=.bench_cache/netflix_dir
timeout 14000 bash scripts/test_als.sh "$NF" 17770 480189 \
    99077413 1408586 0.048 round4_logs/sweep \
    > round4_logs/sweep_run.log 2>&1
python scripts/sweep_steady.py round4_logs/sweep \
    | tee round4_logs/sweep_table.txt

echo "=== done ==="
