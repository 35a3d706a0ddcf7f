#!/usr/bin/env bash
# Round-3 measurement batch: run AFTER the full-scale hugewiki driver
# finishes (the chip must be free). Results land in round3_logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p round3_logs
SUM=round3_logs/summary.jsonl

echo "=== netflix bench (repeat 3) ==="
timeout 3000 python bench.py --repeat 3 \
    > >(tee round3_logs/netflix.json) 2> round3_logs/netflix.log \
    && tail -1 round3_logs/netflix.json >> "$SUM"

echo "=== netflix --mesh 1 (sharded on one chip) ==="
timeout 3000 python bench.py --mesh 1 \
    > round3_logs/netflix_mesh1.json 2> round3_logs/netflix_mesh1.log \
    && cat round3_logs/netflix_mesh1.json >> "$SUM"

echo "=== yahoo 10 iterations ==="
timeout 4800 python bench.py --workload yahoo \
    > round3_logs/yahoo.json 2> round3_logs/yahoo.log \
    && cat round3_logs/yahoo.json >> "$SUM"

echo "=== ml10m ==="
timeout 1800 python bench.py --workload ml10m \
    > round3_logs/ml10m.json 2> round3_logs/ml10m.log \
    && cat round3_logs/ml10m.json >> "$SUM"

echo "=== F-sweep, FULL Netflix shape (reference test_als.sh surface) ==="
NF=.bench_cache/netflix_dir
timeout 14000 bash scripts/test_als.sh "$NF" 17770 480189 \
    99077413 1408586 0.048 round3_logs/sweep \
    > round3_logs/sweep_run.log 2>&1
python scripts/sweep_steady.py round3_logs/sweep \
    | tee round3_logs/sweep_table.txt

echo "=== done ==="
