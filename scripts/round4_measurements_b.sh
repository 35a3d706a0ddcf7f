#!/usr/bin/env bash
# Round-4 measurement batch, part B (the part-A run was cut short at
# the netflix_cal stage; its netflix/yahoo/ml10m numbers predate the
# direct-aug default flip). Priority order: headline first, the long
# F-sweep last, so a truncated session still lands the high-value
# numbers. Run with the chip free and the host idle.
set -u
cd "$(dirname "$0")/.."
mkdir -p round4_logs
SUM=round4_logs/summary.jsonl

echo "=== netflix headline (repeat 2, defaults: direct-aug off) ==="
timeout 2400 python bench.py --repeat 2 \
    > round4_logs/netflix_b.json 2> round4_logs/netflix_b.log \
    && tail -1 round4_logs/netflix_b.json >> "$SUM"

echo "=== accuracy contract (netflix_cal, full scale) ==="
timeout 2400 python bench.py --workload netflix_cal --accuracy-check \
    > round4_logs/netflix_cal.json 2> round4_logs/netflix_cal.log \
    && tail -1 round4_logs/netflix_cal.json >> "$SUM"

echo "=== F-sweep, FULL Netflix shape, 5 iters/point ==="
NF=.bench_cache/netflix_dir
timeout 7200 bash scripts/test_als.sh "$NF" 17770 480189 \
    99077413 1408586 0.048 round4_logs/sweep --iters 5 \
    > round4_logs/sweep_run.log 2>&1
python scripts/sweep_steady.py round4_logs/sweep \
    | tee round4_logs/sweep_table.txt

echo "=== yahoo (split auto, direct-aug off) ==="
timeout 3600 python bench.py --workload yahoo \
    > round4_logs/yahoo_b.json 2> round4_logs/yahoo_b.log \
    && cat round4_logs/yahoo_b.json >> "$SUM"

echo "=== sharded mesh=1 (repeat 2) ==="
timeout 3000 python bench.py --mesh 1 --repeat 2 \
    > round4_logs/netflix_mesh1_b.json 2> round4_logs/netflix_mesh1_b.log \
    && tail -1 round4_logs/netflix_mesh1_b.json >> "$SUM"

echo "=== hugewiki CG study (scale 0.05, 6 iters, warm vs cold) ==="
bash scripts/hugewiki_cg_study.sh 0.05 6

echo "=== done ==="
