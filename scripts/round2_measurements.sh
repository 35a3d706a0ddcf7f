#!/usr/bin/env bash
# Round-2 measurement queue: runs each workload/path serially on the
# attached chip, logging unbuffered to $OUT. Each entry appends one
# JSON line to $OUT/summary.jsonl.
set -uo pipefail
OUT=${1:-./round2_logs}
mkdir -p "$OUT"

run() {
    name=$1; shift
    echo "=== $name: $*" | tee -a "$OUT/summary.jsonl" >/dev/null
    stdbuf -oL -eL "$@" > "$OUT/$name.log" 2>&1
    tail -1 "$OUT/$name.log" >> "$OUT/summary.jsonl"
}

run ml10m       timeout 1200 python bench.py --workload ml10m
run netflix_sh  timeout 2400 python bench.py --workload netflix --mesh 1
run hugewiki_ooc timeout 3000 python bench.py --workload hugewiki_mini \
    --out-of-core --iters 2
echo "done" >> "$OUT/summary.jsonl"
