#!/usr/bin/env bash
# Round-2 measurement queue: runs each workload/path serially on the
# attached chip, logging unbuffered to $OUT. Each entry appends one
# JSON line to $OUT/summary.jsonl.
set -uo pipefail
OUT=${1:-./round2_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
    name=$1; shift
    echo "=== $name: $*" >> "$OUT/summary.jsonl"
    stdbuf -oL -eL "$@" > "$OUT/$name.log" 2>&1
    tail -1 "$OUT/$name.log" >> "$OUT/summary.jsonl"
}

# 1. Yahoo: fused batched-panel path (round-1: 8.14 s/iter, target <= ~5)
run yahoo        timeout 3600 python bench.py --workload yahoo --iters 5

# 2. Sharded Netflix on one chip: the SPMD path's measured cost
run netflix_sh   timeout 2400 python bench.py --workload netflix --mesh 1 --iters 5

# 3. ML-10M at the round-2 configuration
run ml10m        timeout 1200 python bench.py --workload ml10m

# 4. F-sweep (reference test_als.sh contract) on quarter-scale Netflix
python - <<'EOF'
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
path = "/root/repo/.bench_cache/netflix_q"
if not os.path.exists(os.path.join(path, "meta.txt")):
    from cumf_als_tpu.data.synthetic import workload_ratings
    from cumf_als_tpu.utils.io import write_dataset
    train, test = workload_ratings("netflix", scale=0.25, seed=0)
    write_dataset(path, train, test)
    with open(os.path.join(path, "meta.txt"), "w") as f:
        f.write(f"{train.num_rows} {train.num_cols} {train.nnz} {test.nnz}\n")
print(open(os.path.join(path, "meta.txt")).read().strip())
EOF
read M N NNZ NNZT < .bench_cache/netflix_q/meta.txt
bash scripts/test_als.sh .bench_cache/netflix_q "$M" "$N" "$NNZ" "$NNZT" \
    0.048 "$OUT/sweep" > "$OUT/sweep_table.txt" 2>&1
tail -25 "$OUT/sweep_table.txt" >> "$OUT/summary.jsonl"

# 5. hugewiki-mini out-of-core (generation ~20 min on this 1-CPU host)
run hugewiki_ooc timeout 4000 python bench.py --workload hugewiki_mini \
    --out-of-core --iters 2

# 6. hugewiki-mini sharded+OOC on one chip (the combined path, measured)
run hugewiki_shooc timeout 4000 python bench.py --workload hugewiki_mini \
    --mesh 1 --out-of-core --iters 2

echo "done" >> "$OUT/summary.jsonl"
