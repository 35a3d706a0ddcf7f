#!/usr/bin/env bash
# Round-5 measurement battery. Sequential (one TPU process at a time),
# each step bounded by a generous timeout and logged under round5_logs.
# Re-runnable: bench datasets/plans/compiles all cache, so a re-run
# skips straight to steady-state iterations.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=round5_logs
mkdir -p "$OUT"
# Every XLA compile logged to stderr: cache misses at measurement time
# are visible (and each one is a remote-compile round trip worth
# knowing about on this tunnel).
export JAX_LOG_COMPILES=1

# Gate on a healthy remote-compile path: the tunnel's compile helper
# wedges after a Mosaic crash (r5 operational note) and recovers on its
# own (~2h observed); a measurement run launched against a wedged
# helper burns its whole timeout budget. Probe with a tiny fresh-shape
# compile until it goes through.
probe() {
    timeout 200 python - <<'EOF' > /dev/null 2>&1
import sys, time
sys.path.insert(0, ".")
from cumf_als_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
x = jnp.ones((17, int(time.time()) % 97 + 131))
jax.jit(lambda a: (a @ a.T).sum())(x).block_until_ready()
EOF
}
until probe; do
    echo "compile path wedged; sleeping 600s ($(date +%H:%M:%S))" \
        | tee -a "$OUT/summary_run.log"
    sleep 600
done
echo "compile path healthy ($(date +%H:%M:%S))" \
    | tee -a "$OUT/summary_run.log"

run() {
    local name=$1 tmo=$2; shift 2
    echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/summary_run.log"
    timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
    local rc=$?
    tail -c 2000 "$OUT/$name.json" | tail -1 >> "$OUT/summary.jsonl"
    echo "--- rc=$rc" | tee -a "$OUT/summary_run.log"
}

# 1. Headline: Netflix F=100, 3 repeats (median + spread decide)
run netflix_r3 3600 python bench.py --repeat 3

# 2. Accuracy contracts (bounds frozen in bench.py before these runs)
run netflix_cal 2400 python bench.py --workload netflix_cal --accuracy-check
run ml10m_cal 2400 python bench.py --workload ml10m_cal --accuracy-check
run yahoo_cal 5400 python bench.py --workload yahoo_cal --accuracy-check

# 3. Yahoo with the r5 tuple-grouped split plans
run yahoo 5400 python bench.py --workload yahoo

# 4. ml10m (small-workload ns/nnz)
run ml10m 1800 python bench.py --workload ml10m

# 5. Sharded mesh=1 parity
run netflix_mesh1 3600 python bench.py --mesh 1

# 6. Netflix octave-16 A/B (X-phase expansion 1.096 -> 1.080)
run netflix_o16 3600 python bench.py --octave-points 16

echo "battery done $(date +%H:%M:%S)" | tee -a "$OUT/summary_run.log"
