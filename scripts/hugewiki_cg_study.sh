#!/usr/bin/env bash
# VERDICT r3 #5: quantify hugewiki convergence under cold- vs warm-start
# CG at scale 0.1 (310M nnz — large enough for the regime, small enough
# to run three 10-iteration trajectories in one session).
#
#   a) device-X, WARM start, cg_iters=20 (the r4 default)
#   b) device-X, cold start, cg_iters=20 (the r3 full-scale mode that
#      showed non-monotone train RMSE, VERDICT r3 #5)
#   c) device-X, cold start, cg_iters=100 (the reference's own hugewiki
#      choice, hugewiki.cu:2569)
#
# Run with the chip free. Results land in round4_logs/hugewiki_study/.
set -u
cd "$(dirname "$0")/.."
OUT=round4_logs/hugewiki_study
mkdir -p "$OUT"
SCALE=${1:-0.1}
ITERS=${2:-10}

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 14000 python scripts/hugewiki_full.py \
        --scale "$SCALE" --iters "$ITERS" "$@" \
        > "$OUT/$name.json" 2> "$OUT/$name.log"
    echo "exit=$? $(tail -c 400 "$OUT/$name.json")"
}

run warm_cg20 --cg-iters 20 --x-warm-start on
run cold_cg20 --cg-iters 20 --x-warm-start off
run cold_cg100 --cg-iters 100 --x-warm-start off
echo "=== done ==="
