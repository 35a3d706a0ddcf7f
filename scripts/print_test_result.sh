#!/usr/bin/env bash
# Tabulate an F-sweep: F / final test RMSE / summed ALS phase time /
# total runtime — the greps of the reference's print-test-result.sh:8-12,
# against the same stdout contract lines.
set -euo pipefail
OUTDIR=${1:-./als_sweep_logs}
printf "%-6s %-12s %-12s %-12s\n" "F" "testRMSE@last" "ALStime(s)" "runtime(s)"
for log in "$OUTDIR"/F_*.log; do
    F=$(basename "$log" .log | cut -d_ -f2)
    # last test-RMSE line, not a hardcoded iter 9: sweeps may run with
    # --iters != 10 (ADVICE r4); the reference greps iter 9 only
    # because its ITERS is fixed at 10 (print-test-result.sh:10)
    RMSE=$(grep "Test RMSE in iter" "$log" | tail -1 | awk '{print $NF}')
    ALS=$(grep -E "^update (X|theta) run" "$log" | awk '{s+=$4} END {printf "%.3f", s}')
    TOTAL=$(grep "doALS takes seconds" "$log" | awk '{print $4}')
    printf "%-6s %-12s %-12s %-12s\n" "$F" "${RMSE:--}" "${ALS:--}" "${TOTAL:--}"
done
