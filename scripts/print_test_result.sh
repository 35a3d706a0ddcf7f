#!/usr/bin/env bash
# Tabulate an F-sweep: F / final test RMSE / summed ALS phase time /
# total runtime — the greps of the reference's print-test-result.sh:8-12,
# against the same stdout contract lines.
set -euo pipefail
OUTDIR=${1:-./als_sweep_logs}
printf "%-6s %-12s %-12s %-12s\n" "F" "testRMSE@9" "ALStime(s)" "runtime(s)"
for log in "$OUTDIR"/F_*.log; do
    F=$(basename "$log" .log | cut -d_ -f2)
    RMSE=$(grep "Test RMSE in iter 9" "$log" | tail -1 | awk '{print $NF}')
    ALS=$(grep -E "^update (X|theta) run" "$log" | awk '{s+=$4} END {printf "%.3f", s}')
    TOTAL=$(grep "doALS takes seconds" "$log" | awk '{print $4}')
    printf "%-6s %-12s %-12s %-12s\n" "$F" "${RMSE:--}" "${ALS:--}" "${TOTAL:--}"
done
