#!/usr/bin/env bash
# Per-phase time aggregation over a run log: sums of the update-X and
# update-theta lines (reference hermitiantime.sh / solvertime.sh; our
# phases fuse Gram+solve, so the split is X-phase vs theta-phase).
LOG=${1:?log file}
echo "update X total:     $(grep -E '^update X run' "$LOG" | awk '{s+=$4} END {printf "%.3f s\n", s}')"
echo "update theta total: $(grep -E '^update theta run' "$LOG" | awk '{s+=$4} END {printf "%.3f s\n", s}')"
