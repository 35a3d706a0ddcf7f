#!/usr/bin/env bash
# Total-runtime extractor over a run log (reference getRuntime.sh).
grep "doALS takes seconds" "${1:?log file}" | awk '{print $4}'
