#!/usr/bin/env bash
cd /root/repo
timeout 2400 python scripts/tpu_parity_check.py \
    > round4_logs/tpu_parity.jsonl 2> round4_logs/tpu_parity.log
echo "parity exit=$?" >> round4_logs/tpu_parity.log
bash scripts/round4_measurements_b.sh > round4_logs/part_b_run.log 2>&1
echo ALL_DONE >> round4_logs/part_b_run.log
