#!/usr/bin/env python
"""Steady-state F-sweep table from CLI sweep logs.

The reference's print_test_result.sh greps total runtime, which on this
environment is dominated by remote-compile latency that varies run to
run. This tool reports the steady-state per-iteration time instead
(median of X+theta phase seconds over iterations 2+, from the CLI's
debug-timing lines), which is the number the wall clock converges to
on a warm compile cache.

Usage: python scripts/sweep_steady.py LOG_DIR
"""

import glob
import re
import statistics
import sys


def main(log_dir: str) -> int:
    paths = sorted(glob.glob(f"{log_dir}/F_*.log"),
                   key=lambda p: int(re.search(r"F_(\d+)", p).group(1)))
    print(f"{'F':>4} {'s/iter(steady)':>15} {'x_phase':>8} "
          f"{'testRMSE@last':>14}")
    for path in paths:
        fdim = int(re.search(r"F_(\d+)", path).group(1))
        txt = open(path).read()
        xs = [float(m) for m in
              re.findall(r"update X run ([\d.]+) seconds", txt)]
        ts = [float(m) for m in
              re.findall(r"update theta run ([\d.]+) seconds", txt)]
        rm = re.findall(r"Test RMSE in iter \d+: ([\d.]+)", txt)
        if len(xs) < 4 or len(ts) < 4:
            print(f"{fdim:>4} {'(incomplete)':>15}")
            continue
        iters = [x + t for x, t in zip(xs, ts)][2:]
        print(f"{fdim:>4} {statistics.median(iters):>15.4f} "
              f"{statistics.median(xs[2:]):>8.4f} "
              f"{(rm[-1] if rm else '-'):>14}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "./als_sweep_logs"))
