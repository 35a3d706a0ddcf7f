"""Format a hugewiki state.json trajectory as a markdown table.

Usage: python scripts/hugewiki_table.py [STATE_DIR]
"""
import json
import os
import sys


def main() -> int:
    sd = sys.argv[1] if len(sys.argv) > 1 else "round3_logs/hugewiki_state"
    with open(os.path.join(sd, "state.json")) as fh:
        s = json.load(fh)
    print("| iter | update X (s) | update theta (s) | train RMSE | "
          "test RMSE |")
    print("|---|---|---|---|---|")
    for h in s["history"]:
        print(f"| {h['iter']} | {h['x_seconds']:.0f} | "
              f"{h['theta_seconds']:.0f} | {h['train_rmse']:.4f} | "
              f"{h['test_rmse']:.4f} |")
    warm = [h["x_seconds"] + h["theta_seconds"] for h in s["history"][1:]]
    if warm:
        import statistics
        print(f"\nwarm-iteration median: {statistics.median(warm):.0f} s "
              f"({len(s['history'])} iterations recorded)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
