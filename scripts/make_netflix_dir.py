"""Write the cached synthetic Netflix dataset as a CLI binary dataset
directory (reference loader contract, host_utilities.cpp:19-97) so the
F-sweep harness (scripts/test_als.sh) can drive the full-scale shape.

Usage: python scripts/make_netflix_dir.py [OUT_DIR]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402
from cumf_als_tpu.utils.io import write_dataset  # noqa: E402


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        bench.CACHE_DIR, "netflix_dir")
    train, test = bench.load_workload("netflix", 1.0)
    os.makedirs(out, exist_ok=True)
    write_dataset(out, train, test)
    print(f"wrote {out}: m={train.num_rows} n={train.num_cols} "
          f"nnz={train.nnz} nnz_test={test.nnz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
