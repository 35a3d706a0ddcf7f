"""Round-5 plan-expansion study (host-side, no TPU needed).

Every padded slot costs a full gather+Gram pass on TPU (the gather is
row-rate bound — docs/PERFORMANCE.md), so plan expansion is wall-clock
to first order. This sweeps the plan-builder knobs offline on the
cached full-scale datasets and prints the expansion (and chunk-shape
count, which bounds compile time) per setting, to pick the round-5
defaults before spending TPU time.

Usage:
  python scripts/r5_expansion_study.py netflix   # X panel + theta direct
  python scripts/r5_expansion_study.py yahoo     # split plans both phases
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from cumf_als_tpu.ops import tiling  # noqa: E402
from cumf_als_tpu.utils.io import CSRMatrix  # noqa: E402


def load(name):
    import os
    base = f"/root/repo/.bench_cache/{name}_s1_seed0_v2"
    with open(os.path.join(base, "meta.json")) as fh:
        meta = json.load(fh)
    a = {k: np.load(os.path.join(base, k + ".npy"), mmap_mode="r")
         for k in ("indptr", "indices", "data")}
    return CSRMatrix(indptr=a["indptr"], indices=a["indices"],
                     data=a["data"], num_rows=meta["m"],
                     num_cols=meta["n"])


def transpose(csr):
    from cumf_als_tpu.utils.io import transpose_csr
    return transpose_csr(csr)


def n_shapes(chunks):
    return len({(c.rows.shape[0], getattr(c, "width", 0))
                for c in chunks})


def run_netflix():
    csr = load("netflix")
    csc = transpose(csr)
    t0 = time.time()
    for octave in (8, 16):
        p = tiling.build_panel_plan(csr, panel_size=1 << 16,
                                    chunk_nnz=1 << 22,
                                    chunk_rows=1 << 14,
                                    split_width=4096,
                                    octave_points=octave)
        print(json.dumps({"phase": "x_panel", "octave": octave,
                          "expansion": round(p.expansion, 4),
                          "chunks": len(p.chunks),
                          "shapes": n_shapes(p.chunks),
                          "sec": round(time.time() - t0, 1)}), flush=True)
        t0 = time.time()
        u = tiling.build_update_plan(csc, chunk_nnz=1 << 22,
                                     chunk_rows=1 << 14,
                                     octave_points=octave)
        print(json.dumps({"phase": "theta_direct", "octave": octave,
                          "expansion": round(u.expansion, 4),
                          "chunks": len(u.chunks),
                          "shapes": n_shapes(u.chunks),
                          "sec": round(time.time() - t0, 1)}), flush=True)
        t0 = time.time()


def run_yahoo():
    csr = load("yahoo")
    csc = transpose(csr)
    part = (64 << 20) // (128 * 2)  # split_part_rows at bf16: 262144
    for name, mat in (("x", csr), ("theta", csc)):
        for octave in (8, 16):
            t0 = time.time()
            p = tiling.build_split_plan(mat, part_size=part,
                                        chunk_nnz=1 << 22,
                                        chunk_rows=1 << 14,
                                        octave_points=octave)
            print(json.dumps({"phase": f"{name}_split",
                              "octave": octave,
                              "expansion": round(p.expansion, 4),
                              "chunks": len(p.chunks),
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "netflix"
    if which == "netflix":
        run_netflix()
    else:
        run_yahoo()
