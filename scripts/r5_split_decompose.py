"""Decompose the Yahoo SplitPlan expansion (r4: 1.28 vs direct 1.066)
into its sources, host-side:

  - bucket rounding: row total nnz -> bucket width (same as direct)
  - part quantization: per-chunk per-part max -> width-grid point
  - chunk max: per-row part-k count -> chunk max part-k count
  - ragged rows: dummy tail rows

and evaluate candidate fixes (chunk_rows, within-bucket ordering) by
their expansion, before spending TPU time (VERDICT r4 #4).

Usage: python scripts/r5_split_decompose.py [x|theta]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from cumf_als_tpu.ops import tiling  # noqa: E402


def load_yahoo(side):
    import os
    from cumf_als_tpu.utils.io import CSRMatrix, transpose_csr
    base = "/root/repo/.bench_cache/yahoo_s1_seed0_v2"
    with open(os.path.join(base, "meta.json")) as fh:
        meta = json.load(fh)
    a = {k: np.load(os.path.join(base, k + ".npy"), mmap_mode="r")
         for k in ("indptr", "indices", "data")}
    csr = CSRMatrix(indptr=a["indptr"], indices=a["indices"],
                    data=a["data"], num_rows=meta["m"],
                    num_cols=meta["n"])
    return csr if side == "x" else transpose_csr(csr)


def decompose(plan):
    true_nnz = plan.true_nnz
    pad_quant = 0      # width-grid quantization of per-part chunk max
    pad_chunkmax = 0   # chunk max over rows vs per-row count
    pad_ragged = 0     # dummy tail rows
    used = 0
    for ch in plan.chunks:
        r_pad = ch.rows.shape[0]
        live = int((ch.rows < plan.num_rows).sum())
        for k, w in enumerate(ch.widths):
            lens = (ch.cols[k] < plan.part_size).sum(axis=1)
            wmax = int(lens[:live].max()) if live else 0
            pad_quant += (w - wmax) * r_pad
            pad_chunkmax += int((wmax - lens[:live]).sum())
            pad_ragged += wmax * (r_pad - live)
            used += int(lens[:live].sum())
    total = plan.padded_nnz
    return {
        "true_nnz": true_nnz, "padded": total,
        "expansion": round(total / true_nnz, 4),
        "quant_frac": round(pad_quant / true_nnz, 4),
        "chunkmax_frac": round(pad_chunkmax / true_nnz, 4),
        "ragged_frac": round(pad_ragged / true_nnz, 4),
    }


def main():
    side = sys.argv[1] if len(sys.argv) > 1 else "x"
    csr = load_yahoo(side)
    part = (64 << 20) // (128 * 2)
    variants = [
        ("base_o8", dict(octave_points=8)),
        ("o16", dict(octave_points=16)),
        ("o16_cr4096", dict(octave_points=16, chunk_rows=1 << 12)),
        ("o8_cr4096", dict(octave_points=8, chunk_rows=1 << 12)),
        ("o8_cr2048", dict(octave_points=8, chunk_rows=1 << 11)),
    ]
    for name, kw in variants:
        t0 = time.time()
        p = tiling.build_split_plan(csr, part_size=part,
                                    chunk_nnz=1 << 22, **kw)
        rec = decompose(p)
        rec.update({"variant": name, "side": side,
                    "chunks": len(p.chunks),
                    "sec": round(time.time() - t0, 1)})
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
