"""Calibrate a *_cal planted model to its published accuracy regime
(VERDICT r3 #6 for netflix_cal; r4 #6 extends to ml10m_cal/yahoo_cal).

The reference validates on real data: test RMSE at iteration 9 grepped
from stdout (reference print-test-result.sh:10) — ~0.92 on Netflix
F=100 lambda=0.048; ML-10M and YahooMusic land in the regimes the cuMF
papers plot (~0.82 at rank 100, and ~22 on Yahoo's 0-100 rating scale
with lambda=1.4). This zero-egress environment substitutes planted
low-rank models; this script sweeps (noise, signal_scale) so each
synthetic's CONVERGED test RMSE lands in its regime, making the
accuracy bands falsifiable.

Per-row rating counts are scale-invariant here (m, n, nnz all scale
together), so the F=100 overfitting regime at scale 0.25 matches scale
1.0; the chosen point is then verified once at full scale by
`bench.py --workload netflix_cal --accuracy-check`.

Run on the real chip, host otherwise idle:
  python scripts/calibrate_accuracy.py [--scale 0.25] \
      [--candidates 0.6:0.80 0.6:0.86 0.6:0.92]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="netflix_cal",
                   choices=["netflix_cal", "ml10m_cal", "yahoo_cal"])
    p.add_argument("--lam", type=float, default=None,
                   help="override the workload lambda")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--f", type=int, default=100)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--candidates", nargs="+",
                   default=["0.6:0.80", "0.6:0.86", "0.6:0.92"],
                   help="signal_scale:noise pairs")
    args = p.parse_args()

    if args.platform:
        import os as _os
        _os.environ["JAX_PLATFORMS"] = args.platform
    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax

    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors, workload_ratings
    from cumf_als_tpu.models.als import ALS

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for cand in args.candidates:
        sig, noi = (float(v) for v in cand.split(":"))
        t0 = time.monotonic()
        train, test = workload_ratings(args.workload, scale=args.scale,
                                       signal_scale=sig, noise=noi)
        gen_s = time.monotonic() - t0
        std = float(np.std(train.data))
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=args.f,
                        nnz=train.nnz, nnz_test=test.nnz,
                        lam=(args.lam if args.lam is not None else
                             {"netflix_cal": 0.048, "ml10m_cal": 0.05,
                              "yahoo_cal": 1.4}[args.workload]),
                        iters=args.iters, solver="cg", backend="pallas",
                        factor_dtype="bf16", gram_dtype="bf16",
                        train_rmse_method="fused", verbose=False)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=cfg.seed)
        model = ALS(cfg, train, None, test)
        res = model.run(x0, th0)
        h = res.history
        print(json.dumps({
            "workload": args.workload,
            "signal_scale": sig, "noise": noi, "scale": args.scale,
            "rating_std": round(std, 4), "gen_seconds": round(gen_s, 1),
            "test_rmse_iter1": round(h[1].test_rmse, 4),
            "test_rmse_iter5": round(h[5].test_rmse, 4),
            "test_rmse_final": round(h[-1].test_rmse, 4),
            "train_rmse_final": round(h[-1].train_rmse, 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
