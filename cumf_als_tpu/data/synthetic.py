"""Synthetic rating-matrix generators.

The reference downloads Netflix/ML-10M (reference
data/ml10M/prepare_ml10M_data.py:24-43); this environment has no network
egress, so tests and benchmarks run on synthetic matrices with matched
shape, nnz and degree skew, generated from a planted low-rank model so ALS
convergence (falling RMSE toward the noise floor) is verifiable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix, coo_to_csr


def synthetic_ratings(
    m: int,
    n: int,
    nnz: int,
    nnz_test: int,
    rank: int = 10,
    noise: float = 0.1,
    skew: float = 1.0,
    rating_range: Tuple[float, float] = (1.0, 5.0),
    seed: int = 0,
) -> Tuple[CSRMatrix, COOMatrix]:
    """Sample (train CSR, test COO) from a planted rank-`rank` model.

    Row/column sampling uses Zipf-like weights with exponent `skew` to
    mimic the heavy-tailed degree distributions of the real datasets
    (Netflix movie rows reach ~230k ratings; SURVEY §7 "hard parts").
    Duplicate (row, col) pairs are de-duplicated, so the returned nnz can
    be slightly below the request for dense regimes.
    """
    rng = np.random.RandomState(seed)
    u = rng.standard_normal((m, rank)).astype(np.float32) / np.sqrt(rank)
    v = rng.standard_normal((n, rank)).astype(np.float32)

    lo, hi = rating_range
    total = nnz + nnz_test

    prow = (np.arange(1, m + 1, dtype=np.float64)) ** (-skew)
    rng.shuffle(prow)
    prow /= prow.sum()
    pcol = (np.arange(1, n + 1, dtype=np.float64)) ** (-skew)
    rng.shuffle(pcol)
    pcol /= pcol.sum()

    # Oversample, then de-duplicate (row, col) pairs.
    want = int(total * 1.3) + 16
    rows = rng.choice(m, size=want, p=prow).astype(np.int64)
    cols = rng.choice(n, size=want, p=pcol).astype(np.int64)
    keys = rows * n + cols
    _, first = np.unique(keys, return_index=True)
    first.sort()
    first = first[:total]
    rows = rows[first].astype(np.int32)
    cols = cols[first].astype(np.int32)
    total = rows.shape[0]
    nnz = min(nnz, total - min(nnz_test, total // 10))
    nnz_test = total - nnz

    raw = np.einsum("ij,ij->i", u[rows], v[cols])
    raw = raw + noise * rng.standard_normal(total).astype(np.float32)
    # Affine-map to the rating range and round to halves like real stars.
    mid, half = (hi + lo) / 2.0, (hi - lo) / 2.0
    vals = np.clip(mid + half * raw / 2.0, lo, hi).astype(np.float32)
    vals = np.round(vals * 2.0) / 2.0
    vals = vals.astype(np.float32)

    perm = rng.permutation(total)
    tr, te = perm[:nnz], perm[nnz:]
    train = coo_to_csr(COOMatrix(row=rows[tr], col=cols[tr], data=vals[tr],
                                 num_rows=m, num_cols=n))
    test = COOMatrix(row=rows[te], col=cols[te], data=vals[te],
                     num_rows=m, num_cols=n)
    return train, test


def init_factors(m: int, n: int, f: int, seed: int = 0,
                 init_scale: float = 0.2) -> Tuple[np.ndarray, np.ndarray]:
    """Initial factors: theta ~ init_scale*U(0,1), X = 0 (reference
    main.cpp:72-78; the CG path needs X initialized too). The reference
    uses C srand/rand; we use numpy's PRNG — same distribution, different
    stream, which only shifts the trajectory within its seed-to-seed
    variance."""
    rng = np.random.RandomState(seed)
    theta = (init_scale * rng.random_sample((n, f))).astype(np.float32)
    x = np.zeros((m, f), dtype=np.float32)
    return x, theta
