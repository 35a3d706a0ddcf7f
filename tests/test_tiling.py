"""Bucketing-plan tests: every nonzero appears exactly once, padding uses
the sentinel column, dummy tail rows are marked, expansion is bounded."""

import numpy as np

from cumf_als_tpu.ops.tiling import build_update_plan
from cumf_als_tpu.utils.io import coo_to_csr, COOMatrix


def _csr(m, n, nnz, seed=0):
    rng = np.random.RandomState(seed)
    k = rng.choice(m * n, size=nnz, replace=False)
    return coo_to_csr(COOMatrix(row=(k // n).astype(np.int32),
                                col=(k % n).astype(np.int32),
                                data=rng.uniform(1, 5, nnz).astype(np.float32),
                                num_rows=m, num_cols=n))


def test_plan_covers_all_nonzeros(small_problem):
    train, _ = small_problem
    plan = build_update_plan(train, chunk_nnz=256)
    seen = {}
    for ch in plan.chunks:
        for r in range(ch.num_rows):
            row = int(ch.rows[r])
            if row == plan.num_rows:  # dummy tail
                assert ch.nnz[r] == 0
                continue
            k = int(ch.nnz[r])
            assert k <= ch.width
            cols = ch.cols[r, :k]
            vals = ch.vals[r, :k]
            assert row not in seen
            seen[row] = (cols.copy(), vals.copy())
            # padding contract
            assert np.all(ch.cols[r, k:] == plan.num_cols)
            assert np.all(ch.vals[r, k:] == 0.0)
    # reconstruct the CSR
    for i in range(train.num_rows):
        lo, hi = int(train.indptr[i]), int(train.indptr[i + 1])
        if hi == lo:
            assert i not in seen
            continue
        cols, vals = seen[i]
        np.testing.assert_array_equal(cols, train.indices[lo:hi])
        np.testing.assert_allclose(vals, train.data[lo:hi])
    assert plan.true_nnz == train.nnz


def test_plan_expansion_bounded():
    csr = _csr(500, 400, 20000, seed=5)
    plan = build_update_plan(csr)
    # power-of-two buckets: padded <= 2x true for rows >= min width
    assert plan.expansion < 2.5


def test_skewed_row_gets_own_bucket():
    # one row with 3000 nonzeros among tiny rows
    m, n = 50, 4000
    rows = [0] * 3000 + list(range(1, m))
    cols = list(range(3000)) + [0] * (m - 1)
    vals = np.ones(len(rows), np.float32)
    csr = coo_to_csr(COOMatrix(row=np.array(rows, np.int32),
                               col=np.array(cols, np.int32), data=vals,
                               num_rows=m, num_cols=n))
    plan = build_update_plan(csr, chunk_nnz=1 << 14)
    widths = sorted({c.width for c in plan.chunks})
    assert widths[-1] >= 3000
    assert widths[0] <= 64


def test_chunk_shapes_bounded_within_bucket():
    """Full chunks in a bucket share one shape; the ragged final chunk is
    a multiple of 8 with a <=4-bit mantissa (dummy rows cost full
    gather+Gram work each, so the tail shape hugs the true row count
    while the compiled-shape count stays O(log))."""
    csr = _csr(1000, 100, 30000, seed=6)
    plan = build_update_plan(csr, chunk_nnz=1 << 12)
    by_width = {}
    for ch in plan.chunks:
        by_width.setdefault(ch.width, []).append(ch.num_rows)
    for width, sizes in by_width.items():
        full = max(sizes)
        # at most one non-full chunk, 8-aligned with a small mantissa
        ragged = [s for s in sizes if s != full]
        assert len(ragged) <= 1, (width, sizes)
        for s in ragged:
            assert s % 8 == 0 and s >= 8
            mantissa = s >> max(0, s.bit_length() - 4)
            assert s <= 128 or (mantissa << max(0, s.bit_length() - 4)) == s
