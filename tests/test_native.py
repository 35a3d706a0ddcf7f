"""Native data-plane tests: the C++ library must agree bit-for-bit with
the numpy fallbacks (and with scipy, transitively via test_io)."""

import numpy as np
import pytest

from cumf_als_tpu import native
from cumf_als_tpu.utils.io import COOMatrix

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="native library unavailable and not buildable")


def _coo(m, n, nnz, seed=0):
    rng = np.random.RandomState(seed)
    k = rng.choice(m * n, size=nnz, replace=False)
    return (k // n).astype(np.int32), (k % n).astype(np.int32), \
        rng.uniform(1, 5, nnz).astype(np.float32)


def test_coo_to_csr_matches_scipy():
    import scipy.sparse as sp
    m, n = 43, 37
    row, col, dat = _coo(m, n, 400, seed=1)
    indptr, indices, data = native.coo_to_csr(m, n, row, col, dat)
    ref = sp.coo_matrix((dat, (row, col)), shape=(m, n)).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)
    np.testing.assert_allclose(data, ref.data)


def test_csr_transpose_matches_scipy():
    import scipy.sparse as sp
    m, n = 31, 45
    row, col, dat = _coo(m, n, 300, seed=2)
    indptr, indices, data = native.coo_to_csr(m, n, row, col, dat)
    t_indptr, t_indices, t_data = native.csr_transpose(
        m, n, indptr, indices, data)
    ref = sp.csr_matrix((data, indices, indptr), shape=(m, n)).T.tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(t_indptr, ref.indptr)
    np.testing.assert_array_equal(t_indices, ref.indices)
    np.testing.assert_allclose(t_data, ref.data)


def test_materialize_chunk_contract():
    m, n = 20, 15
    row, col, dat = _coo(m, n, 80, seed=3)
    indptr, indices, data = native.coo_to_csr(m, n, row, col, dat)
    rows = np.array([3, 7, 1, -1, -1], np.int32)  # two dummy tails
    rows_out, nnz, cols, vals = native.materialize_chunk(
        indptr, indices, data, rows, width=16, pad_col=n, pad_row=m,
        num_rows=m)
    for i, r in enumerate([3, 7, 1]):
        k = int(indptr[r + 1] - indptr[r])
        assert nnz[i] == k and rows_out[i] == r
        np.testing.assert_array_equal(cols[i, :k],
                                      indices[indptr[r]:indptr[r + 1]])
        assert np.all(cols[i, k:] == n)
        assert np.all(vals[i, k:] == 0.0)
    assert np.all(rows_out[3:] == m)
    assert np.all(nnz[3:] == 0)


def test_materialize_chunk_rejects_overflow():
    indptr = np.array([0, 20], np.int64)
    indices = np.zeros(20, np.int32)
    data = np.zeros(20, np.float32)
    with pytest.raises(ValueError):
        native.materialize_chunk(indptr, indices, data,
                                 np.array([0], np.int32), width=8,
                                 pad_col=5, pad_row=1, num_rows=1)


def test_expand_indptr_and_sum_squares():
    indptr = np.array([0, 2, 2, 5], np.int64)
    rows = native.expand_indptr(indptr, 5)
    np.testing.assert_array_equal(rows, [0, 0, 2, 2, 2])
    x = np.array([1.5, -2.0, 3.0], np.float32)
    assert native.sum_squares(x) == pytest.approx(1.5**2 + 4 + 9)


class TestSynthGenerator:
    """Native synthetic-workload generator (the hugewiki-scale path of
    data/synthetic.py)."""

    def _gen(self, m=900, n=700, nnz=30_000, nnz_test=3_000, seed=11):
        from cumf_als_tpu.data.synthetic import _native_synthetic
        rng = np.random.RandomState(seed)
        u = rng.standard_normal((m, 6)).astype(np.float32) / np.sqrt(6)
        v = rng.standard_normal((n, 6)).astype(np.float32)
        return _native_synthetic(m, n, nnz, nnz_test, u, v, 0.2,
                                 0.5, 0.4, 1.0, 5.0, seed, rng)

    def test_csr_invariants_and_split(self):
        train, test = self._gen()
        m, n = train.num_rows, train.num_cols
        assert train.indptr[0] == 0 and train.indptr[-1] == train.nnz
        lens = np.diff(train.indptr)
        # per-row columns strictly increasing (sorted, deduped)
        for r in np.nonzero(lens > 1)[0][:50]:
            seg = train.indices[train.indptr[r]:train.indptr[r + 1]]
            assert (np.diff(seg) > 0).all()
        # ratings in range, rounded to halves
        assert train.data.min() >= 1.0 and train.data.max() <= 5.0
        assert np.allclose(train.data * 2, np.round(train.data * 2))
        # train/test keys disjoint (a pair never appears in both)
        keys_train = (np.repeat(np.arange(m, dtype=np.int64), lens) * n
                      + train.indices)
        keys_test = test.row.astype(np.int64) * n + test.col
        allk = np.concatenate([keys_train, keys_test])
        assert np.unique(allk).size == allk.size
        # achieved counts near the request (hash-threshold split)
        assert train.nnz + test.nnz >= 0.95 * 33_000
        assert abs(test.nnz - 3_000) < 600

    def test_deterministic(self):
        a_train, a_test = self._gen()
        b_train, b_test = self._gen()
        np.testing.assert_array_equal(a_train.indices, b_train.indices)
        np.testing.assert_allclose(a_train.data, b_train.data)
        np.testing.assert_array_equal(a_test.col, b_test.col)

    @pytest.mark.slow  # ~19s CPU e2e on generated data
    def test_als_converges_on_native_data(self):
        from cumf_als_tpu.config import ALSConfig
        from cumf_als_tpu.data.synthetic import init_factors
        from cumf_als_tpu.models.als import do_als
        train, test = self._gen(m=150, n=120, nnz=6_000, nnz_test=600)
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=12,
                        lam=0.05, iters=4, verbose=False,
                        debug_timing=False, solver="cholesky",
                        train_rmse_method="direct")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        res = do_als(train, None, test, th0, x0, cfg)
        assert res.history[-1].train_rmse < res.history[0].train_rmse
        assert np.isfinite(res.history[-1].test_rmse)
