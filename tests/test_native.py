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
