"""IO tests: binary contract round-trip against scipy (the prep scripts'
source of truth, reference data/ml10M/prepare_ml10M_data.py:150-170)."""

import numpy as np
import pytest

from cumf_als_tpu.utils.io import (COOMatrix, CSRMatrix, coo_to_csr,
                                   load_csc_as_csr, load_csr,
                                   load_test_coo, transpose_csr,
                                   write_dataset)


def _random_coo(m, n, nnz, seed=0):
    rng = np.random.RandomState(seed)
    k = rng.choice(m * n, size=nnz, replace=False)
    return COOMatrix(row=(k // n).astype(np.int32),
                     col=(k % n).astype(np.int32),
                     data=rng.uniform(1, 5, nnz).astype(np.float32),
                     num_rows=m, num_cols=n)


def test_coo_csr_roundtrip_vs_scipy():
    import scipy.sparse as sp
    coo = _random_coo(37, 29, 300)
    ours = coo_to_csr(coo)
    ref = sp.coo_matrix((coo.data, (coo.row, coo.col)),
                        shape=(37, 29)).tocsr()
    np.testing.assert_array_equal(ours.indptr, ref.indptr)
    np.testing.assert_array_equal(ours.indices, ref.indices)
    np.testing.assert_allclose(ours.data, ref.data)


def test_transpose_csr_vs_scipy():
    import scipy.sparse as sp
    coo = _random_coo(23, 41, 250, seed=1)
    csr = coo_to_csr(coo)
    ours = transpose_csr(csr)
    ref = sp.csr_matrix((csr.data, csr.indices, csr.indptr),
                        shape=(23, 41)).T.tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(ours.indptr, ref.indptr)
    np.testing.assert_array_equal(ours.indices, ref.indices)
    np.testing.assert_allclose(ours.data, ref.data)


def test_write_load_dataset(tmp_path):
    coo = _random_coo(19, 17, 120, seed=2)
    csr = coo_to_csr(coo)
    test = _random_coo(19, 17, 40, seed=3)
    write_dataset(str(tmp_path), csr, test)
    # Exact reference file set (main.cpp:91-103)
    for name in ["R_train_csr.data.bin", "R_train_csr.indptr.bin",
                 "R_train_csr.indices.bin", "R_train_csc.data.bin",
                 "R_train_csc.indptr.bin", "R_train_csc.indices.bin",
                 "R_train_coo.row.bin", "R_test_coo.data.bin",
                 "R_test_coo.row.bin", "R_test_coo.col.bin"]:
        assert (tmp_path / name).exists(), name
    got = load_csr(str(tmp_path), 19, 17, csr.nnz)
    np.testing.assert_array_equal(got.indptr, csr.indptr)
    np.testing.assert_array_equal(got.indices, csr.indices)
    got_csc = load_csc_as_csr(str(tmp_path), 19, 17, csr.nnz)
    np.testing.assert_array_equal(got_csc.indptr,
                                  transpose_csr(csr).indptr)
    got_test = load_test_coo(str(tmp_path), 19, 17, 40)
    np.testing.assert_allclose(got_test.data, test.data)


def test_loader_size_check(tmp_path):
    np.zeros(10, np.int32).tofile(tmp_path / "R_test_coo.data.bin")
    np.zeros(10, np.int32).tofile(tmp_path / "R_test_coo.row.bin")
    np.zeros(10, np.int32).tofile(tmp_path / "R_test_coo.col.bin")
    with pytest.raises(IOError):
        load_test_coo(str(tmp_path), 5, 5, 999)


def test_coo_rows_expansion():
    coo = _random_coo(11, 13, 60, seed=4)
    csr = coo_to_csr(coo)
    rows = csr.to_coo_rows()
    assert rows.shape[0] == csr.nnz
    np.testing.assert_array_equal(np.sort(rows), np.sort(coo.row))
