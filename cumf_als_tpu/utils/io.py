"""Binary sparse-matrix IO matching the reference's file contract.

The reference loads raw little-endian int32/float32 arrays with fread
(reference host_utilities.cpp:19-97) from files emitted by the data-prep
scripts (reference data/ml10M/prepare_ml10M_data.py:150-170):

    R_train_csr.{data,indptr,indices}.bin   float32 / int32 / int32
    R_train_csc.{data,indices,indptr}.bin   float32 / int32 / int32
    R_train_coo.row.bin                     int32
    R_test_coo.{data,row,col}.bin           float32 / int32 / int32

A native C++ loader (cumf_als_tpu/native) provides an mmap'd fast path;
this module is the always-available numpy fallback and the writer side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class CSRMatrix:
    """Host-side CSR (row-compressed) ratings. indptr is (num_rows+1,)."""
    indptr: np.ndarray   # int32/int64 (num_rows+1,)
    indices: np.ndarray  # int32 (nnz,)
    data: np.ndarray     # float32 (nnz,)
    num_rows: int
    num_cols: int

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    def to_coo_rows(self) -> np.ndarray:
        """Expand indptr to per-nonzero row ids (the R_train_coo.row.bin
        contract, reference main.cpp:103)."""
        return np.repeat(
            np.arange(self.num_rows, dtype=np.int32),
            np.diff(self.indptr).astype(np.int64))


@dataclass
class COOMatrix:
    row: np.ndarray   # int32 (nnz,)
    col: np.ndarray   # int32 (nnz,)
    data: np.ndarray  # float32 (nnz,)
    num_rows: int
    num_cols: int

    @property
    def nnz(self) -> int:
        return int(self.row.shape[0])


def _read(path: str, dtype, count: int = -1) -> np.ndarray:
    arr = np.fromfile(path, dtype=dtype, count=count)
    if count >= 0 and arr.shape[0] != count:
        raise IOError(
            f"{path}: expected {count} {np.dtype(dtype).name} entries, "
            f"got {arr.shape[0]}")
    return arr


def load_csr(data_dir: str, m: int, n: int, nnz: int,
             prefix: str = "R_train_csr") -> CSRMatrix:
    """Load CSR binaries (reference host_utilities.cpp:19-43)."""
    indptr = _read(os.path.join(data_dir, f"{prefix}.indptr.bin"),
                   np.int32, m + 1)
    indices = _read(os.path.join(data_dir, f"{prefix}.indices.bin"),
                    np.int32, nnz)
    data = _read(os.path.join(data_dir, f"{prefix}.data.bin"),
                 np.float32, nnz)
    return CSRMatrix(indptr=indptr, indices=indices, data=data,
                     num_rows=m, num_cols=n)


def load_csc_as_csr(data_dir: str, m: int, n: int, nnz: int,
                    prefix: str = "R_train_csc") -> CSRMatrix:
    """Load CSC binaries (reference host_utilities.cpp:45-69) as the CSR of
    the transpose: rows are the original columns. The theta update consumes
    R^T in row-compressed form, mirroring the reference's mirrored-argument
    reuse of its Gram kernel (reference als.cu:918-919)."""
    indptr = _read(os.path.join(data_dir, f"{prefix}.indptr.bin"),
                   np.int32, n + 1)
    indices = _read(os.path.join(data_dir, f"{prefix}.indices.bin"),
                    np.int32, nnz)
    data = _read(os.path.join(data_dir, f"{prefix}.data.bin"),
                 np.float32, nnz)
    return CSRMatrix(indptr=indptr, indices=indices, data=data,
                     num_rows=n, num_cols=m)


def load_test_coo(data_dir: str, m: int, n: int, nnz_test: int) -> COOMatrix:
    """Load the test COO binaries (reference host_utilities.cpp:71-89,
    main.cpp:91-93)."""
    data = _read(os.path.join(data_dir, "R_test_coo.data.bin"),
                 np.float32, nnz_test)
    row = _read(os.path.join(data_dir, "R_test_coo.row.bin"),
                np.int32, nnz_test)
    col = _read(os.path.join(data_dir, "R_test_coo.col.bin"),
                np.int32, nnz_test)
    return COOMatrix(row=row, col=col, data=data, num_rows=m, num_cols=n)


def write_dataset(data_dir: str, train_csr: CSRMatrix,
                  test_coo: COOMatrix) -> None:
    """Emit the full binary contract for a dataset directory, exactly the
    files the reference's prepare scripts produce
    (reference data/ml10M/prepare_ml10M_data.py:96-170)."""
    os.makedirs(data_dir, exist_ok=True)

    def out(name, arr, dtype):
        np.ascontiguousarray(arr, dtype=dtype).tofile(
            os.path.join(data_dir, name))

    # train CSR
    out("R_train_csr.data.bin", train_csr.data, np.float32)
    out("R_train_csr.indptr.bin", train_csr.indptr, np.int32)
    out("R_train_csr.indices.bin", train_csr.indices, np.int32)
    # train CSC (transpose of CSR, column-sorted)
    csc = transpose_csr(train_csr)
    out("R_train_csc.data.bin", csc.data, np.float32)
    out("R_train_csc.indptr.bin", csc.indptr, np.int32)
    out("R_train_csc.indices.bin", csc.indices, np.int32)
    # train COO rows
    out("R_train_coo.row.bin", train_csr.to_coo_rows(), np.int32)
    # test COO
    out("R_test_coo.data.bin", test_coo.data, np.float32)
    out("R_test_coo.row.bin", test_coo.row, np.int32)
    out("R_test_coo.col.bin", test_coo.col, np.int32)


def transpose_csr(csr: CSRMatrix) -> CSRMatrix:
    """CSR -> CSR of the transpose (i.e. the CSC arrays of the original),
    with int64-safe counting for hugewiki-scale nnz (the reference is
    careful about the same overflow, hugewiki.cu:2299). Uses the native
    C++ counting-sort when libdataplane.so is built (one pass, no argsort
    — the scalable path for 1e9+ nnz)."""
    n = csr.num_cols
    from cumf_als_tpu import native
    if native.available():
        indptr, indices, data = native.csr_transpose(
            csr.num_rows, n, np.asarray(csr.indptr, np.int64),
            csr.indices, csr.data)
        out_dtype = np.int32 if csr.nnz < 2**31 else np.int64
        return CSRMatrix(indptr=indptr.astype(out_dtype), indices=indices,
                         data=data, num_rows=n, num_cols=csr.num_rows)
    counts = np.bincount(csr.indices, minlength=n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    order = np.argsort(csr.indices, kind="stable")
    rows = csr.to_coo_rows()
    out_dtype = np.int32 if csr.nnz < 2**31 else np.int64
    return CSRMatrix(
        indptr=indptr.astype(out_dtype),
        indices=rows[order].astype(np.int32),
        data=csr.data[order],
        num_rows=n,
        num_cols=csr.num_rows,
    )


def coo_to_csr(coo: COOMatrix) -> CSRMatrix:
    """COO -> CSR with column indices sorted within each row, matching
    scipy's tocsr output used by the prep scripts. Native two-pass
    counting sort when libdataplane.so is built.

    Duplicate (row, col) entries are kept as-is (scipy sums them on
    conversion); the reference's prep scripts assert exact nnz so real
    datasets never carry duplicates (prepare_ml10M_data.py:96)."""
    m = coo.num_rows
    from cumf_als_tpu import native
    if native.available():
        indptr, indices, data = native.coo_to_csr(
            m, coo.num_cols, coo.row, coo.col, coo.data)
        out_dtype = np.int32 if coo.nnz < 2**31 else np.int64
        return CSRMatrix(indptr=indptr.astype(out_dtype), indices=indices,
                         data=data, num_rows=m, num_cols=coo.num_cols)
    counts = np.bincount(coo.row, minlength=m).astype(np.int64)
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    order = np.lexsort((coo.col, coo.row))
    out_dtype = np.int32 if coo.nnz < 2**31 else np.int64
    return CSRMatrix(
        indptr=indptr.astype(out_dtype),
        indices=coo.col[order].astype(np.int32),
        data=coo.data[order].astype(np.float32),
        num_rows=m,
        num_cols=coo.num_cols,
    )
