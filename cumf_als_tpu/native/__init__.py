"""ctypes bindings for the native data plane (libdataplane.so).

Every entry point has a numpy fallback; `available()` reports whether the
shared library was found/loadable. Build with:
    make -C cumf_als_tpu/native
(or `python -m cumf_als_tpu.native.build`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdataplane.so")
_SRC_PATH = os.path.join(_DIR, "dataplane.cpp")
_lib: Optional[ctypes.CDLL] = None
_build_tried = False


def _ensure_built() -> None:
    """Compile the library on first use when missing or older than its
    source (the .so is a build artifact, never committed)."""
    global _build_tried
    if _build_tried or not os.path.exists(_SRC_PATH):
        return
    stale = (not os.path.exists(_LIB_PATH) or
             os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH))
    if stale:
        _build_tried = True
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    _ensure_built()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.csr_transpose.restype = ctypes.c_int
    lib.csr_transpose.argtypes = [ctypes.c_int64] * 3 + [
        i64p, i32p, f32p, i64p, i32p, f32p]
    lib.coo_to_csr.restype = ctypes.c_int
    lib.coo_to_csr.argtypes = [ctypes.c_int64] * 3 + [
        i32p, i32p, f32p, i64p, i32p, f32p]
    lib.materialize_chunk.restype = ctypes.c_int
    lib.materialize_chunk.argtypes = [
        i64p, i32p, f32p, i32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, i32p, i32p,
        i32p, f32p]
    lib.materialize_subrows.restype = ctypes.c_int
    lib.materialize_subrows.argtypes = [
        i32p, f32p, i64p, i32p, i32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, f32p]
    lib.expand_indptr.restype = ctypes.c_int
    lib.expand_indptr.argtypes = [ctypes.c_int64, i64p, i32p]
    lib.sum_squares.restype = ctypes.c_double
    lib.sum_squares.argtypes = [f32p, ctypes.c_int64]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.synth_sample_keys.restype = ctypes.c_int64
    lib.synth_sample_keys.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64p, f64p,
        ctypes.c_uint64, ctypes.c_int64, i64p]
    lib.synth_counts.restype = ctypes.c_int
    lib.synth_counts.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, i64p]
    lib.synth_emit.restype = ctypes.c_int
    lib.synth_emit.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f32p, f32p,
        ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, i64p, i32p,
        f32p, i32p, i32p, f32p]
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Compile libdataplane.so in place. Returns success."""
    try:
        subprocess.run(["make", "-C", _DIR],
                       check=True,
                       capture_output=quiet)
        return _load() is not None
    except Exception:
        return False


def available() -> bool:
    return _load() is not None


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def csr_transpose(m: int, n: int, indptr: np.ndarray, indices: np.ndarray,
                  data: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    nnz = indices.shape[0]
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    out_indptr = np.zeros(n + 1, np.int64)
    out_indices = np.empty(nnz, np.int32)
    out_data = np.empty(nnz, np.float32)
    rc = lib.csr_transpose(m, n, nnz, _p(indptr, ctypes.c_int64),
                           _p(indices, ctypes.c_int32),
                           _p(data, ctypes.c_float),
                           _p(out_indptr, ctypes.c_int64),
                           _p(out_indices, ctypes.c_int32),
                           _p(out_data, ctypes.c_float))
    if rc != 0:
        raise ValueError("csr_transpose: column index out of range")
    return out_indptr, out_indices, out_data


def coo_to_csr(m: int, n: int, row: np.ndarray, col: np.ndarray,
               data: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    nnz = row.shape[0]
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    out_indptr = np.zeros(m + 1, np.int64)
    out_indices = np.empty(nnz, np.int32)
    out_data = np.empty(nnz, np.float32)
    rc = lib.coo_to_csr(m, n, nnz, _p(row, ctypes.c_int32),
                        _p(col, ctypes.c_int32), _p(data, ctypes.c_float),
                        _p(out_indptr, ctypes.c_int64),
                        _p(out_indices, ctypes.c_int32),
                        _p(out_data, ctypes.c_float))
    if rc != 0:
        raise ValueError("coo_to_csr: index out of range")
    return out_indptr, out_indices, out_data


def materialize_chunk(indptr: np.ndarray, indices: np.ndarray,
                      data: np.ndarray, rows: np.ndarray, width: int,
                      pad_col: int, pad_row: int, num_rows: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
    lib = _load()
    assert lib is not None
    r = rows.shape[0]
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    rows = np.ascontiguousarray(rows, np.int32)
    rows_out = np.empty(r, np.int32)
    nnz_out = np.empty(r, np.int32)
    cols_out = np.empty((r, width), np.int32)
    vals_out = np.empty((r, width), np.float32)
    rc = lib.materialize_chunk(
        _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int32),
        _p(data, ctypes.c_float), _p(rows, ctypes.c_int32), r, width,
        pad_col, pad_row, num_rows, _p(rows_out, ctypes.c_int32),
        _p(nnz_out, ctypes.c_int32), _p(cols_out, ctypes.c_int32),
        _p(vals_out, ctypes.c_float))
    if rc != 0:
        raise ValueError("materialize_chunk: row longer than bucket width")
    return rows_out, nnz_out, cols_out, vals_out


def materialize_subrows(indices: np.ndarray, data: np.ndarray,
                        sub_off: np.ndarray, sub_len: np.ndarray,
                        sub_rows: np.ndarray, r_pad: int, width: int,
                        base: int, pad_col: int, pad_row: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    lib = _load()
    assert lib is not None
    k = sub_off.shape[0]
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    sub_off = np.ascontiguousarray(sub_off, np.int64)
    sub_len = np.ascontiguousarray(sub_len, np.int32)
    sub_rows = np.ascontiguousarray(sub_rows, np.int32)
    rows_out = np.empty(r_pad, np.int32)
    nnz_out = np.empty(r_pad, np.int32)
    cols_out = np.empty((r_pad, width), np.int32)
    vals_out = np.empty((r_pad, width), np.float32)
    rc = lib.materialize_subrows(
        _p(indices, ctypes.c_int32), _p(data, ctypes.c_float),
        _p(sub_off, ctypes.c_int64), _p(sub_len, ctypes.c_int32),
        _p(sub_rows, ctypes.c_int32), k, r_pad, width, base, pad_col,
        pad_row, _p(rows_out, ctypes.c_int32), _p(nnz_out, ctypes.c_int32),
        _p(cols_out, ctypes.c_int32), _p(vals_out, ctypes.c_float))
    if rc != 0:
        raise ValueError("materialize_subrows: subrow longer than width")
    return rows_out, nnz_out, cols_out, vals_out


def expand_indptr(indptr: np.ndarray, nnz: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    m = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    out = np.empty(nnz, np.int32)
    lib.expand_indptr(m, _p(indptr, ctypes.c_int64),
                      _p(out, ctypes.c_int32))
    return out


def sum_squares(x: np.ndarray) -> float:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    return float(lib.sum_squares(_p(x, ctypes.c_float), x.shape[0]))


def synth_sample_keys(m: int, n: int, total: int, row_w: np.ndarray,
                      col_w: np.ndarray, seed: int) -> np.ndarray:
    """Sample unique sorted flat keys r*n+c via native alias sampling.
    Returns the achieved unique keys (possibly more than `total`; thin
    with the keep-hash threshold in synth_emit)."""
    lib = _load()
    assert lib is not None
    row_w = np.ascontiguousarray(row_w, np.float64)
    col_w = np.ascontiguousarray(col_w, np.float64)
    cap = total + total // 8 + 64
    keys = np.empty(cap, np.int64)
    k = lib.synth_sample_keys(m, n, total, _p(row_w, ctypes.c_double),
                              _p(col_w, ctypes.c_double),
                              ctypes.c_uint64(seed & (2**64 - 1)), cap,
                              _p(keys, ctypes.c_int64))
    if k < 0:
        raise ValueError("synth_sample_keys: capacity too small")
    return keys[:k]


def synth_split_emit(keys: np.ndarray, m: int, n: int, u: np.ndarray,
                     v: np.ndarray, noise: float, lo: float, hi: float,
                     seed: int, total: int, test_frac: float):
    """Planted-model ratings + hash train/test split + CSR/COO emit in
    one native pass. Returns (indptr, cols, vals, trow, tcol, tvals)."""
    lib = _load()
    assert lib is not None
    k = keys.shape[0]
    keep_t = min(1.0, total / max(1, k))
    test_t = min(1.0, test_frac)
    keep_u = ctypes.c_uint64(min(int(keep_t * 2.0**64), 2**64 - 1))
    test_u = ctypes.c_uint64(min(int(test_t * 2.0**64), 2**64 - 1))
    seed_u = ctypes.c_uint64(seed & (2**64 - 1))
    counts = np.zeros(2, np.int64)
    lib.synth_counts(_p(keys, ctypes.c_int64), k, seed_u, keep_u, test_u,
                     _p(counts, ctypes.c_int64))
    n_train, n_test = int(counts[0]), int(counts[1])
    u = np.ascontiguousarray(u, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    indptr = np.zeros(m + 1, np.int64)
    cols = np.empty(n_train, np.int32)
    vals = np.empty(n_train, np.float32)
    trow = np.empty(n_test, np.int32)
    tcol = np.empty(n_test, np.int32)
    tvals = np.empty(n_test, np.float32)
    rc = lib.synth_emit(
        _p(keys, ctypes.c_int64), k, m, n, _p(u, ctypes.c_float),
        _p(v, ctypes.c_float), u.shape[1], ctypes.c_float(noise),
        ctypes.c_float(lo), ctypes.c_float(hi), seed_u, keep_u, test_u,
        _p(indptr, ctypes.c_int64), _p(cols, ctypes.c_int32),
        _p(vals, ctypes.c_float), _p(trow, ctypes.c_int32),
        _p(tcol, ctypes.c_int32), _p(tvals, ctypes.c_float))
    if rc != 0:
        raise ValueError("synth_emit failed")
    return indptr, cols, vals, trow, tcol, tvals
