// Native data plane for cumf_als_tpu.
//
// The reference keeps its host-side runtime in C++ (binary loaders,
// reference host_utilities.cpp:19-97; pinned-memory staging, main.cpp:50-69).
// The TPU framework's host runtime work is different — the expensive parts
// are the CSR<->CSC transpose at hugewiki-scale nnz (int64-safe counting
// sort; the reference worries about the same overflow, hugewiki.cu:2299)
// and materializing padded bucket chunks (the layout consumed by the MXU
// Gram kernels). Both are implemented here, cache-friendly and bound via
// ctypes (no pybind11 in this image).
//
// Build: make -C cumf_als_tpu/native   (produces libdataplane.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// CSR -> CSR-of-transpose (i.e. CSC arrays of the original matrix).
// indptr_in: (m+1) int64, indices_in: (nnz) int32, data_in: (nnz) float.
// Outputs: indptr_out (n+1) int64, indices_out (nnz) int32 (row ids),
// data_out (nnz) float, with column-major (row-id-sorted) order inside
// each output row, matching scipy's .T.tocsr().sort_indices().
int csr_transpose(int64_t m, int64_t n, int64_t nnz,
                  const int64_t* indptr_in, const int32_t* indices_in,
                  const float* data_in, int64_t* indptr_out,
                  int32_t* indices_out, float* data_out) {
  std::vector<int64_t> count(n + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    int32_t c = indices_in[k];
    if (c < 0 || c >= n) return -1;
    ++count[c + 1];
  }
  indptr_out[0] = 0;
  for (int64_t c = 0; c < n; ++c) indptr_out[c + 1] = indptr_out[c] + count[c + 1];
  std::vector<int64_t> cursor(indptr_out, indptr_out + n);
  // walk rows in order: within each output row, source rows appear sorted
  for (int64_t r = 0; r < m; ++r) {
    for (int64_t k = indptr_in[r]; k < indptr_in[r + 1]; ++k) {
      int32_t c = indices_in[k];
      int64_t dst = cursor[c]++;
      indices_out[dst] = static_cast<int32_t>(r);
      data_out[dst] = data_in[k];
    }
  }
  return 0;
}

// COO -> CSR with per-row column-sorted order (two-pass counting sort by
// row, then an in-row sort by column via a second counting pass is not
// needed if we sort keys; we do a stable two-key counting sort:
// first by col, then by row).
int coo_to_csr(int64_t m, int64_t n, int64_t nnz, const int32_t* row,
               const int32_t* col, const float* data, int64_t* indptr_out,
               int32_t* indices_out, float* data_out) {
  // pass 1: stable counting sort by column into scratch
  std::vector<int64_t> ccount(n + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    if (col[k] < 0 || col[k] >= n || row[k] < 0 || row[k] >= m) return -1;
    ++ccount[col[k] + 1];
  }
  for (int64_t c = 0; c < n; ++c) ccount[c + 1] += ccount[c];
  std::vector<int32_t> srow(nnz), scol(nnz);
  std::vector<float> sdat(nnz);
  {
    std::vector<int64_t> cur(ccount.begin(), ccount.end() - 1);
    for (int64_t k = 0; k < nnz; ++k) {
      int64_t dst = cur[col[k]]++;
      srow[dst] = row[k];
      scol[dst] = col[k];
      sdat[dst] = data[k];
    }
  }
  // pass 2: stable counting sort by row -> final (row-major, col-sorted)
  std::vector<int64_t> rcount(m + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) ++rcount[srow[k] + 1];
  indptr_out[0] = 0;
  for (int64_t r = 0; r < m; ++r) indptr_out[r + 1] = indptr_out[r] + rcount[r + 1];
  std::vector<int64_t> cur(indptr_out, indptr_out + m);
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t dst = cur[srow[k]]++;
    indices_out[dst] = scol[k];
    data_out[dst] = sdat[k];
  }
  return 0;
}

// Materialize one padded bucket chunk (the layout of ops/tiling.py):
// for each listed row, copy its column ids / values into a (R, width)
// padded matrix; cols padded with pad_col, vals with 0.
int materialize_chunk(const int64_t* indptr, const int32_t* indices,
                      const float* data, const int32_t* rows, int64_t r,
                      int64_t width, int32_t pad_col, int32_t pad_row,
                      int64_t num_rows, int32_t* rows_out,
                      int32_t* nnz_out, int32_t* cols_out,
                      float* vals_out) {
  for (int64_t i = 0; i < r; ++i) {
    int32_t* crow = cols_out + i * width;
    float* vrow = vals_out + i * width;
    int32_t rid = rows[i];
    if (rid < 0 || rid >= num_rows) {  // dummy tail row
      rows_out[i] = pad_row;
      nnz_out[i] = 0;
      for (int64_t p = 0; p < width; ++p) crow[p] = pad_col;
      std::memset(vrow, 0, width * sizeof(float));
      continue;
    }
    int64_t lo = indptr[rid], hi = indptr[rid + 1];
    int64_t k = hi - lo;
    if (k > width) return -1;
    rows_out[i] = rid;
    nnz_out[i] = static_cast<int32_t>(k);
    std::memcpy(crow, indices + lo, k * sizeof(int32_t));
    std::memcpy(vrow, data + lo, k * sizeof(float));
    for (int64_t p = k; p < width; ++p) crow[p] = pad_col;
    std::memset(vrow + k, 0, (width - k) * sizeof(float));
  }
  return 0;
}

// Materialize one padded *panel* chunk (ops/tiling.PanelChunk layout):
// subrows are (offset, length) runs of the flat nonzero arrays; columns
// are rebased to panel-local ids (col - base). Rows beyond k are dummy
// tails. This is the hot inner loop of build_panel_plan — one linear
// pass instead of numpy fancy-indexing temporaries.
int materialize_subrows(const int32_t* indices, const float* data,
                        const int64_t* sub_off, const int32_t* sub_len,
                        const int32_t* sub_rows, int64_t k, int64_t r_pad,
                        int64_t width, int32_t base, int32_t pad_col,
                        int32_t pad_row, int32_t* rows_out,
                        int32_t* nnz_out, int32_t* cols_out,
                        float* vals_out) {
  for (int64_t i = 0; i < r_pad; ++i) {
    int32_t* crow = cols_out + i * width;
    float* vrow = vals_out + i * width;
    if (i >= k) {  // dummy tail row
      rows_out[i] = pad_row;
      nnz_out[i] = 0;
      for (int64_t p = 0; p < width; ++p) crow[p] = pad_col;
      std::memset(vrow, 0, width * sizeof(float));
      continue;
    }
    int64_t off = sub_off[i];
    int64_t len = sub_len[i];
    if (len > width) return -1;
    rows_out[i] = sub_rows[i];
    nnz_out[i] = static_cast<int32_t>(len);
    for (int64_t p = 0; p < len; ++p) crow[p] = indices[off + p] - base;
    std::memcpy(vrow, data + off, len * sizeof(float));
    for (int64_t p = len; p < width; ++p) crow[p] = pad_col;
    std::memset(vrow + len, 0, (width - len) * sizeof(float));
  }
  return 0;
}

// Expand indptr to per-nonzero row ids (R_train_coo.row contract,
// reference main.cpp:103).
int expand_indptr(int64_t m, const int64_t* indptr, int32_t* rows_out) {
  for (int64_t r = 0; r < m; ++r) {
    for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k)
      rows_out[k] = static_cast<int32_t>(r);
  }
  return 0;
}

// Squared-sum of a float array in double precision (for sum r^2).
double sum_squares(const float* x, int64_t n) {
  double acc = 0.0;
  for (int64_t k = 0; k < n; ++k) acc += static_cast<double>(x[k]) * x[k];
  return acc;
}

}  // extern "C"
