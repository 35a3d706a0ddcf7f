"""Gram-matrix + RHS formation: the TPU-native get_hermitian kernels.

The reference forms per-row Gram matrices A_i = sum_{j in R_i} theta_j
theta_j^T + nnz_i*lambda*I with hand register-tiled CUDA kernels
(get_hermitian100, reference als.cu:443-569; get_hermitianT10,
als.cu:575-659) and computes the RHS separately with cusparseScsrmm2
(als.cu:750-752). On TPU both collapse into one bucketed
gather + batched MXU contraction:

    G = theta[cols]                       (R, P, f)   gather
    A = einsum('rpf,rpg->rfg', G, G)      (R, f, f)   MXU batched matmul
    b = einsum('rp,rpf->rf', vals, G)     (R, f)      fused RHS

The 10x10 register tiling disappears: the MXU's 128x128 systolic tile is
the tile, and XLA fuses the regularizer add. Fusing the RHS into the same
gather is the structural win the reference wanted but could not get on GPU
(the fused kernel was abandoned for register pressure, reference
als.cu:809-812, cg.cu:726).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # ~fp32 MXU (6-pass)
    "high": jax.lax.Precision.HIGH,        # bf16x3
    "default": jax.lax.Precision.DEFAULT,  # 1-pass bf16
}


def extend_table(table: jnp.ndarray) -> jnp.ndarray:
    """Append one zero row so padded gather indices (== num_rows) read
    zeros and contribute nothing to A or b."""
    return jnp.concatenate(
        [table, jnp.zeros((1, table.shape[1]), table.dtype)], axis=0)


@partial(jax.jit, static_argnames=("precision", "factor_dtype", "gram_dtype"))
def gram_rhs(
    table_ext: jnp.ndarray,   # (num_cols + 1, f_pad) zero-extended factor
    cols: jnp.ndarray,        # (R, P) int32 gather indices, padded
    vals: jnp.ndarray,        # (R, P) f32 ratings, 0-padded
    nnz: jnp.ndarray,         # (R,) int32 true row lengths
    lam: float,
    precision: str = "highest",
    factor_dtype: str = "f32",
    gram_dtype: str = "f32",
):
    """Form (A, b) for one chunk of rows.

    A_r = sum_p G[r,p,:] G[r,p,:]^T + nnz_r*lam*I  (+ I on empty rows so
    the solve cleanly yields x_r = 0, the intended SURPASS_NAN semantics
    of reference als.cu:201-211). The regularizer rides the full padded
    diagonal, which keeps A SPD on the padded dims and pins their solution
    to zero.
    """
    f = table_ext.shape[1]
    # device plan arrays arrive FLAT (models.als._unflatten): 2-D
    # (R, P) arrays pad their minor dim to 128 lanes physically on TPU
    if cols.ndim == 1:
        cols = cols.reshape(nnz.shape[0], -1)
    if vals.ndim == 1:
        vals = vals.reshape(nnz.shape[0], -1)
    if factor_dtype == "bf16":                       # CUMF_USE_HALF analog
        # cast the table, not the gathered copy: the gather then moves
        # half the bytes (cheap one-pass cast of the small factor)
        table_ext = table_ext.astype(jnp.bfloat16)
    g = jnp.take(table_ext, cols, axis=0)           # (R, P, f)
    prec = _PRECISIONS[precision]
    a = jnp.einsum("rpf,rpg->rfg", g, g, precision=prec,
                   preferred_element_type=jnp.float32)
    b = jnp.einsum("rp,rpf->rf", vals, g.astype(jnp.float32),
                   precision=prec, preferred_element_type=jnp.float32)
    nnzf = nnz.astype(jnp.float32)
    diag = nnzf * lam + (nnzf == 0)
    a = a + diag[:, None, None] * jnp.eye(f, dtype=jnp.float32)
    if gram_dtype == "bf16":                         # CUMF_TT_FP16 analog
        a = a.astype(jnp.bfloat16)
    return a, b


def dense_gram_rhs_reference(theta, csr_indptr, csr_indices, csr_data, lam):
    """Slow numpy oracle used by unit tests: literal per-row Gram/RHS."""
    import numpy as np
    m = len(csr_indptr) - 1
    f = theta.shape[1]
    a = np.zeros((m, f, f), np.float32)
    b = np.zeros((m, f), np.float32)
    for i in range(m):
        lo, hi = int(csr_indptr[i]), int(csr_indptr[i + 1])
        t = np.asarray(theta[csr_indices[lo:hi]], np.float32)
        r = np.asarray(csr_data[lo:hi], np.float32)
        a[i] = t.T @ t + (hi - lo) * lam * np.eye(f, dtype=np.float32)
        if hi == lo:
            a[i] += np.eye(f, dtype=np.float32)
        b[i] = t.T @ r
    return a, b
