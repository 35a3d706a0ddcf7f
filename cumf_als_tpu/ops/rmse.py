"""RMSE evaluation: the TPU-native replacement of the reference RMSE kernel.

The reference launches one thread per nonzero, computes
e = r_ij - theta_j . x_i and atomicAdds e^2 into a 1000-slot buffer summed
by cublasSasum (reference als.cu:191-219, 962-1020). Here each chunk of
nonzeros is a pair of gathers plus a fused dot/reduce; the 1000-slot
atomic binning and the test-grid off-by-one (als.cu:968, 1006) are
reference implementation artifacts, not math, and are not reproduced
(SURVEY §7: replicate the intended math).

SURPASS_NAN semantics (als.cu:201-211): entries whose row/col had no
training ratings contribute e = r (prediction 0). Our framework zeroes
empty-row factors, which reproduces that exactly without NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _sq_err_chunk(x, theta, rows, cols, vals, weight):
    xg = jnp.take(x, rows, axis=0)
    tg = jnp.take(theta, cols, axis=0)
    pred = jnp.sum(xg.astype(jnp.float32) * tg.astype(jnp.float32), axis=-1)
    e = (vals - pred) * weight
    return jnp.sum(e * e, dtype=jnp.float32)


def rmse_direct(x, theta, rows, cols, vals, chunk: int = 1 << 21) -> float:
    """sqrt(mean(e^2)) over the given COO entries, chunked so the factor
    gathers stay within a bounded transient footprint. rows/cols/vals are
    host numpy arrays; x/theta live on device. Per-chunk partial sums stay
    on device (a float() per chunk would force a blocking sync and stall
    the dispatch pipeline); one scalar comes back at the end."""
    nnz = int(vals.shape[0])
    if nnz == 0:
        return 0.0
    parts = []
    ones = np.ones(chunk, np.float32)
    for lo in range(0, nnz, chunk):
        hi = min(lo + chunk, nnz)
        if hi - lo == chunk:
            r, c, v, w = rows[lo:hi], cols[lo:hi], vals[lo:hi], ones
        else:
            # Pad the ragged tail to the chunk shape; padded entries are
            # masked out by zero weight.
            pad = chunk - (hi - lo)
            r = np.concatenate([rows[lo:hi], np.zeros(pad, rows.dtype)])
            c = np.concatenate([cols[lo:hi], np.zeros(pad, cols.dtype)])
            v = np.concatenate([vals[lo:hi], np.zeros(pad, vals.dtype)])
            w = np.concatenate([ones[:hi - lo], np.zeros(pad, np.float32)])
        parts.append(_sq_err_chunk(x, theta, jnp.asarray(r),
                                   jnp.asarray(c), jnp.asarray(v),
                                   jnp.asarray(w)))
    total = float(jnp.sum(jnp.stack(parts))) if len(parts) > 1 \
        else float(parts[0])
    return float(np.sqrt(total / nnz))


@jax.jit
def fused_sq_err(a, b, vals, nnz, lam, x_new):
    """Per-chunk squared error from the free train-RMSE identity.

    With A_j, b_j the theta-phase Gram/RHS (formed from the *new* X) and
    theta_j the freshly solved factors, per row j:
        se_j = sum_i r_ij^2 - 2 theta_j.b_j
               + theta_j^T (A_j - nnz_j lam I - empty_j I) theta_j
    and sum_j se_j = sum_ij e_ij^2 exactly. Train RMSE then costs
    O(rows * f^2) on quantities the update already materialized, instead
    of a 2*NNZ*f-byte re-gather. The identity is evaluated *per row* so
    f32 cancellation error scales with per-row magnitudes (~1e-6 of
    sum r^2 total), not with the global sums.
    """
    xt = x_new.astype(jnp.float32)
    v32 = vals.astype(jnp.float32)   # vals may arrive bf16 (compact plans)
    r2 = jnp.sum(v32 * v32, axis=-1)                         # (R,)
    cross = jnp.sum(xt * b, axis=-1)                         # (R,)
    aq = jnp.einsum("rfg,rg->rf", a.astype(jnp.float32), xt,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    quad = jnp.sum(xt * aq, axis=-1)                         # (R,)
    nnzf = nnz.astype(jnp.float32)
    diag = nnzf * lam + (nnzf == 0)
    reg = diag * jnp.sum(xt * xt, axis=-1)
    se_row = r2 - 2.0 * cross + quad - reg
    return jnp.sum(jnp.maximum(se_row, 0.0))
