"""Batched f x f SPD solvers: the cuBLAS-LU / custom-CG replacements.

The reference offers (a) cublasSgetrfBatched **without pivoting** +
cublasSgetrsBatched (reference als.cu:58-122) and (b) a hand-written
one-block-per-system CG kernel with warm start, fixed iteration count and
absolute early exit rsnew < 1e-4 (reference cg.cu:36-231; CG_ERROR
cg.cu:31, CG_ITER=6 als.cu:32). On TPU:

  - "cholesky": batched Cholesky + two triangular solves. The Gram
    matrices are SPD by construction, so Cholesky strictly dominates the
    reference's unpivoted LU in both stability and flops.
  - "lu": jnp.linalg.solve, kept for solver-parity A/B testing.
  - "cg": a lax.fori_loop over batched MXU/VPU einsums reproducing the
    reference's exact update order (x is updated with the final alpha
    *before* the tolerance check) with per-system early-exit masking in
    place of the per-block `break`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def solve_cholesky(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve via Cholesky. a: (R, f, f) f32, b: (R, f)."""
    l = jnp.linalg.cholesky(a.astype(jnp.float32))
    y = jax.lax.linalg.triangular_solve(
        l, b[..., None], left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        l, y, left_side=True, lower=True, transpose_a=True)
    return x[..., 0]


@jax.jit
def solve_lu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched general solve (pivoted LU — unlike reference als.cu:77,
    which passes a NULL pivot array; hugewiki.cu:2094 does pivot)."""
    return jnp.linalg.solve(a.astype(jnp.float32), b[..., None])[..., 0]


@partial(jax.jit, static_argnames=("cg_iters",))
def solve_cg(a: jnp.ndarray, b: jnp.ndarray, x0: jnp.ndarray,
             cg_iters: int = 6, cg_tol: float = 1e-4) -> jnp.ndarray:
    """Batched conjugate gradient mirroring reference cg.cu:36-231.

    a: (R, f, f) f32 or bf16 (the CUMF_TT_FP16 analog feeds bf16 A);
    b, x0: (R, f) f32. Warm-started from x0 exactly like the reference
    (cg.cu:48 loads the current factor). Early exit is per-system: a
    system whose rsnew drops below cg_tol is frozen, matching the
    reference's `if(rsnew[0]<CG_ERROR) break` (cg.cu:195) which also
    takes effect *after* x was updated with that iteration's alpha.
    Divisions are guarded so zero systems (empty rows) return x0 instead
    of the reference's NaN.
    """
    f32 = jnp.float32
    av = a.astype(a.dtype)  # matvec in storage dtype, accumulate f32

    # HIGHEST: default matmul precision is bf16 on TPU (and mirrored on
    # CPU); CG matvecs on an f32 Gram must run at f32 or convergence and
    # trajectory parity degrade. When A is stored bf16 (CUMF_TT_FP16
    # analog) the inputs are bf16 and this costs nothing extra.
    prec = jax.lax.Precision.HIGHEST

    def matvec(p):
        return jnp.einsum("rfg,rg->rf", av, p.astype(a.dtype),
                          precision=prec, preferred_element_type=f32)

    x = x0.astype(f32)
    r = b.astype(f32) - matvec(x)
    p = r
    rsold = jnp.sum(r * r, axis=-1)
    active = jnp.ones_like(rsold, dtype=bool)

    def body(_, carry):
        x, r, p, rsold, active = carry
        ap = matvec(p)
        pap = jnp.sum(p * ap, axis=-1)
        safe = jnp.where(jnp.abs(pap) > 0, pap, 1.0)
        alpha = jnp.where(active & (pap != 0), rsold / safe, 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * ap
        rsnew = jnp.sum(r * r, axis=-1)
        still = active & (rsnew >= cg_tol)
        beta = jnp.where(still, rsnew / jnp.where(rsold > 0, rsold, 1.0), 0.0)
        p = jnp.where(still[:, None], r + beta[:, None] * p, p)
        rsold = jnp.where(still, rsnew, rsold)
        return x, r, p, rsold, still

    x, *_ = jax.lax.fori_loop(0, cg_iters, body,
                              (x, r, p, rsold, active))
    return x


def solve(a, b, x0, solver: str = "cg", cg_iters: int = 6,
          cg_tol: float = 1e-4, backend: str = "xla", diag=None,
          aug: bool = False):
    """backend="pallas" routes CG through the VMEM-resident kernel
    (pallas_solve.solve_cg_pallas) — A is read from HBM once instead of
    once per matvec. Falls back to the XLA loop when the kernel is
    unavailable on the local toolchain or f is not lane-aligned.

    diag: optional (R,) Tikhonov diagonal. When given, `a` is the RAW
    Gram and the regularizer is applied at solve time — in VMEM on the
    pallas path, so a bf16 A is never upcast in HBM.

    aug: `a` is the augmented accumulator carrying b in row f-1 (pass
    b=None); the pallas kernel unpacks it in VMEM, the fallback unpacks
    in XLA (one A-sized pass)."""
    if solver == "cg":
        if backend == "pallas" and a.shape[-1] % 128 == 0:
            from cumf_als_tpu.ops.pallas_solve import (cg_solve_available,
                                                       solve_cg_pallas)
            if cg_solve_available():
                return solve_cg_pallas(a, b, x0, cg_iters=cg_iters,
                                       cg_tol=cg_tol, diag=diag, aug=aug)
    if aug:
        f = a.shape[-1]
        lane = jnp.arange(f)
        af = a.astype(jnp.float32)
        b = af[:, f - 1, :] * (lane < f - 1)
        keep = (lane < f - 1).astype(jnp.float32)
        a = af * keep[None, :, None] * keep[None, None, :]
    if diag is not None:
        f = a.shape[-1]
        a = a.astype(jnp.float32) + \
            diag.astype(jnp.float32)[:, None, None] * \
            jnp.eye(f, dtype=jnp.float32)
    if solver == "cg":
        return solve_cg(a, b, x0, cg_iters=cg_iters, cg_tol=cg_tol)
    if solver == "cholesky":
        return solve_cholesky(a, b)
    if solver == "lu":
        return solve_lu(a, b)
    raise ValueError(f"unknown solver {solver!r}")
