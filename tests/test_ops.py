"""Unit tests of the Gram/solve/RMSE ops against numpy oracles — the unit
layer the reference lacks entirely (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cumf_als_tpu.ops.gram import (dense_gram_rhs_reference, extend_table,
                                   gram_rhs)
from cumf_als_tpu.ops.rmse import fused_sq_err, rmse_direct
from cumf_als_tpu.ops.solve import solve_cg, solve_cholesky, solve_lu
from cumf_als_tpu.ops.tiling import build_update_plan


def _spd(rng, r, f, jitter=1.0):
    m = rng.standard_normal((r, f, f)).astype(np.float32)
    return np.einsum("rij,rkj->rik", m, m) / f + \
        jitter * np.eye(f, dtype=np.float32)


class TestSolvers:
    def test_cholesky_matches_numpy(self):
        rng = np.random.RandomState(0)
        a = _spd(rng, 5, 32)
        b = rng.standard_normal((5, 32)).astype(np.float32)
        x = np.asarray(solve_cholesky(jnp.asarray(a), jnp.asarray(b)))
        ref = np.stack([np.linalg.solve(a[i], b[i]) for i in range(5)])
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)

    def test_lu_matches_numpy(self):
        rng = np.random.RandomState(1)
        a = _spd(rng, 4, 16)
        b = rng.standard_normal((4, 16)).astype(np.float32)
        x = np.asarray(solve_lu(jnp.asarray(a), jnp.asarray(b)))
        ref = np.stack([np.linalg.solve(a[i], b[i]) for i in range(4)])
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)

    def test_cg_converges_to_exact(self):
        rng = np.random.RandomState(2)
        a = _spd(rng, 6, 24, jitter=2.0)
        b = rng.standard_normal((6, 24)).astype(np.float32)
        x0 = np.zeros_like(b)
        x = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(x0), cg_iters=60, cg_tol=1e-12))
        ref = np.stack([np.linalg.solve(a[i], b[i]) for i in range(6)])
        np.testing.assert_allclose(x, ref, rtol=1e-3, atol=1e-3)

    def test_cg_warm_start_at_solution_stays(self):
        rng = np.random.RandomState(3)
        a = _spd(rng, 3, 16, jitter=2.0)
        ref = rng.standard_normal((3, 16)).astype(np.float32)
        b = np.einsum("rij,rj->ri", a, ref)
        x = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(ref), cg_iters=6))
        np.testing.assert_allclose(x, ref, rtol=1e-4, atol=1e-4)

    def test_cg_zero_system_returns_x0(self):
        # Empty-row semantics: A=0,b=0 must return x0 (not NaN as the
        # reference kernel would, cg.cu:127 0/0).
        a = np.zeros((2, 8, 8), np.float32)
        b = np.zeros((2, 8), np.float32)
        x0 = np.full((2, 8), 7.0, np.float32)
        x = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(x0), cg_iters=6))
        assert np.all(np.isfinite(x))
        np.testing.assert_allclose(x, x0)

    def test_cg_six_iters_near_exact_on_wellconditioned(self):
        # The reference runs CG_ITER=6 on Gram matrices; verify 6 iters
        # give a good solution on a well-conditioned SPD batch.
        rng = np.random.RandomState(4)
        a = _spd(rng, 8, 32, jitter=4.0)
        ref = rng.standard_normal((8, 32)).astype(np.float32) * 0.1
        b = np.einsum("rij,rj->ri", a, ref)
        x = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                                jnp.zeros_like(jnp.asarray(b)), cg_iters=6))
        np.testing.assert_allclose(x, ref, rtol=5e-2, atol=5e-3)

    def test_cg_bf16_gram(self):
        # CUMF_TT_FP16 analog: A stored bf16, solve still converges.
        rng = np.random.RandomState(5)
        a = _spd(rng, 4, 16, jitter=4.0).astype(jnp.bfloat16)
        ref = rng.standard_normal((4, 16)).astype(np.float32) * 0.1
        b = np.einsum("rij,rj->ri", np.asarray(a, np.float32), ref)
        x = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                                jnp.zeros((4, 16), jnp.float32),
                                cg_iters=20, cg_tol=0.0))
        np.testing.assert_allclose(x, ref, rtol=0.1, atol=0.02)


class TestGram:
    def test_gram_rhs_matches_dense_reference(self, small_problem):
        train, _ = small_problem
        f = 32
        rng = np.random.RandomState(0)
        theta = rng.standard_normal((train.num_cols, f)).astype(np.float32)
        lam = 0.05
        a_ref, b_ref = dense_gram_rhs_reference(
            theta, train.indptr, train.indices, train.data, lam)
        plan = build_update_plan(train, chunk_nnz=512)
        table_ext = extend_table(jnp.asarray(theta))
        a_got = np.zeros_like(a_ref)
        b_got = np.zeros_like(b_ref)
        for ch in plan.chunks:
            a, b = gram_rhs(table_ext, jnp.asarray(ch.cols),
                            jnp.asarray(ch.vals), jnp.asarray(ch.nnz), lam)
            for r in range(ch.num_rows):
                row = int(ch.rows[r])
                if row < plan.num_rows:
                    a_got[row] = np.asarray(a[r])
                    b_got[row] = np.asarray(b[r])
        # empty rows: oracle adds +I as well, compare directly
        np.testing.assert_allclose(a_got, a_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(b_got, b_ref, rtol=1e-4, atol=1e-4)

    def test_gram_symmetry_and_spd(self, small_problem):
        train, _ = small_problem
        f = 16
        rng = np.random.RandomState(1)
        theta = rng.standard_normal((train.num_cols, f)).astype(np.float32)
        plan = build_update_plan(train)
        table_ext = extend_table(jnp.asarray(theta))
        ch = plan.chunks[0]
        a, _ = gram_rhs(table_ext, jnp.asarray(ch.cols),
                        jnp.asarray(ch.vals), jnp.asarray(ch.nnz), 0.1)
        a = np.asarray(a)
        np.testing.assert_allclose(a, np.swapaxes(a, 1, 2), atol=1e-5)
        for r in range(a.shape[0]):
            w = np.linalg.eigvalsh(a[r])
            assert w.min() > 0

    def test_gram_bf16_factor_dtype_close(self, small_problem):
        train, _ = small_problem
        f = 16
        rng = np.random.RandomState(2)
        theta = rng.standard_normal((train.num_cols, f)).astype(np.float32)
        plan = build_update_plan(train)
        table_ext = extend_table(jnp.asarray(theta))
        ch = plan.chunks[-1]
        a32, b32 = gram_rhs(table_ext, jnp.asarray(ch.cols),
                            jnp.asarray(ch.vals), jnp.asarray(ch.nnz), 0.1)
        a16, b16 = gram_rhs(table_ext, jnp.asarray(ch.cols),
                            jnp.asarray(ch.vals), jnp.asarray(ch.nnz), 0.1,
                            factor_dtype="bf16")
        np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                                   rtol=0.1, atol=0.2)
        np.testing.assert_allclose(np.asarray(b16), np.asarray(b32),
                                   rtol=0.1, atol=0.2)


class TestRMSE:
    def test_rmse_direct_matches_numpy(self, small_problem):
        train, test = small_problem
        f = 8
        rng = np.random.RandomState(0)
        x = rng.standard_normal((train.num_rows, f)).astype(np.float32)
        th = rng.standard_normal((train.num_cols, f)).astype(np.float32)
        got = rmse_direct(jnp.asarray(x), jnp.asarray(th), test.row,
                          test.col, test.data, chunk=64)
        pred = np.einsum("ij,ij->i", x[test.row], th[test.col])
        ref = float(np.sqrt(np.mean((test.data - pred) ** 2)))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_fused_identity_matches_direct(self, small_problem):
        """The free train-RMSE identity must agree with the per-nonzero
        gather RMSE."""
        train, _ = small_problem
        f = 16
        lam = 0.07
        rng = np.random.RandomState(3)
        x = rng.standard_normal((train.num_rows, f)).astype(np.float32)
        # Build theta-phase Gram from x over the transpose, solve thetas
        from cumf_als_tpu.utils.io import transpose_csr
        csc = transpose_csr(train)
        plan = build_update_plan(csc)
        table_ext = extend_table(jnp.asarray(x))
        theta = np.zeros((train.num_cols, f), np.float32)
        se = 0.0
        for ch in plan.chunks:
            a, b = gram_rhs(table_ext, jnp.asarray(ch.cols),
                            jnp.asarray(ch.vals), jnp.asarray(ch.nnz), lam)
            sol = solve_cholesky(a, b)
            sol = sol * (jnp.asarray(ch.nnz) > 0)[:, None]
            se += float(fused_sq_err(a, b, jnp.asarray(ch.vals),
                                     jnp.asarray(ch.nnz), lam, sol))
            solnp = np.asarray(sol)
            for r in range(ch.num_rows):
                row = int(ch.rows[r])
                if row < plan.num_rows:
                    theta[row] = solnp[r]
        fused = np.sqrt(max(se, 0.0) / train.nnz)
        direct = rmse_direct(jnp.asarray(x), jnp.asarray(theta),
                             train.to_coo_rows(), train.indices,
                             train.data, chunk=256)
        assert fused == pytest.approx(direct, rel=1e-3)
