"""End-to-end ALS tests: the TPU framework's trajectory must match the
numpy golden ALS within tight tolerance (the RMSE-within-1e-3 contract,
SURVEY §7 "numerics parity"), and converge on planted low-rank data."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import ALS, do_als
from cumf_als_tpu.models.reference_numpy import numpy_als
from cumf_als_tpu.utils.io import transpose_csr


def _cfg(train, iters=4, **kw):
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                iters=iters, verbose=False, debug_timing=False,
                chunk_nnz=1 << 12)
    base.update(kw)
    return ALSConfig(**base)


class TestTrajectoryParity:
    @pytest.mark.parametrize("solver", ["cholesky", "lu"])
    def test_exact_solvers_match_numpy_oracle(self, medium_problem, solver):
        train, test = medium_problem
        cfg = _cfg(train, solver=solver)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        res = do_als(train, None, test, th0, x0, cfg)
        _, _, ref_hist = numpy_als(train, test, x0, th0, cfg.lam, cfg.iters)
        for got, (rt, re) in zip(res.history, ref_hist):
            assert got.train_rmse == pytest.approx(rt, abs=1e-3)
            assert got.test_rmse == pytest.approx(re, abs=1e-3)

    def test_cg_matches_oracle_loosely(self, medium_problem):
        # CG-6 with tol 1e-4 (reference semantics) tracks the exact solve
        # closely on these well-conditioned Grams.
        train, test = medium_problem
        cfg = _cfg(train, solver="cg")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        res = do_als(train, None, test, th0, x0, cfg)
        _, _, ref_hist = numpy_als(train, test, x0, th0, cfg.lam, cfg.iters)
        assert res.history[-1].train_rmse == pytest.approx(
            ref_hist[-1][0], abs=2e-3)
        assert res.history[-1].test_rmse == pytest.approx(
            ref_hist[-1][1], abs=5e-3)

    def test_fused_train_rmse_matches_direct(self, medium_problem):
        train, test = medium_problem
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=2)
        res_d = do_als(train, None, test, th0, x0,
                       _cfg(train, train_rmse_method="direct"))
        res_f = do_als(train, None, test, th0, x0,
                       _cfg(train, train_rmse_method="fused"))
        for a, b in zip(res_d.history, res_f.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-3)


class TestConvergence:
    def test_rmse_decreases_and_beats_noise(self, medium_problem):
        train, test = medium_problem
        cfg = _cfg(train, iters=6, solver="cholesky")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        res = do_als(train, None, test, th0, x0, cfg)
        tr = [h.train_rmse for h in res.history]
        assert tr == sorted(tr, reverse=True) or tr[-1] < tr[0] * 0.5
        assert tr[-1] < 0.4   # planted noise was 0.1 + rounding
        assert res.history[-1].test_rmse < 1.0

    def test_empty_rows_get_zero_factors(self):
        from cumf_als_tpu.utils.io import COOMatrix, coo_to_csr
        # rows 3 and 7 of m=10 have no ratings; cols 5+ of n=8 empty
        rows = np.array([0, 0, 1, 2, 4, 5, 6, 8, 9, 1], np.int32)
        cols = np.array([0, 1, 2, 3, 4, 0, 1, 2, 3, 4], np.int32)
        vals = np.linspace(1, 5, 10).astype(np.float32)
        train = coo_to_csr(COOMatrix(row=rows, col=cols, data=vals,
                                     num_rows=10, num_cols=8))
        test = COOMatrix(row=np.array([3], np.int32),
                         col=np.array([7], np.int32),
                         data=np.array([2.5], np.float32),
                         num_rows=10, num_cols=8)
        cfg = _cfg(train, iters=2, f=8, solver="cg")
        x0, th0 = init_factors(10, 8, 8, seed=0)
        res = do_als(train, None, test, th0, x0, cfg)
        np.testing.assert_allclose(res.x[3], 0.0)
        np.testing.assert_allclose(res.x[7], 0.0)
        np.testing.assert_allclose(res.theta[5:], 0.0)
        # SURPASS_NAN-intended semantics: prediction 0 => test RMSE = |r|
        assert res.history[-1].test_rmse == pytest.approx(2.5, abs=1e-5)

    @pytest.mark.parametrize("f", [10, 200])
    def test_f_extremes(self, small_problem, f):
        """Generic-F support (the get_hermitianT10 analog): small F pads
        to one lane tile, F>128 spans multiple (f_pad=256)."""
        train, test = small_problem
        cfg = _cfg(train, iters=2, f=f, solver="cg")
        x0, th0 = init_factors(cfg.m, cfg.n, f, seed=0)
        res = do_als(train, None, test, th0, x0, cfg)
        assert cfg.f_pad == (128 if f <= 128 else 256)
        assert res.x.shape == (cfg.m, f)
        # tiny overparameterized problems wiggle at the CG-6 tolerance;
        # require a sane fit, not strict monotonicity
        assert res.history[-1].train_rmse < 0.5
        assert np.isfinite(res.history[-1].test_rmse)

    def test_nonfinite_guard(self, small_problem):
        train, test = small_problem
        cfg = _cfg(train, iters=1, lam=float("nan"))
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        with pytest.raises(FloatingPointError):
            do_als(train, None, test, th0, x0, cfg)


class TestCheckpoint:
    def test_checkpoint_resume_identical(self, small_problem, tmp_path):
        train, test = small_problem
        cfg = _cfg(train, iters=4, solver="cholesky",
                   checkpoint_dir=str(tmp_path), checkpoint_every=1)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        full = do_als(train, None, test, th0, x0, cfg)
        # resume from iteration 1's checkpoint and rerun 2..3
        from cumf_als_tpu.utils.checkpoint import load_checkpoint
        x1, th1, it = load_checkpoint(str(tmp_path), 1, cfg=cfg)
        model = ALS(cfg, train, None, test)
        rest = model.run(x1, th1, start_iter=it + 1)
        np.testing.assert_allclose(rest.x, full.x, rtol=1e-5, atol=1e-6)
        assert rest.history[-1].test_rmse == pytest.approx(
            full.history[-1].test_rmse, abs=1e-6)


class TestShippedConfiguration:
    """Oracle parity at the configuration the benchmarks actually ship:
    f=100 (padded to 128 lanes), bf16 factors, panel-path gathers,
    fused phases (backend='pallas' falls back to XLA per-op where
    Mosaic is unavailable — on CPU this exercises the identical panel
    orchestration)."""

    def test_f100_bf16_panel_fused_matches_oracle(self, medium_problem):
        train, test = medium_problem
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=100,
                        lam=0.05, iters=3, verbose=False,
                        debug_timing=False, chunk_nnz=1 << 12,
                        factor_dtype="bf16", backend="pallas",
                        use_panels="auto", panel_size=64,
                        fuse_phase=True, train_rmse_method="fused",
                        solver="cg")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        model = ALS(cfg, train, None, test)
        # the X phase must actually take the panel path (n=220 > 64+8)
        from cumf_als_tpu.ops.tiling import PanelPlan
        assert isinstance(model.plan_x[0], PanelPlan)
        res = model.run(x0, th0)
        _, _, ref_hist = numpy_als(train, test, x0, th0, cfg.lam,
                                   cfg.iters)
        # bf16 factors move the trajectory by O(1e-3) (the
        # CUMF_USE_HALF ablation, docs/PERFORMANCE.md)
        assert res.history[-1].train_rmse == pytest.approx(
            ref_hist[-1][0], abs=5e-3)
        assert res.history[-1].test_rmse == pytest.approx(
            ref_hist[-1][1], abs=1e-2)

    def test_f100_gram_bf16_close_to_f32(self, medium_problem):
        train, test = medium_problem
        base = dict(m=train.num_rows, n=train.num_cols, f=100, lam=0.05,
                    iters=3, verbose=False, debug_timing=False,
                    chunk_nnz=1 << 12, use_panels="auto", panel_size=64,
                    train_rmse_method="fused", solver="cg")
        x0, th0 = init_factors(train.num_rows, train.num_cols, 100,
                               seed=1)
        r32 = ALS(ALSConfig(**base), train, None, test).run(x0, th0)
        rbf = ALS(ALSConfig(gram_dtype="bf16", **base), train, None,
                  test).run(x0, th0)
        # CUMF_TT_FP16 analog: bf16 Gram accumulators stay within the
        # reference's half-precision accuracy envelope
        assert rbf.history[-1].test_rmse == pytest.approx(
            r32.history[-1].test_rmse, abs=2e-2)


class TestVmemBackoffInRunLoop:
    def test_oom_on_first_phase_dispatch_retries_and_matches(
            self, medium_problem, monkeypatch):
        """A compile-time scoped-VMEM OOM raised from the first phase
        dispatch must shrink the kernel sizing budget and retry, yielding
        the same trajectory as an undisturbed run (the OOM fires before
        any donated buffer is consumed)."""
        import cumf_als_tpu.ops.pallas_solve as ps
        train, test = medium_problem
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=2)
        ref = do_als(train, None, test, th0, x0, _cfg(train, iters=2))

        budget0 = ps._VMEM_BUDGET
        orig = ALS._update_phase
        state = {"raised": False}

        def flaky(self, *a, **kw):
            if not state["raised"]:
                state["raised"] = True
                raise RuntimeError(
                    "INTERNAL: Ran out of memory in memory space vmem "
                    "while allocating on stack for %fused_gram_cg")
            return orig(self, *a, **kw)

        monkeypatch.setattr(ALS, "_update_phase", flaky)
        try:
            res = do_als(train, None, test, th0, x0, _cfg(train, iters=2))
        finally:
            ps._VMEM_BUDGET = budget0
        assert state["raised"]
        for a, b in zip(ref.history, res.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-6)
            assert a.test_rmse == pytest.approx(b.test_rmse, rel=1e-6)
