"""Wide-F tier (128 < F <= 256): the two-block fused Gram+CG kernel
and its routing. The monolithic kernel pads F=130 to 256 lanes and
costs what F=200 costs (the r3 sweep's flat 4.4x cliff); the two-block
form restores ~F^2-ish scaling on TPU's 128-lane granule (reference
analog: get_hermitianT10's F-granular register tiling, als.cu:575-659).
Kernels run in interpreter mode on CPU (numerics; the real-chip compile
is probed by wide_available on TPU runs)."""

import numpy as np
import pytest

import cumf_als_tpu.ops.pallas_solve as ps
from cumf_als_tpu.config import ALSConfig


@pytest.fixture()
def interp(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", patched)


def _ref_solve(g, vals, nnz, lam):
    """Dense numpy oracle: per-row regularized normal equations."""
    r, p, f = g.shape
    out = np.zeros((r, f), np.float32)
    se = np.zeros((r,), np.float32)
    for i in range(r):
        gi = g[i].astype(np.float64)
        a = gi.T @ gi + (nnz[i] * lam + (nnz[i] == 0)) * np.eye(f)
        b = gi.T @ vals[i].astype(np.float64)
        x = np.linalg.solve(a, b)
        if nnz[i] == 0:
            x[:] = 0.0
        out[i] = x
        resid = vals[i] - gi @ x
        # the kernel's se identity counts padded slots' zero residuals
        se[i] = float(resid @ resid) if nnz[i] else 0.0
    return out, se


class TestWideKernel:
    @pytest.mark.parametrize("f2", [32, 96, 128])
    def test_matches_dense_oracle(self, interp, f2):
        rng = np.random.default_rng(0)
        r, p, flive = 16, 32, 128 + max(1, f2 - 7)
        g = rng.standard_normal((r, p, 256)).astype(np.float32) * 0.4
        g[:, :, flive:] = 0.0
        vals = rng.random((r, p)).astype(np.float32)
        nnz = np.full((r,), p, np.int32)
        nnz[-1] = 0  # dummy row contract
        g[-1] = 0.0
        vals[-1] = 0.0
        x1, x2, se = ps.fused_gram_cg_wide(
            g[:, :, :128], g[:, :, 128:128 + f2], vals, nnz,
            np.zeros((r, 128), np.float32),
            np.zeros((r, f2), np.float32), 0.05, cg_iters=40,
            cg_tol=1e-12)
        got = np.concatenate([np.asarray(x1), np.asarray(x2)], axis=1)
        want, want_se = _ref_solve(
            np.concatenate([g[:, :, :128], g[:, :, 128:128 + f2]],
                           axis=2), vals, nnz, 0.05)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
        # dead lanes identically zero
        assert np.abs(got[:, flive:]).max() == 0.0
        np.testing.assert_allclose(np.asarray(se)[:, 0], want_se,
                                   rtol=5e-3, atol=1e-4)

    def test_matches_monolithic_kernel(self, interp):
        """Same inputs through the two-block and the 256-lane kernels
        must agree to CG tolerance."""
        rng = np.random.default_rng(1)
        r, p, f2 = 8, 48, 64
        g = rng.standard_normal((r, p, 256)).astype(np.float32) * 0.3
        g[:, :, 128 + f2 - 3:] = 0.0
        vals = rng.random((r, p)).astype(np.float32)
        nnz = np.full((r,), p, np.int32)
        x0 = rng.standard_normal((r, 256)).astype(np.float32) * 0.1
        x0[:, 128 + f2 - 3:] = 0.0
        mono, se_m = ps.fused_gram_cg(g, vals, nnz, x0, 0.05,
                                      cg_iters=30, cg_tol=1e-10)
        x1, x2, se_w = ps.fused_gram_cg_wide(
            g[:, :, :128], g[:, :, 128:128 + f2], vals, nnz,
            x0[:, :128], x0[:, 128:128 + f2], 0.05, cg_iters=30,
            cg_tol=1e-10)
        wide = np.concatenate([np.asarray(x1), np.asarray(x2)], axis=1)
        np.testing.assert_allclose(wide, np.asarray(mono)[:, :128 + f2],
                                    rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(se_w), np.asarray(se_m),
                                    rtol=1e-3, atol=1e-4)

    def test_cat_matches_monolithic(self, interp):
        """The packed-gather concat kernel is bit-compatible with the
        monolithic kernel when the mono input's upper lanes are zero
        (on-chip parity err measured 0.0, r4)."""
        rng = np.random.default_rng(4)
        r, p, f2 = 8, 48, 32
        g = rng.standard_normal((r, p, 256)).astype(np.float32) * 0.3
        g[:, :, 128 + f2:] = 0.0
        vals = rng.random((r, p)).astype(np.float32)
        nnz = np.full((r,), p, np.int32)
        x0 = np.zeros((r, 256), np.float32)
        mono, se_m = ps.fused_gram_cg(g, vals, nnz, x0, 0.05,
                                      cg_iters=20, cg_tol=1e-10)
        cat, se_c = ps.fused_gram_cg_cat(
            g[:, :, :128], g[:, :, 128:128 + f2], vals, nnz, x0, 0.05,
            cg_iters=20, cg_tol=1e-10)
        np.testing.assert_allclose(np.asarray(cat), np.asarray(mono),
                                    rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(se_c), np.asarray(se_m),
                                    rtol=1e-5, atol=1e-6)

    def test_gather_wrapper_and_f2(self, interp):
        assert ps.wide_f2(130) == 32
        assert ps.wide_f2(160) == 32
        assert ps.wide_f2(161) == 64
        assert ps.wide_f2(200) == 96
        assert ps.wide_f2(256) == 128
        rng = np.random.default_rng(2)
        n, r, p, f = 40, 8, 16, 130
        f2 = ps.wide_f2(f)
        table = np.zeros((n + 1, 256), np.float32)
        table[:n, :f] = rng.standard_normal((n, f)) * 0.4
        cols = rng.integers(0, n, (r, p)).astype(np.int32)
        vals = rng.random((r, p)).astype(np.float32)
        nnz = np.full((r,), p, np.int32)
        x0 = np.zeros((r, 256), np.float32)
        got, se = ps.gather_gram_cg_wide(table, cols, vals, nnz, x0,
                                         0.05, f2=f2, cg_iters=40,
                                         cg_tol=1e-12)
        g = table[cols]
        want, _ = _ref_solve(g[:, :, :128 + f2], vals, nnz, 0.05)
        np.testing.assert_allclose(np.asarray(got)[:, :128 + f2], want,
                                    rtol=2e-3, atol=2e-4)
        assert np.abs(np.asarray(got)[:, f:]).max() == 0.0


class TestWideRouting:
    def test_wide_enabled_range(self, monkeypatch):
        monkeypatch.setattr(ps, "wide_available", lambda: True)
        base = dict(m=64, n=64, lam=0.05, solver="cg", backend="pallas",
                    wide_kernel="on")
        assert not ps.wide_enabled(ALSConfig(f=100, **base))
        assert not ps.wide_enabled(ALSConfig(f=128, **base))
        assert ps.wide_enabled(ALSConfig(f=130, **base))
        assert ps.wide_enabled(ALSConfig(f=200, **base))
        assert ps.wide_enabled(ALSConfig(f=256, **base))
        assert not ps.wide_enabled(
            ALSConfig(f=130, **{**base, "solver": "cholesky"}))
        assert not ps.wide_enabled(
            ALSConfig(f=130, **{**base, "backend": "xla"}))
        # measured-slower on v5e: requires the explicit opt-in
        assert not ps.wide_enabled(
            ALSConfig(f=130, **{**base, "wide_kernel": "off"}))
        monkeypatch.setattr(ps, "wide_available", lambda: False)
        assert not ps.wide_enabled(ALSConfig(f=130, **base))


class TestWideEndToEnd:
    def test_direct_phase_wide_matches_oracle(self, small_problem,
                                              monkeypatch, interp):
        """F=130 through the fused direct phase with the wide kernel
        tracks the exact-solver oracle."""
        from cumf_als_tpu.data.synthetic import init_factors
        from cumf_als_tpu.models.als import ALS
        from cumf_als_tpu.models.reference_numpy import numpy_als
        monkeypatch.setattr(ps, "fused_available", lambda: True)
        monkeypatch.setattr(ps, "wide_available", lambda: True)
        train, test = small_problem
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=130,
                        lam=0.05, iters=2, solver="cg", cg_iters=30,
                        cg_tol=1e-10, backend="pallas", verbose=False,
                        chunk_nnz=1 << 11, fuse_phase=True,
                        wide_kernel="on")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=3)
        als = ALS(cfg, train, None, test)
        res = als.run(x0, th0)
        _, _, ref_hist = numpy_als(train, test, x0, th0, cfg.lam,
                                   cfg.iters)
        for got, (rt, re) in zip(res.history, ref_hist):
            assert got.train_rmse == pytest.approx(rt, abs=2e-3)
            assert got.test_rmse == pytest.approx(re, abs=5e-3)
