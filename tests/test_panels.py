"""Panelized-Gram tests: the panel path must reproduce the direct path
exactly (same math, different blocking)."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import ALS, do_als
from cumf_als_tpu.ops.tiling import build_panel_plan


def test_panel_plan_covers_all(small_problem):
    train, _ = small_problem
    plan = build_panel_plan(train, panel_size=16, chunk_nnz=256)
    total = {}
    for ch in plan.chunks:
        base = ch.panel * plan.panel_size
        for r in range(ch.rows.shape[0]):
            row = int(ch.rows[r])
            if row == plan.num_rows:
                continue
            k = int(ch.nnz[r])
            cols = ch.cols[r, :k] + base
            vals = ch.vals[r, :k]
            assert np.all(ch.cols[r, k:] == plan.panel_size)
            lst = total.setdefault(row, [])
            lst.extend(zip(cols.tolist(), vals.tolist()))
    for i in range(train.num_rows):
        lo, hi = int(train.indptr[i]), int(train.indptr[i + 1])
        got = sorted(total.get(i, []))
        ref = sorted(zip(train.indices[lo:hi].tolist(),
                         train.data[lo:hi].tolist()))
        assert got == ref, i


@pytest.mark.parametrize("solver", [
    # batched Cholesky on CPU is minutes-scale; the cg param keeps the
    # path covered in the fast gate (VERDICT r4 #9)
    pytest.param("cholesky", marks=pytest.mark.slow), "cg"])
def test_panel_matches_direct(medium_problem, solver):
    train, test = medium_problem
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                iters=3, verbose=False, debug_timing=False,
                chunk_nnz=1 << 11, chunk_rows=128, solver=solver)
    x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=1)
    direct = do_als(train, None, test, th0, x0,
                    ALSConfig(use_panels="never", **base))
    panel_cfg = ALSConfig(use_panels="auto", panel_size=64,
                          panel_budget_bytes=1 << 30, **base)
    model = ALS(panel_cfg, train, None, test)
    # X phase must actually be panelized, theta phase stays direct
    from cumf_als_tpu.ops.tiling import PanelPlan
    assert isinstance(model.plan_x[0], PanelPlan)
    res = model.run(x0, th0)
    for a, b in zip(direct.history, res.history):
        assert b.train_rmse == pytest.approx(a.train_rmse, abs=1e-3)
        assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
    np.testing.assert_allclose(res.x, direct.x, rtol=2e-2, atol=2e-2)


def test_deep_panel_bf16_accumulators_promote_to_f32(capsys):
    """Deep scatter-add chains swamp bf16 accumulators (hugewiki-0.1
    theta rows touch ~77 panels; plain ALS NaN'd at iteration 3 before
    the r5 guard). A plan whose rows average > BF16_ACCUM_MAX_DEPTH
    partial adds must promote the Gram accumulator to f32 and converge
    finitely."""
    import numpy as np
    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors, synthetic_ratings
    from cumf_als_tpu.models.als import ALS

    # few fat rows over many columns + tiny panels -> deep accumulation
    train, test = synthetic_ratings(m=24, n=2400, nnz=12000, nnz_test=800,
                                    rank=4, noise=0.1, seed=11)
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=3, solver="cg", gram_dtype="bf16",
                    panel_size=64, split_width=64, verbose=False,
                    train_rmse_method="fused")
    model = ALS(cfg, train, None, test)
    a_dtype = model._accum_dtype(
        sum(c.rows.shape[0] for c in model.plan_x[1]),
        model.plan_x[0].num_rows)
    import jax.numpy as jnp
    assert a_dtype == jnp.float32  # promoted
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
    res = model.run(x0, th0)
    assert np.isfinite([h.train_rmse for h in res.history]).all()
