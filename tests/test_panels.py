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
