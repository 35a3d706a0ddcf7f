"""Batched-panel (two-level) plan tests: the both-sides-big strategy
must reproduce the direct path exactly."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import ALS, do_als
from cumf_als_tpu.ops.tiling import (BatchedPanelPlan,
                                     build_batched_panel_plan)


def test_batched_panel_plan_covers_all(medium_problem):
    train, _ = medium_problem
    plan = build_batched_panel_plan(train, panel_size=64, batch_rows=64,
                                    chunk_nnz=512)
    got = {}
    for batch in plan.batches:
        local_ids = batch.global_ids
        for ch in batch.plan.chunks:
            base = ch.panel * plan.panel_size
            for r in range(ch.rows.shape[0]):
                lr = int(ch.rows[r])
                if lr >= batch.plan.num_rows:
                    continue
                g = int(local_ids[lr])
                k = int(ch.nnz[r])
                lst = got.setdefault(g, [])
                lst.extend(zip((ch.cols[r, :k] + base).tolist(),
                               ch.vals[r, :k].tolist()))
    for i in range(train.num_rows):
        lo, hi = int(train.indptr[i]), int(train.indptr[i + 1])
        ref = sorted(zip(train.indices[lo:hi].tolist(),
                         train.data[lo:hi].tolist()))
        assert sorted(got.get(i, [])) == ref, i


def test_both_sides_big_prefers_direct_when_fused(medium_problem,
                                                  monkeypatch):
    """Yahoo-class phases (accumulator over budget) route to the direct
    fused path when the Pallas Gram+CG kernel is available — measured
    7.44 vs 11.74 s/iter on Yahoo F=100 (v5e) — and fall back to
    batched_panel otherwise."""
    import cumf_als_tpu.models.als as als_mod
    import cumf_als_tpu.ops.pallas_solve as ps
    train, _ = medium_problem
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                use_panels="auto", panel_size=64, panel_budget_bytes=1,
                backend="pallas", solver="cg")

    cfg = ALSConfig(**base)
    model = ALS.__new__(ALS)
    model.cfg = cfg
    monkeypatch.setattr(ps, "fused_available", lambda: True)
    assert model._phase_strategy(train) == "direct"
    monkeypatch.setattr(ps, "fused_available", lambda: False)
    assert model._phase_strategy(train) == "batched_panel"
    model.cfg = ALSConfig(**{**base, "solver": "cholesky"})
    assert model._phase_strategy(train) == "batched_panel"


@pytest.mark.parametrize("solver", [
    # batched Cholesky on CPU is minutes-scale; the cg param keeps the
    # path covered in the fast gate (VERDICT r4 #9)
    pytest.param("cholesky", marks=pytest.mark.slow), "cg"])
def test_batched_panel_matches_direct(medium_problem, solver):
    train, test = medium_problem
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                iters=3, verbose=False, debug_timing=False,
                chunk_nnz=1 << 11, chunk_rows=64, solver=solver)
    x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=1)
    direct = do_als(train, None, test, th0, x0,
                    ALSConfig(use_panels="never", **base))
    cfg = ALSConfig(use_panels="auto", panel_size=64,
                    panel_budget_bytes=1, **base)  # budget 1B -> batched
    model = ALS(cfg, train, None, test)
    assert isinstance(model.plan_x[0], BatchedPanelPlan)
    assert isinstance(model.plan_theta[0], BatchedPanelPlan)
    res = model.run(x0, th0)
    for a, b in zip(direct.history, res.history):
        assert b.train_rmse == pytest.approx(a.train_rmse, abs=1e-3)
        assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
    np.testing.assert_allclose(res.x, direct.x, rtol=2e-2, atol=2e-2)
