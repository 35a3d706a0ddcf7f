"""Out-of-core ALS tests: the host-resident-X path must match the
in-memory trajectory (the property hugewiki could only validate on a
real 4-GPU box — SURVEY §4 item 7)."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import do_als
from cumf_als_tpu.models.out_of_core import OutOfCoreALS


@pytest.mark.parametrize("solver", [
    pytest.param("cholesky", marks=pytest.mark.slow), "cg"])
def test_ooc_matches_in_memory(medium_problem, solver):
    train, test = medium_problem
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                iters=3, verbose=False, debug_timing=False,
                chunk_nnz=1 << 11, chunk_rows=128, solver=solver)
    x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=1)
    ref = do_als(train, None, test, th0, x0,
                 ALSConfig(use_panels="never",
                           train_rmse_method="direct", **base))
    ooc = OutOfCoreALS(ALSConfig(panel_size=64, **base), train, None,
                       test)
    res = ooc.run(x0, th0)
    assert ooc.plan_theta.n_panels > 1  # X actually streamed in panels
    for a, b in zip(ref.history, res.history):
        assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-3)
        assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
    np.testing.assert_allclose(res.x, ref.x, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(res.theta, ref.theta, rtol=2e-2,
                               atol=2e-2)


def test_ooc_hugewiki_shape_smoke():
    """Tall-skinny hugewiki shape (m >> n) at toy scale."""
    from cumf_als_tpu.data.synthetic import synthetic_ratings
    train, test = synthetic_ratings(m=5000, n=40, nnz=60000,
                                    nnz_test=3000, rank=4, noise=0.1,
                                    skew=(0.3, 0.3), seed=9)
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=2, verbose=False, debug_timing=False,
                    panel_size=1024, chunk_rows=512, solver="cg")
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
    res = OutOfCoreALS(cfg, train, None, test).run(x0, th0)
    assert res.history[-1].train_rmse < res.history[0].train_rmse
    assert np.isfinite(res.history[-1].test_rmse)
