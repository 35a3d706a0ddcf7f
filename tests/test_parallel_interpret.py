"""Mesh-mode Pallas coverage (VERDICT r4 #8): the fused Gram+CG kernels
dispatched INSIDE shard_map on the 8-device CPU mesh, via the Pallas
interpreter. The CPU-mesh suite otherwise exercises only the XLA
fallback (fused_available() is False on a CPU backend), so a divergence
between the sharded fused path and plain ALS could only surface on real
hardware; this test makes it fail in CI.

Reference analog: none — the reference's multi-GPU path was untestable
off a 4-GPU box (reference README.md:115, hugewiki.cu:41)."""

import numpy as np
import pytest
import jax.experimental.pallas as pl

import cumf_als_tpu.ops.pallas_solve as ps
from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import do_als
from cumf_als_tpu.parallel.sharded_als import ShardedALS

# Interpreter-mode shard_map over 8 virtual devices is minutes-scale;
# keep it out of the sub-5-minute fast gate with the heavy mesh tests.
pytestmark = pytest.mark.slow


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Force every pallas_call in ops.pallas_solve to interpreter mode
    and reset the probe caches so availability gates re-probe under the
    interpreter (other tests may have cached False from a compiled-mode
    probe on CPU)."""
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", patched)
    for flag in ("_STATUS", "_AUG_STATUS", "_CG_STATUS",
                 "_PANEL_AUG_STATUS", "_WIDE_STATUS"):
        monkeypatch.setattr(ps, flag, None)
    yield
    for flag in ("_STATUS", "_AUG_STATUS", "_CG_STATUS",
                 "_PANEL_AUG_STATUS", "_WIDE_STATUS"):
        setattr(ps, flag, None)


def test_sharded_fused_kernels_match_plain(medium_problem,
                                           interpret_pallas):
    train, test = medium_problem
    assert ps.fused_available(), "interpreter probe must pass"
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=2, solver="cg", backend="pallas",
                    verbose=False, debug_timing=False,
                    chunk_nnz=1 << 11, train_rmse_method="fused")
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
    plain = do_als(train, None, test, th0, x0,
                   cfg.replace(backend="xla",
                               train_rmse_method="direct"))
    sharded = ShardedALS(cfg, train, None, test, block_rows=64,
                         n_devices=8)
    res = sharded.run(x0, th0)
    for hp, hs in zip(plain.history, res.history):
        # same CG semantics, different accumulation order across shards
        assert abs(hp.train_rmse - hs.train_rmse) < 2e-3
        assert abs(hp.test_rmse - hs.test_rmse) < 2e-3
