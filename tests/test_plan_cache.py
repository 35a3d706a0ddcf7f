"""On-disk plan cache: round-trip fidelity and cache-hit equivalence.

The cache makes startup an mmap load instead of a plan rebuild (the
reference's startup is an fread, host_utilities.cpp:19-97)."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import ALS
from cumf_als_tpu.ops.tiling import (build_batched_panel_plan,
                                     build_panel_plan, build_update_plan)
from cumf_als_tpu.utils import plan_cache as pc


def _chunks_equal(a, b):
    assert len(a) == len(b)
    for c1, c2 in zip(a, b):
        assert c1.width == c2.width
        assert getattr(c1, "panel", -1) == getattr(c2, "panel", -1)
        assert np.array_equal(c1.rows, c2.rows)
        assert np.array_equal(c1.nnz, c2.nnz)
        assert np.array_equal(c1.cols, c2.cols)
        assert np.array_equal(c1.vals, c2.vals)


class TestRoundTrip:
    def test_update_plan(self, medium_problem, tmp_path):
        train, _ = medium_problem
        plan = build_update_plan(train, chunk_nnz=1 << 10)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert (got.num_rows, got.num_cols, got.true_nnz,
                got.padded_nnz) == (plan.num_rows, plan.num_cols,
                                    plan.true_nnz, plan.padded_nnz)
        _chunks_equal(plan.chunks, got.chunks)

    def test_panel_plan(self, medium_problem, tmp_path):
        train, _ = medium_problem
        plan = build_panel_plan(train, panel_size=64, chunk_nnz=1 << 10)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert got.panel_size == plan.panel_size
        assert got.n_panels == plan.n_panels
        assert np.array_equal(got.row_nnz, plan.row_nnz)
        _chunks_equal(plan.chunks, got.chunks)

    def test_batched_panel_plan(self, medium_problem, tmp_path):
        train, _ = medium_problem
        plan = build_batched_panel_plan(train, panel_size=64,
                                        batch_rows=64,
                                        chunk_nnz=1 << 10)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert len(got.batches) == len(plan.batches)
        assert got.batch_rows == plan.batch_rows
        for b1, b2 in zip(plan.batches, got.batches):
            assert np.array_equal(b1.global_ids, b2.global_ids)
            assert np.array_equal(b1.row_nnz, b2.row_nnz)
            assert np.array_equal(b1.plan.row_nnz, b2.plan.row_nnz)
            _chunks_equal(b1.plan.chunks, b2.plan.chunks)

    def test_missing_key_returns_none(self, tmp_path):
        assert pc.load_plan(str(tmp_path), "nope") is None


class TestShardedRoundTrip:
    def test_sharded_row_plan(self, medium_problem, tmp_path):
        from cumf_als_tpu.parallel.plan import build_sharded_row_plan
        train, _ = medium_problem
        plan = build_sharded_row_plan(train, 4, chunk_nnz=1 << 10,
                                      chunk_rows=64)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert (got.n_dev, got.m, got.m_loc, got.num_cols) == \
            (plan.n_dev, plan.m, plan.m_loc, plan.num_cols)
        assert np.array_equal(got.global_ids, plan.global_ids)
        _chunks_equal(plan.chunks, got.chunks)

    def test_reduce_plan(self, medium_problem, tmp_path):
        from cumf_als_tpu.parallel.plan import (build_reduce_plan,
                                                build_sharded_row_plan)
        from cumf_als_tpu.utils.io import transpose_csr
        train, _ = medium_problem
        row_plan = build_sharded_row_plan(train, 4)
        plan = build_reduce_plan(transpose_csr(train), row_plan,
                                 block_rows=16)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert (got.n_dev, got.n, got.m_loc) == (plan.n_dev, plan.n,
                                                plan.m_loc)
        assert len(got.blocks) == len(plan.blocks)
        for b1, b2 in zip(plan.blocks, got.blocks):
            assert b1.width == b2.width
            assert np.array_equal(b1.rows, b2.rows)
            assert np.array_equal(b1.nnz_local, b2.nnz_local)
            assert np.array_equal(b1.nnz_total, b2.nnz_total)
            assert np.array_equal(b1.cols, b2.cols)
            assert np.array_equal(b1.vals, b2.vals)

    def test_aligned_steps(self, medium_problem, tmp_path):
        from cumf_als_tpu.parallel.plan import (
            AlignedSteps, build_sharded_row_plan,
            build_sharded_x_panel_steps)
        train, _ = medium_problem
        row_plan = build_sharded_row_plan(train, 4)
        steps, n_panels = build_sharded_x_panel_steps(
            train, row_plan, panel_size=32, chunk_rows=64)
        plan = AlignedSteps(steps=steps, n_panels=n_panels)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert got.n_panels == n_panels
        _chunks_equal(plan.steps, got.steps)

    def test_lazy_sharded_row_round_trip(self, medium_problem, tmp_path):
        from cumf_als_tpu.parallel.plan import build_sharded_row_plan
        train, _ = medium_problem
        plan = build_sharded_row_plan(train, 4, lazy=True)
        pc.save_plan(str(tmp_path), "k", plan)
        # lazy entries need the source matrix to re-bind
        assert pc.load_plan(str(tmp_path), "k") is None
        got = pc.load_plan(str(tmp_path), "k", csr=train)
        assert (got.n_dev, got.m, got.m_loc, got.num_cols) == \
            (plan.n_dev, plan.m, plan.m_loc, plan.num_cols)
        assert np.array_equal(got.global_ids, plan.global_ids)
        assert len(got.chunks) == len(plan.chunks)
        for c1, c2 in zip(plan.chunks, got.chunks):
            for a, b in zip(c1.materialize(), c2.materialize()):
                assert np.array_equal(a, b)

    def test_lazy_aligned_steps_round_trip(self, medium_problem,
                                           tmp_path):
        from cumf_als_tpu.ops.tiling import build_panel_plan
        from cumf_als_tpu.parallel.plan import (AlignedSteps,
                                                align_panel_plans)
        from cumf_als_tpu.utils.io import transpose_csr
        train, _ = medium_problem
        csc = transpose_csr(train)
        pp = build_panel_plan(csc, panel_size=32, chunk_rows=64,
                              lazy=True)
        steps, n_panels = align_panel_plans([pp], csc.num_rows, 32)
        plan = AlignedSteps(steps=steps, n_panels=n_panels)
        pc.save_plan(str(tmp_path), "k", plan)
        assert pc.load_plan(str(tmp_path), "k") is None
        got = pc.load_plan(str(tmp_path), "k", csr=csc)
        assert got.n_panels == n_panels
        assert len(got.steps) == len(plan.steps)
        for s1, s2 in zip(plan.steps, got.steps):
            assert (s1.panel, s1.width) == (s2.panel, s2.width)
            for a, b in zip(s1.materialize(), s2.materialize()):
                assert np.array_equal(a, b)

    def test_lazy_multidev_steps_not_cached(self, medium_problem,
                                            tmp_path):
        from cumf_als_tpu.ops.tiling import build_panel_plan
        from cumf_als_tpu.parallel.plan import (AlignedSteps,
                                                align_panel_plans)
        from cumf_als_tpu.utils.io import transpose_csr
        train, _ = medium_problem
        csc = transpose_csr(train)
        pp = build_panel_plan(csc, panel_size=32, chunk_rows=64,
                              lazy=True)
        steps, n_panels = align_panel_plans([pp, pp], csc.num_rows, 32)
        plan = AlignedSteps(steps=steps, n_panels=n_panels)
        pc.save_plan(str(tmp_path), "k", plan)  # silently skipped
        assert pc.load_plan(str(tmp_path), "k", csr=csc) is None


class TestFingerprint:
    def test_sensitive_to_data(self, medium_problem):
        train, _ = medium_problem
        fp1 = pc.dataset_fingerprint(train)
        import dataclasses
        bumped = dataclasses.replace(
            train, data=train.data + np.float32(1.0))
        assert pc.dataset_fingerprint(bumped) != fp1
        assert pc.dataset_fingerprint(train) == fp1


class TestCacheHitEquivalence:
    def test_als_results_identical_with_cache(self, medium_problem,
                                              tmp_path):
        train, test = medium_problem
        base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=3, verbose=False, debug_timing=False,
                    chunk_nnz=1 << 12, panel_size=64,
                    plan_cache_dir=str(tmp_path))
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=1)
        r1 = ALS(ALSConfig(**base), train, None, test).run(x0, th0)
        # second construction hits the cache
        r2 = ALS(ALSConfig(**base), train, None, test).run(x0, th0)
        for a, b in zip(r1.history, r2.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-6)
            assert a.test_rmse == pytest.approx(b.test_rmse, rel=1e-6)
        # and actually created entries on disk
        assert any(p.is_dir() for p in tmp_path.iterdir())

    def test_sharded_results_identical_with_cache(self, medium_problem,
                                                  tmp_path):
        """ShardedALS (ROADMAP r2 #4): plans load from disk on the second
        construction and the trajectory is unchanged."""
        from cumf_als_tpu.parallel.sharded_als import ShardedALS
        train, test = medium_problem
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16,
                        lam=0.05, iters=2, verbose=False,
                        debug_timing=False, chunk_nnz=1 << 12,
                        panel_size=32, chunk_rows=64,
                        plan_cache_dir=str(tmp_path))
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=1)
        r1 = ShardedALS(cfg, train, None, test, block_rows=64).run(x0, th0)
        m2 = ShardedALS(cfg, train, None, test, block_rows=64)
        assert m2.x_steps is not None  # panel mode engaged from cache
        r2 = m2.run(x0, th0)
        for a, b in zip(r1.history, r2.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-6)
            assert a.test_rmse == pytest.approx(b.test_rmse, rel=1e-6)
        kinds = {p.name.split("-")[0] for p in tmp_path.iterdir()}
        assert {"sh_row", "sh_reduce", "sh_xpanel", "csc"} <= kinds

    def test_sharded_ooc_identical_with_cache(self, medium_problem,
                                              tmp_path):
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        train, test = medium_problem
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16,
                        lam=0.05, iters=2, verbose=False,
                        debug_timing=False, chunk_nnz=1 << 12,
                        panel_size=32, chunk_rows=64,
                        plan_cache_dir=str(tmp_path))
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=1)
        r1 = ShardedOutOfCoreALS(cfg, train, None, test).run(x0, th0)
        r2 = ShardedOutOfCoreALS(cfg, train, None, test).run(x0, th0)
        for a, b in zip(r1.history, r2.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-6)
            assert a.test_rmse == pytest.approx(b.test_rmse, rel=1e-6)
        kinds = {p.name.split("-")[0] for p in tmp_path.iterdir()}
        assert {"sh_row", "sh_ooc_theta"} <= kinds


class TestPanelFusedRMSE:
    def test_fused_matches_direct_on_panel_paths(self, medium_problem):
        """ADVICE r1 (medium): fused train RMSE must work when the theta
        phase uses a panel/batched-panel plan."""
        train, test = medium_problem
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=2)
        base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=3, verbose=False, debug_timing=False,
                    chunk_nnz=1 << 12, panel_size=64)
        res_d = ALS(ALSConfig(**base, train_rmse_method="direct"),
                    train, None, test).run(x0, th0)
        res_f = ALS(ALSConfig(**base, train_rmse_method="fused"),
                    train, None, test).run(x0, th0)
        for a, b in zip(res_d.history, res_f.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-3)

    @pytest.mark.slow  # ~2 min on one CPU: out of the fast gate (VERDICT r4 #9)
    def test_fused_matches_direct_batched_panel(self, medium_problem):
        train, test = medium_problem
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=2)
        # tiny panel_budget forces the batched-panel strategy
        base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=3, verbose=False, debug_timing=False,
                    chunk_nnz=1 << 12, panel_size=64, chunk_rows=128,
                    panel_budget_bytes=1 << 16)
        res_d = ALS(ALSConfig(**base, train_rmse_method="direct"),
                    train, None, test).run(x0, th0)
        res_f = ALS(ALSConfig(**base, train_rmse_method="fused"),
                    train, None, test).run(x0, th0)
        for a, b in zip(res_d.history, res_f.history):
            assert a.train_rmse == pytest.approx(b.train_rmse, rel=1e-3)
