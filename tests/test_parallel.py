"""Multi-device tests on the virtual 8-device CPU mesh: the sharded ALS
must reproduce the single-device trajectory (the property the reference
could never test without a 4-GPU box — SURVEY §4 item 7)."""

import jax
import numpy as np
import pytest

# Heavy mesh tests: minutes each on a 1-CPU host (VERDICT r4 #9) —
# excluded from the fast gate; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import do_als
from cumf_als_tpu.parallel.mesh import make_mesh
from cumf_als_tpu.parallel.plan import (assign_rows_balanced,
                                        build_reduce_plan,
                                        build_sharded_row_plan)
from cumf_als_tpu.parallel.sharded_als import ShardedALS


def _cfg(train, **kw):
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                iters=3, verbose=False, debug_timing=False,
                chunk_nnz=1 << 11, train_rmse_method="fused")
    base.update(kw)
    return ALSConfig(**base)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


class TestPlans:
    def test_balanced_assignment(self):
        rng = np.random.RandomState(0)
        nnz = rng.randint(1, 1000, size=200).astype(np.int64)
        assign = assign_rows_balanced(nnz, 4)
        loads = [nnz[assign == d].sum() for d in range(4)]
        assert max(loads) < 1.3 * min(loads)
        counts = [int((assign == d).sum()) for d in range(4)]
        assert max(counts) <= -(-200 // 4)

    def test_row_plan_covers_all(self, small_problem):
        train, _ = small_problem
        plan = build_sharded_row_plan(train, 4, chunk_nnz=256)
        seen = set()
        for ch in plan.chunks:
            for d in range(4):
                for i in range(ch.rows.shape[1]):
                    if ch.rows[d, i] < plan.m_loc:
                        g = int(plan.global_ids[d, ch.rows[d, i]])
                        assert g not in seen
                        seen.add(g)
        expect = {i for i in range(train.num_rows)
                  if train.indptr[i + 1] > train.indptr[i]}
        assert seen == expect

    def test_reduce_plan_partials_sum_to_total(self, small_problem):
        train, _ = small_problem
        from cumf_als_tpu.utils.io import transpose_csr
        csc = transpose_csr(train)
        row_plan = build_sharded_row_plan(train, 4)
        plan = build_reduce_plan(csc, row_plan, block_rows=16)
        got_nnz = {}
        for bl in plan.blocks:
            for i, j in enumerate(bl.rows):
                if j < plan.n:
                    assert bl.nnz_local[:, i].sum() == bl.nnz_total[i]
                    got_nnz[int(j)] = int(bl.nnz_total[i])
        for j in range(csc.num_rows):
            k = int(csc.indptr[j + 1] - csc.indptr[j])
            if k:
                assert got_nnz[j] == k


class TestShardedEqualsSingle:
    @pytest.mark.parametrize("solver,ndev", [("cholesky", 8),
                                             ("cg", 8), ("cg", 4),
                                             ("cg", 2)])
    def test_trajectory_matches_single_device(self, medium_problem,
                                              solver, ndev):
        train, test = medium_problem
        cfg = _cfg(train, solver=solver)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        single = do_als(train, None, test, th0, x0,
                        cfg.replace(train_rmse_method="direct"))
        sharded = ShardedALS(cfg, train, None, test, block_rows=64,
                             n_devices=ndev)
        multi = sharded.run(x0, th0)
        for a, b in zip(single.history, multi.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-3)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
        np.testing.assert_allclose(multi.x, single.x, rtol=2e-2, atol=2e-2)

    def test_panelized_x_phase_matches_single_device(self,
                                                     medium_problem):
        """Tiny panel_size forces the panelized sharded X phase (the
        SPMD PanelPlan path for large replicated gather tables)."""
        train, test = medium_problem
        cfg = _cfg(train, solver="cg", panel_size=32, chunk_rows=64)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        single = do_als(train, None, test, th0, x0,
                        cfg.replace(train_rmse_method="direct",
                                    use_panels="never"))
        sharded = ShardedALS(cfg, train, None, test, block_rows=64)
        assert sharded.x_steps is not None  # panel mode engaged
        assert sharded.x_n_panels > 1
        multi = sharded.run(x0, th0)
        for a, b in zip(single.history, multi.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-3)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
        np.testing.assert_allclose(multi.x, single.x, rtol=2e-2,
                                   atol=2e-2)

    def test_panelized_fused_iteration(self, medium_problem):
        """The panel X phase must also compose inside the single jitted
        SPMD step (the dryrun/fused_iteration form)."""
        train, test = medium_problem
        cfg = _cfg(train, solver="cg", panel_size=32, chunk_rows=64,
                   iters=1)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        sharded = ShardedALS(cfg, train, None, test, block_rows=64)
        assert sharded.x_steps is not None
        x = sharded.shard_x(x0)
        theta = sharded.replicate_theta(
            th0 * (np.diff(sharded.train_csc.indptr) > 0)[:, None])
        step = sharded.fused_iteration()
        chunk_data, block_data = sharded.device_plan()
        x, theta, se = step(x, theta, chunk_data, block_data)
        assert np.isfinite(float(se))
        ref = sharded.run(x0, th0)
        assert float(np.sqrt(float(se) / train.nnz)) == pytest.approx(
            ref.history[0].train_rmse, abs=1e-4)

    def test_fused_step_run_matches_per_chunk_run(self, medium_problem):
        """run() with fused_step='on' (one jitted SPMD program per
        phase) and the grouped auto mode (barrier-chained GROUP_BLOCKS
        programs — the accelerator default) must both reproduce the
        per-chunk dispatch trajectory."""
        train, test = medium_problem
        cfg = _cfg(train, solver="cg")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        off = ShardedALS(cfg.replace(fused_step="off"), train, None,
                         test, block_rows=64).run(x0, th0)
        on = ShardedALS(cfg.replace(fused_step="on"), train, None,
                        test, block_rows=64).run(x0, th0)
        grouped_model = ShardedALS(cfg.replace(fused_step="auto"),
                                   train, None, test, block_rows=64)
        grouped_model._cpu_mesh = False  # force the accelerator route
        grouped = grouped_model.run(x0, th0)
        for got in (on, grouped):
            for a, b in zip(off.history, got.history):
                assert b.train_rmse == pytest.approx(a.train_rmse,
                                                     abs=1e-5)
                assert b.test_rmse == pytest.approx(a.test_rmse,
                                                    abs=1e-5)
            np.testing.assert_allclose(got.x, off.x, rtol=1e-4,
                                       atol=1e-4)

    def test_mesh1_fused_theta_matches_reference(self, medium_problem,
                                                 monkeypatch):
        """n_dev == 1 routes theta blocks through the fused Gram+CG
        kernel directly (no materialized partial Gram, no psum) and
        skips the panelized X phase — the structure that closed the
        mesh=1 gap vs plain ALS (r4). Interpret-mode kernels on CPU;
        trajectory must match the multi-step reduce path."""
        import jax.experimental.pallas as pl
        import cumf_als_tpu.ops.pallas_solve as ps
        train, test = medium_problem
        cfg = _cfg(train, solver="cg", backend="pallas", aug_gram="off",
                   cg_iters=25, cg_tol=1e-10)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        ref = ShardedALS(cfg.replace(backend="xla"), train, None, test,
                         n_devices=1, block_rows=64).run(x0, th0)
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(ps.pl, "pallas_call", patched)
        monkeypatch.setattr(ps, "fused_available", lambda: True)
        model = ShardedALS(cfg, train, None, test, n_devices=1,
                           block_rows=64)
        assert model.x_steps is None  # direct beats panels here
        got = model.run(x0, th0)
        for a, b in zip(ref.history, got.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-4)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-4)

    def test_sharded_runs_on_subset_of_devices(self, small_problem):
        train, test = small_problem
        cfg = _cfg(train, iters=1)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        sharded = ShardedALS(cfg, train, None, test, n_devices=2,
                             block_rows=16)
        res = sharded.run(x0, th0)
        assert np.isfinite(res.history[-1].train_rmse)


class TestShardedOutOfCore:
    """The combined hugewiki path: sharded ratings + host-resident X
    shards + streamed panels + psum'd theta partials (reference
    hugewiki.cu:2300-2302, 2560-2572, 2703-2730 as one program)."""

    def test_trajectory_matches_single_device(self, medium_problem):
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        train, test = medium_problem
        # tiny panels force several streamed panels per device
        cfg = _cfg(train, solver="cg", panel_size=32, chunk_rows=64)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        single = do_als(train, None, test, th0, x0,
                        cfg.replace(train_rmse_method="direct"))
        model = ShardedOutOfCoreALS(cfg, train, None, test)
        assert model.n_panels > 1  # panels actually stream
        multi = model.run(x0, th0)
        for a, b in zip(single.history, multi.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-3)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
        np.testing.assert_allclose(multi.x, single.x, rtol=2e-2, atol=2e-2)

    def test_lazy_plans_match_eager(self, medium_problem, monkeypatch):
        """Streaming-materialized plans (the hugewiki-scale form) must
        produce the identical trajectory as eager plan arrays."""
        import cumf_als_tpu.parallel.sharded_ooc as so
        train, test = medium_problem
        cfg = _cfg(train, solver="cg", panel_size=32, chunk_rows=64,
                   iters=2)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        eager = so.ShardedOutOfCoreALS(cfg, train, None, test).run(
            x0, th0)
        monkeypatch.setattr(so, "LAZY_NNZ_THRESHOLD", 1)
        model = so.ShardedOutOfCoreALS(cfg, train, None, test)
        from cumf_als_tpu.ops.tiling import LazyPanelChunk
        from cumf_als_tpu.parallel.plan import (LazyAlignedPanelChunk,
                                                LazyShardedChunk)
        assert all(isinstance(c, LazyShardedChunk)
                   for c in model.row_plan.chunks)
        assert any(isinstance(s, LazyAlignedPanelChunk)
                   for s in model.theta_steps)
        lazy = model.run(x0, th0)
        for a, b in zip(eager.history, lazy.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=1e-6)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=1e-6)
        np.testing.assert_allclose(lazy.x, eager.x, rtol=1e-5, atol=1e-5)

    def test_lazy_plans_single_device(self, medium_problem, monkeypatch):
        """n_dev=1 takes the identity-shard shortcut (no owner split);
        lazy + shortcut must still converge."""
        import cumf_als_tpu.parallel.sharded_ooc as so
        monkeypatch.setattr(so, "LAZY_NNZ_THRESHOLD", 1)
        train, test = medium_problem
        cfg = _cfg(train, solver="cg", panel_size=64, chunk_rows=64,
                   iters=2)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        model = so.ShardedOutOfCoreALS(cfg, train, None, test,
                                       n_devices=1)
        res = model.run(x0, th0)
        assert res.history[-1].train_rmse < res.history[0].train_rmse

    def test_bf16_gram_accumulators(self, small_problem):
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        train, test = small_problem
        cfg = _cfg(train, iters=2, gram_dtype="bf16", panel_size=16)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        model = ShardedOutOfCoreALS(cfg, train, None, test, n_devices=4)
        res = model.run(x0, th0)
        assert np.isfinite(res.history[-1].train_rmse)
        assert res.history[-1].train_rmse < res.history[0].train_rmse


class TestShardedResume:
    def test_sharded_resume_matches_full_run(self, small_problem,
                                             tmp_path):
        """Checkpoint at every iteration, then resume the SPMD model
        from iteration 1's checkpoint — same final factors as the
        uninterrupted run (CLI --resume now covers all model classes)."""
        train, test = small_problem
        cfg = _cfg(train, iters=3, solver="cholesky",
                   checkpoint_dir=str(tmp_path), checkpoint_every=1)
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        full = ShardedALS(cfg, train, None, test).run(x0, th0)
        from cumf_als_tpu.utils.checkpoint import load_checkpoint
        x1, th1, it = load_checkpoint(str(tmp_path), 1, cfg=cfg)
        rest = ShardedALS(cfg, train, None, test).run(
            x1, th1, start_iter=it + 1)
        np.testing.assert_allclose(rest.x, full.x, rtol=1e-5, atol=1e-6)
        assert rest.history[-1].iteration == full.history[-1].iteration


class TestDeviceResidentX:
    """x_placement="device" (r3): X shards live in HBM, CG warm-starts
    from the resident shard (r4 — r3 cold-started and train RMSE
    drifted up under a tight budget, VERDICT r3 #5), panels become
    device slices (multi-shard) or the theta update solves DIRECTLY
    against the device X (single shard), and test RMSE evaluates on
    device. With an exact (start-independent) solver the trajectory
    must match the host placement to f32 summation noise."""

    @pytest.mark.parametrize("ndev", [1, 4])
    def test_matches_host_placement_exactly(self, medium_problem, ndev):
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        train, test = medium_problem
        base = dict(solver="cholesky", panel_size=32, chunk_rows=64,
                    iters=3)
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16,
                               seed=1)
        host = ShardedOutOfCoreALS(
            _cfg(train, **base, x_placement="host"), train, None, test,
            n_devices=ndev).run(x0, th0)
        model = ShardedOutOfCoreALS(
            _cfg(train, **base, x_placement="device"), train, None,
            test, n_devices=ndev)
        assert model._theta_direct == (ndev == 1)
        dev = model.run(x0, th0)
        for a, b in zip(host.history, dev.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=5e-5)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=5e-5)
        np.testing.assert_allclose(dev.x, host.x, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(dev.theta, host.theta, rtol=1e-3,
                                   atol=1e-4)

    def test_direct_theta_hot_columns(self, medium_problem, monkeypatch):
        """Columns above THETA_SEG_W ratings route through the
        segmented accumulate-then-solve path; a tiny cap forces every
        hot column through it and the trajectory must still match."""
        from cumf_als_tpu.parallel import sharded_ooc as so
        train, test = medium_problem
        base = dict(solver="cholesky", panel_size=32, chunk_rows=64,
                    iters=3)
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16,
                               seed=1)
        host = so.ShardedOutOfCoreALS(
            _cfg(train, **base, x_placement="host"), train, None, test,
            n_devices=1).run(x0, th0)
        monkeypatch.setattr(so.ShardedOutOfCoreALS, "THETA_SEG_W", 64)
        model = so.ShardedOutOfCoreALS(
            _cfg(train, **base, x_placement="device"), train, None,
            test, n_devices=1)
        assert model._hot_rows.size > 0  # segments actually engaged
        dev = model.run(x0, th0)
        for a, b in zip(host.history, dev.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=5e-5)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=5e-5)

    def test_warm_start_cg_converges(self, medium_problem):
        """CG on the device-X path warm-starts from the HBM-resident
        shard (r4), so even the STANDALONE budget (CG_ITER=6,
        reference als.cu:32 — not hugewiki's cold-start cgIter=100,
        hugewiki.cu:2569) must track the exact-solver trajectory within
        the accuracy budget."""
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        train, test = medium_problem
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16,
                               seed=1)
        exact = ShardedOutOfCoreALS(
            _cfg(train, solver="cholesky", panel_size=32, chunk_rows=64,
                 x_placement="device"), train, None, test,
            n_devices=2).run(x0, th0)
        cg = ShardedOutOfCoreALS(
            _cfg(train, solver="cg", cg_iters=6, panel_size=32,
                 chunk_rows=64, x_placement="device"), train, None,
            test, n_devices=2).run(x0, th0)
        for a, b in zip(exact.history, cg.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-3)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)

    def test_keep_sharded_and_fetch(self, small_problem):
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        train, test = small_problem
        cfg = _cfg(train, solver="cholesky", panel_size=16,
                   chunk_rows=32, iters=2, x_placement="device")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        model = ShardedOutOfCoreALS(cfg, train, None, test, n_devices=2)
        res = model.run(x0, th0, keep_sharded=True)
        assert res.x is None
        x = model.fetch_x()
        assert x.shape == (cfg.m, cfg.f)
        assert np.isfinite(x).all()


class TestNetflixQuarterScale:
    """Realistic-shape SPMD trajectory check (VERDICT r2 #5): a
    quarter-scale-Netflix-shaped problem on the full 8-device CPU mesh
    vs the single-device oracle — beyond the ~220-row toys above."""

    def test_sharded_matches_single_netflix_shape(self):
        from cumf_als_tpu.data.synthetic import workload_ratings
        from cumf_als_tpu.models.als import ALS
        # scale 0.125 of the Netflix shape: 2221 x 60023, ~12M nnz
        train, test = workload_ratings("netflix", scale=0.125, seed=0)
        cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16,
                        lam=0.048, iters=2, solver="cg", verbose=False,
                        debug_timing=False, chunk_nnz=1 << 19,
                        train_rmse_method="fused")
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
        single = ALS(cfg, train, None, test).run(x0, th0)
        multi = ShardedALS(cfg, train, None, test,
                           n_devices=8).run(x0, th0)
        for a, b in zip(single.history, multi.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-3)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=2e-3)
        assert multi.history[-1].train_rmse < multi.history[0].train_rmse
