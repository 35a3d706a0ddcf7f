"""Split-table direct path (SplitPlan): coverage/contract invariants of
the plan builder, plan-cache round trip, and e2e trajectory parity with
the plain direct path. This is the both-sides-big gather strategy (the
Yahoo-class fix): the gather table is popularity-permuted and cut into
fixed-size parts so every gather operand stays at the fast small-operand
tier (reference analog: the texture-staged theta-phase kernels,
hugewiki.cu:686-1688)."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.data.synthetic import init_factors
from cumf_als_tpu.models.als import ALS, do_als
from cumf_als_tpu.models.reference_numpy import numpy_als
from cumf_als_tpu.ops.tiling import build_split_plan
from cumf_als_tpu.utils import plan_cache as pc


def _cfg(train, iters=3, **kw):
    base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                iters=iters, verbose=False, debug_timing=False,
                chunk_nnz=1 << 12)
    base.update(kw)
    return ALSConfig(**base)


class TestBuildSplitPlan:
    def test_covers_all_nonzeros_once(self, medium_problem):
        train, _ = medium_problem
        plan = build_split_plan(train, part_size=40, chunk_nnz=1 << 10)
        assert plan.true_nnz == train.nnz
        assert plan.n_parts == -(-train.num_cols // 40)
        # perm is a permutation of the gather-table rows
        assert np.array_equal(np.sort(plan.perm),
                              np.arange(train.num_cols))
        seen = {}
        for ch in plan.chunks:
            assert len(ch.parts) == len(ch.widths) == len(ch.cols)
            assert list(ch.parts) == sorted(ch.parts)
            assert ch.vals.shape == (ch.num_rows, ch.width)
            for r in range(ch.num_rows):
                row = int(ch.rows[r])
                if row == plan.num_rows:  # dummy tail
                    assert ch.nnz[r] == 0
                    continue
                assert row not in seen
                cols_all, off = [], 0
                for k, w, cb in zip(ch.parts, ch.widths, ch.cols):
                    local = cb[r]
                    vseg = ch.vals[r, off:off + w]
                    live = local != plan.part_size
                    # padding contract: sentinel cols carry zero vals
                    assert np.all(vseg[~live] == 0.0)
                    # part-local ids map back through the permutation
                    glob = plan.perm[k * plan.part_size +
                                     local[live].astype(np.int64)]
                    cols_all.append(np.stack(
                        [glob, vseg[live]], axis=0))
                    off += w
                cat = np.concatenate(cols_all, axis=1) if cols_all else \
                    np.zeros((2, 0))
                assert cat.shape[1] == int(ch.nnz[r])
                seen[row] = cat
        for i in range(train.num_rows):
            lo, hi = int(train.indptr[i]), int(train.indptr[i + 1])
            if hi == lo:
                assert i not in seen
                continue
            got = seen[i]
            order = np.argsort(got[0])
            np.testing.assert_array_equal(got[0, order],
                                          train.indices[lo:hi])
            np.testing.assert_allclose(got[1, order], train.data[lo:hi])

    def test_popularity_concentrates_part0(self, medium_problem):
        """The popularity permutation must put the heaviest gather-table
        rows in part 0, so most chunks touch few parts."""
        train, _ = medium_problem
        plan = build_split_plan(train, part_size=40, chunk_nnz=1 << 10)
        pop = np.bincount(train.indices, minlength=train.num_cols)
        part0 = pop[plan.perm[:40]].sum()
        assert part0 >= pop.sum() * 40 / train.num_cols  # beats uniform
        # expansion stays bounded despite the per-part width quantization
        assert plan.expansion < 3.0

    def test_single_part_degenerates_to_direct_widths(self, small_problem):
        train, _ = small_problem
        plan = build_split_plan(train, part_size=train.num_cols + 8,
                                chunk_nnz=1 << 10)
        assert plan.n_parts == 1
        for ch in plan.chunks:
            assert ch.parts == (0,)


class TestSplitPlanCache:
    def test_round_trip(self, medium_problem, tmp_path):
        train, _ = medium_problem
        plan = build_split_plan(train, part_size=40, chunk_nnz=1 << 10)
        pc.save_plan(str(tmp_path), "k", plan)
        got = pc.load_plan(str(tmp_path), "k")
        assert (got.num_rows, got.num_cols, got.part_size, got.n_parts,
                got.true_nnz, got.padded_nnz) == (
            plan.num_rows, plan.num_cols, plan.part_size, plan.n_parts,
            plan.true_nnz, plan.padded_nnz)
        assert np.array_equal(got.perm, plan.perm)
        assert len(got.chunks) == len(plan.chunks)
        for a, b in zip(plan.chunks, got.chunks):
            assert a.parts == b.parts and a.widths == b.widths
            assert np.array_equal(a.rows, b.rows)
            assert np.array_equal(a.nnz, b.nnz)
            for ca, cb in zip(a.cols, b.cols):
                assert np.array_equal(ca, cb)
            np.testing.assert_array_equal(a.vals, b.vals)


class TestSplitTrajectory:
    def test_matches_numpy_oracle(self, medium_problem):
        """split_gather='force' with a tiny part budget (many parts on
        both phases) must reproduce the exact-solver oracle trajectory."""
        train, test = medium_problem
        cfg = _cfg(train, solver="cholesky", split_gather="force",
                   gather_part_bytes=40 * 128 * 4)
        assert cfg.split_part_rows() == 40
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
        als = ALS(cfg, train, None, test)
        assert als._phase_strategy(train) == "split"
        res = do_als(train, None, test, th0, x0, cfg)
        _, _, ref_hist = numpy_als(train, test, x0, th0, cfg.lam,
                                   cfg.iters)
        for got, (rt, re) in zip(res.history, ref_hist):
            assert got.train_rmse == pytest.approx(rt, abs=1e-3)
            assert got.test_rmse == pytest.approx(re, abs=1e-3)

    def test_cg_matches_direct_path(self, medium_problem):
        """Same solver/config, split vs plain direct: identical math,
        so the trajectories must agree to solver tolerance."""
        train, test = medium_problem
        x0, th0 = init_factors(train.num_rows, train.num_cols, 16, seed=2)
        res_d = do_als(train, None, test, th0, x0,
                       _cfg(train, solver="cg", split_gather="off"))
        res_s = do_als(train, None, test, th0, x0,
                       _cfg(train, solver="cg", split_gather="force",
                            gather_part_bytes=40 * 128 * 4))
        for a, b in zip(res_d.history, res_s.history):
            assert b.train_rmse == pytest.approx(a.train_rmse, abs=2e-4)
            assert b.test_rmse == pytest.approx(a.test_rmse, abs=5e-4)

    def test_fused_phase_interpret_matches_oracle(self, small_problem,
                                                  monkeypatch):
        """The one-program fused split phase (pallas backend) through
        the interpreter-mode fused Gram+CG kernel must track the
        oracle — exercises make_parts + per-part gathers + the
        single-scatter write-back inside one jit."""
        import jax.experimental.pallas as pl
        import cumf_als_tpu.ops.pallas_solve as ps
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(ps.pl, "pallas_call", patched)
        monkeypatch.setattr(ps, "fused_available", lambda: True)
        train, test = small_problem
        cfg = _cfg(train, iters=2, solver="cg", backend="pallas",
                   aug_gram="off", split_gather="force",
                   gather_part_bytes=16 * 128 * 4, fuse_phase=True)
        assert cfg.split_part_rows() == 16
        x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=3)
        als = ALS(cfg, train, None, test)
        assert als._phase_strategy(train) == "split"
        res = als.run(x0, th0)
        _, _, ref_hist = numpy_als(train, test, x0, th0, cfg.lam,
                                   cfg.iters)
        for got, (rt, re) in zip(res.history, ref_hist):
            assert got.train_rmse == pytest.approx(rt, abs=2e-3)
            assert got.test_rmse == pytest.approx(re, abs=5e-3)


class TestSplitRouting:
    def test_auto_routes_split_when_fused(self, medium_problem,
                                          monkeypatch):
        """Auto mode: both-sides-big phases route to 'split' when the
        fused kernel is available and the gather table exceeds one
        part; plain direct when the table fits a single part; and the
        fused-direct fallback when split is off."""
        import cumf_als_tpu.ops.pallas_solve as ps
        train, _ = medium_problem
        base = dict(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    use_panels="auto", panel_size=64,
                    panel_budget_bytes=1, backend="pallas", solver="cg",
                    gather_part_bytes=40 * 128 * 4,
                    split_min_table_bytes=0)
        model = ALS.__new__(ALS)
        monkeypatch.setattr(ps, "fused_available", lambda: True)
        model.cfg = ALSConfig(**base)
        assert model._phase_strategy(train) == "split"
        model.cfg = ALSConfig(**{**base, "split_gather": "off"})
        assert model._phase_strategy(train) == "direct"
        model.cfg = ALSConfig(
            **{**base, "gather_part_bytes": 1 << 30})
        assert model._phase_strategy(train) == "direct"
        # auto requires the slow-tier table threshold (r4: a 123 MB
        # table measured faster direct than split)
        model.cfg = ALSConfig(
            **{**base, "split_min_table_bytes": 1 << 30})
        assert model._phase_strategy(train) == "direct"
        monkeypatch.setattr(ps, "fused_available", lambda: False)
        model.cfg = ALSConfig(**base)
        assert model._phase_strategy(train) == "batched_panel"


class TestTupleGroupMerge:
    def test_merge_bounds_group_count(self):
        import numpy as np
        from cumf_als_tpu.ops.tiling import _merge_tuple_groups
        warr = np.asarray([8, 16, 32, 64], np.int64)

        def grid_w(widx):
            return np.where(widx > 0, warr[np.maximum(widx - 1, 0)], 0)

        # 40 tiny adjacent groups with slightly varying tuples
        raw = []
        lo = 0
        rng = np.random.RandomState(0)
        for i in range(40):
            r = int(rng.randint(1, 4))
            widx = np.asarray([1 + (i % 3), (i // 3) % 2, 0], np.int32)
            raw.append((lo, lo + r, widx))
            lo += r
        groups = _merge_tuple_groups(raw, grid_w, max_groups=6)
        assert len(groups) <= 6 + 4  # negative-cost merges may stop early
        # coverage: contiguous, complete
        assert groups[0][0] == 0
        for (a, b, _), (c, d, _) in zip(groups, groups[1:]):
            assert b == c
        assert groups[-1][1] == lo
        # widths dominate every member tuple
        for glo, ghi, w in groups:
            for rlo, rhi, widx in raw:
                if rlo >= glo and rhi <= ghi:
                    assert np.all(w >= grid_w(widx))

    def test_merge_noop_when_groups_large(self):
        import numpy as np
        from cumf_als_tpu.ops.tiling import _merge_tuple_groups
        warr = np.asarray([8, 16, 32], np.int64)

        def grid_w(widx):
            return np.where(widx > 0, warr[np.maximum(widx - 1, 0)], 0)

        raw = [(0, 5000, np.asarray([1, 0], np.int32)),
               (5000, 9000, np.asarray([3, 1], np.int32))]
        groups = _merge_tuple_groups(raw, grid_w, max_groups=8)
        # two big dissimilar groups: merging would pad 5000 rows 4x —
        # must stay separate
        assert len(groups) == 2
