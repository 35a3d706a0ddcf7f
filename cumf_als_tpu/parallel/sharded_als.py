"""Multi-chip ALS: the hugewiki app re-designed as SPMD over a mesh.

The reference's 4-GPU topology (reference hugewiki/hugewiki.cu:2248-2888):
X out-of-core/streamed, theta replicated and broadcast after each update,
partial Gram matrices gathered to GPU0 and accumulated with cublasSaxpy,
batches pulled off a shared OpenMP counter. Here:

  - the LARGE factor is row-sharded over a 1-D mesh (balanced by nnz);
  - the SMALL factor is replicated (the broadcast is free: XLA keeps it
    replicated);
  - large-factor update: shard_map with NO collectives (row solves are
    independent — pure model parallelism, SURVEY §2 parallelism item 1);
  - small-factor update: each device forms partial (A, b) from its
    ratings shard, lax.psum over the mesh axis — the ICI all-reduce that
    replaces hugewiki.cu:2703-2730 — then every device solves the block
    (replicated compute, no broadcast needed afterwards).
"""

from __future__ import annotations

import sys
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.models.als import ALSResult, IterationMetrics
from cumf_als_tpu.ops.gram import _PRECISIONS
from cumf_als_tpu.ops.pallas_solve import (backend_uses_pallas,
                                             call_with_vmem_backoff)
from cumf_als_tpu.ops.solve import solve
from cumf_als_tpu.parallel.mesh import DATA_AXIS, make_mesh
from cumf_als_tpu.parallel.plan import (build_reduce_plan,
                                        build_sharded_row_plan,
                                        build_sharded_x_panel_steps)
from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix
from cumf_als_tpu.utils.timing import seconds


def _gram_local(table_ext, cols, vals, precision, factor_dtype="f32"):
    """Local gather + MXU contraction (no regularizer — the caller adds
    it after any cross-device reduction)."""
    g = jnp.take(table_ext, cols, axis=0)
    if factor_dtype == "bf16":  # CUMF_USE_HALF analog
        g = g.astype(jnp.bfloat16)
    prec = _PRECISIONS[precision]
    a = jnp.einsum("rpf,rpg->rfg", g, g, precision=prec,
                   preferred_element_type=jnp.float32)
    b = jnp.einsum("rp,rpf->rf", vals, g, precision=prec,
                   preferred_element_type=jnp.float32)
    return a, b


class ShardedALS:
    """SPMD ALS over a 1-D device mesh (the hugewiki-capability path)."""

    def __init__(self, cfg: ALSConfig, train_csr: CSRMatrix,
                 train_csc: Optional[CSRMatrix] = None,
                 test_coo: Optional[COOMatrix] = None,
                 n_devices: Optional[int] = None,
                 block_rows: int = 1 << 14):
        from cumf_als_tpu.utils.plan_cache import (cached_build,
                                                   cached_transpose)
        self.cfg = cfg
        self.mesh = make_mesh(n_devices)
        self.n_dev = self.mesh.devices.size
        self.train_csr = train_csr
        self.train_csc = train_csc or cached_transpose(
            cfg.plan_cache_dir, train_csr)
        self.test_coo = test_coo
        row_params = dict(n_dev=self.n_dev, min_w=cfg.min_bucket_width,
                          max_w=cfg.max_bucket_width,
                          chunk_nnz=cfg.chunk_nnz,
                          chunk_rows=cfg.chunk_rows,
                          octave=cfg.octave_points)
        self.row_plan = cached_build(
            cfg.plan_cache_dir, "sh_row", train_csr, row_params,
            lambda: build_sharded_row_plan(
                train_csr, self.n_dev, cfg.min_bucket_width,
                cfg.max_bucket_width, cfg.chunk_nnz, cfg.chunk_rows,
                octave_points=cfg.octave_points))
        self.reduce_plan = cached_build(
            cfg.plan_cache_dir, "sh_reduce", train_csr,
            dict(row_params, block_rows=block_rows),
            lambda: build_reduce_plan(
                self.train_csc, self.row_plan, block_rows=block_rows))
        self._shard = NamedSharding(self.mesh, P(DATA_AXIS))
        self._repl = NamedSharding(self.mesh, P())
        # Panelized X phase (the single-device PanelPlan optimization
        # brought to SPMD): when the replicated gather table exceeds
        # panel_size rows, gathers drop to HBM rate; if per-device full
        # (A, b) accumulators fit, restructure the phase as per-panel
        # partial Grams (cols panel-local) scatter-added per device.
        self.x_steps = None
        f = cfg.f_pad
        ps = min(cfg.panel_size, 1 << 16)
        a_el = 2 if cfg.gram_dtype == "bf16" else 4
        batch = min(cfg.chunk_rows,
                    -(-(self.row_plan.m_loc + 1) // 8) * 8)
        m_pad = -(-(self.row_plan.m_loc + 1) // batch) * batch
        margin = max(1, ps // 8)
        # Mirror the plain ALS strategy (models/als._phase_strategy):
        # panel whenever the replicated gather table exceeds the fast
        # gather tier (> panel_size rows) and the accumulator fits.
        # r4 NOTE: an earlier r4 cut preferred DIRECT chunks for
        # slow-tier tables under split_min_table_bytes — measured a 2.3x
        # regression (2.70 vs 1.198 s/iter, round4_logs/netflix_mesh1e
        # vs mesh1b): 99M gathers from the 480k-row Netflix theta table
        # run at the ~13 ns/row HBM tier, exactly what panels avoid.
        if (cfg.use_panels != "never"
                and train_csr.num_cols > ps + margin
                and m_pad * f * f * a_el <= cfg.panel_budget_bytes):
            self.x_panel_size = ps
            self._x_solve_batch = batch
            self._x_m_pad = m_pad
            from cumf_als_tpu.parallel.plan import AlignedSteps
            xp_params = dict(row_params, panel=ps,
                             split_w=cfg.split_width,
                             octave=cfg.octave_points)
            aligned = cached_build(
                cfg.plan_cache_dir, "sh_xpanel", train_csr, xp_params,
                lambda: AlignedSteps(*build_sharded_x_panel_steps(
                    train_csr, self.row_plan, ps, cfg.min_bucket_width,
                    cfg.chunk_nnz, cfg.chunk_rows, cfg.split_width,
                    cfg.octave_points)))
            self.x_steps, self.x_n_panels = (aligned.steps,
                                             aligned.n_panels)
            row_nnz = np.diff(np.asarray(train_csr.indptr))
            nnz_loc = np.zeros((self.n_dev, m_pad), np.int32)
            for d in range(self.n_dev):
                ids = self.row_plan.global_ids[d]
                valid = ids < self.row_plan.m
                nnz_loc[d, :self.row_plan.m_loc][valid] = \
                    row_nnz[ids[valid]]
            self._x_nnz_loc = nnz_loc
        self._test_plan = (self._build_coo_plan(test_coo)
                           if test_coo is not None and test_coo.nnz else None)
        self._fn_cache = {}
        self._cpu_mesh = self.mesh.devices.flat[0].platform == "cpu"

    # ---------- factor layout ----------
    def shard_x(self, x: np.ndarray) -> jnp.ndarray:
        """(m, f) host factors -> (n_dev, m_loc, f_pad) device-sharded."""
        f_pad = self.cfg.f_pad
        out = np.zeros((self.n_dev, self.row_plan.m_loc, f_pad), np.float32)
        for d in range(self.n_dev):
            ids = self.row_plan.global_ids[d]
            valid = ids < self.row_plan.m
            out[d, valid, :x.shape[1]] = x[ids[valid]]
        return jax.device_put(out, self._shard)

    def unshard_x(self, x_sharded: jnp.ndarray) -> np.ndarray:
        if not x_sharded.is_fully_addressable:
            # multi-host: each process holds only its DCN slice; one
            # XLA all-gather replicates before the host fetch (the
            # reference's anchor-GPU gather, hugewiki.cu:2703, done by
            # the compiler)
            x_sharded = jax.jit(lambda a: a,
                                out_shardings=self._repl)(x_sharded)
        xs = np.asarray(x_sharded)
        out = np.zeros((self.row_plan.m, self.cfg.f), np.float32)
        for d in range(self.n_dev):
            ids = self.row_plan.global_ids[d]
            valid = ids < self.row_plan.m
            out[ids[valid]] = xs[d, valid, :self.cfg.f]
        return out

    def replicate_theta(self, theta: np.ndarray) -> jnp.ndarray:
        f_pad = self.cfg.f_pad
        out = np.zeros((theta.shape[0], f_pad), np.float32)
        out[:, :theta.shape[1]] = theta
        return jax.device_put(out, self._repl)

    # ---------- jitted sharded steps ----------
    def _x_body_fn(self):
        """The per-chunk X row solve on an ALREADY cast+extended theta
        table: (theta_ext, xs, rows, nnz, cols, vals) -> xs, all args
        device-local (leading axis stripped)."""
        key = ("x_body", self.cfg.solver)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg

        use_pallas = cfg.backend == "pallas" and cfg.solver == "cg"
        use_aug = False
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import (aug_enabled,
                                                       fused_available)
            use_pallas = fused_available()
            use_aug = use_pallas and aug_enabled(cfg)

        def body(theta_ext, xs, rows, nnz, cols, vals):
            x0 = jnp.take(xs, rows, axis=0, mode="fill", fill_value=0.0)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_cg
                solved, _se = gather_gram_cg(
                    theta_ext, cols, vals, nnz, x0, cfg.lam,
                    cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                    factor_dtype=cfg.factor_dtype, aug=use_aug)
            else:
                a, b = _gram_local(theta_ext, cols, vals,
                                   cfg.gram_precision,
                                   cfg.factor_dtype)
                nnzf = nnz.astype(jnp.float32)
                diag = nnzf * cfg.lam + (nnzf == 0)
                a = a + diag[:, None, None] * jnp.eye(a.shape[-1],
                                                      dtype=jnp.float32)
                solved = solve(a, b, x0, solver=cfg.solver,
                               cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                               backend=cfg.backend)
                solved = solved * (nnz > 0)[:, None]
            return xs.at[rows].set(solved, mode="drop")

        self._fn_cache[key] = body
        return body

    def _x_chunk_sm(self, width: int, r: int):
        """shard_map-wrapped (unjitted) X-phase chunk update; cached per
        shape so it can be composed inside larger jitted programs."""
        key = ("x_sm", width, r, self.cfg.solver)
        if key in self._fn_cache:
            return self._fn_cache[key]
        body_fn = self._x_body_fn()

        def body(theta, x_shard, rows, nnz, cols, vals):
            # per-device blocks: x_shard (1, m_loc, f); index arrays (1, ...)
            # zero-extend: padded cols (== n) must gather zeros
            theta_ext = self._extend_table(theta)
            xs = body_fn(theta_ext, x_shard[0], rows[0], nnz[0],
                         cols[0], vals[0])
            return xs[None]

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            # pallas_call outputs carry no vma metadata; specs are
            # explicit here so the check adds nothing
            check_vma=False)
        self._fn_cache[key] = sm
        return sm

    def _x_chunk_fn(self, width: int, r: int):
        key = ("x", width, r, self.cfg.solver)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(self._x_chunk_sm(width, r),
                                          donate_argnums=(1,))
        return self._fn_cache[key]

    # ---------- panelized X phase ----------
    def _x_panel_group_sm(self, shapes_key):
        """shard_map'd accumulation of one panel's chunk group: slice
        the panel from the replicated (padded) table, form partial
        (A, b) per chunk, scatter-add into the per-device accumulators.
        One program per shapes signature, reused across panels (the
        panel start is a traced scalar)."""
        from cumf_als_tpu.ops.pallas_solve import panel_aug_enabled
        aug = panel_aug_enabled(self.cfg)
        key = ("xp_group_sm", shapes_key, aug)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        s = self.x_panel_size
        prec = _PRECISIONS[cfg.gram_precision]

        use_pallas = cfg.backend == "pallas"
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import fused_available
            use_pallas = fused_available()

        if aug:
            def body_aug(theta_pad, p_start, a_buf, chunk_arrays):
                f = theta_pad.shape[1]
                tp = jax.lax.dynamic_slice(theta_pad, (p_start, 0),
                                           (s, f))
                if cfg.factor_dtype == "bf16":
                    tp = tp.astype(jnp.bfloat16)
                tp = jnp.concatenate(
                    [tp, jnp.zeros((1, f), tp.dtype)], axis=0)
                a = a_buf[0]
                from cumf_als_tpu.ops.pallas_solve import (
                    augment_g, gather_gram_aug_out)
                for rows, cols, vals in chunk_arrays:
                    if use_pallas:
                        a_part = gather_gram_aug_out(
                            tp, cols[0], vals[0],
                            out_dtype=str(a.dtype))
                    else:
                        g = augment_g(jnp.take(tp, cols[0], axis=0),
                                      vals[0])
                        a_part = jnp.einsum(
                            "rpf,rpg->rfg", g, g, precision=prec,
                            preferred_element_type=jnp.float32)
                    a = a.at[rows[0]].add(a_part.astype(a.dtype),
                                          mode="drop")
                return a[None]

            sm = jax.shard_map(
                body_aug, mesh=self.mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
            self._fn_cache[key] = sm
            return sm

        def body(theta_pad, p_start, a_buf, b_buf, chunk_arrays):
            f = theta_pad.shape[1]
            tp = jax.lax.dynamic_slice(theta_pad, (p_start, 0), (s, f))
            if cfg.factor_dtype == "bf16":  # CUMF_USE_HALF analog
                tp = tp.astype(jnp.bfloat16)
            tp = jnp.concatenate(
                [tp, jnp.zeros((1, f), tp.dtype)], axis=0)
            a, b = a_buf[0], b_buf[0]
            for rows, cols, vals in chunk_arrays:
                if use_pallas:
                    from cumf_als_tpu.ops.pallas_solve import \
                        gather_gram_out
                    a_part, b_part = gather_gram_out(
                        tp, cols[0], vals[0], out_dtype=str(a.dtype))
                else:
                    g = jnp.take(tp, cols[0], axis=0)
                    a_part = jnp.einsum(
                        "rpf,rpg->rfg", g, g, precision=prec,
                        preferred_element_type=jnp.float32)
                    b_part = jnp.einsum(
                        "rp,rpf->rf", vals[0], g, precision=prec,
                        preferred_element_type=jnp.float32)
                a = a.at[rows[0]].add(a_part.astype(a.dtype), mode="drop")
                b = b.at[rows[0]].add(b_part, mode="drop")
            return a[None], b[None]

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
        self._fn_cache[key] = sm
        return sm

    def _x_panel_group_fn(self, shapes_key):
        from cumf_als_tpu.ops.pallas_solve import panel_aug_enabled
        aug = panel_aug_enabled(self.cfg)
        key = ("xp_group", shapes_key, aug)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                self._x_panel_group_sm(shapes_key),
                donate_argnums=(2,) if aug else (2, 3))
        return self._fn_cache[key]

    def _x_panel_solve_sm(self):
        """Batched per-device solves over the accumulated (A, b) — or
        the combined augmented A' (b in row f-1) in aug mode."""
        from cumf_als_tpu.ops.pallas_solve import panel_aug_enabled
        aug = panel_aug_enabled(self.cfg)
        key = ("xp_solve_sm", self.cfg.solver, aug)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        m_loc = self.row_plan.m_loc
        m_pad = self._x_m_pad
        batch = self._x_solve_batch

        def solve_full(a_full, b_full, nnz, x_shard):
            f = a_full.shape[-1]
            x0_full = jnp.pad(x_shard, ((0, m_pad - m_loc), (0, 0)))
            outs = []
            for lo in range(0, m_pad, batch):
                # raw (possibly bf16) A slice; the regularizer rides
                # into the solve (in-VMEM on the pallas path)
                a = jax.lax.dynamic_slice(
                    a_full, (lo, 0, 0), (batch, f, f))
                b = None if aug else \
                    jax.lax.dynamic_slice(b_full, (lo, 0), (batch, f))
                x0 = jax.lax.dynamic_slice(x0_full, (lo, 0), (batch, f))
                nz = jax.lax.dynamic_slice(nnz, (lo,), (batch,)
                                           ).astype(jnp.float32)
                diag = nz * cfg.lam + (nz == 0)
                sv = solve(a, b, x0, solver=cfg.solver,
                           cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                           backend=cfg.backend, diag=diag, aug=aug)
                outs.append(sv * (nz > 0)[:, None])
            solved = outs[0] if len(outs) == 1 else \
                jnp.concatenate(outs, axis=0)
            return solved[:m_loc][None]

        if aug:
            def body_aug(a_buf, x_shard, nnz_loc):
                return solve_full(a_buf[0], None, nnz_loc[0], x_shard[0])
            sm = jax.shard_map(
                body_aug, mesh=self.mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
        else:
            def body(a_buf, b_buf, x_shard, nnz_loc):
                return solve_full(a_buf[0], b_buf[0], nnz_loc[0],
                                  x_shard[0])
            sm = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
        self._fn_cache[key] = sm
        return sm

    def _x_panel_solve_fn(self):
        from cumf_als_tpu.ops.pallas_solve import panel_aug_enabled
        aug = panel_aug_enabled(self.cfg)
        key = ("xp_solve", self.cfg.solver, aug)
        if key not in self._fn_cache:
            # Donate only x_shard (its shape matches the output). The
            # (A, b) accumulators are READ across every solve batch, so
            # XLA can never alias them into the small output — donating
            # them only produced the "donated buffers were not usable"
            # warning flagged in VERDICT r3 #4.
            self._fn_cache[key] = jax.jit(
                self._x_panel_solve_sm(),
                donate_argnums=(1,) if aug else (2,))
        return self._fn_cache[key]

    def _x_panel_groups(self):
        """Step indices grouped by panel (bounded by fuse_max_chunks)."""
        groups = []
        for i, st in enumerate(self.x_steps):
            if groups and groups[-1][0] == st.panel and \
                    len(groups[-1][1]) < self.cfg.fuse_max_chunks:
                groups[-1][1].append(i)
            else:
                groups.append((st.panel, [i]))
        return groups

    def _run_x_panel_phase(self, x_sharded, theta, xp_data,
                           jitted: bool):
        """The panelized X phase. jitted=True dispatches cached jits per
        group (run()); jitted=False composes the raw shard_maps inside
        an enclosing jit trace (fused_iteration)."""
        cfg = self.cfg
        from cumf_als_tpu.ops.pallas_solve import panel_aug_enabled
        aug = panel_aug_enabled(cfg)
        steps_data, nnz_loc = xp_data
        s, f = self.x_panel_size, cfg.f_pad
        pad_to = self.x_n_panels * s
        # bf16 accumulators swamp past ~16 scatter-adds per row — the
        # same depth gate as ShardedOutOfCoreALS/models.als (r5: the
        # plain panel path NaN'd at hugewiki scale without it).
        depth = sum(int(st.rows.shape[1]) if hasattr(st, "rows")
                    else int(st._r) for st in self.x_steps) \
            / max(1, self.row_plan.m_loc)
        a_dtype = jnp.bfloat16 if (cfg.gram_dtype == "bf16" and
                                   depth <= 16) else jnp.float32
        if jitted:
            key = ("xp_init", pad_to, aug)
            if key not in self._fn_cache:
                if aug:
                    zeros_fn = jax.jit(lambda: jnp.zeros(
                        (self.n_dev, self._x_m_pad, f, f), a_dtype),
                        out_shardings=self._shard)
                else:
                    zeros_fn = jax.jit(lambda: (
                        jnp.zeros((self.n_dev, self._x_m_pad, f, f),
                                  a_dtype),
                        jnp.zeros((self.n_dev, self._x_m_pad, f),
                                  jnp.float32)),
                        out_shardings=(self._shard, self._shard))
                self._fn_cache[key] = (
                    jax.jit(lambda th: jnp.pad(
                        th, ((0, pad_to - th.shape[0]), (0, 0))),
                        out_shardings=self._repl),
                    zeros_fn)
            pad_fn, zeros_fn = self._fn_cache[key]
            theta_pad = pad_fn(theta)
            if aug:
                a_buf, b_buf = zeros_fn(), None
            else:
                a_buf, b_buf = zeros_fn()
        else:
            theta_pad = jnp.pad(
                theta, ((0, pad_to - theta.shape[0]), (0, 0)))
            a_buf = jax.lax.with_sharding_constraint(
                jnp.zeros((self.n_dev, self._x_m_pad, f, f), a_dtype),
                self._shard)
            b_buf = None if aug else jax.lax.with_sharding_constraint(
                jnp.zeros((self.n_dev, self._x_m_pad, f), jnp.float32),
                self._shard)
        for panel, idxs in self._x_panel_groups():
            shapes_key = tuple(
                (self.x_steps[i].rows.shape[1], self.x_steps[i].width)
                for i in idxs)
            fn = self._x_panel_group_fn(shapes_key) if jitted \
                else self._x_panel_group_sm(shapes_key)
            chunk_args = tuple(steps_data[i] for i in idxs)
            p_start = jnp.asarray(panel * s, jnp.int32)
            if aug:
                args = (theta_pad, p_start, a_buf, chunk_args)
                a_buf = call_with_vmem_backoff(
                    fn, *args,
                    uses_pallas=backend_uses_pallas(self.cfg)) \
                    if jitted else fn(*args)
            else:
                args = (theta_pad, p_start, a_buf, b_buf, chunk_args)
                a_buf, b_buf = call_with_vmem_backoff(
                    fn, *args,
                    uses_pallas=backend_uses_pallas(self.cfg)) \
                    if jitted else fn(*args)
        fn = self._x_panel_solve_fn() if jitted \
            else self._x_panel_solve_sm()
        args = (a_buf, x_sharded, nnz_loc) if aug else \
            (a_buf, b_buf, x_sharded, nnz_loc)
        return call_with_vmem_backoff(
            fn, *args, uses_pallas=backend_uses_pallas(self.cfg)) \
            if jitted else fn(*args)

    def _extend_table(self, table):
        """Cast (bf16 path) + zero-extend a gather table ONCE — hoisted
        out of the per-block bodies so barrier-chained group programs
        don't re-materialize it per block (r4: 37 re-casts of the 123 MB
        Netflix theta table cost more than the grouping saved)."""
        if self.cfg.factor_dtype == "bf16":
            table = table.astype(jnp.bfloat16)
        return jnp.concatenate(
            [table, jnp.zeros((1, table.shape[-1]), table.dtype)],
            axis=0)

    def _theta_body_fn(self):
        """The per-block theta update on an ALREADY cast+extended local
        X table: (xs_ext, theta, se_in, rows, nnz_total, cols, vals) ->
        (theta, se). cols/vals are the device-local (leading-axis-
        stripped) views; runs under shard_map (the psums bind there)."""
        key = ("theta_body", self.cfg.solver)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg

        use_pallas = cfg.backend == "pallas"
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import fused_available
            use_pallas = fused_available()
        from cumf_als_tpu.ops.pallas_solve import (aug_enabled,
                                                   panel_aug_enabled)
        aug = panel_aug_enabled(cfg)
        aug_direct = use_pallas and aug_enabled(cfg)

        # bf16 partials (CUMF_TT_FP16 analog): halves the partial-Gram
        # HBM writes AND the ICI all-reduce bytes; the regularizer is
        # applied to the f32 VMEM copy inside the CG solve kernel, so
        # the raw A never gets upcast in HBM.
        a_dt = "bfloat16" if cfg.gram_dtype == "bf16" else "float32"

        # n_dev == 1: every theta row's ratings are device-local, so
        # the psum'd accumulate-then-solve structure degenerates — the
        # fused Gram+CG kernel solves the block directly with A never
        # leaving VMEM (no materialized (R, f, f) partial, no separate
        # CG pass). This is what closes the r3/r4 mesh=1 gap vs plain
        # ALS (1.18-1.24 vs ~1.0 s/iter).
        single_fused = self.n_dev == 1 and use_pallas and \
            cfg.solver == "cg"

        def body(xs_ext, theta, se_in, rows, nnz_total, cols, vals):
            if single_fused:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_cg
                th0 = jnp.take(theta, rows, axis=0, mode="fill",
                               fill_value=0.0)
                solved, se_rows = gather_gram_cg(
                    xs_ext, cols, vals, nnz_total, th0, cfg.lam,
                    cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                    factor_dtype=cfg.factor_dtype, aug=aug_direct)
                theta = theta.at[rows].set(solved, mode="drop")
                return theta, se_in + jnp.sum(se_rows)
            if aug:
                # combined partial A' (b in row f-1, sum r^2 in the
                # corner): ONE psum replaces the (A, b, vsq) trio
                from cumf_als_tpu.ops.pallas_solve import (
                    augment_g, gather_gram_aug_out)
                if use_pallas:
                    a_part = gather_gram_aug_out(xs_ext, cols,
                                                 vals, out_dtype=a_dt)
                else:
                    g = augment_g(jnp.take(xs_ext, cols, axis=0),
                                  vals)
                    a_part = jnp.einsum(
                        "rpf,rpg->rfg", g, g,
                        precision=_PRECISIONS[cfg.gram_precision],
                        preferred_element_type=jnp.float32
                    ).astype(jnp.dtype(a_dt))
            elif use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_out
                a_part, b_part = gather_gram_out(xs_ext, cols,
                                                 vals, out_dtype=a_dt)
            else:
                a_part, b_part = _gram_local(xs_ext, cols, vals,
                                             cfg.gram_precision,
                                             cfg.factor_dtype)
                a_part = a_part.astype(jnp.dtype(a_dt))
            # ICI all-reduce of partial Gram/RHS — replaces the reference's
            # anchor-GPU memcpy+saxpy loop (hugewiki.cu:2703-2730).
            a = jax.lax.psum(a_part, DATA_AXIS)
            nnzf = nnz_total.astype(jnp.float32)
            diag = nnzf * cfg.lam + (nnzf == 0)
            th0 = jnp.take(theta, rows, axis=0, mode="fill", fill_value=0.0)
            if aug:
                # aug implies f32 accumulators (panel_aug_enabled's
                # gram_dtype gate, ADVICE r3), so the b row and the vsq
                # corner read back exact f32 psums here
                f = a.shape[-1]
                lane = jnp.arange(f)
                brow = a[:, f - 1, :].astype(jnp.float32)  # [b | vsq]
                b = brow * (lane < f - 1)
                vsq = brow[:, f - 1]
            else:
                b = jax.lax.psum(b_part, DATA_AXIS)
                vsq = jax.lax.psum(jnp.sum(vals * vals, axis=-1),
                                   DATA_AXIS)
            solved = solve(a, None if aug else b, th0, solver=cfg.solver,
                           cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                           backend=cfg.backend, diag=diag, aug=aug)
            solved = solved * (nnzf > 0)[:, None]
            theta = theta.at[rows].set(solved, mode="drop")
            # free train-RMSE pieces (exact identity, ops/rmse.py) from
            # the raw (un-regularized) A; in aug mode the value row/
            # column of A' contribute nothing (solved lane f-1 is zero)
            xt = solved
            cross = jnp.sum(xt * b, axis=-1)
            aq = jnp.einsum("rfg,rg->rf", a, xt,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            quad = jnp.sum(xt * aq, axis=-1)
            se = jnp.sum(jnp.maximum(vsq - 2.0 * cross + quad, 0.0))
            # accumulate INSIDE the jit: an eager scalar add per block
            # is a multi-device dispatch, and hundreds of them
            # abort-crashed XLA:CPU on realistic shapes (r3)
            return theta, se_in + se

        self._fn_cache[key] = body
        return body

    def _theta_block_sm(self, width: int, c: int):
        key = ("theta_sm", width, c, self.cfg.solver)
        if key in self._fn_cache:
            return self._fn_cache[key]
        body_fn = self._theta_body_fn()

        def body(x_shard, theta, se_in, rows, nnz_local, nnz_total,
                 cols, vals):
            return body_fn(self._extend_table(x_shard[0]), theta, se_in,
                           rows, nnz_total, cols[0], vals[0])

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(), P(), P(), P(DATA_AXIS), P(),
                      P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()), check_vma=False)
        self._fn_cache[key] = sm
        return sm

    def _theta_block_fn(self, width: int, c: int):
        key = ("theta", width, c, self.cfg.solver)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(self._theta_block_sm(width, c),
                                          donate_argnums=(1, 2))
        return self._fn_cache[key]

    # ---------- one fully-jitted training step ----------
    def device_plan(self):
        """All plan arrays placed with their shardings, as pytrees. In
        panel mode the X-phase entry is (per-step (rows, cols, vals),
        per-device row nnz) instead of the bucket chunk tuples."""
        if self.x_steps is not None:
            chunk_data = (tuple(
                (jax.device_put(st.rows, self._shard),
                 jax.device_put(st.cols, self._shard),
                 jax.device_put(st.vals, self._shard))
                for st in self.x_steps),
                jax.device_put(self._x_nnz_loc, self._shard))
        else:
            chunk_data = tuple(
                (jax.device_put(ch.rows, self._shard),
                 jax.device_put(ch.nnz, self._shard),
                 jax.device_put(ch.cols, self._shard),
                 jax.device_put(ch.vals, self._shard))
                for ch in self.row_plan.chunks)
        block_data = tuple(
            (jax.device_put(bl.rows, self._repl),
             jax.device_put(bl.nnz_local, self._shard),
             jax.device_put(bl.nnz_total, self._repl),
             jax.device_put(bl.cols, self._shard),
             jax.device_put(bl.vals, self._shard))
            for bl in self.reduce_plan.blocks)
        return chunk_data, block_data

    def fused_iteration(self):
        """One FULL ALS iteration (X phase + psum'd theta phase + train
        sq-err) as a single jitted SPMD program. This is the form the MXU
        pipeline likes best (XLA overlaps gathers, matmuls and the ICI
        all-reduce across chunks) and the dryrun entry point for
        multi-chip validation."""

        def step(x_sharded, theta, chunk_data, block_data):
            if self.x_steps is not None:
                x_sharded = self._run_x_panel_phase(
                    x_sharded, theta, chunk_data, jitted=False)
            else:
                for (rows, nnz, cols, vals) in chunk_data:
                    sm = self._x_chunk_sm(int(vals.shape[-1]),
                                          int(rows.shape[-1]))
                    x_sharded = sm(theta, x_sharded, rows, nnz, cols,
                                   vals)
            se = jnp.zeros((), jnp.float32)
            for (rows, nnz_local, nnz_total, cols, vals) in block_data:
                sm = self._theta_block_sm(int(vals.shape[-1]),
                                          int(rows.shape[0]))
                theta, se = sm(x_sharded, theta, se, rows, nnz_local,
                               nnz_total, cols, vals)
            return x_sharded, theta, se

        return jax.jit(step, donate_argnums=(0, 1))

    def fused_phases(self):
        """The X and theta phases as TWO jitted SPMD programs (the
        fused_step="on" A/B form). One whole-iteration program
        (fused_iteration) holds the X panel accumulators AND every
        theta block's gather buffers in one memory plan — measured 16.0
        GB peak on Netflix mesh=1, over the v5e's 15.75 GB HBM; the
        per-phase theta program STILL OOMs there (XLA hoists every
        block's 0.5-1 GB gather/partial-Gram temps; round4_logs/
        netflix_mesh1b.log), which is why run()'s auto mode uses the
        barrier-chained GROUP dispatches (_theta_group_fn /
        _x_chunk_group_fn) instead."""

        def x_phase(x_sharded, theta, chunk_data):
            if self.x_steps is not None:
                return self._run_x_panel_phase(x_sharded, theta,
                                               chunk_data, jitted=False)
            for (rows, nnz, cols, vals) in chunk_data:
                sm = self._x_chunk_sm(int(vals.shape[-1]),
                                      int(rows.shape[-1]))
                x_sharded = sm(theta, x_sharded, rows, nnz, cols, vals)
            return x_sharded

        def theta_phase(x_sharded, theta, block_data):
            se = jnp.zeros((), jnp.float32)
            for (rows, nnz_local, nnz_total, cols, vals) in block_data:
                sm = self._theta_block_sm(int(vals.shape[-1]),
                                          int(rows.shape[0]))
                theta, se = sm(x_sharded, theta, se, rows, nnz_local,
                               nnz_total, cols, vals)
            return theta, se

        return (jax.jit(x_phase, donate_argnums=(0,)),
                jax.jit(theta_phase, donate_argnums=(1,)))

    # Blocks per fused group dispatch: each theta block holds ~0.5-1 GB
    # of gather + partial-Gram temps live (Netflix shapes), and the
    # in-group barrier serializes them, so the group's peak is ~one
    # block while dispatch count (the axon tunnel charges per dispatch;
    # VERDICT r3 #4's 25% mesh=1 overhead) drops by the group factor.
    GROUP_BLOCKS = 8

    def _theta_group_fn(self, idxs):
        """One jitted SPMD program covering theta blocks idxs: ONE
        shard_map whose body casts+extends the local X table once, then
        runs the blocks chained through an optimization_barrier on
        (xs_ext, theta, se) — XLA can neither hoist every block's
        0.5-1 GB gather/partial temps (the unbarriered per-phase
        program co-materializes them and OOMs HBM, see fused_phases)
        nor, because the prep is OUTSIDE the chain, re-materialize the
        table per block (the r4 first-cut group fns re-cast the 123 MB
        Netflix theta table per chunk and LOST time)."""
        blocks = self.reduce_plan.blocks
        key = ("theta_group", tuple(
            (blocks[i].width, blocks[i].rows.shape[0]) for i in idxs),
            self.cfg.solver)
        if key in self._fn_cache:
            return self._fn_cache[key]
        body_fn = self._theta_body_fn()
        n = len(idxs)

        def group(x_shard, theta, se, block_args):
            xs_ext = self._extend_table(x_shard[0])
            for (rows, _nnz_local, nnz_total, cols, vals) in block_args:
                xs_ext, theta, se = jax.lax.optimization_barrier(
                    (xs_ext, theta, se))
                theta, se = body_fn(xs_ext, theta, se, rows, nnz_total,
                                    cols[0], vals[0])
            return theta, se

        blk_spec = (P(), P(DATA_AXIS), P(), P(DATA_AXIS), P(DATA_AXIS))
        sm = jax.shard_map(
            group, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(), P(),
                      tuple(blk_spec for _ in range(n))),
            out_specs=(P(), P()), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(1, 2))
        self._fn_cache[key] = fn
        return fn

    def _x_chunk_group_fn(self, idxs):
        """Group twin for the non-panel X phase: one shard_map program
        per GROUP_BLOCKS row chunks — the replicated theta table is
        cast+extended once, the chunk solves chain through a barrier
        for bounded gather liveness."""
        chunks = self.row_plan.chunks
        key = ("x_group", tuple(
            (chunks[i].width, chunks[i].rows.shape[1]) for i in idxs),
            self.cfg.solver)
        if key in self._fn_cache:
            return self._fn_cache[key]
        body_fn = self._x_body_fn()
        n = len(idxs)

        def group(theta, x_shard, chunk_args):
            theta_ext = self._extend_table(theta)
            xs = x_shard[0]
            for (rows, nnz, cols, vals) in chunk_args:
                theta_ext, xs = jax.lax.optimization_barrier(
                    (theta_ext, xs))
                xs = body_fn(theta_ext, xs, rows[0], nnz[0], cols[0],
                             vals[0])
            return xs[None]

        ch_spec = (P(DATA_AXIS),) * 4
        sm = jax.shard_map(
            group, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS),
                      tuple(ch_spec for _ in range(n))),
            out_specs=P(DATA_AXIS), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(1,))
        self._fn_cache[key] = fn
        return fn

    # ---------- test RMSE ----------
    def _build_coo_plan(self, coo: COOMatrix):
        """Group COO entries by the device that owns their large-factor
        row; local ids for x, global for theta."""
        owner = np.zeros(self.row_plan.m, np.int32)
        local = np.zeros(self.row_plan.m, np.int32)
        for d in range(self.n_dev):
            ids = self.row_plan.global_ids[d]
            valid = ids < self.row_plan.m
            owner[ids[valid]] = d
            local[ids[valid]] = np.arange(
                self.row_plan.m_loc, dtype=np.int32)[valid]
        dev = owner[coo.row]
        e_loc = max(int(np.max(np.bincount(dev, minlength=self.n_dev))), 1)
        rows = np.full((self.n_dev, e_loc), self.row_plan.m_loc, np.int32)
        cols = np.zeros((self.n_dev, e_loc), np.int32)
        vals = np.zeros((self.n_dev, e_loc), np.float32)
        wght = np.zeros((self.n_dev, e_loc), np.float32)
        for d in range(self.n_dev):
            sel = dev == d
            k = int(sel.sum())
            rows[d, :k] = local[coo.row[sel]]
            cols[d, :k] = coo.col[sel]
            vals[d, :k] = coo.data[sel]
            wght[d, :k] = 1.0
        return (jax.device_put(rows, self._shard),
                jax.device_put(cols, self._shard),
                jax.device_put(vals, self._shard),
                jax.device_put(wght, self._shard), coo.nnz)

    def _coo_sq_err_fn(self):
        key = ("rmse",)
        if key in self._fn_cache:
            return self._fn_cache[key]

        def body(x_shard, theta, rows, cols, vals, wght):
            xg = jnp.take(x_shard[0], rows[0], axis=0, mode="fill",
                          fill_value=0.0)
            tg = jnp.take(theta, cols[0], axis=0, mode="fill",
                          fill_value=0.0)
            pred = jnp.sum(xg * tg, axis=-1)
            e = (vals[0] - pred) * wght[0]
            return jax.lax.psum(jnp.sum(e * e), DATA_AXIS)

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(), check_vma=False)
        fn = jax.jit(sm)
        self._fn_cache[key] = fn
        return fn

    # ---------- one full iteration (jittable end to end) ----------
    def iteration(self, x_sharded, theta, device_data=None):
        """One ALS iteration: X phase (model parallel), theta phase
        (data parallel + psum). Returns (x, theta, train_sq_err).

        device_data: optional (chunk_data, block_data) from
        device_plan() — the plan arrays already resident with their
        shardings. Without it every chunk re-uploads host arrays, which
        costs a full plan transfer per iteration; run() always passes
        the resident plan."""
        if device_data is None:
            device_data = self.device_plan()
        chunk_data, block_data = device_data
        if self.x_steps is not None:
            x_sharded = self._run_x_panel_phase(x_sharded, theta,
                                                chunk_data, jitted=True)
        else:
            for arrs, ch in zip(chunk_data, self.row_plan.chunks):
                fn = self._x_chunk_fn(ch.width, ch.rows.shape[1])
                x_sharded = call_with_vmem_backoff(
                    fn, theta, x_sharded, *arrs,
                    uses_pallas=backend_uses_pallas(self.cfg))
        # running device-scalar accumulation: an eager jnp.stack over
        # hundreds of block scalars abort-crashed XLA:CPU on the
        # realistic-shape test (r3); a chained add dispatches one tiny
        # op per block and syncs once at the float()
        se_acc = jnp.zeros((), jnp.float32)
        for i, (arrs, bl) in enumerate(zip(block_data,
                                           self.reduce_plan.blocks)):
            fn = self._theta_block_fn(bl.width, bl.rows.shape[0])
            theta, se_acc = call_with_vmem_backoff(
                fn, x_sharded, theta, se_acc, *arrs,
                uses_pallas=backend_uses_pallas(self.cfg))
            self._maybe_throttle(i, theta)
        se_total = float(se_acc) if block_data else 0.0
        return x_sharded, theta, se_total

    def _grouped_iteration(self, x_sharded, theta, device_data):
        """One ALS iteration via barrier-chained GROUP dispatches
        (fused_step="auto" on accelerator meshes): the panelized X
        phase already dispatches per panel group; the non-panel X
        chunks and the theta reduce blocks go GROUP_BLOCKS per jitted
        program. Same math as iteration(), ~1/GROUP_BLOCKS of its
        dispatch count."""
        cfg = self.cfg
        chunk_data, block_data = device_data
        if self.x_steps is not None:
            x_sharded = self._run_x_panel_phase(x_sharded, theta,
                                                chunk_data, jitted=True)
        else:
            for lo in range(0, len(chunk_data), self.GROUP_BLOCKS):
                idxs = range(lo, min(lo + self.GROUP_BLOCKS,
                                     len(chunk_data)))
                fn = self._x_chunk_group_fn(list(idxs))
                x_sharded = call_with_vmem_backoff(
                    fn, theta, x_sharded,
                    tuple(chunk_data[i] for i in idxs),
                    uses_pallas=backend_uses_pallas(cfg))
        se_acc = jnp.zeros((), jnp.float32)
        for lo in range(0, len(block_data), self.GROUP_BLOCKS):
            idxs = range(lo, min(lo + self.GROUP_BLOCKS,
                                 len(block_data)))
            fn = self._theta_group_fn(list(idxs))
            theta, se_acc = call_with_vmem_backoff(
                fn, x_sharded, theta, se_acc,
                tuple(block_data[i] for i in idxs),
                uses_pallas=backend_uses_pallas(cfg))
        se_total = float(se_acc) if block_data else 0.0
        return x_sharded, theta, se_total

    def _maybe_throttle(self, i: int, ref) -> None:
        """Simulated-mesh dispatch throttle: on the CPU backend the
        async queue outruns execution, and hundreds of enqueued block
        programs hold their gather buffers live at once — observed as
        an XLA:CPU abort at ~14 GB on the realistic-shape test (r3).
        Real accelerators bound their queue; no-op there."""
        if self._cpu_mesh and (i + 1) % 32 == 0:
            jax.block_until_ready(ref)

    def run(self, x0: np.ndarray, theta0: np.ndarray,
            start_iter: int = 0) -> ALSResult:
        cfg = self.cfg
        # zero empty rows/cols (excluded from every chunk/block): their
        # factors would otherwise keep their init values and pollute test
        # predictions — the SURPASS_NAN-intended semantics (ALS.run twin)
        theta0 = theta0 * (np.diff(self.train_csc.indptr) > 0
                           ).astype(np.float32)[:, None]
        x0 = x0 * (np.diff(self.train_csr.indptr) > 0
                   ).astype(np.float32)[:, None]
        x = self.shard_x(x0)
        theta = self.replicate_theta(theta0)
        device_data = self.device_plan()  # plan resident for the run
        # Fused dispatch granularity (VERDICT r3 #4: per-chunk dispatch
        # cost ~25% at mesh=1 — the tunnel charges per dispatch):
        #   auto -> barrier-chained GROUP programs (~GROUP_BLOCKS per
        #           dispatch, HBM peak ~one block; whole-phase programs
        #           OOM at Netflix scale, round4_logs/netflix_mesh1b);
        #   on   -> one program per phase (A/B; falls back on OOM);
        #   off  -> per-chunk dispatch (+ CPU-mesh throttle).
        # CPU meshes always take per-chunk (one big program at
        # realistic shapes aborts XLA:CPU — r3).
        mode = cfg.fused_step
        if self._cpu_mesh and mode == "auto":
            mode = "off"
        phase_fns = self.fused_phases() if mode == "on" else None
        history: List[IterationMetrics] = []
        if cfg.verbose:
            print(f"*******parameters: m: {cfg.m}, n:  {cfg.n}, "
                  f"f: {cfg.f}, nnz: {self.train_csr.nnz} ")
            print(f"*******mesh: {self.n_dev} devices over axis "
                  f"'{DATA_AXIS}'.")
            print("*******start iterations...")
        for it in range(start_iter, cfg.iters):
            t0 = seconds()
            if phase_fns is not None:
                try:
                    x_fn, th_fn = phase_fns
                    chunk_data, block_data = device_data
                    x = call_with_vmem_backoff(
                        x_fn, x, theta, chunk_data,
                        uses_pallas=backend_uses_pallas(cfg))
                    theta, se_dev = call_with_vmem_backoff(
                        th_fn, x, theta, block_data,
                        uses_pallas=backend_uses_pallas(cfg))
                    se = float(se_dev)
                except Exception as e:  # noqa: BLE001 — filtered below
                    from cumf_als_tpu.ops.pallas_solve import \
                        _classify_compile_oom
                    if it != start_iter or \
                            _classify_compile_oom(e) is None:
                        raise
                    # HBM-OOM at compile (the opaque remote-compile
                    # failure survives the VMEM backoff): the fused
                    # phase program's working set exceeds the chip.
                    # Donated inputs are only consumed at execution,
                    # so falling back to group dispatch is safe.
                    print("[sharded] fused phase program failed to "
                          "compile; falling back to group "
                          f"dispatch ({e})", file=sys.stderr, flush=True)
                    phase_fns = None
                    mode = "auto"
                    x, theta, se = self._grouped_iteration(
                        x, theta, device_data)
            elif mode == "auto":
                x, theta, se = self._grouped_iteration(x, theta,
                                                       device_data)
            else:
                x, theta, se = self.iteration(x, theta, device_data)
            theta.block_until_ready()
            dt = seconds() - t0
            train_rmse = float(np.sqrt(max(se, 0.0) / self.train_csr.nnz))
            if cfg.verbose:
                print(f"update X+theta run {dt:f} seconds (sharded, "
                      f"{self.n_dev} devices).")
                print(f"--------- Train RMSE in iter {it}: {train_rmse:f}")
            test_rmse = float("nan")
            if self._test_plan is not None:
                rows, cols, vals, wght, nnz_test = self._test_plan
                se_t = float(self._coo_sq_err_fn()(x, theta, rows, cols,
                                                   vals, wght))
                test_rmse = float(np.sqrt(se_t / nnz_test))
                if cfg.verbose:
                    print(f"--------- Test RMSE in iter {it}: "
                          f"{test_rmse:f}")
            history.append(IterationMetrics(it, train_rmse, test_rmse,
                                            dt, 0.0, 0.0))
            if not np.isfinite(train_rmse):
                raise FloatingPointError(
                    f"non-finite train RMSE at iteration {it}")
            if cfg.checkpoint_every and cfg.checkpoint_dir and \
                    (it + 1) % cfg.checkpoint_every == 0:
                from cumf_als_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(cfg.checkpoint_dir, it, self.unshard_x(x),
                                np.asarray(theta)[:, :cfg.f], cfg)
        return ALSResult(x=self.unshard_x(x),
                         theta=np.asarray(theta)[:, :cfg.f],
                         history=history)
