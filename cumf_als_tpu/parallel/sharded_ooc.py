"""Sharded + out-of-core ALS: the full hugewiki capability.

The reference's hugewiki app combines THREE mechanisms in one program
(reference hugewiki/hugewiki.cu:2248-2888): the tall factor XT lives in
pinned host memory (XT_h, hugewiki.cu:2300-2302) and is streamed through
device memory batch by batch (2560-2572); the rating matrix is sharded
across 4 GPUs; and the small-factor update all-reduces partial Gram
matrices via an anchor-GPU memcpy+cublasSaxpy loop (2703-2730). Round-1
had sharding (parallel/sharded_als.py) and host-resident X
(models/out_of_core.py) only separately; this module is the combination,
sized for the real workload (m=50M, nnz=3.1B, hugewiki.cu:27-42):

  - rows are nnz-balanced across a 1-D mesh; each device's X shard stays
    HOST-resident (the XT_h analog) — full X is m*f*4 B (25.6 GB at
    hugewiki scale), more than one chip holds once plan arrays join it;
  - X phase: per aligned chunk shape, (x0, nnz, cols, vals) stream to
    the devices as (n_dev, R, P) sharded arrays, a shard_map'd fused
    Gram+CG solves against the replicated small factor (the hugewiki
    X-phase gather table is theta, 39,780 rows — on-chip gather rate),
    and solved rows stream back to host double-buffered (the OpenMP
    per-GPU streaming pipeline, hugewiki.cu:2447-2496, as async
    device_put/get);
  - theta phase: for each panel index, every device uploads one <=64k
    panel of its LOCAL X shard and accumulates partial (A, b) over ALL
    theta rows from its panel-local ratings; after the last panel the
    partials are psum'd over ICI (replacing hugewiki.cu:2703-2730) and
    theta solves replicated;
  - plan arrays are never device-resident in aggregate: at hugewiki
    scale they are ~8 B/padded-nnz (~30 GB), so they stream per chunk
    exactly like the reference re-uploads CSR slices per batch
    (hugewiki.cu:2508-2516). All flat offsets are int64 (nnz > 2^31).
"""

from __future__ import annotations

import os
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
from cumf_als_tpu.ops.tiling import build_panel_plan
from cumf_als_tpu.parallel.mesh import DATA_AXIS, make_mesh
from cumf_als_tpu.parallel.plan import (AlignedSteps, ShardedRowPlan,
                                        align_panel_plans,
                                        build_sharded_row_plan)
from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix
from cumf_als_tpu.utils.timing import seconds


# Above this nnz the plan arrays stream (LazyShardedChunk /
# LazyPanelChunk) instead of being pre-materialized.
LAZY_NNZ_THRESHOLD = 1 << 28

# CUMF_RSS_LOG=<N>: print host RSS every N streamed steps inside the
# phase loops (multi-hour-run observability; the reference's analog is
# the per-batch DEBUG printf, hugewiki.cu:2538-2572).
_RSS_LOG_EVERY = int(os.environ.get("CUMF_RSS_LOG", "0"))


def _rss_gb() -> float:
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * 4096 / 1e9


def _maybe_log_rss(phase: str, step: int) -> None:
    if _RSS_LOG_EVERY and step % _RSS_LOG_EVERY == 0:
        import sys
        print(f"[rss] {phase} step {step}: {_rss_gb():.2f} GB",
              file=sys.stderr, flush=True)


class ShardedOutOfCoreALS:
    """Multi-chip ALS with the large factor host-resident per shard."""

    def __init__(self, cfg: ALSConfig, train_csr: CSRMatrix,
                 train_csc: Optional[CSRMatrix] = None,
                 test_coo: Optional[COOMatrix] = None,
                 n_devices: Optional[int] = None):
        from cumf_als_tpu.utils.plan_cache import (cached_build,
                                                   cached_transpose)
        self.cfg = cfg
        self.mesh = make_mesh(n_devices)
        self.n_dev = self.mesh.devices.size
        self.train_csr = train_csr
        self.train_csc = train_csc or cached_transpose(
            cfg.plan_cache_dir, train_csr)
        self.test_coo = test_coo
        self._shard = NamedSharding(self.mesh, P(DATA_AXIS))
        self._repl = NamedSharding(self.mesh, P())
        self._fn_cache = {}

        # Lazy plans above ~2.7e8 nnz: padded (cols, vals) arrays
        # materialize per chunk at stream time (the reference re-slices
        # its CSR per batch the same way, hugewiki.cu:2508-2516); eager
        # plan arrays are ~8 B/padded-nnz — ~28 GB at full-hugewiki
        # scale, which cannot coexist with the CSR+CSC+X host store.
        lazy = train_csr.nnz >= LAZY_NNZ_THRESHOLD

        # --- X phase: nnz-balanced row shards, aligned bucket chunks.
        # Plan arrays stay host-side numpy; streamed per chunk.
        row_params = dict(n_dev=self.n_dev, min_w=cfg.min_bucket_width,
                          max_w=cfg.max_bucket_width,
                          chunk_nnz=cfg.chunk_nnz,
                          chunk_rows=cfg.chunk_rows,
                          octave=cfg.octave_points)
        self.row_plan: ShardedRowPlan = cached_build(
            cfg.plan_cache_dir, "sh_row", train_csr,
            dict(row_params, lazy=lazy),
            lambda: build_sharded_row_plan(
                train_csr, self.n_dev, cfg.min_bucket_width,
                cfg.max_bucket_width, cfg.chunk_nnz, cfg.chunk_rows,
                lazy=lazy, octave_points=cfg.octave_points),
            csr_for_lazy=train_csr if lazy else None)

        # --- theta phase: per-device panel plans over LOCAL X ids.
        # Each device's sub-matrix: theta rows x its local x columns.
        # Panel capped 8 short of 2^16 so panel-local ids INCLUDING the
        # pad sentinel (== panel_size) fit the uint16 stream transport.
        m_loc = self.row_plan.m_loc
        self.panel_size = min(cfg.panel_size, (1 << 16) - 8)
        csc = self.train_csc

        # Direct theta (r3): with X HBM-resident on ONE device, the
        # theta update needs no panels and no Gram-tile accumulation at
        # all — theta rows bucket exactly like X rows, gather straight
        # from the device X, and the fused kernel keeps each row's Gram
        # in VMEM. The panel path's scatter-accumulation pays one
        # (f, f)-tile read-modify-write per (row, panel) touch, which at
        # full-hugewiki scale (~765 touches x 39,780 rows) is ~8 TB of
        # HBM traffic per iteration; the direct path pays none. Only the
        # few ultra-hot columns (> THETA_SEG_W ratings, whose gathered
        # slab would not fit HBM in one piece) take a segmented
        # accumulate-then-solve path.
        self._theta_direct = (cfg.x_placement == "device"
                              and self.n_dev == 1)
        self.theta_nnz = np.diff(np.asarray(csc.indptr)).astype(np.int32)
        th_params = dict(row_params, panel=self.panel_size,
                         split_w=cfg.split_width,
                         octave=cfg.octave_points, lazy=lazy)
        if self._theta_direct:
            self.theta_steps = []
            self.n_panels = -(-m_loc // self.panel_size)
            seg_w = self.THETA_SEG_W
            lens = np.diff(np.asarray(csc.indptr)).astype(np.int64)
            norm_mask = lens <= seg_w
            csc_loc = CSRMatrix(indptr=csc.indptr, indices=csc.indices,
                                data=csc.data, num_rows=csc.num_rows,
                                num_cols=m_loc)
            self.th_plan = cached_build(
                cfg.plan_cache_dir, "sh_thdir", train_csr,
                dict(th_params, seg_w=seg_w, direct=True),
                lambda: build_sharded_row_plan(
                    csc_loc, 1, cfg.min_bucket_width, seg_w,
                    cfg.chunk_nnz, cfg.chunk_rows, lazy=lazy,
                    octave_points=cfg.octave_points,
                    fine_max_width=seg_w, row_mask=norm_mask),
                csr_for_lazy=csc_loc if lazy else None)
            self._build_hot_segments(csc, lens, seg_w)
        else:
            def build_theta_steps():
                return AlignedSteps(*align_panel_plans(
                    self._build_per_dev_plans(lazy), csc.num_rows,
                    self.panel_size))

            aligned = cached_build(cfg.plan_cache_dir, "sh_ooc_theta",
                                   train_csr, th_params,
                                   build_theta_steps,
                                   csr_for_lazy=csc if lazy else None)
            self.theta_steps, self.n_panels = (aligned.steps,
                                               aligned.n_panels)

        # --- device-resident X placement (r3) ---
        # x_placement="device": each device's X shard stays in HBM for
        # the whole run (padded to whole panels so the theta-phase
        # panel reads are static slices); per-row CG solves COLD-start,
        # so X never crosses the host boundary — the tunneled-chip D2H
        # path has no fast lane (~35 MB/s, docs/PERFORMANCE.md r3). At
        # reference-hugewiki scale the bf16 shard is 12.8 GB on one
        # v5e — the reference needed pinned host XT_h because its 12 GB
        # GPUs could not hold X (hugewiki.cu:2300-2302).
        self.x_on_device = cfg.x_placement == "device"
        self.m_loc_pad = self.n_panels * self.panel_size
        if self.m_loc_pad <= m_loc:
            # the direct-theta gather sentinel (== m_loc) must hit a
            # real, always-zero padding row of the device X
            self.m_loc_pad = m_loc + 8
        self._x_dev = None
        self._test_order = None


        # Theta accumulator row padding: multiple of 1024 (divisible by
        # every pallas CG row block) — NOT of chunk_rows, which the
        # streamed X phase wants large (the fused kernel keeps Gram in
        # VMEM, so chunk_rows no longer bounds an HBM buffer) and which
        # would balloon the (n_pad, f, f) accumulators.
        batch = min(cfg.chunk_rows, 1024)
        n = csc.num_rows
        self.n_pad = -(-(n + 1) // batch) * batch
        nnz_pad = np.zeros(self.n_pad, np.int32)
        nnz_pad[:n] = self.theta_nnz
        self._theta_nnz_pad = jnp.asarray(nnz_pad)
        # Compacted-stream disk cache (lazy plans only — eager plans
        # already hold their arrays in RAM): after the first pass the
        # per-iteration host cost of a streamed phase collapses to
        # slicing mmap'd pages (utils/stream_cache.py).
        self._x_stream = self._theta_stream = None
        if cfg.plan_cache_dir and lazy:
            from cumf_als_tpu.utils.plan_cache import (
                dataset_fingerprint, plan_key)
            from cumf_als_tpu.utils.stream_cache import StreamCache
            fp = dataset_fingerprint(train_csr)
            sv = cfg.stream_val_dtype
            self._x_stream = StreamCache(cfg.plan_cache_dir, plan_key(
                "xstream", fp, dict(row_params, lazy=lazy, sv=sv)))
            self._theta_stream = StreamCache(cfg.plan_cache_dir, plan_key(
                "thstream", fp, dict(th_params, sv=sv, n_pad=self.n_pad,
                                     direct=self._theta_direct)))

    def _build_per_dev_plans(self, lazy: bool):
        cfg = self.cfg
        train_csr = self.train_csr
        csc = self.train_csc
        m_loc = self.row_plan.m_loc
        per_dev_plans = []
        if self.n_dev == 1:
            # single-device shard: global_ids[0] is the identity, so
            # the device's sub-matrix IS the CSC view — skip the
            # owner-split construction (whose flat temporaries are
            # ~3x nnz bytes, prohibitive at hugewiki scale).
            sub = CSRMatrix(indptr=csc.indptr, indices=csc.indices,
                            data=csc.data, num_rows=csc.num_rows,
                            num_cols=m_loc)
            per_dev_plans.append(build_panel_plan(
                sub, panel_size=self.panel_size,
                min_width=cfg.min_bucket_width, chunk_nnz=cfg.chunk_nnz,
                chunk_rows=cfg.chunk_rows, split_width=cfg.split_width,
                octave_points=cfg.octave_points, lazy=lazy))
        else:
            col_owner = np.zeros(train_csr.num_rows + 1, np.int32)
            col_local = np.zeros(train_csr.num_rows + 1, np.int32)
            for d in range(self.n_dev):
                ids = self.row_plan.global_ids[d]
                valid = ids < train_csr.num_rows
                col_owner[ids[valid]] = d
                col_local[ids[valid]] = np.arange(
                    m_loc, dtype=np.int32)[valid]
            indptr = np.asarray(csc.indptr, np.int64)
            lens = np.diff(indptr)
            owner_flat = col_owner[csc.indices]
            local_flat = col_local[csc.indices]
            row_of = np.repeat(np.arange(csc.num_rows, dtype=np.int64),
                               lens)
            for d in range(self.n_dev):
                sel = owner_flat == d
                r_d = row_of[sel]
                c_d = local_flat[sel]
                v_d = csc.data[sel]
                order = np.lexsort((c_d, r_d))
                r_d, c_d, v_d = r_d[order], c_d[order], v_d[order]
                sub_indptr = np.zeros(csc.num_rows + 1, np.int64)
                np.cumsum(np.bincount(r_d, minlength=csc.num_rows),
                          out=sub_indptr[1:])
                sub = CSRMatrix(indptr=sub_indptr,
                                indices=c_d.astype(np.int32),
                                data=v_d.astype(np.float32),
                                num_rows=csc.num_rows, num_cols=m_loc)
                per_dev_plans.append(build_panel_plan(
                    sub, panel_size=self.panel_size,
                    min_width=cfg.min_bucket_width,
                    chunk_nnz=cfg.chunk_nnz,
                    chunk_rows=cfg.chunk_rows,
                    split_width=cfg.split_width,
                    octave_points=cfg.octave_points, lazy=lazy))
        return per_dev_plans

    # ---------- stream transport compaction ----------
    # The streamed-plan H2D volume (~8 B/padded-nnz in int32+f32)
    # dominates tunnel-bound runs; ids compact to uint16 whenever the
    # target table fits, values to fp16 behind cfg.stream_val_dtype,
    # factors to bf16 when factor_dtype already computes in bf16. The
    # in-jit casts back to int32/f32 run at VPU rate on device.
    def _compact_ids(self, ids: np.ndarray, table_rows: int) -> np.ndarray:
        if table_rows <= (1 << 16):
            return ids.astype(np.uint16)
        return ids

    def _compact_vals(self, vals: np.ndarray) -> np.ndarray:
        if self.cfg.stream_val_dtype == "f16":
            return vals.astype(np.float16)
        return vals

    def _compact_factors(self, x: np.ndarray) -> np.ndarray:
        return x.astype(self._x_store_dtype(), copy=False)

    def _x_store_dtype(self):
        """Host-store dtype for the large factor: bf16 when the compute
        path is bf16 anyway (factor_dtype) — halves the XT_h analog
        (25.6 GB -> 12.8 GB at hugewiki scale) and all panel/warm-start
        stream traffic."""
        if self.cfg.factor_dtype == "bf16":
            import ml_dtypes
            return ml_dtypes.bfloat16
        return np.float32

    # ---------- X phase ----------
    def _chunk_solver(self):
        """Shared per-chunk row solver: (theta, x0, nnz, cols, vals)
        all device-local f32/int32 -> solved rows (R, f_pad) f32. Used
        by both X placements."""
        cfg = self.cfg
        use_pallas = cfg.backend == "pallas" and cfg.solver == "cg"
        use_aug = False
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import (aug_enabled,
                                                       fused_available)
            use_pallas = fused_available()
            use_aug = use_pallas and aug_enabled(cfg)

        def solve_rows(theta, x0, nnz, cols, vals):
            if cfg.factor_dtype == "bf16":  # bf16 table pre-gather
                theta = theta.astype(jnp.bfloat16)
            theta_ext = jnp.concatenate(
                [theta, jnp.zeros((1, theta.shape[1]), theta.dtype)],
                axis=0)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_cg
                solved, _se = gather_gram_cg(
                    theta_ext, cols, vals, nnz, x0, cfg.lam,
                    cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                    factor_dtype=cfg.factor_dtype, aug=use_aug)
            else:
                from cumf_als_tpu.ops.gram import gram_rhs
                a, b = gram_rhs(theta_ext, cols, vals, nnz,
                                cfg.lam, precision=cfg.gram_precision,
                                factor_dtype=cfg.factor_dtype,
                                gram_dtype=cfg.gram_dtype)
                solved = solve(a, b, x0, solver=cfg.solver,
                               cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                               backend=cfg.backend)
            return solved * (nnz > 0)[:, None]

        return solve_rows

    def _x_solve_fn(self, width: int, r: int):
        """shard_map'd streamed-chunk solve: no device-resident X.
        (theta, x0, nnz, cols, vals) -> solved rows, all but theta
        sharded (n_dev, ...)."""
        key = ("xs", width, r)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        solve_rows = self._chunk_solver()

        def body(theta, x0, nnz, cols, vals):
            cols = cols[0].astype(jnp.int32)   # uint16 stream transport
            vals = vals[0].astype(jnp.float32)
            x0 = x0[0].astype(jnp.float32)
            solved = solve_rows(theta, x0, nnz[0], cols, vals)
            if cfg.factor_dtype == "bf16":  # halve the D2H write-back
                solved = solved.astype(jnp.bfloat16)
            return solved[None]

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False)
        # explicit in_shardings: chunk args arrive as RAW numpy (the
        # jit-internal transfer leaks ~1x its bytes in the tunnel
        # client vs ~2x for device_put + execute — measured, see
        # docs/PERFORMANCE.md on the axon H2D leak)
        fn = jax.jit(sm, donate_argnums=(1,),
                     in_shardings=(self._repl, self._shard, self._shard,
                                   self._shard, self._shard))
        self._fn_cache[key] = fn
        return fn

    def _x_phase(self, x_host: np.ndarray, theta: jnp.ndarray) -> None:
        """x_host: (n_dev, m_loc, f_pad). Streams chunks; solved rows
        written back via a 2-deep pipeline (device_put/asarray are
        async/blocking respectively — the hugewiki per-GPU OpenMP
        streaming loop, hugewiki.cu:2447-2496)."""
        pending = []
        m_loc = self.row_plan.m_loc
        for ci, ch in enumerate(self.row_plan.chunks):
            _maybe_log_rss("x", ci)
            rows, nnz, cols, vals = ch.materialize()
            safe_rows = np.minimum(rows, m_loc - 1)
            x0 = np.where((rows < m_loc)[..., None],
                          np.take_along_axis(
                              x_host, safe_rows[..., None], axis=1),
                          np.zeros((), x_host.dtype))
            fn = self._x_solve_fn(ch.width, rows.shape[1])
            from cumf_als_tpu.utils.transfer import fast_put
            solved = call_with_vmem_backoff(
                fn, theta, fast_put(self._compact_factors(x0),
                                    self._shard),
                fast_put(nnz, self._shard),
                fast_put(self._compact_ids(cols,
                                           self.row_plan.num_cols + 1),
                         self._shard),
                fast_put(self._compact_vals(vals), self._shard),
                uses_pallas=backend_uses_pallas(self.cfg))
            pending.append((rows, nnz, solved))
            if len(pending) >= 2:
                self._drain_one(x_host, pending)
        while pending:
            self._drain_one(x_host, pending)

    @staticmethod
    def _drain_one(x_host, pending):
        rows, nnz, solved = pending.pop(0)
        out = np.asarray(solved)
        for d in range(rows.shape[0]):
            valid = nnz[d] > 0
            x_host[d, rows[d][valid]] = out[d][valid]

    # ---------- X phase, device-resident placement ----------
    def _x_scatter_fn(self, width: int, r: int):
        """shard_map'd streamed-chunk solve scattering straight into the
        HBM-resident X shard (donated in-place): (x_dev, theta, rows,
        nnz, cols, vals) -> x_dev. CG warm-starts from the shard itself
        — no x0 upload, no solved-rows D2H (cf. the reference's
        per-batch H2D/D2H of XT_h slices, hugewiki.cu:2560-2572)."""
        key = ("xdev", width, r)
        if key in self._fn_cache:
            return self._fn_cache[key]
        solve_rows = self._chunk_solver()
        warm = self.cfg.x_warm_start

        def body(x_dev, theta, rows, nnz, cols, vals):
            rows = rows[0].astype(jnp.int32)
            cols = cols[0].astype(jnp.int32)   # uint16 stream transport
            vals = vals[0].astype(jnp.float32)
            # Warm start from the HBM-resident shard itself (each row is
            # solved once per phase, so the gather sees last iteration's
            # value). r3 cold-started here and train RMSE drifted UP
            # after iter 3 under cg_iters=20 (VERDICT r3 #5) — the warm
            # start restores the plain-ALS trajectory at no transfer
            # cost; sentinel rows (id >= m_loc_pad) read as zero and
            # their solves are dropped by the scatter anyway.
            # cfg.x_warm_start=False reverts to the cold start (the
            # state-dir per-process mode, where X is not persisted).
            if warm:
                x0 = jnp.take(x_dev[0], rows, axis=0, mode="fill",
                              fill_value=0).astype(jnp.float32)
            else:
                x0 = jnp.zeros((rows.shape[0], theta.shape[-1]),
                               jnp.float32)
            solved = solve_rows(theta, x0, nnz[0], cols, vals)
            # dummy rows (sentinel id m_loc) write zeros into the panel
            # padding region, which must stay zero anyway; ids past
            # m_loc_pad (exact-multiple case) drop
            xd = x_dev[0].at[rows].set(solved.astype(x_dev.dtype),
                                       mode="drop")
            return xd[None]

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(0,),
                     in_shardings=(self._shard, self._repl, self._shard,
                                   self._shard, self._shard, self._shard))
        self._fn_cache[key] = fn
        return fn

    def _x_phase_device(self, theta: jnp.ndarray) -> None:
        from cumf_als_tpu.utils.transfer import fast_put
        sc = self._x_stream
        if sc is not None:
            sc.begin()
        for ci, ch in enumerate(self.row_plan.chunks):
            _maybe_log_rss("x", ci)
            ent = sc.get(ci) if sc is not None else None
            if ent is None:
                rows, nnz, cols, vals = ch.materialize()
                cols = self._compact_ids(cols,
                                         self.row_plan.num_cols + 1)
                vals = self._compact_vals(vals)
                if sc is not None and sc.building:
                    sc.put(ci, dict(rows=rows, nnz=nnz, cols=cols,
                                    vals=vals))
            else:
                rows, nnz, cols, vals = (ent["rows"], ent["nnz"],
                                         ent["cols"], ent["vals"])
            fn = self._x_scatter_fn(ch.width, rows.shape[1])
            self._x_dev = call_with_vmem_backoff(
                fn, self._x_dev, theta,
                fast_put(rows, self._shard),
                fast_put(nnz, self._shard),
                fast_put(cols, self._shard),
                fast_put(vals, self._shard),
                uses_pallas=backend_uses_pallas(self.cfg))
        if sc is not None and sc.building:
            sc.finish()

    # ---------- theta phase ----------
    def _accum_fn(self, width: int, r: int):
        """shard_map'd panel accumulation: partial (A, b) over all theta
        rows from one device-local chunk; buffers stay sharded
        per-device (leading axis) and are donated across steps."""
        key = ("acc", width, r)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        prec = _PRECISIONS[cfg.gram_precision]

        use_pallas = cfg.backend == "pallas"
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import fused_available
            use_pallas = fused_available()

        def body(a_buf, b_buf, x_panel, rows, cols, vals):
            rows = rows[0].astype(jnp.int32)   # uint16 stream transport
            cols = cols[0].astype(jnp.int32)
            vals = vals[0].astype(jnp.float32)
            xp = x_panel[0]
            if cfg.factor_dtype == "bf16":
                xp = xp.astype(jnp.bfloat16)
            xp = jnp.concatenate(
                [xp, jnp.zeros((1, xp.shape[1]), xp.dtype)], axis=0)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_out
                a_part, b_part = gather_gram_out(
                    xp, cols, vals, out_dtype=str(a_buf.dtype))
            else:
                g = jnp.take(xp, cols, axis=0)
                a_part = jnp.einsum("rpf,rpg->rfg", g, g, precision=prec,
                                    preferred_element_type=jnp.float32)
                b_part = jnp.einsum("rp,rpf->rf", vals, g,
                                    precision=prec,
                                    preferred_element_type=jnp.float32)
            a = a_buf[0].at[rows].add(a_part.astype(a_buf.dtype),
                                      mode="drop")
            b = b_buf[0].at[rows].add(b_part, mode="drop")
            return a[None], b[None]

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
        # raw-numpy chunk args (see _x_solve_fn on the H2D leak); the
        # panel xp stays a device array — device_put'd one panel ahead
        # for transfer/compute overlap, transferred once per panel
        fn = jax.jit(sm, donate_argnums=(0, 1),
                     in_shardings=(self._shard,) * 6)
        self._fn_cache[key] = fn
        return fn

    def _accum_group_fn(self, shapes_key):
        """One jitted program accumulating a GROUP of same-panel theta
        steps: (a_buf, b_buf, x_panel, ((rows, cols, vals), ...)) ->
        (a_buf, b_buf). Grouping turns the per-step dispatch overhead
        (~38k steps at full-hugewiki scale) into one dispatch per
        (panel, signature) — the same fusion the sharded non-OOC X
        panel phase uses (sharded_als._x_panel_group_fn)."""
        key = ("accg", shapes_key)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        prec = _PRECISIONS[cfg.gram_precision]

        use_pallas = cfg.backend == "pallas"
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import fused_available
            use_pallas = fused_available()

        def body(a_buf, b_buf, x_panel, steps):
            xp = x_panel[0]
            if cfg.factor_dtype == "bf16":
                xp = xp.astype(jnp.bfloat16)
            xp = jnp.concatenate(
                [xp, jnp.zeros((1, xp.shape[1]), xp.dtype)], axis=0)
            a, b = a_buf[0], b_buf[0]
            for rows, cols, vals in steps:
                rows = rows[0].astype(jnp.int32)
                cols = cols[0].astype(jnp.int32)
                vals = vals[0].astype(jnp.float32)
                if use_pallas:
                    from cumf_als_tpu.ops.pallas_solve import \
                        gather_gram_out
                    a_part, b_part = gather_gram_out(
                        xp, cols, vals, out_dtype=str(a.dtype))
                else:
                    g = jnp.take(xp, cols, axis=0)
                    a_part = jnp.einsum(
                        "rpf,rpg->rfg", g, g, precision=prec,
                        preferred_element_type=jnp.float32)
                    b_part = jnp.einsum(
                        "rp,rpf->rf", vals, g, precision=prec,
                        preferred_element_type=jnp.float32)
                a = a.at[rows].add(a_part.astype(a.dtype), mode="drop")
                b = b.at[rows].add(b_part, mode="drop")
            return a[None], b[None]

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(0, 1),
                     in_shardings=(self._shard, self._shard, self._shard,
                                   self._shard))
        self._fn_cache[key] = fn
        return fn

    def _theta_step_groups(self):
        """Step indices grouped by panel, bounded by fuse_max_chunks."""
        groups = []
        for i, st in enumerate(self.theta_steps):
            if groups and groups[-1][0] == st.panel and \
                    len(groups[-1][1]) < self.cfg.fuse_max_chunks:
                groups[-1][1].append(i)
            else:
                groups.append((st.panel, [i]))
        return groups

    # Above this many ratings a theta column's gathered slab would not
    # fit device memory in one padded row — it goes through segmented
    # Gram accumulation instead of the direct fused solve. At reference-
    # hugewiki scale only the few hundred hottest columns qualify.
    THETA_SEG_W = 1 << 18

    def _build_hot_segments(self, csc, lens: np.ndarray,
                            seg_w: int) -> None:
        """Segment descriptors for the hot theta columns: each segment
        is (hot index, flat offset, length) into the CSC arrays; packed
        into fixed-R chunks for the accumulate kernel."""
        hot = np.nonzero(lens > seg_w)[0].astype(np.int32)
        self._hot_rows = hot
        self._hot_nnz = lens[hot].astype(np.int64)
        self._hot_chunks = []
        if hot.size == 0:
            return
        indptr = np.asarray(csc.indptr, np.int64)
        segs = []
        for h, row in enumerate(hot):
            off = int(indptr[row])
            rem = int(lens[row])
            while rem > 0:
                take = min(seg_w, rem)
                segs.append((h, off, take))
                off += take
                rem -= take
        r_seg = max(8, min(self.cfg.chunk_nnz // seg_w, 64))
        for lo in range(0, len(segs), r_seg):
            part = segs[lo:lo + r_seg]
            rows = np.full(r_seg, hot.size, np.int32)  # sentinel
            offs = np.zeros(r_seg, np.int64)
            ls = np.zeros(r_seg, np.int32)
            for j, (h, off, take) in enumerate(part):
                rows[j], offs[j], ls[j] = h, off, take
            self._hot_chunks.append((rows, offs, ls))

    def _materialize_hot(self, chunk):
        """(rows, cols (R, SEG_W), vals) for one hot-segment chunk."""
        rows, offs, ls = chunk
        csc = self.train_csc
        seg_w = self.THETA_SEG_W
        r = rows.shape[0]
        cols = np.full((r, seg_w), self.row_plan.m_loc, np.int32)
        vals = np.zeros((r, seg_w), np.float32)
        for j in range(r):
            k = int(ls[j])
            if k:
                o = int(offs[j])
                cols[j, :k] = csc.indices[o:o + k]
                vals[j, :k] = csc.data[o:o + k]
        return rows, cols, vals

    # ---------- theta phase, direct (device-X, single shard) ----------
    def _th_direct_fn(self, width: int, r: int):
        """Fused direct theta-chunk solve against the HBM-resident X:
        (x_dev, th_new, th_old, se, rows, nnz, cols, vals) ->
        (th_new, se). The per-row Gram never leaves VMEM."""
        key = ("thdir", width, r)
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

        def body(x_dev, th_new, th_old, se_in, rows, nnz, cols, vals):
            xs = x_dev[0]        # sentinel col == m_loc is a zero row
            rows = rows[0].astype(jnp.int32)
            cols = cols[0].astype(jnp.int32)
            vals = vals[0].astype(jnp.float32)
            nnzd = nnz[0]
            x0 = jnp.take(th_old, rows, axis=0, mode="fill",
                          fill_value=0.0)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_cg
                solved, se = gather_gram_cg(
                    xs, cols, vals, nnzd, x0, cfg.lam,
                    cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                    factor_dtype=cfg.factor_dtype, aug=use_aug)
                se = se[:, 0]
            else:
                from cumf_als_tpu.ops.gram import gram_rhs
                from cumf_als_tpu.ops.rmse import fused_sq_err
                a, b = gram_rhs(xs, cols, vals, nnzd, cfg.lam,
                                precision=cfg.gram_precision,
                                factor_dtype=cfg.factor_dtype,
                                gram_dtype=cfg.gram_dtype)
                solved = solve(a, b, x0, solver=cfg.solver,
                               cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                               backend=cfg.backend)
                se = fused_sq_err(a, b, vals, nnzd, cfg.lam, solved)
            solved = solved * (nnzd > 0)[:, None]
            th = th_new.at[rows].set(solved, mode="drop")
            return th, se_in + jnp.sum(se)

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(), P(), P(), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(1, 3),
                     in_shardings=(self._shard, self._repl, self._repl,
                                   self._repl, self._shard, self._shard,
                                   self._shard, self._shard))
        self._fn_cache[key] = fn
        return fn

    def _th_hot_accum_fn(self, r: int):
        """Segmented Gram accumulation for hot theta columns:
        (x_dev, a_h, b_h, v_h, rows, cols, vals) -> (a_h, b_h, v_h)."""
        key = ("thhot", r)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        prec = _PRECISIONS[cfg.gram_precision]

        use_pallas = cfg.backend == "pallas"
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import fused_available
            use_pallas = fused_available()

        def body(x_dev, a_h, b_h, v_h, rows, cols, vals):
            xs = x_dev[0]
            rows = rows[0].astype(jnp.int32)
            cols = cols[0].astype(jnp.int32)
            vals = vals[0].astype(jnp.float32)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_out
                a_part, b_part = gather_gram_out(
                    xs, cols, vals, factor_dtype=cfg.factor_dtype,
                    out_dtype="float32")
            else:
                g = jnp.take(xs, cols, axis=0)
                a_part = jnp.einsum("rpf,rpg->rfg", g, g, precision=prec,
                                    preferred_element_type=jnp.float32)
                b_part = jnp.einsum("rp,rpf->rf", vals, g, precision=prec,
                                    preferred_element_type=jnp.float32)
            vsq = jnp.sum(vals * vals, axis=-1)
            a = a_h.at[rows].add(a_part.astype(a_h.dtype), mode="drop")
            b = b_h.at[rows].add(b_part, mode="drop")
            v = v_h.at[rows].add(vsq, mode="drop")
            return a, b, v

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(), P(), P(), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P()), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(1, 2, 3),
                     in_shardings=(self._shard,) + (self._repl,) * 3
                     + (self._shard,) * 3)
        self._fn_cache[key] = fn
        return fn

    def _th_hot_solve_fn(self):
        """Solve the accumulated hot systems, scatter them into the new
        theta, and add their exact train-SE identity terms."""
        key = ("thhotsolve",)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg

        def body(th_new, se_in, a_h, b_h, v_h, th0_h, nnz_h, rows_h):
            nnzf = nnz_h.astype(jnp.float32)
            diag = nnzf * cfg.lam + (nnzf == 0)
            th = solve(a_h, b_h, th0_h, solver=cfg.solver,
                       cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                       backend=cfg.backend, diag=diag)
            th = th * (nnzf > 0)[:, None]
            cross = jnp.sum(th * b_h, axis=-1)
            aq = jnp.einsum("rfg,rg->rf", a_h, th,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            quad = jnp.sum(th * aq, axis=-1)
            se = jnp.sum(jnp.maximum(v_h - 2.0 * cross + quad, 0.0))
            th_out = th_new.at[rows_h].set(th, mode="drop")
            return th_out, se_in + se

        sm = jax.shard_map(
            body, mesh=self.mesh, in_specs=(P(),) * 8,
            out_specs=(P(), P()), check_vma=False)
        fn = jax.jit(sm, donate_argnums=(0, 1))
        self._fn_cache[key] = fn
        return fn

    def _theta_phase_direct(self, theta: jnp.ndarray):
        """Direct theta update against the HBM-resident X (single
        shard): bucketed fused solves + segmented hot columns. Returns
        (new theta (n, f_pad), total train squared error)."""
        from cumf_als_tpu.utils.transfer import fast_put
        cfg = self.cfg
        f = cfg.f_pad
        n = self.train_csc.num_rows
        zeros = jax.jit(lambda: (jnp.zeros((self.n_pad, f), jnp.float32),
                                 jnp.zeros((), jnp.float32)),
                        out_shardings=(self._repl, self._repl))
        th_new, se = zeros()
        theta_pad = jax.device_put(
            jnp.pad(theta, ((0, self.n_pad - n), (0, 0))), self._repl)
        sc = self._theta_stream
        if sc is not None:
            sc.begin()
        for ci, ch in enumerate(self.th_plan.chunks):
            _maybe_log_rss("theta", ci)
            ent = sc.get(ci) if sc is not None else None
            if ent is None:
                rows, nnz, cols, vals = ch.materialize()
                cols = self._compact_ids(cols, self.row_plan.m_loc + 1)
                vals = self._compact_vals(vals)
                if sc is not None and sc.building:
                    sc.put(ci, dict(rows=rows, nnz=nnz, cols=cols,
                                    vals=vals))
            else:
                rows, nnz, cols, vals = (ent["rows"], ent["nnz"],
                                         ent["cols"], ent["vals"])
            fn = self._th_direct_fn(ch.width, rows.shape[1])
            th_new, se = call_with_vmem_backoff(
                fn, self._x_dev, th_new, theta_pad, se,
                fast_put(rows, self._shard), fast_put(nnz, self._shard),
                fast_put(cols, self._shard), fast_put(vals, self._shard),
                uses_pallas=backend_uses_pallas(cfg))
        if sc is not None and sc.building:
            sc.finish()
        if self._hot_rows.size:
            h_pad = max(8, -(-self._hot_rows.size // 8) * 8)
            zeros_h = jax.jit(
                lambda: (jnp.zeros((h_pad, f, f), jnp.float32),
                         jnp.zeros((h_pad, f), jnp.float32),
                         jnp.zeros((h_pad,), jnp.float32)),
                out_shardings=(self._repl,) * 3)
            a_h, b_h, v_h = zeros_h()
            for chunk in self._hot_chunks:
                rows, cols, vals = self._materialize_hot(chunk)
                fn = self._th_hot_accum_fn(rows.shape[0])
                a_h, b_h, v_h = call_with_vmem_backoff(
                    fn, self._x_dev, a_h, b_h, v_h,
                    fast_put(rows[None], self._shard),
                    fast_put(cols[None], self._shard),
                    fast_put(self._compact_vals(vals)[None],
                             self._shard),
                    uses_pallas=backend_uses_pallas(cfg))
            th0_h = np.zeros((h_pad, f), np.float32)
            th0_h[:self._hot_rows.size] = np.asarray(
                theta)[self._hot_rows]
            nnz_h = np.zeros(h_pad, np.int32)
            nnz_h[:self._hot_rows.size] = np.minimum(
                self._hot_nnz, np.iinfo(np.int32).max)
            rows_h = np.full(h_pad, self.n_pad, np.int32)
            rows_h[:self._hot_rows.size] = self._hot_rows
            th_new, se = call_with_vmem_backoff(
                self._th_hot_solve_fn(), th_new, se, a_h, b_h, v_h,
                jax.device_put(th0_h, self._repl),
                jax.device_put(nnz_h, self._repl),
                jax.device_put(rows_h, self._repl),
                uses_pallas=backend_uses_pallas(cfg))
        return th_new[:n], float(se)

    def _reduce_solve_fn(self):
        """psum the per-device partials over ICI (the reference's
        anchor-GPU gather+saxpy, hugewiki.cu:2703-2730), then solve all
        theta rows replicated and return the fused train-RMSE term."""
        key = ("rsolve",)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg

        def body(a_buf, b_buf, theta0, nnz_pad):
            a = jax.lax.psum(a_buf[0].astype(jnp.float32), DATA_AXIS)
            b = jax.lax.psum(b_buf[0], DATA_AXIS)
            nnzf = nnz_pad.astype(jnp.float32)
            diag = nnzf * cfg.lam + (nnzf == 0)
            # raw A into the solve; diag applied in VMEM on the pallas
            # path (keeps a bf16 accumulator bf16 in HBM)
            th = solve(a, b, theta0, solver=cfg.solver,
                       cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                       backend=cfg.backend, diag=diag)
            th = th * (nnzf > 0)[:, None]
            # train sq-err identity terms (ops/rmse.py): raw A, b
            cross = jnp.sum(th * b)
            aq = jnp.einsum("rfg,rg->rf", a, th,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            quad = jnp.sum(th * aq)
            return th, quad - 2.0 * cross

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
            out_specs=(P(), P()), check_vma=False)
        # No donation here: the (theta, se) outputs can't alias the big
        # Gram accumulators, so donating them only emitted a
        # "Some donated buffers were not usable" warning once per
        # process. The accumulators are freed by explicit .delete() in
        # _theta_phase instead (ROADMAP r2 #5).
        fn = jax.jit(sm)
        self._fn_cache[key] = fn
        return fn

    def _panel_xp_fn(self):
        """Device-X panel read: (x_dev, panel_start) -> the (n_dev, s,
        f_pad) panel, a static-shape dynamic_slice of the HBM shard."""
        key = ("pxp",)
        if key in self._fn_cache:
            return self._fn_cache[key]
        s = self.panel_size

        def body(x_dev, p0):
            xp = jax.lax.dynamic_slice(
                x_dev[0], (p0, jnp.int32(0)), (s, x_dev.shape[2]))
            return xp[None]

        sm = jax.shard_map(
            body, mesh=self.mesh, in_specs=(P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS), check_vma=False)
        fn = jax.jit(sm, in_shardings=(self._shard, self._repl))
        self._fn_cache[key] = fn
        return fn

    # Above this many partial ADDS PER THETA ROW, bf16 Gram accumulators
    # are force-promoted to f32: each row's (A, b) receives one partial
    # per (panel, width-chunk) subrow covering it, and bf16 swamping
    # over deep add-chains (hugewiki: ~19 split-width segments x 765
    # panels per 78k-nnz row) corrupts the Gram and drives the fused
    # train-RMSE identity negative. Netflix-class plans (~1-2 subrows
    # per row) keep the bf16 win (measured test-RMSE delta 1.5e-4,
    # docs/PERFORMANCE.md).
    BF16_ACCUM_MAX_DEPTH = 16

    def _theta_accum_depth(self) -> float:
        """Average scatter-adds per theta accumulator row (dummy slots
        included — they only overestimate, which is the safe side)."""
        slots = sum(int(st.rows.shape[1]) if hasattr(st, "rows")
                    else int(st._r) for st in self.theta_steps)
        return slots / max(1, self.train_csc.num_rows)

    def _theta_phase(self, x_host: np.ndarray, theta: jnp.ndarray):
        cfg = self.cfg
        f = cfg.f_pad
        s = self.panel_size
        m_loc = self.row_plan.m_loc
        use_bf16 = cfg.gram_dtype == "bf16"
        if use_bf16:
            depth = self._theta_accum_depth()
            use_bf16 = depth <= self.BF16_ACCUM_MAX_DEPTH
            if not use_bf16 and not getattr(self, "_warned_promote",
                                            False):
                self._warned_promote = True
                import sys
                print(f"[sharded_ooc] ~{depth:.0f} partial adds per "
                      f"theta row > {self.BF16_ACCUM_MAX_DEPTH}: "
                      f"promoting Gram accumulators bf16 -> f32 "
                      f"(swamping guard)", file=sys.stderr, flush=True)
        a_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        zeros = jax.jit(lambda: (
            jnp.zeros((self.n_dev, self.n_pad, f, f), a_dtype),
            jnp.zeros((self.n_dev, self.n_pad, f), jnp.float32)),
            out_shardings=(self._shard, self._shard))
        a_buf, b_buf = zeros()

        from cumf_als_tpu.utils.transfer import fast_put

        if self.x_on_device:
            slice_fn = self._panel_xp_fn()

            def panel_slice(p):
                # static-shape dynamic_slice of the HBM-resident shard:
                # no host traffic at all for the panel reads
                return slice_fn(self._x_dev,
                                jnp.asarray(p * s, jnp.int32))
        else:
            def panel_slice(p):
                lo = p * s
                sl = x_host[:, lo:min(lo + s, m_loc)]
                if sl.shape[1] < s:
                    sl = np.pad(sl,
                                ((0, 0), (0, s - sl.shape[1]), (0, 0)))
                # chunked async put, issued a panel ahead: H2D overlaps
                # the previous panel's accumulation (the reference's
                # OpenMP streaming, hugewiki.cu:2629-2680)
                return fast_put(self._compact_factors(
                    np.ascontiguousarray(sl)), self._shard)

        groups = self._theta_step_groups()
        panel_ids = [p for p, _ in groups]
        sc = self._theta_stream
        if sc is not None:
            sc.begin()
        nxt_i = 0
        nxt = panel_slice(panel_ids[0]) if panel_ids else None
        cur_panel, xp = -1, None
        for gi, (panel, idxs) in enumerate(groups):
            _maybe_log_rss("theta", gi)
            if panel != cur_panel:
                xp = nxt
                nxt_i += 1
                nxt = panel_slice(panel_ids[nxt_i]) \
                    if nxt_i < len(panel_ids) else None
                cur_panel = panel
            steps = []
            shapes_key = []
            for i in idxs:
                st = self.theta_steps[i]
                shapes_key.append((st.rows.shape[1] if hasattr(
                    st, "rows") else st._r, st.width))
                ent = sc.get(i) if sc is not None else None
                if ent is None:
                    rows, _nnz, cols, vals = st.materialize()
                    rows = self._compact_ids(rows, self.n_pad + 1)
                    cols = self._compact_ids(cols, s + 1)
                    vals = self._compact_vals(vals)
                    if sc is not None and sc.building:
                        sc.put(i, dict(rows=rows, cols=cols, vals=vals))
                else:
                    rows, cols, vals = (ent["rows"], ent["cols"],
                                        ent["vals"])
                steps.append((fast_put(rows, self._shard),
                              fast_put(cols, self._shard),
                              fast_put(vals, self._shard)))
            fn = self._accum_group_fn(tuple(shapes_key))
            a_buf, b_buf = call_with_vmem_backoff(
                fn, a_buf, b_buf, xp, tuple(steps),
                uses_pallas=backend_uses_pallas(self.cfg))
        if sc is not None and sc.building:
            sc.finish()
        n = self.train_csc.num_rows
        theta_pad = jnp.pad(theta, ((0, self.n_pad - n), (0, 0)))
        th_new, se_term = call_with_vmem_backoff(
            self._reduce_solve_fn(),
            a_buf, b_buf, jax.device_put(theta_pad, self._repl),
            self._theta_nnz_pad,
            uses_pallas=backend_uses_pallas(self.cfg))
        se = float(se_term) + self._sum_r2()  # blocks on the solve
        a_buf.delete()  # free the Gram accumulators before the X phase
        b_buf.delete()  # allocates next iteration's chunk buffers
        return th_new[:n], se

    def _sum_r2(self) -> float:
        if not hasattr(self, "_r2"):
            from cumf_als_tpu import native
            if native.available():
                self._r2 = native.sum_squares(self.train_csr.data)
            else:
                self._r2 = float(
                    np.sum(self.train_csr.data.astype(np.float64) ** 2))
        return self._r2

    # ---------- factor layout ----------
    def shard_x_host(self, x0: np.ndarray) -> np.ndarray:
        """(m, f) -> host-resident (n_dev, m_loc, f_pad) (the XT_h
        analog, hugewiki.cu:2300-2302)."""
        f_pad = self.cfg.f_pad
        out = np.zeros((self.n_dev, self.row_plan.m_loc, f_pad),
                       self._x_store_dtype())
        if x0.any():  # zeros stay calloc-virtual (25.6 GB at hugewiki)
            for d in range(self.n_dev):
                ids = self.row_plan.global_ids[d]
                valid = ids < self.row_plan.m
                out[d, valid, :x0.shape[1]] = x0[ids[valid]]
        return out

    def unshard_x_host(self, x_host: np.ndarray) -> np.ndarray:
        out = np.zeros((self.row_plan.m, self.cfg.f), np.float32)
        for d in range(self.n_dev):
            ids = self.row_plan.global_ids[d]
            valid = ids < self.row_plan.m
            out[ids[valid]] = x_host[d, valid, :self.cfg.f]
        return out

    def _inverse_row_maps(self):
        """(owner device, local id) of every global row, cached."""
        if getattr(self, "_inv_maps", None) is None:
            m_loc = self.row_plan.m_loc
            inv_dev = np.zeros(self.row_plan.m, np.int32)
            inv_loc = np.zeros(self.row_plan.m, np.int32)
            for d in range(self.n_dev):
                ids = self.row_plan.global_ids[d]
                valid = ids < self.row_plan.m
                inv_dev[ids[valid]] = d
                inv_loc[ids[valid]] = np.arange(
                    m_loc, dtype=np.int32)[valid]
            self._inv_maps = (inv_dev, inv_loc)
        return self._inv_maps

    def _test_eval_fn(self, c: int):
        """Device-X test-RMSE chunk: (x_dev, theta, rows, cols, vals,
        cnt) -> replicated partial squared error (psum over the mesh —
        each test entry is owned by exactly one device's X shard)."""
        key = ("teval", c)
        if key in self._fn_cache:
            return self._fn_cache[key]

        def body(x_dev, theta, rows, cols, vals, cnt):
            rows = rows[0].astype(jnp.int32)
            cols = cols[0].astype(jnp.int32)
            vals = vals[0].astype(jnp.float32)
            xg = x_dev[0][rows].astype(jnp.float32)
            tg = theta[cols]
            pred = jnp.sum(xg * tg, axis=-1)
            mask = jnp.arange(rows.shape[0]) < cnt[0, 0]
            e = jnp.where(mask, vals - pred, 0.0)
            return jax.lax.psum(jnp.dot(e, e), DATA_AXIS)

        sm = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(DATA_AXIS),) + (P(),) + (P(DATA_AXIS),) * 4,
            out_specs=P(), check_vma=False)
        fn = jax.jit(sm, in_shardings=(self._shard, self._repl)
                     + (self._shard,) * 4)
        self._fn_cache[key] = fn
        return fn

    def _test_rmse_device(self, theta: jnp.ndarray) -> float:
        """Test RMSE against the HBM-resident X: gathers/dots run on
        device; only the (ids, vals) test stream crosses H2D (the
        reference runs RMSE_CSC on GPU0 the same way,
        hugewiki.cu:2752-2857)."""
        from cumf_als_tpu.utils.transfer import fast_put
        coo = self.test_coo
        if coo is None or not coo.nnz:
            return float("nan")
        inv_dev, inv_loc = self._inverse_row_maps()
        if self._test_order is None:
            if self.n_dev == 1:
                self._test_order = ()   # no regrouping needed
            else:
                order = np.argsort(inv_dev[coo.row], kind="stable")
                counts = np.bincount(inv_dev[coo.row],
                                     minlength=self.n_dev)
                self._test_order = (order, counts)
        step = 1 << 22
        if self.n_dev == 1:
            t_loc, starts = coo.nnz, np.zeros(1, np.int64)
        else:
            order, counts = self._test_order
            t_loc = int(counts.max())
            starts = np.zeros(self.n_dev, np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
        parts = []
        for lo in range(0, t_loc, step):
            c = min(step, t_loc - lo)
            c_pad = max(8, -(-c // 8) * 8)
            rows = np.zeros((self.n_dev, c_pad), np.int32)
            cols = np.zeros((self.n_dev, c_pad), np.int32)
            vals = np.zeros((self.n_dev, c_pad), np.float32)
            cnt = np.zeros((self.n_dev, 1), np.int32)
            for d in range(self.n_dev):
                if self.n_dev == 1:
                    sel = slice(lo, min(coo.nnz, lo + step))
                    r = coo.row[sel]
                    co = coo.col[sel]
                    v = coo.data[sel]
                else:
                    k = min(max(0, int(counts[d]) - lo), step)
                    idx = order[starts[d] + lo:starts[d] + lo + k]
                    r, co, v = coo.row[idx], coo.col[idx], coo.data[idx]
                cnt[d, 0] = r.shape[0]
                rows[d, :r.shape[0]] = inv_loc[r]
                cols[d, :co.shape[0]] = co
                vals[d, :v.shape[0]] = v
            fn = self._test_eval_fn(c_pad)
            parts.append(fn(
                self._x_dev, theta,
                fast_put(rows, self._shard),
                fast_put(self._compact_ids(
                    cols, self.train_csc.num_rows), self._shard),
                fast_put(self._compact_vals(vals), self._shard),
                jax.device_put(cnt, self._shard)))
        se = float(jnp.sum(jnp.stack(parts)))
        return float(np.sqrt(se / coo.nnz))

    def _test_rmse(self, x_host: np.ndarray, theta: jnp.ndarray) -> float:
        coo = self.test_coo
        if coo is None or not coo.nnz:
            return float("nan")
        th = np.asarray(theta)[:, :self.cfg.f]
        # chunked: at hugewiki scale (344M test entries, m=50M) a full
        # x[coo.row] gather would materialize ~140 GB
        f = self.cfg.f
        inv_dev, inv_loc = self._inverse_row_maps()
        se = 0.0
        step = 1 << 23
        for lo in range(0, coo.nnz, step):
            r = coo.row[lo:lo + step]
            c = coo.col[lo:lo + step]
            v = coo.data[lo:lo + step]
            xg = x_host[inv_dev[r], inv_loc[r], :f].astype(np.float32)
            pred = np.einsum("ij,ij->i", xg, th[c])
            e = v - pred
            se += float(np.dot(e, e))
        return float(np.sqrt(se / coo.nnz))

    # ---------- training loop ----------
    def run(self, x0: Optional[np.ndarray], theta0: np.ndarray,
            start_iter: int = 0, x_host0: Optional[np.ndarray] = None,
            keep_sharded: bool = False) -> ALSResult:
        """x_host0: resume directly from a sharded host store (skips the
        global (m, f) staging copy — the per-iteration process-restart
        path for leak-bounded full-scale runs). keep_sharded: skip the
        final unshard copy; the sharded store stays on self.x_host."""
        cfg = self.cfg
        theta0 = theta0 * (self.theta_nnz > 0).astype(np.float32)[:, None]
        if self.x_on_device:
            # HBM-resident X shards, cold-started CG: x0/x_host0 are
            # ignored (X is fully determined by theta each iteration;
            # cross-process state is theta alone)
            x_host = None
            self.x_host = None
            zeros = jax.jit(
                lambda: jnp.zeros(
                    (self.n_dev, self.m_loc_pad, cfg.f_pad),
                    jnp.bfloat16 if cfg.factor_dtype == "bf16"
                    else jnp.float32),
                out_shardings=self._shard)
            self._x_dev = zeros()
        elif x_host0 is not None:
            x_host = np.ascontiguousarray(
                x_host0.astype(self._x_store_dtype(), copy=False))
            self.x_host = x_host
        else:
            if x0.any():  # all-zero x0 (reference init): skip the 20 GB+
                x0 = x0 * (np.diff(self.train_csr.indptr) > 0
                           ).astype(np.float32)[:, None]
            x_host = self.shard_x_host(x0)
            self.x_host = x_host
        th = np.zeros((self.train_csc.num_rows, cfg.f_pad), np.float32)
        th[:, :cfg.f] = theta0
        theta = jax.device_put(jnp.asarray(th), self._repl)
        history: List[IterationMetrics] = []
        if cfg.verbose:
            print(f"*******parameters: m: {cfg.m}, n:  {cfg.n}, "
                  f"f: {cfg.f}, nnz: {self.train_csr.nnz} ")
            place = ("HBM-resident" if self.x_on_device
                     else "host-resident")
            print(f"*******mesh: {self.n_dev} devices; X {place} "
                  f"({self.row_plan.m_loc} rows/device), "
                  f"{self.n_panels} local X panels "
                  f"{'sliced' if self.x_on_device else 'streamed'} "
                  f"per theta update.")
            print("*******start iterations...", flush=True)
        for it in range(start_iter, cfg.iters):
            t0 = seconds()
            if self.x_on_device:
                self._x_phase_device(theta)
                if cfg.debug_timing:
                    self._x_dev.block_until_ready()
            else:
                self._x_phase(x_host, theta)
            tx = seconds() - t0
            if cfg.debug_timing:
                print(f"update X run {tx:f} seconds, gridSize: {cfg.m}, "
                      f"blockSize {cfg.f}.", flush=True)
            t0 = seconds()
            if getattr(self, "_theta_direct", False):
                theta, se = self._theta_phase_direct(theta)
            else:
                theta, se = self._theta_phase(x_host, theta)
            # (device placement reads panels straight from self._x_dev;
            # x_host is None there)
            theta.block_until_ready()
            tth = seconds() - t0
            if cfg.debug_timing:
                print(f"update theta run {tth:f} seconds, gridSize: "
                      f"{cfg.n}, blockSize {cfg.f}.", flush=True)
            train_rmse = float(np.sqrt(max(se, 0.0) /
                                       self.train_csr.nnz))
            test_rmse = (self._test_rmse_device(theta)
                         if self.x_on_device
                         else self._test_rmse(x_host, theta))
            if cfg.verbose:
                print(f"--------- Train RMSE in iter {it}: {train_rmse:f}")
                if np.isfinite(test_rmse):
                    print(f"--------- Test RMSE in iter {it}: "
                          f"{test_rmse:f}")
                import sys as _sys
                _sys.stdout.flush()
            history.append(IterationMetrics(it, train_rmse, test_rmse,
                                            tx, tth, 0.0))
            if not np.isfinite(train_rmse):
                raise FloatingPointError(
                    f"non-finite train RMSE at iteration {it}")
            if cfg.checkpoint_every and cfg.checkpoint_dir and \
                    (it + 1) % cfg.checkpoint_every == 0:
                from cumf_als_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(cfg.checkpoint_dir, it,
                                self.fetch_x() if self.x_on_device
                                else self.unshard_x_host(x_host),
                                np.asarray(theta)[:, :cfg.f], cfg)
        if keep_sharded:
            x_out = None
        elif self.x_on_device:
            x_out = self.fetch_x()
        else:
            x_out = self.unshard_x_host(x_host)
        return ALSResult(x=x_out,
                         theta=np.asarray(theta)[:, :cfg.f],
                         history=history)

    def fetch_x(self) -> np.ndarray:
        """D2H the HBM-resident X as a global (m, f) array. Slow on
        tunneled chips (~35 MB/s D2H, no fast lane) — final-output or
        small-problem use only; full-scale runs keep X on device."""
        xh = np.asarray(self._x_dev)[:, :self.row_plan.m_loc]
        return self.unshard_x_host(xh)
