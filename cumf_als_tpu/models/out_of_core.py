"""Out-of-core ALS: the hugewiki capability on TPU.

The reference's hugewiki app factors a 50M x 39.8K matrix with 3.1B
ratings by keeping the tall factor XT in pinned host memory and streaming
row batches through the GPUs (reference hugewiki/hugewiki.cu:2248-2888:
XT_h host store 2300-2302, batch streaming 2560-2572, per-batch H2D/D2H
2508/2571). The TPU re-design:

  - X lives in host memory (numpy); the X phase streams each bucket
    chunk's plan arrays + warm-start slice to the device, solves, and
    writes the slice back (device_put/host transfers are async, so the
    next chunk's upload overlaps the current solve).
  - the theta phase uses the panelized Gram (ops/tiling.PanelPlan) with
    panels of X *streamed from host* — the gather table never needs to
    fit in HBM; partial (A, b) accumulate on device where theta (the
    small factor) is solved, exactly the role-split of the reference's
    theta update (hugewiki.cu:2607-2749) with the psum replaced by
    on-device accumulation (single chip) or lax.psum (mesh, see
    parallel/sharded_als.py).
  - train RMSE comes free from the theta-phase accumulators; test RMSE
    streams X panels once more over row-sorted test entries.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.models.als import (ALSResult, IterationMetrics,
                                     _solve_slice, _panel_accum,
                                     DeviceChunk)
from cumf_als_tpu.ops.gram import extend_table, gram_rhs
from cumf_als_tpu.ops.pallas_solve import (backend_uses_pallas,
                                             call_with_vmem_backoff)
from cumf_als_tpu.ops.solve import solve
from cumf_als_tpu.ops.tiling import (build_panel_plan, build_update_plan)
from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix, transpose_csr
from cumf_als_tpu.utils.timing import seconds


@jax.jit
def _ooc_se_terms(a_buf, b_buf, th_new):
    """-2*sum theta.b + sum theta^T A theta over all rows, with A the
    *raw* (unregularized) Gram accumulators; the host adds sum r^2 to
    complete the train squared error."""
    th = th_new.astype(jnp.float32)
    cross = jnp.sum(th * b_buf)
    aq = jnp.einsum("rfg,rg->rf", a_buf.astype(jnp.float32), th,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    quad = jnp.sum(th * aq)
    return quad - 2.0 * cross


class OutOfCoreALS:
    """Single-host out-of-core ALS: X on host, theta on device."""

    def __init__(self, cfg: ALSConfig, train_csr: CSRMatrix,
                 train_csc: Optional[CSRMatrix] = None,
                 test_coo: Optional[COOMatrix] = None):
        from cumf_als_tpu.utils.plan_cache import (cached_build,
                                                   cached_transpose)
        self.cfg = cfg
        self.train_csr = train_csr
        self.train_csc = train_csc or cached_transpose(
            cfg.plan_cache_dir, train_csr)
        self.test_coo = test_coo
        # X phase: bucketed chunks, gather table = theta (device).
        # Plan arrays stay HOST-side; streamed per chunk.
        x_params = dict(min_width=cfg.min_bucket_width,
                        max_width=cfg.max_bucket_width,
                        chunk_nnz=cfg.chunk_nnz,
                        chunk_rows=cfg.chunk_rows,
                        octave_points=cfg.octave_points)
        self.plan_x = cached_build(
            cfg.plan_cache_dir, "update", train_csr, x_params,
            lambda: build_update_plan(train_csr, **x_params))
        # theta phase: panelized over X (host-streamed panels).
        th_params = dict(panel_size=cfg.panel_size,
                         min_width=cfg.min_bucket_width,
                         chunk_nnz=cfg.chunk_nnz,
                         chunk_rows=cfg.chunk_rows,
                         split_width=cfg.split_width,
                         octave_points=cfg.octave_points)
        self.plan_theta = cached_build(
            cfg.plan_cache_dir, "panel", self.train_csc, th_params,
            lambda: build_panel_plan(self.train_csc, **th_params))
        batch = cfg.chunk_rows
        n = self.plan_theta.num_rows
        self.n_pad = -(-(n + 1) // batch) * batch
        nnz_pad = np.zeros(self.n_pad, np.int32)
        nnz_pad[:n] = self.plan_theta.row_nnz
        self._theta_nnz_pad = jnp.asarray(nnz_pad)

    # ---------- phases ----------
    def _x_phase(self, x_host: np.ndarray, theta: jnp.ndarray) -> None:
        cfg = self.cfg
        if cfg.factor_dtype == "bf16":  # halve table+G bytes pre-gather
            theta = theta.astype(jnp.bfloat16)
        table_ext = extend_table(theta)
        use_pallas = cfg.backend == "pallas" and cfg.solver == "cg"
        use_aug = False
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import (aug_enabled,
                                                       fused_available,
                                                       gather_gram_cg)
            use_pallas = fused_available()
            use_aug = use_pallas and aug_enabled(cfg)
        pending: List = []  # (rows_valid_host, nnz, device_result)
        for ch in self.plan_x.chunks:
            dc = DeviceChunk(ch)
            x0 = jnp.asarray(
                np.where((ch.rows < self.plan_x.num_rows)[:, None],
                         x_host[np.minimum(ch.rows,
                                           self.plan_x.num_rows - 1)],
                         0.0))
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_cg
                solved, _se = gather_gram_cg(
                    table_ext, dc.cols, dc.vals, dc.nnz, x0, cfg.lam,
                    cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                    factor_dtype=cfg.factor_dtype, aug=use_aug)
            else:
                a, b = gram_rhs(table_ext, dc.cols, dc.vals, dc.nnz,
                                cfg.lam, precision=cfg.gram_precision,
                                factor_dtype=cfg.factor_dtype,
                                gram_dtype=cfg.gram_dtype)
                solved = solve(a, b, x0, solver=cfg.solver,
                               cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                               backend=cfg.backend)
                solved = solved * (dc.nnz > 0)[:, None]
            pending.append((ch.rows, ch.nnz, solved))
            # drain to keep at most 2 chunks in flight (double buffer)
            if len(pending) >= 2:
                self._drain_one(x_host, pending)
        while pending:
            self._drain_one(x_host, pending)

    @staticmethod
    def _drain_one(x_host, pending):
        rows, nnz, solved = pending.pop(0)
        out = np.asarray(solved)
        valid = nnz > 0
        x_host[rows[valid]] = out[valid]

    def _theta_phase(self, x_host: np.ndarray, theta: jnp.ndarray):
        cfg = self.cfg
        plan = self.plan_theta
        f = cfg.f_pad
        s = plan.panel_size
        m = plan.num_cols  # X rows
        # bf16 accumulators swamp when each theta row receives many
        # partial adds (one per (panel, width-chunk) subrow covering
        # it); promote to f32 for deep-accumulation (hugewiki-class)
        # plans. Same guard as ShardedOutOfCoreALS.BF16_ACCUM_MAX_DEPTH.
        from cumf_als_tpu.parallel.sharded_ooc import ShardedOutOfCoreALS
        depth = sum(int(ch.num_rows) if hasattr(ch, "num_rows")
                    else int(ch.rows.shape[0])
                    for ch in plan.chunks) / max(1, plan.num_rows)
        use_bf16 = (cfg.gram_dtype == "bf16" and depth <=
                    ShardedOutOfCoreALS.BF16_ACCUM_MAX_DEPTH)
        a_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        a_buf = jnp.zeros((self.n_pad, f, f), a_dtype)
        b_buf = jnp.zeros((self.n_pad, f), jnp.float32)

        def panel_slice(p):
            lo = p * s
            sl = x_host[lo:min(lo + s, m)]
            if sl.shape[0] < s:
                sl = np.pad(sl, ((0, s - sl.shape[0]), (0, 0)))
            # device_put is async: issued one panel ahead, the H2D
            # transfer overlaps the previous panel's accumulation (the
            # reference overlapped via per-GPU OpenMP threads,
            # hugewiki.cu:2629-2680; here the DMA stream is the thread)
            return jax.device_put(np.ascontiguousarray(sl))

        by_panel = {}
        for ch in plan.chunks:
            by_panel.setdefault(ch.panel, []).append(ch)
        panels = sorted(by_panel)
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        nxt = panel_slice(panels[0]) if panels else None
        for i, p in enumerate(panels):
            tp, nxt = nxt, (panel_slice(panels[i + 1])
                            if i + 1 < len(panels) else None)
            group = by_panel[p]
            if cfg.fuse_phase and len(group) <= cfg.fuse_max_chunks:
                from cumf_als_tpu.models.als import make_panel_group_fn
                shapes_key = tuple(
                    (c.cols.shape[0], c.cols.shape[1]) for c in group)
                fn = make_panel_group_fn(cfg, self._fn_cache, shapes_key)
                a_buf, b_buf = fn(
                    tp, a_buf, b_buf,
                    tuple((c.rows, c.cols, c.vals) for c in group))
                continue
            for ch in group:
                dc = DeviceChunk(ch)
                a_buf, b_buf = _panel_accum(tp, a_buf, b_buf, dc.cols,
                                            dc.vals, dc.rows,
                                            cfg.gram_precision,
                                            cfg.factor_dtype)
        n = plan.num_rows
        theta_pad = jnp.pad(theta, ((0, self.n_pad - n), (0, 0)))
        batch = cfg.chunk_rows
        outs, se = [], 0.0
        for lo in range(0, self.n_pad, batch):
            part = _solve_slice(
                a_buf, b_buf, theta_pad, self._theta_nnz_pad,
                jnp.asarray(lo, jnp.int32), cfg.lam, batch, cfg.solver,
                cfg.cg_iters, cfg.cg_tol, backend=cfg.backend)
            outs.append(part)
        new = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
        # free train RMSE from the accumulators (ops/rmse.py identity);
        # the r^2 term is accumulated host-side once per dataset.
        # Kept as a device scalar: float() would block inside the phase.
        se = _ooc_se_terms(a_buf, b_buf, new) + self._sum_r2()
        return new[:n], se

    def _sum_r2(self) -> float:
        if not hasattr(self, "_r2"):
            from cumf_als_tpu import native
            if native.available():
                self._r2 = native.sum_squares(self.train_csr.data)
            else:
                self._r2 = float(
                    np.sum(self.train_csr.data.astype(np.float64) ** 2))
        return self._r2

    def _test_rmse(self, x_host: np.ndarray, theta: jnp.ndarray) -> float:
        coo = self.test_coo
        if coo is None or not coo.nnz:
            return float("nan")
        order = np.argsort(coo.row, kind="stable")
        rows, cols, vals = coo.row[order], coo.col[order], coo.data[order]
        xg = x_host[rows][:, :self.cfg.f]
        # theta gathers on device; x rows come from host memory
        th = np.asarray(theta)[:, :self.cfg.f]
        pred = np.einsum("ij,ij->i", xg, th[cols])
        e = vals - pred
        return float(np.sqrt(np.mean(e * e)))

    # ---------- loop ----------
    def run(self, x0: np.ndarray, theta0: np.ndarray,
            start_iter: int = 0) -> ALSResult:
        cfg = self.cfg
        f_pad = cfg.f_pad
        m, n = self.train_csr.num_rows, self.train_csr.num_cols
        x_host = np.zeros((m, f_pad), np.float32)
        x_host[:, :cfg.f] = x0
        th = np.zeros((n, f_pad), np.float32)
        th[:, :cfg.f] = theta0
        th *= (self.plan_theta.row_nnz > 0)[:, None]
        x_host *= (np.diff(self.train_csr.indptr) > 0
                   ).astype(np.float32)[:, None]
        theta = jnp.asarray(th)
        history = []
        if cfg.verbose:
            print(f"*******parameters: m: {m}, n:  {n}, f: {cfg.f}, "
                  f"nnz: {self.train_csr.nnz} ")
            print("*******out-of-core: X host-resident, theta on device, "
                  f"{self.plan_theta.n_panels} X panels streamed.")
            print("*******start iterations...")
        for it in range(start_iter, cfg.iters):
            t0 = seconds()
            call_with_vmem_backoff(self._x_phase, x_host, theta,
                                   uses_pallas=backend_uses_pallas(cfg))
            tx = seconds() - t0
            if cfg.debug_timing:
                print(f"update X run {tx:f} seconds, gridSize: {m}, "
                      f"blockSize {cfg.f}.")
            t0 = seconds()
            theta, se_plus_r2 = call_with_vmem_backoff(
                self._theta_phase, x_host, theta,
                uses_pallas=backend_uses_pallas(cfg))
            theta.block_until_ready()
            tth = seconds() - t0
            if cfg.debug_timing:
                print(f"update theta run {tth:f} seconds, gridSize: {n}, "
                      f"blockSize {cfg.f}.")
            train_rmse = float(
                np.sqrt(max(float(se_plus_r2), 0.0) / self.train_csr.nnz))
            test_rmse = self._test_rmse(x_host, theta)
            if cfg.verbose:
                print(f"--------- Train RMSE in iter {it}: {train_rmse:f}")
                if np.isfinite(test_rmse):
                    print(f"--------- Test RMSE in iter {it}: "
                          f"{test_rmse:f}")
            history.append(IterationMetrics(it, train_rmse, test_rmse,
                                            tx, tth, 0.0))
            if not np.isfinite(train_rmse):
                raise FloatingPointError(
                    f"non-finite train RMSE at iteration {it}")
            if cfg.checkpoint_every and cfg.checkpoint_dir and \
                    (it + 1) % cfg.checkpoint_every == 0:
                from cumf_als_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(cfg.checkpoint_dir, it,
                                x_host[:, :cfg.f].copy(),
                                np.asarray(theta)[:, :cfg.f], cfg)
        return ALSResult(x=x_host[:, :cfg.f].copy(),
                         theta=np.asarray(theta)[:, :cfg.f],
                         history=history)
