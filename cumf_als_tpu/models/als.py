"""The ALS training loop: TPU-native doALS.

Mirrors the reference orchestrator (doALS, reference als.cu:662-1035):
per iteration, update X from theta over the CSR ratings, update theta
from X over the CSC ratings, then report train/test RMSE with the exact
stdout contract the reference harness greps (als.cu:991, 1019;
print-test-result.sh:8-12). Memory batching (X_BATCH/THETA_BATCH,
als.cu:768, 881) maps to the bucketed chunk plans of ops/tiling.py.
"""

from __future__ import annotations

import dataclasses
import sys
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.ops.gram import extend_table, gram_rhs
from cumf_als_tpu.ops.pallas_solve import (backend_uses_pallas,
                                             call_with_vmem_backoff)
from cumf_als_tpu.ops.rmse import fused_sq_err, rmse_direct
from cumf_als_tpu.ops.solve import solve
from cumf_als_tpu.ops.tiling import (BatchedPanelPlan, PanelPlan,
                                     SplitPlan, build_batched_panel_plan,
                                     build_panel_plan, build_split_plan,
                                     build_update_plan)
from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix
from cumf_als_tpu.utils.timing import seconds


@dataclasses.dataclass
class IterationMetrics:
    iteration: int
    train_rmse: float
    test_rmse: float
    x_seconds: float
    theta_seconds: float
    rmse_seconds: float


@dataclasses.dataclass
class ALSResult:
    x: np.ndarray        # (m, f) user-facing (un-padded) factors
    theta: np.ndarray    # (n, f)
    history: List[IterationMetrics]

    @property
    def final_test_rmse(self) -> float:
        return self.history[-1].test_rmse if self.history else float("nan")

    def predict(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        """Serving path: predicted ratings for (row, col) pairs — the
        computation of the reference RMSE kernel (als.cu:191-219)
        exposed as an API."""
        return np.einsum("ij,ij->i", self.x[rows], self.theta[cols])


def _unflatten(r: int, cols, vals):
    """Re-view flat device plan arrays as (R, P) inside a jit. Device
    copies are stored 1-D because a 2-D (R, P) array pads its minor dim
    to 128 lanes PHYSICALLY on TPU — a width-8 chunk would occupy 16x
    its logical bytes in HBM (hugewiki's mean row degree is ~62, so
    its "3.2 GB" plan really cost >10 GB resident before this, r5).
    Inside a jitted consumer the reshape fuses into the gather/compute,
    so nothing padded materializes for longer than the chunk dispatch."""
    if cols.ndim == 1:
        cols = cols.reshape(r, -1)
    if vals.ndim == 1:
        vals = vals.reshape(r, -1)
    return cols, vals


def _compact_cols(cols: np.ndarray) -> jnp.ndarray:
    """Device copy of gather indices, stored uint16 when every index
    (including the zero-extension pad id) fits — halves the
    device-resident plan's index bytes. XLA's gather takes unsigned
    indices directly; correctness is unchanged. The hugewiki-class
    device-resident runs are HBM-bound on plan bytes (scale 0.25 OOM'd
    at ~13.4 GB of int32+f32 plans, r5)."""
    if cols.size and int(cols.max()) <= np.iinfo(np.uint16).max:
        return jnp.asarray(cols.astype(np.uint16).reshape(-1))
    return jnp.asarray(cols.reshape(-1))


def _compact_vals(vals: np.ndarray) -> jnp.ndarray:
    """Device copy of the rating values, stored bf16 ONLY when the
    round-trip is exact — true for every real workload here (star
    halves 0.5..5 and integer 0..100 grids are exact in bf16's 8-bit
    mantissa). Lossy inputs keep f32, so numerics never change. All
    consumers cast to f32 before squaring (fused_sq_err, the Pallas
    kernels' vblk reads)."""
    if vals.dtype == np.float32 and vals.size:
        import ml_dtypes
        v16 = vals.astype(ml_dtypes.bfloat16)
        if np.array_equal(np.asarray(v16, np.float32), vals):
            return jnp.asarray(v16.reshape(-1))
    return jnp.asarray(vals.reshape(-1))


class DeviceChunk:
    """A plan chunk's arrays resident on device (compacted: uint16
    gather ids / bf16 values where exact — see _compact_cols/_vals)."""

    __slots__ = ("width", "rows", "nnz", "cols", "vals", "panel")

    def __init__(self, chunk, device=None):
        self.width = chunk.width
        self.rows = jnp.asarray(chunk.rows)
        self.nnz = jnp.asarray(chunk.nnz)
        self.cols = _compact_cols(chunk.cols)
        self.vals = _compact_vals(chunk.vals)
        self.panel = getattr(chunk, "panel", 0)


class DeviceSplitChunk:
    """A SplitChunk's arrays resident on device (cols is a tuple of
    per-part blocks; compacted like DeviceChunk)."""

    __slots__ = ("parts", "widths", "rows", "nnz", "cols", "vals")

    def __init__(self, chunk):
        self.parts = chunk.parts
        self.widths = chunk.widths
        self.rows = jnp.asarray(chunk.rows)
        self.nnz = jnp.asarray(chunk.nnz)
        self.cols = tuple(_compact_cols(c) for c in chunk.cols)
        self.vals = _compact_vals(chunk.vals)


@partial(jax.jit, static_argnames=("panel_size",))
def _slice_panel(table_pad, panel_start, panel_size):
    f = table_pad.shape[1]
    return jax.lax.dynamic_slice(table_pad, (panel_start, 0),
                                 (panel_size, f))


@partial(jax.jit, static_argnames=("precision", "factor_dtype"),
         donate_argnums=(1, 2))
def _panel_accum(table_panel, a_buf, b_buf, cols, vals, rows, precision,
                 factor_dtype="f32"):
    """Partial Gram/RHS of one panel chunk, scatter-added into the
    full-phase accumulators. The panel (<= panel_size rows) is small
    enough for XLA to stage on chip, which is the whole point; it can be
    a slice of a device-resident factor or a host-streamed shard (the
    out-of-core XT_h path, reference hugewiki.cu:2300-2302).

    a_buf may be bf16 (the CUMF_TT_FP16 analog, reference als.cu:30-31):
    partials are then rounded at each panel scatter-add — the accuracy
    cost is quantified in docs/PERFORMANCE.md."""
    from cumf_als_tpu.ops.gram import _PRECISIONS
    cols, vals = _unflatten(rows.shape[0], cols, vals)
    f = table_panel.shape[1]
    if factor_dtype == "bf16":  # CUMF_USE_HALF analog
        table_panel = table_panel.astype(jnp.bfloat16)
    tp = jnp.concatenate(
        [table_panel, jnp.zeros((1, f), table_panel.dtype)], axis=0)
    g = jnp.take(tp, cols, axis=0)
    prec = _PRECISIONS[precision]
    a_part = jnp.einsum("rpf,rpg->rfg", g, g, precision=prec,
                        preferred_element_type=jnp.float32)
    b_part = jnp.einsum("rp,rpf->rf", vals, g, precision=prec,
                        preferred_element_type=jnp.float32)
    a_buf = a_buf.at[rows].add(a_part.astype(a_buf.dtype), mode="drop")
    b_buf = b_buf.at[rows].add(b_part, mode="drop")
    return a_buf, b_buf


@partial(jax.jit, static_argnames=("precision", "factor_dtype"),
         donate_argnums=(1,))
def _panel_accum_aug(table_panel, a_buf, cols, vals, rows, precision,
                     factor_dtype="f32"):
    """Augmented-lane twin of _panel_accum: ONE einsum accumulates the
    combined A' (Gram + b row + r^2 corner) and the separate b scatter
    chain disappears (ops/pallas_solve._kernel_aug has the layout)."""
    from cumf_als_tpu.ops.gram import _PRECISIONS
    from cumf_als_tpu.ops.pallas_solve import augment_g
    cols, vals = _unflatten(rows.shape[0], cols, vals)
    f = table_panel.shape[1]
    if factor_dtype == "bf16":
        table_panel = table_panel.astype(jnp.bfloat16)
    tp = jnp.concatenate(
        [table_panel, jnp.zeros((1, f), table_panel.dtype)], axis=0)
    g = augment_g(jnp.take(tp, cols, axis=0), vals)
    a_part = jnp.einsum("rpf,rpg->rfg", g, g,
                        precision=_PRECISIONS[precision],
                        preferred_element_type=jnp.float32)
    return a_buf.at[rows].add(a_part.astype(a_buf.dtype), mode="drop")


def make_panel_group_fn(cfg, cache: dict, shapes_key, aug: bool = False):
    """One jit per panel: every chunk's partial Gram is independent
    (subrows within a panel are disjoint across chunks), so XLA can
    overlap the gathers/einsums; write-back is ONE scatter-add per
    chunk and the (A, b) accumulators are donated through. Shared by
    the panel, batched-panel and out-of-core theta paths.

    aug=True: the augmented-lane form — values ride lane f-1 of G, the
    single accumulator A' carries b in row f-1, and the group takes/
    returns a_buf alone."""
    key = ("panel_group", shapes_key, aug)
    if key in cache:
        return cache[key]

    use_pallas = cfg.backend == "pallas"
    if use_pallas:
        from cumf_als_tpu.ops.pallas_solve import fused_available
        use_pallas = fused_available()

    if aug:
        def group_aug(table_panel, a_buf, chunk_arrays):
            from cumf_als_tpu.ops.gram import _PRECISIONS
            from cumf_als_tpu.ops.pallas_solve import (augment_g,
                                                       gather_gram_aug_out)
            f = table_panel.shape[1]
            tpn = table_panel
            if cfg.factor_dtype == "bf16":
                tpn = tpn.astype(jnp.bfloat16)
            tp = jnp.concatenate(
                [tpn, jnp.zeros((1, f), tpn.dtype)], axis=0)
            for rows, cols, vals in chunk_arrays:
                cols, vals = _unflatten(rows.shape[0], cols, vals)
                if use_pallas:
                    a_part = gather_gram_aug_out(
                        tp, cols, vals, out_dtype=str(a_buf.dtype))
                else:
                    g = augment_g(jnp.take(tp, cols, axis=0), vals)
                    a_part = jnp.einsum(
                        "rpf,rpg->rfg", g, g,
                        precision=_PRECISIONS[cfg.gram_precision],
                        preferred_element_type=jnp.float32)
                a_buf = a_buf.at[rows].add(a_part.astype(a_buf.dtype),
                                           mode="drop")
            return a_buf
        fn = jax.jit(group_aug, donate_argnums=(1,))
        cache[key] = fn
        return fn

    def group(table_panel, a_buf, b_buf, chunk_arrays):
        from cumf_als_tpu.ops.gram import _PRECISIONS
        f = table_panel.shape[1]
        tpn = table_panel
        if cfg.factor_dtype == "bf16":
            tpn = tpn.astype(jnp.bfloat16)
        tp = jnp.concatenate(
            [tpn, jnp.zeros((1, f), tpn.dtype)], axis=0)
        prec = _PRECISIONS[cfg.gram_precision]
        for rows, cols, vals in chunk_arrays:
            cols, vals = _unflatten(rows.shape[0], cols, vals)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import \
                    gather_gram_out
                a_part, b_part = gather_gram_out(
                    tp, cols, vals, out_dtype=str(a_buf.dtype))
            else:
                g = jnp.take(tp, cols, axis=0)
                a_part = jnp.einsum(
                    "rpf,rpg->rfg", g, g, precision=prec,
                    preferred_element_type=jnp.float32)
                b_part = jnp.einsum(
                    "rp,rpf->rf", vals, g, precision=prec,
                    preferred_element_type=jnp.float32)
            a_buf = a_buf.at[rows].add(a_part.astype(a_buf.dtype),
                                       mode="drop")
            b_buf = b_buf.at[rows].add(b_part, mode="drop")
        return a_buf, b_buf

    fn = jax.jit(group, donate_argnums=(1, 2))
    cache[key] = fn
    return fn


@jax.jit
def _se_terms_aug(a_buf, x_new):
    """_se_terms over the augmented accumulator: b is row f-1 of A'.
    Lane f-1 of x_new is identically zero, so the r^2 corner and the
    value row/column of A' contribute nothing to cross/quad."""
    x = x_new.astype(jnp.float32)
    f = a_buf.shape[-1]
    cross = jnp.sum(x * a_buf[:, f - 1, :].astype(jnp.float32))
    aq = jnp.einsum("rfg,rg->rf", a_buf.astype(jnp.float32), x,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    quad = jnp.sum(x * aq)
    return quad - 2.0 * cross


@partial(jax.jit, static_argnames=("batch", "solver", "cg_iters",
                                   "cg_tol", "backend"))
def _solve_slice_aug(a_buf, x0_full, row_nnz, lo, lam, batch, solver,
                     cg_iters, cg_tol, backend="xla"):
    """_solve_slice over the augmented accumulator: b unpacks from row
    f-1 inside the solve (in VMEM on the pallas path)."""
    from cumf_als_tpu.ops.solve import solve as _solve
    f = a_buf.shape[-1]
    a = jax.lax.dynamic_slice(a_buf, (lo, 0, 0), (batch, f, f))
    x0 = jax.lax.dynamic_slice(x0_full, (lo, 0), (batch, f))
    nnz = jax.lax.dynamic_slice(row_nnz, (lo,), (batch,))
    nnzf = nnz.astype(jnp.float32)
    diag = nnzf * lam + (nnzf == 0)
    out = _solve(a, None, x0, solver=solver, cg_iters=cg_iters,
                 cg_tol=cg_tol, backend=backend, diag=diag, aug=True)
    return out * (nnzf > 0)[:, None]


@jax.jit
def _se_terms(a_buf, b_buf, x_new):
    """-2*sum x.b + sum x^T A x over all rows, with A the *raw*
    (unregularized) Gram accumulators; adding sum r^2 completes the
    train squared error (exact identity, see ops/rmse.py). Rows with no
    ratings have x == 0 and contribute nothing, so stray dummy-row
    accumulator content is harmless."""
    x = x_new.astype(jnp.float32)
    cross = jnp.sum(x * b_buf)
    aq = jnp.einsum("rfg,rg->rf", a_buf.astype(jnp.float32), x,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    quad = jnp.sum(x * aq)
    return quad - 2.0 * cross


@partial(jax.jit, static_argnames=("batch", "solver", "cg_iters",
                                   "cg_tol", "backend"))
def _solve_slice(a_buf, b_buf, x0_full, row_nnz, lo, lam, batch, solver,
                 cg_iters, cg_tol, backend="xla"):
    from cumf_als_tpu.ops.solve import solve as _solve
    f = a_buf.shape[-1]
    # raw (possibly bf16) A slice; the Tikhonov diagonal is applied at
    # solve time — in VMEM on the pallas path, so the HBM accumulator
    # never gets upcast to f32
    a = jax.lax.dynamic_slice(a_buf, (lo, 0, 0), (batch, f, f))
    b = jax.lax.dynamic_slice(b_buf, (lo, 0), (batch, f))
    x0 = jax.lax.dynamic_slice(x0_full, (lo, 0), (batch, f))
    nnz = jax.lax.dynamic_slice(row_nnz, (lo,), (batch,))
    nnzf = nnz.astype(jnp.float32)
    diag = nnzf * lam + (nnzf == 0)
    out = _solve(a, b, x0, solver=solver, cg_iters=cg_iters,
                 cg_tol=cg_tol, backend=backend, diag=diag)
    return out * (nnzf > 0)[:, None]


class ALS:
    """TPU-native ALS solver over row-compressed ratings.

    Parameters mirror doALS (reference als.h:676-681): the training CSR,
    its transpose (the CSC view), the test COO, and an ALSConfig carrying
    m, n, f, lambda, iters, batching and solver/precision flags.
    """

    def __init__(self, cfg: ALSConfig, train_csr: CSRMatrix,
                 train_csc: Optional[CSRMatrix] = None,
                 test_coo: Optional[COOMatrix] = None):
        from cumf_als_tpu.utils.plan_cache import cached_transpose
        self.cfg = cfg
        self.train_csr = train_csr
        self.train_csc = train_csc or cached_transpose(
            cfg.plan_cache_dir, train_csr)
        self.test_coo = test_coo
        t0 = seconds()
        self.plan_x = self._build_phase_plan(self.train_csr,
                                             cfg.x_batch)
        self.plan_theta = self._build_phase_plan(self.train_csc,
                                                 cfg.theta_batch)
        self.plan_seconds = seconds() - t0

    def _split_enabled(self, csr: CSRMatrix) -> bool:
        """Whether the split-table direct path applies to this phase:
        the gather table must exceed one part (otherwise plain direct
        already gathers at the fast tier). "auto" additionally requires
        the table to be in the measured slow-gather tier
        (split_min_table_bytes; a 123 MB bf16 table ran faster direct,
        round4_logs) and the fused Gram+CG kernel (the XLA fallback
        would materialize per-chunk (R, f, f) Gram buffers); "force"
        skips those gates for CPU-backend tests and A/B runs."""
        cfg = self.cfg
        if cfg.split_gather == "off" or \
                csr.num_cols <= cfg.split_part_rows():
            return False
        if cfg.split_gather == "force":
            return True
        item = 2 if cfg.factor_dtype == "bf16" else 4
        if csr.num_cols * cfg.f_pad * item <= cfg.split_min_table_bytes:
            return False
        if cfg.backend == "pallas" and cfg.solver == "cg":
            from cumf_als_tpu.ops.pallas_solve import fused_available
            return fused_available()
        return False

    def _phase_strategy(self, csr: CSRMatrix) -> str:
        """Pick direct vs panelized vs split-table Gram for one phase
        (see ALSConfig.use_panels / split_gather)."""
        cfg = self.cfg
        if cfg.split_gather == "force" and self._split_enabled(csr):
            return "split"
        if cfg.use_panels == "never":
            return "direct"
        a_bytes = (csr.num_rows + 1) * cfg.f_pad * cfg.f_pad * 4
        margin = max(1, cfg.panel_size // 8)
        if csr.num_cols > cfg.panel_size + margin:
            if a_bytes <= cfg.panel_budget_bytes:
                return "panel"
            # Both sides big (Yahoo-class). Panels only pay off when
            # rows are long relative to the panel count: a short row
            # (Yahoo avg 253 nnz over ~10+16 panels) touches most
            # panels, and every touch is a 2*f*f read-modify-write of
            # the HBM (A, b) accumulators — ~10x its gather bytes —
            # plus the solve must then run through the XLA batched CG
            # instead of the fused in-VMEM kernel. Measured on Yahoo
            # F=100 (v5e): direct 7.44 s/iter vs batched-panel 11.74.
            # The split-table direct path beats both: every gather runs
            # at the fast small-operand tier with no accumulator RMW
            # (r4; scripts/bench_gather.py). Plain direct and
            # batched_panel remain as fallbacks.
            if self._split_enabled(csr):
                return "split"
            if cfg.backend == "pallas" and cfg.solver == "cg":
                from cumf_als_tpu.ops.pallas_solve import fused_available
                if fused_available():
                    return "direct"
            return "batched_panel"
        return "direct"

    # bf16 partial-Gram accumulators swamp under deep scatter-add
    # chains: past ~16 partials per row, late adds round away and the
    # train-RMSE identity can go negative/NaN (first observed at
    # hugewiki scale on the sharded path — ShardedOutOfCoreALS has the
    # same guard; r5 found the plain panel paths hit it too, e.g.
    # hugewiki scale-0.1 theta rows touch ~77 panels and NaN'd at
    # iteration 3). Netflix-class plans (~1-8 partials) keep the bf16
    # win (test-RMSE delta 1.5e-4).
    BF16_ACCUM_MAX_DEPTH = 16

    def _accum_dtype(self, total_row_slots: int, num_rows: int):
        if self.cfg.gram_dtype != "bf16":
            return jnp.float32
        depth = total_row_slots / max(1, num_rows)
        if depth <= self.BF16_ACCUM_MAX_DEPTH:
            return jnp.bfloat16
        if not getattr(self, "_warned_promote", False):
            self._warned_promote = True
            print(f"[als] ~{depth:.0f} partial adds per accumulator "
                  f"row > {self.BF16_ACCUM_MAX_DEPTH}: promoting Gram "
                  f"accumulators bf16 -> f32 (swamping guard)",
                  file=sys.stderr, flush=True)
        return jnp.float32

    def _batch_rows(self) -> int:
        """Row-batch size of the batched-panel path (see
        ALSConfig.batch_rows)."""
        cfg = self.cfg
        if cfg.batch_rows:
            return cfg.batch_rows
        return 1 << 17 if cfg.gram_dtype == "bf16" else 1 << 16

    def _chunk_nnz(self, csr: CSRMatrix, batch: int) -> int:
        """Per-phase chunk budget. The reference's X_BATCH/THETA_BATCH
        (als.cu:768, 881) split a phase into `batch` memory batches; our
        automatic chunking is usually finer already, so the knobs act as
        a guaranteed MINIMUM batch count: requesting more batches caps
        the per-chunk padded-nnz budget (and with it the transient
        gather buffer) at phase_nnz/batch."""
        budget = self.cfg.chunk_nnz
        if batch and batch > 1:
            budget = min(budget, max(1 << 14, -(-csr.nnz // batch)))
        return budget

    def _build_phase_plan(self, csr: CSRMatrix, batch: int = 1):
        from cumf_als_tpu.utils.plan_cache import cached_build
        cfg = self.cfg
        strategy = self._phase_strategy(csr)
        chunk_nnz = self._chunk_nnz(csr, batch)
        if strategy == "panel":
            params = dict(panel_size=cfg.panel_size,
                          min_width=cfg.min_bucket_width,
                          chunk_nnz=chunk_nnz,
                          chunk_rows=cfg.chunk_rows,
                          split_width=cfg.split_width,
                          octave_points=cfg.octave_points)
            plan = cached_build(
                cfg.plan_cache_dir, "panel", csr, params,
                lambda: build_panel_plan(csr, **params))
        elif strategy == "split":
            params = dict(part_size=cfg.split_part_rows(),
                          min_width=cfg.min_bucket_width,
                          max_width=cfg.max_bucket_width,
                          chunk_nnz=chunk_nnz,
                          chunk_rows=cfg.chunk_rows,
                          octave_points=cfg.octave_points,
                          max_groups=cfg.split_max_groups)
            plan = cached_build(
                cfg.plan_cache_dir, "split", csr, params,
                lambda: build_split_plan(csr, **params))
        elif strategy == "batched_panel":
            # Large row batches + sparse-bucket promotion bound BOTH the
            # padding (fuller width buckets: Yahoo expansion 1.135 ->
            # 1.10) and the compiled-program count (606 fused-group
            # shapes -> 79 — the per-batch sub-plans otherwise multiply
            # ragged shapes; measured on Yahoo, see docs/PERFORMANCE.md)
            params = dict(panel_size=cfg.panel_size,
                          batch_rows=self._batch_rows(),
                          min_width=cfg.min_bucket_width,
                          chunk_nnz=chunk_nnz,
                          chunk_rows=cfg.chunk_rows,
                          split_width=cfg.split_width,
                          octave_points=cfg.octave_points,
                          ragged="mantissa", min_bucket_rows=16)
            plan = cached_build(
                cfg.plan_cache_dir, "batched_panel", csr, params,
                lambda: build_batched_panel_plan(csr, **params))
        else:
            params = dict(min_width=cfg.min_bucket_width,
                          max_width=cfg.max_bucket_width,
                          chunk_nnz=chunk_nnz,
                          chunk_rows=cfg.chunk_rows,
                          octave_points=cfg.octave_points)
            plan = cached_build(
                cfg.plan_cache_dir, "update", csr, params,
                lambda: build_update_plan(csr, **params))
        return self._device_plan(plan)

    def _device_plan(self, plan):
        aux = {}
        if isinstance(plan, SplitPlan):
            aux["perm"] = jnp.asarray(plan.perm)
            return plan, [DeviceSplitChunk(c) for c in plan.chunks], aux
        if isinstance(plan, BatchedPanelPlan):
            aux["batches"] = [
                (jnp.asarray(b.global_ids), jnp.asarray(b.row_nnz),
                 [DeviceChunk(c) for c in b.plan.chunks])
                for b in plan.batches]
            return plan, [], aux
        if isinstance(plan, PanelPlan):
            # solve batch hugs the row count (multiple of 8) instead of
            # rounding m_pad to a full chunk_rows multiple — next-pow2
            # rounding made Netflix's X-phase solve nearly half dummies
            batch = min(self.cfg.chunk_rows,
                        -(-(plan.num_rows + 1) // 8) * 8)
            m_pad = -(-(plan.num_rows + 1) // batch) * batch
            nnz_pad = np.zeros(m_pad, np.int32)
            nnz_pad[:plan.num_rows] = plan.row_nnz
            aux["row_nnz_pad"] = jnp.asarray(nnz_pad)
            aux["m_pad"] = m_pad
            aux["solve_batch"] = batch
        return plan, [DeviceChunk(c) for c in plan.chunks], aux

    # ----- factor padding helpers -----
    def _pad_f(self, arr: np.ndarray) -> jnp.ndarray:
        f_pad = self.cfg.f_pad
        if arr.shape[1] == f_pad:
            return jnp.asarray(arr, dtype=jnp.float32)
        out = np.zeros((arr.shape[0], f_pad), np.float32)
        out[:, :arr.shape[1]] = arr
        return jnp.asarray(out)

    def _unpad_f(self, arr: jnp.ndarray) -> np.ndarray:
        return np.asarray(arr[:, :self.cfg.f])

    # ----- CUMF_SAVE_MODEL Gram dumps -----
    def _dump_gram(self, a, b, what: str) -> None:
        """Dump a Gram/RHS slice for offline solver A/B diffing — the
        reference's CUMF_SAVE_MODEL tt/xx dumps (reference als.cu:33,
        49-57, 800-807) at the same granularity. `what` encodes
        phase+iteration, e.g. 'tt_iter003' (theta Gram used to update X)
        or 'xx_iter003' (X Gram used to update theta)."""
        from cumf_als_tpu.utils.checkpoint import save_debug_array
        k = min(int(a.shape[0]), 1024)
        save_debug_array(self.cfg.save_model_dir, what,
                         np.asarray(a[:k], np.float32))
        save_debug_array(self.cfg.save_model_dir, what.replace(
            "tt", "ytheta").replace("xx", "yTX"),
            np.asarray(b[:k], np.float32))

    # ----- one phase -----
    def _update_phase(self, table: jnp.ndarray, current: jnp.ndarray,
                      plan_pair, collect_rmse_terms: bool):
        if isinstance(plan_pair[0], SplitPlan):
            return self._update_phase_split(table, current, plan_pair,
                                            collect_rmse_terms)
        if isinstance(plan_pair[0], (PanelPlan, BatchedPanelPlan)):
            if isinstance(plan_pair[0], BatchedPanelPlan):
                return self._update_phase_batched_panel(
                    table, current, plan_pair, collect_rmse_terms)
            return self._update_phase_panelized(
                table, current, plan_pair,
                collect_rmse_terms=collect_rmse_terms)
        return self._update_phase_direct(table, current, plan_pair,
                                         collect_rmse_terms)

    def _sum_r2(self) -> float:
        """sum of squared training ratings, computed once (the r^2 term
        of the identity-based fused train RMSE)."""
        if not hasattr(self, "_r2"):
            from cumf_als_tpu import native
            if native.available():
                self._r2 = native.sum_squares(self.train_csr.data)
            else:
                self._r2 = float(
                    np.sum(self.train_csr.data.astype(np.float64) ** 2))
        return self._r2

    def _update_phase_batched_panel(self, table, current, plan_pair,
                                    collect_rmse_terms: bool = False):
        """Two-level (row-batch x panel) Gram for both-sides-big phases:
        a reusable (B, f, f) accumulator per batch, panels sliced from
        the padded table (see ops/tiling.BatchedPanelPlan)."""
        cfg = self.cfg
        plan, _, aux = plan_pair
        f = cfg.f_pad
        s = plan.panel_size
        n_panels = -(-plan.num_cols // s)
        table_pad = jnp.pad(
            table, ((0, n_panels * s - table.shape[0]), (0, 0)))
        first_batch = True
        bsz = plan.batch_rows
        a_dtype = self._accum_dtype(
            sum(c.rows.shape[0] for b in plan.batches
                for c in b.plan.chunks), plan.num_rows)
        aug = self._use_panel_aug()
        se_parts = []
        for gids, row_nnz, chunks in aux["batches"]:
            a_buf = jnp.zeros((bsz, f, f), a_dtype)
            b_buf = None if aug else jnp.zeros((bsz, f), jnp.float32)
            by_panel = {}
            for ch in chunks:
                by_panel.setdefault(ch.panel, []).append(ch)
            for p, group in sorted(by_panel.items()):
                tp = _slice_panel(table_pad,
                                  jnp.asarray(p * s, jnp.int32), s)
                if cfg.fuse_phase and len(group) <= cfg.fuse_max_chunks:
                    # single-dispatch fused group per panel: Pallas
                    # gram-out + one scatter-add, buffers donated
                    # (same routing as the panel path — this is what
                    # closes the Yahoo ns/nnz gap vs Netflix)
                    shapes_key = tuple(
                        (c.rows.shape[0], c.width)
                        for c in group)
                    fn = self._panel_group_fn(shapes_key, len(group),
                                              aug=aug)
                    arrays = tuple((c.rows, c.cols, c.vals)
                                   for c in group)
                    if aug:
                        a_buf = fn(tp, a_buf, arrays)
                    else:
                        a_buf, b_buf = fn(tp, a_buf, b_buf, arrays)
                    continue
                for ch in group:
                    if aug:
                        a_buf = _panel_accum_aug(tp, a_buf, ch.cols,
                                                 ch.vals, ch.rows,
                                                 cfg.gram_precision,
                                                 cfg.factor_dtype)
                    else:
                        a_buf, b_buf = _panel_accum(tp, a_buf, b_buf,
                                                    ch.cols, ch.vals,
                                                    ch.rows,
                                                    cfg.gram_precision,
                                                    cfg.factor_dtype)
            if first_batch and cfg.save_model and \
                    getattr(self, "_save_tag", None):
                self._dump_gram(a_buf, b_buf, self._save_tag)
            first_batch = False
            x0 = jnp.take(current, gids, axis=0, mode="fill",
                          fill_value=0.0)
            # solve in bounded sub-slices: an all-at-once solve over a
            # 2^17-row batch would cast the full bf16 A buffer to f32
            # (8.6 GB transient)
            sb = min(bsz, cfg.chunk_rows)
            if aug:
                outs = [_solve_slice_aug(a_buf, x0, row_nnz,
                                         jnp.asarray(lo, jnp.int32),
                                         cfg.lam, sb, cfg.solver,
                                         cfg.cg_iters, cfg.cg_tol,
                                         backend=cfg.backend)
                        for lo in range(0, bsz, sb)]
            else:
                outs = [_solve_slice(a_buf, b_buf, x0, row_nnz,
                                     jnp.asarray(lo, jnp.int32), cfg.lam,
                                     sb, cfg.solver, cfg.cg_iters,
                                     cfg.cg_tol, backend=cfg.backend)
                        for lo in range(0, bsz, sb)]
            solved = outs[0] if len(outs) == 1 else \
                jnp.concatenate(outs, axis=0)
            if collect_rmse_terms:
                se_parts.append(_se_terms_aug(a_buf, solved) if aug
                                else _se_terms(a_buf, b_buf, solved))
            current = current.at[gids].set(solved.astype(current.dtype), mode="drop")
        se = 0.0
        if collect_rmse_terms:
            # stays a device scalar: float() here would block inside the
            # timed phase (one extra host roundtrip per iteration)
            se = jnp.sum(jnp.stack(se_parts)) + self._sum_r2() \
                if se_parts else self._sum_r2()
        return current, se

    def _panel_group_fn(self, shapes_key, n_chunks, aug: bool = False):
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        return make_panel_group_fn(self.cfg, self._fn_cache, shapes_key,
                                   aug=aug)

    def _use_panel_aug(self) -> bool:
        """Augmented-lane panel phase: one combined A' accumulator, b
        rides row f-1 through accumulation and into the solve (see
        ops/pallas_solve.panel_aug_enabled for the gates)."""
        from cumf_als_tpu.ops.pallas_solve import panel_aug_enabled
        return panel_aug_enabled(self.cfg)

    def _update_phase_panelized(self, table, current, plan_pair,
                                panel_provider=None,
                                collect_rmse_terms: bool = False):
        """Panelized Gram: per-panel partial (A, b) scatter-added into
        full accumulators, then batched solves. See PanelPlan.
        panel_provider(p) overrides panel sourcing (host streaming)."""
        cfg = self.cfg
        plan, chunks, aux = plan_pair
        f = self.cfg.f_pad
        s = plan.panel_size
        if panel_provider is None:
            table_pad = jnp.pad(
                table, ((0, plan.n_panels * s - table.shape[0]), (0, 0)))

            def panel_provider(p):
                return _slice_panel(table_pad,
                                    jnp.asarray(p * s, jnp.int32), s)
        m, m_pad = plan.num_rows, aux["m_pad"]
        a_dtype = self._accum_dtype(
            sum(c.rows.shape[0] for c in chunks), plan.num_rows)
        aug = self._use_panel_aug()
        a_buf = jnp.zeros((m_pad, f, f), a_dtype)
        b_buf = None if aug else jnp.zeros((m_pad, f), jnp.float32)
        by_panel = {}
        for ch in chunks:
            by_panel.setdefault(ch.panel, []).append(ch)
        for p, group in sorted(by_panel.items()):
            tp = panel_provider(p)
            if cfg.fuse_phase and len(group) <= cfg.fuse_max_chunks:
                shapes_key = tuple(
                    (c.rows.shape[0], c.width) for c in group)
                fn = self._panel_group_fn(shapes_key, len(group), aug=aug)
                arrays = tuple((c.rows, c.cols, c.vals) for c in group)
                if aug:
                    a_buf = fn(tp, a_buf, arrays)
                else:
                    a_buf, b_buf = fn(tp, a_buf, b_buf, arrays)
                continue
            for ch in group:
                if aug:
                    a_buf = _panel_accum_aug(tp, a_buf, ch.cols,
                                             ch.vals, ch.rows,
                                             cfg.gram_precision,
                                             cfg.factor_dtype)
                else:
                    a_buf, b_buf = _panel_accum(tp, a_buf, b_buf,
                                                ch.cols, ch.vals,
                                                ch.rows,
                                                cfg.gram_precision,
                                                cfg.factor_dtype)
        if cfg.save_model and getattr(self, "_save_tag", None):
            self._dump_gram(a_buf, b_buf, self._save_tag)
        x0_full = jnp.pad(current, ((0, m_pad - m), (0, 0)))
        batch = aux.get("solve_batch", cfg.chunk_rows)
        outs = []
        for lo in range(0, m_pad, batch):
            if aug:
                outs.append(_solve_slice_aug(
                    a_buf, x0_full, aux["row_nnz_pad"],
                    jnp.asarray(lo, jnp.int32), cfg.lam, batch,
                    cfg.solver, cfg.cg_iters, cfg.cg_tol,
                    backend=cfg.backend))
            else:
                outs.append(_solve_slice(
                    a_buf, b_buf, x0_full, aux["row_nnz_pad"],
                    jnp.asarray(lo, jnp.int32), cfg.lam, batch,
                    cfg.solver, cfg.cg_iters, cfg.cg_tol,
                    backend=cfg.backend))
        new_pad = jnp.concatenate(outs, axis=0) if len(outs) > 1 \
            else outs[0]
        se = 0.0
        if collect_rmse_terms:
            se = (_se_terms_aug(a_buf, new_pad) if aug else
                  _se_terms(a_buf, b_buf, new_pad)) + self._sum_r2()
        return new_pad[:m], se

    def _update_phase_split(self, table: jnp.ndarray,
                            current: jnp.ndarray, plan_pair,
                            collect_rmse_terms: bool):
        """Direct solves over a popularity-permuted, part-split gather
        table (SplitPlan): every per-part gather operand stays under the
        fast small-operand tier, the per-part G blocks concatenate along
        the contraction axis, and one fused Gram+CG instance still sees
        each row whole — no partial-Gram accumulators. The Yahoo-class
        answer to the reference's texture-staged theta kernels
        (reference hugewiki.cu:686-1688)."""
        cfg = self.cfg
        plan, chunks, aux = plan_pair
        f = cfg.f_pad
        s, k_parts = plan.part_size, plan.n_parts
        perm = aux["perm"]
        use_pallas = cfg.backend == "pallas" and cfg.solver == "cg"
        use_aug = use_wide = False
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import (aug_enabled,
                                                       fused_available,
                                                       wide_enabled)
            use_pallas = fused_available()
            use_wide = use_pallas and wide_enabled(cfg)
            use_aug = use_pallas and not use_wide and aug_enabled(cfg)
        if use_wide:
            from cumf_als_tpu.ops.pallas_solve import wide_f2
            f2w = wide_f2(cfg.f)

        def make_parts(table):
            if cfg.factor_dtype == "bf16":
                table = table.astype(jnp.bfloat16)
            tp = jnp.take(table, perm, axis=0)
            tp = jnp.pad(tp, ((0, k_parts * s - tp.shape[0]), (0, 0)))
            zero = jnp.zeros((1, f), tp.dtype)
            parts = tuple(
                jnp.concatenate(
                    [jax.lax.slice_in_dim(tp, k * s, (k + 1) * s), zero],
                    axis=0)
                for k in range(k_parts))
            if use_wide:
                # lane-split each part for the two-block wide kernel:
                # the second slab is PACKED to f2w lanes, so the per-
                # part gathers shed the dead f_pad lanes too
                parts = tuple(
                    (pt[:, :128], pt[:, 128:128 + f2w]) for pt in parts)
            # barrier: stop XLA from folding slice-then-gather back
            # into a gather on the big permuted table, which would
            # reintroduce the slow large-operand tier
            return jax.lax.optimization_barrier(parts)

        def chunk_solve(parts, current, part_ids, ch_arrays):
            rows, nnz, vals, cols_parts = ch_arrays
            r = rows.shape[0]
            if vals.ndim == 1:
                vals = vals.reshape(r, -1)
            cols_parts = tuple(c.reshape(r, -1) if c.ndim == 1 else c
                               for c in cols_parts)
            x0 = jnp.take(current, rows, axis=0, mode="fill",
                          fill_value=0.0)
            if use_wide:
                from cumf_als_tpu.ops.pallas_solve import \
                    fused_gram_cg_wide
                g1 = jnp.concatenate(
                    [jnp.take(parts[k][0], c, axis=0)
                     for k, c in zip(part_ids, cols_parts)], axis=1)
                g2 = jnp.concatenate(
                    [jnp.take(parts[k][1], c, axis=0)
                     for k, c in zip(part_ids, cols_parts)], axis=1)
                x1, x2, se = fused_gram_cg_wide(
                    g1, g2, vals, nnz, x0[:, :128], x0[:, 128:128 + f2w],
                    cfg.lam, cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol)
                solved = jnp.concatenate(
                    [x1, x2, jnp.zeros((x1.shape[0], 128 - f2w),
                                       jnp.float32)], axis=1)
                return solved, jnp.sum(se)
            g = jnp.concatenate(
                [jnp.take(parts[k], c, axis=0)
                 for k, c in zip(part_ids, cols_parts)], axis=1)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import (
                    fused_gram_cg, fused_gram_cg_aug)
                if use_aug:
                    solved, se = fused_gram_cg_aug(
                        g, vals, nnz, x0, cfg.lam, cg_iters=cfg.cg_iters,
                        cg_tol=cfg.cg_tol)
                else:
                    solved, se = fused_gram_cg(
                        g, vals, nnz, x0, cfg.lam, cg_iters=cfg.cg_iters,
                        cg_tol=cfg.cg_tol)
                return solved, jnp.sum(se)
            from cumf_als_tpu.ops.gram import _PRECISIONS
            prec = _PRECISIONS[cfg.gram_precision]
            a = jnp.einsum("rpf,rpg->rfg", g, g, precision=prec,
                           preferred_element_type=jnp.float32)
            b = jnp.einsum("rp,rpf->rf", vals, g.astype(jnp.float32),
                           precision=prec,
                           preferred_element_type=jnp.float32)
            nnzf = nnz.astype(jnp.float32)
            diag = nnzf * cfg.lam + (nnzf == 0)
            a = a + diag[:, None, None] * jnp.eye(f, dtype=jnp.float32)
            if cfg.gram_dtype == "bf16":
                a = a.astype(jnp.bfloat16)
            solved = solve(a, b, x0, solver=cfg.solver,
                           cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                           backend=cfg.backend)
            solved = solved * (nnz > 0)[:, None]
            se = fused_sq_err(a, b, vals, nnz, cfg.lam, solved) \
                if collect_rmse_terms else jnp.zeros((), jnp.float32)
            return solved, se

        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        part_ids_by_chunk = tuple(ch.parts for ch in chunks)
        chunk_arrays = tuple((ch.rows, ch.nnz, ch.vals, ch.cols)
                             for ch in chunks)
        if cfg.fuse_phase and use_pallas and \
                len(chunks) <= cfg.fuse_max_chunks and \
                current.nbytes <= (1 << 31):
            key = ("phase_split", id(plan), collect_rmse_terms,
                   cfg.backend)
            fn = self._fn_cache.get(key)
            if fn is None:
                def phase(table, current, chunk_arrays):
                    parts = make_parts(table)
                    se_total = jnp.zeros((), jnp.float32)
                    for pids, ch_arrays in zip(part_ids_by_chunk,
                                               chunk_arrays):
                        solved, se = chunk_solve(parts, current, pids,
                                                 ch_arrays)
                        current = current.at[ch_arrays[0]].set(
                            solved.astype(current.dtype), mode="drop")
                        se_total = se_total + se
                    return current, se_total
                fn = jax.jit(phase, donate_argnums=(1,))
                self._fn_cache[key] = fn
            current, se_total = fn(table, current, chunk_arrays)
            return current, (se_total if collect_rmse_terms else 0.0)

        key = ("split_parts_fn", id(plan))
        parts_fn = self._fn_cache.get(key)
        if parts_fn is None:
            parts_fn = jax.jit(make_parts)
            self._fn_cache[key] = parts_fn
        parts = parts_fn(table)
        se_parts = []
        for i, (pids, ch_arrays) in enumerate(zip(part_ids_by_chunk,
                                                  chunk_arrays)):
            k2 = ("split_chunk", id(plan), i, collect_rmse_terms)
            fn = self._fn_cache.get(k2)
            if fn is None:
                fn = jax.jit(lambda parts, cur, ca, _p=pids:
                             chunk_solve(parts, cur, _p, ca))
                self._fn_cache[k2] = fn
            solved, se = fn(parts, current, ch_arrays)
            if collect_rmse_terms:
                se_parts.append(se)
            current = current.at[ch_arrays[0]].set(solved.astype(current.dtype), mode="drop")
        se_acc = jnp.sum(jnp.stack(se_parts)) if se_parts else 0.0
        return current, se_acc

    def _update_phase_direct(self, table: jnp.ndarray,
                             current: jnp.ndarray, plan_pair,
                             collect_rmse_terms: bool):
        """Solve every row of `current` against fixed `table`. Returns the
        new factor and, when requested, the fused-RMSE accumulators."""
        cfg = self.cfg
        plan, chunks, _aux = plan_pair
        use_pallas = cfg.backend == "pallas" and cfg.solver == "cg"
        use_aug = use_wide = False
        if use_pallas:
            from cumf_als_tpu.ops.pallas_solve import (aug_enabled,
                                                       fused_available,
                                                       wide_enabled)
            use_pallas = fused_available()
            # wide beats aug in its range: it also avoids the b/r2
            # unpack AND sheds the dead f_pad lanes from every DMA/MXU
            # pass (VERDICT r3 #2's padding cliff)
            use_wide = use_pallas and wide_enabled(cfg)
            use_aug = use_pallas and not use_wide and aug_enabled(cfg)
        if chunks and cfg.save_model and getattr(self, "_save_tag", None):
            ch = chunks[0]
            a_d, b_d = gram_rhs(extend_table(table), ch.cols, ch.vals,
                                ch.nnz, cfg.lam,
                                precision=cfg.gram_precision)
            self._dump_gram(a_d, b_d, self._save_tag)

        def chunk_solve(table_ext, current, ch_arrays):
            rows, nnz, cols, vals = ch_arrays
            cols, vals = _unflatten(rows.shape[0], cols, vals)
            x0 = jnp.take(current, rows, axis=0, mode="fill",
                          fill_value=0.0)
            if use_wide:
                from cumf_als_tpu.ops.pallas_solve import (
                    gather_gram_cg_wide, wide_f2)
                solved, se = gather_gram_cg_wide(
                    table_ext, cols, vals, nnz, x0, cfg.lam,
                    f2=wide_f2(cfg.f), cg_iters=cfg.cg_iters,
                    cg_tol=cfg.cg_tol, factor_dtype=cfg.factor_dtype)
                return solved, jnp.sum(se)
            if use_pallas:
                from cumf_als_tpu.ops.pallas_solve import gather_gram_cg
                solved, se = gather_gram_cg(
                    table_ext, cols, vals, nnz, x0, cfg.lam,
                    cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                    factor_dtype=cfg.factor_dtype, aug=use_aug)
                return solved, jnp.sum(se)
            a, b = gram_rhs(table_ext, cols, vals, nnz, cfg.lam,
                            precision=cfg.gram_precision,
                            factor_dtype=cfg.factor_dtype,
                            gram_dtype=cfg.gram_dtype)
            solved = solve(a, b, x0, solver=cfg.solver,
                           cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol,
                           backend=cfg.backend)
            solved = solved * (nnz > 0)[:, None]
            se = fused_sq_err(a, b, vals, nnz, cfg.lam, solved) \
                if collect_rmse_terms else jnp.zeros((), jnp.float32)
            return solved, se

        # Fusing is only safe on the pallas path: the XLA path
        # materializes (R, f, f) Gram buffers per chunk, and inside one
        # program the scheduler may overlap enough chunks to blow HBM
        # (observed: 51 GB on Netflix/cholesky). The fused kernel keeps
        # A in VMEM scratch, so chunk overlap costs only gather buffers.
        # The fused whole-phase program threads `current` through one
        # scatter-update per chunk; XLA's scheduler overlaps chunks and
        # can keep several VERSIONS of `current` live at once — free for
        # Netflix-sized factors, fatal at hugewiki scale (12.5M x 128
        # bf16 = 3.2 GB per version; r5 scale-0.25 OOM). Huge factors
        # take the per-chunk dispatch path, where donation keeps
        # exactly one version alive.
        if cfg.fuse_phase and use_pallas and \
                len(chunks) <= cfg.fuse_max_chunks and \
                current.nbytes <= (1 << 31):
            # One jitted program for the whole phase: chunk solves are
            # row-disjoint and independent (warm starts read rows only
            # their own chunk writes), so write-back is a single scatter
            # and XLA may overlap gathers/kernels across chunks.
            key = ("phase_fused", id(plan), collect_rmse_terms,
                   cfg.backend)
            fn = self._fn_cache.get(key) if hasattr(self, "_fn_cache") \
                else None
            if not hasattr(self, "_fn_cache"):
                self._fn_cache = {}
            if fn is None:
                def phase(table, current, chunk_arrays):
                    # bf16 table BEFORE the gather: halves both the
                    # staged-table bytes and the materialized G buffer
                    # (the gather's consumer-side cast only got the
                    # latter). CUMF_USE_HALF semantics either way.
                    if cfg.factor_dtype == "bf16":
                        table = table.astype(jnp.bfloat16)
                    table_ext = extend_table(table)
                    se_total = jnp.zeros((), jnp.float32)
                    for ch_arrays in chunk_arrays:
                        solved, se = chunk_solve(table_ext, current,
                                                 ch_arrays)
                        rows = ch_arrays[0]
                        current = current.at[rows].set(
                            solved.astype(current.dtype), mode="drop")
                        se_total = se_total + se
                    return current, se_total
                fn = jax.jit(phase, donate_argnums=(1,))
                self._fn_cache[key] = fn
            chunk_arrays = tuple((c.rows, c.nnz, c.cols, c.vals)
                                 for c in chunks)
            current, se_total = fn(table, current, chunk_arrays)
            return current, (se_total if collect_rmse_terms else 0.0)

        if cfg.factor_dtype == "bf16":
            table = table.astype(jnp.bfloat16)
        table_ext = extend_table(table)
        # se parts stay on device: a float() per chunk would force a
        # blocking device sync and stall the dispatch pipeline.
        # The write-back is a DONATED jitted scatter: an eager
        # .at[].set copies the whole factor per chunk (3.2 GB x 2 per
        # chunk at hugewiki scale); donation updates in place.
        if not hasattr(self, "_fn_cache"):
            self._fn_cache = {}
        upd_key = ("scatter_rows", str(current.dtype))
        upd = self._fn_cache.setdefault(
            upd_key,
            jax.jit(lambda cur, rows, sol: cur.at[rows].set(
                sol.astype(cur.dtype), mode="drop"),
                donate_argnums=(0,)))
        # Huge-factor phases run per-chunk (fusion gate above); the
        # eager loop dispatches asynchronously, so without a throttle
        # ~hundreds of chunks queue with a ~1 GB gathered-G transient
        # each and the device OOMs on in-flight buffers (r5 hugewiki
        # scale-0.25: 6.4 GB resident, OOM regardless). Draining the
        # pipeline every few chunks bounds the overlap at a few
        # transients; a dependent scalar D2H read is the only sync the
        # axon tunnel honors.
        throttle = 4 if current.nbytes > (1 << 31) else 0
        se_parts = []
        for i, ch in enumerate(chunks):
            solved, se = chunk_solve(table_ext, current,
                                     (ch.rows, ch.nnz, ch.cols, ch.vals))
            if collect_rmse_terms:
                se_parts.append(se)
            current = upd(current, ch.rows, solved)
            if throttle and (i % throttle) == throttle - 1:
                float(jnp.sum(solved[:1, :1]))
        se_acc = jnp.sum(jnp.stack(se_parts)) if se_parts else 0.0
        return current, se_acc

    # ----- the training loop -----
    def run(self, x0: np.ndarray, theta0: np.ndarray,
            start_iter: int = 0) -> ALSResult:
        cfg = self.cfg
        if cfg.factor_store == "bf16":
            # Opt-in bf16 factor STORE (beyond the bf16 gather-table
            # cast): halves the resident factor HBM — the lever that
            # lets hugewiki scale-0.25 (m=12.5M: 6.4 GB f32 X) run
            # device-resident. Solved rows round to bf16 at write-back
            # and warm starts read the rounded values; CG re-solves
            # every iteration, so the effect is second-order (measured
            # +-3e-4 on trajectory A/Bs). The cast happens HOST-side so
            # the f32 factors never materialize on device (the f32
            # pad+mask intermediates alone were 12.8 GB at m=12.5M).
            import ml_dtypes
            x0 = np.asarray(x0).astype(ml_dtypes.bfloat16)
            theta0 = np.asarray(theta0).astype(ml_dtypes.bfloat16)
        x = self._pad_f(x0)
        theta = self._pad_f(theta0)
        # Zero factors of empty rows/cols up front: they are excluded
        # from every update plan, so whatever they were initialized to
        # would otherwise persist. Zero factors mean prediction 0 for
        # their test entries — the SURPASS_NAN-intended semantics.
        x = x * jnp.asarray(
            (np.diff(self.train_csr.indptr) > 0))[:, None].astype(x.dtype)
        theta = theta * jnp.asarray(
            (np.diff(self.train_csc.indptr) > 0))[:, None].astype(
            theta.dtype)

        history: List[IterationMetrics] = []
        if cfg.verbose:
            print(f"*******parameters: m: {cfg.m}, n:  {cfg.n}, "
                  f"f: {cfg.f}, nnz: {self.train_csr.nnz} ")
            print("*******start iterations...")
        for it in range(start_iter, cfg.iters):
            if cfg.verbose:
                print(f"---------------------------ALS iteration {it}, "
                      f"update X.----------------------------------")
            t0 = seconds()
            # tt = theta Gram feeding the X update (reference naming,
            # als.cu:800-807); dumped when save_model is on.
            self._save_tag = f"tt_iter{it:03d}" if cfg.save_model else None
            x, _ = call_with_vmem_backoff(
                self._update_phase, theta, x, self.plan_x, False,
                uses_pallas=backend_uses_pallas(cfg))
            if cfg.debug_timing:
                # exact per-phase split costs a device sync at the phase
                # boundary; without it the theta phase's head can queue
                # behind the X tail (and the combined time below is the
                # honest per-iteration figure)
                x.block_until_ready()
            tx = seconds() - t0
            if cfg.debug_timing:
                print(f"update X run {tx:f} seconds, gridSize: {cfg.m}, "
                      f"blockSize {cfg.f}.")

            if cfg.verbose:
                print(f"---------------------------------- ALS iteration "
                      f"{it}, update theta ----------------------------------")
            t0 = seconds()
            self._save_tag = f"xx_iter{it:03d}" if cfg.save_model else None
            want_fused = cfg.train_rmse_method == "fused"
            theta, se_acc = call_with_vmem_backoff(
                self._update_phase, x, theta, self.plan_theta, want_fused,
                uses_pallas=backend_uses_pallas(cfg))
            theta.block_until_ready()
            tth = seconds() - t0
            if cfg.debug_timing:
                print(f"update theta run {tth:f} seconds, gridSize: "
                      f"{cfg.n}, blockSize {cfg.f}.")

            if cfg.save_model:
                # CUMF_SAVE_MODEL analog (reference als.cu:33, 49-57,
                # 800-807): per-iteration solver artifacts for offline
                # numerical A/B diffing of solver/precision variants.
                from cumf_als_tpu.utils.checkpoint import save_debug_array
                save_debug_array(cfg.save_model_dir,
                                 f"XT_iter{it:03d}", self._unpad_f(x))
                save_debug_array(cfg.save_model_dir,
                                 f"thetaT_iter{it:03d}",
                                 self._unpad_f(theta))
            t0 = seconds()
            if want_fused:
                train_rmse = float(np.sqrt(max(float(se_acc), 0.0) /
                                           self.train_csr.nnz))
            else:
                train_rmse = rmse_direct(
                    x, theta, self.train_csr.to_coo_rows(),
                    self.train_csr.indices, self.train_csr.data)
            if cfg.verbose:
                print(f"--------- Train RMSE in iter {it}: {train_rmse:f}")
            test_rmse = float("nan")
            if self.test_coo is not None and self.test_coo.nnz:
                test_rmse = rmse_direct(x, theta, self.test_coo.row,
                                        self.test_coo.col,
                                        self.test_coo.data)
                if cfg.verbose:
                    print(f"--------- Test RMSE in iter {it}: {test_rmse:f}")
            trm = seconds() - t0
            history.append(IterationMetrics(it, train_rmse, test_rmse,
                                            tx, tth, trm))
            if cfg.metrics_jsonl:
                import json
                with open(cfg.metrics_jsonl, "a") as fh:
                    fh.write(json.dumps({
                        "iteration": it, "train_rmse": train_rmse,
                        "test_rmse": test_rmse, "x_seconds": tx,
                        "theta_seconds": tth, "rmse_seconds": trm}) + "\n")
            if cfg.checkpoint_every and cfg.checkpoint_dir and \
                    (it + 1) % cfg.checkpoint_every == 0:
                from cumf_als_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(cfg.checkpoint_dir, it, self._unpad_f(x),
                                self._unpad_f(theta), cfg)
            if not np.isfinite(train_rmse):
                # Abort-on-NaN guard (SURVEY §5 failure-detection gap in
                # the reference).
                raise FloatingPointError(
                    f"non-finite train RMSE at iteration {it}")
        if cfg.factor_store == "bf16":
            x = x.astype(jnp.float32)
            theta = theta.astype(jnp.float32)
        return ALSResult(x=self._unpad_f(x), theta=self._unpad_f(theta),
                         history=history)


def do_als(csr: CSRMatrix, csc: Optional[CSRMatrix], test: Optional[COOMatrix],
           theta0: np.ndarray, x0: np.ndarray, cfg: ALSConfig) -> ALSResult:
    """Functional doALS-equivalent (reference als.h:676-681): consumes the
    sparse views + initial factors, returns final factors and the RMSE
    trajectory (the reference returns the final test RMSE; ours carries
    the full history)."""
    model = ALS(cfg, csr, csc, test)
    return model.run(x0, theta0)
