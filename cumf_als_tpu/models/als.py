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
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.ops.gram import extend_table, gram_rhs
from cumf_als_tpu.ops.rmse import fused_sq_err, rmse_direct
from cumf_als_tpu.ops.solve import solve
from cumf_als_tpu.ops.tiling import UpdatePlan, build_update_plan
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


class DeviceChunk:
    """A plan chunk's arrays resident on device."""

    __slots__ = ("width", "rows", "nnz", "cols", "vals")

    def __init__(self, chunk, device=None):
        self.width = chunk.width
        self.rows = jnp.asarray(chunk.rows)
        self.nnz = jnp.asarray(chunk.nnz)
        self.cols = jnp.asarray(chunk.cols)
        self.vals = jnp.asarray(chunk.vals)


class ALS:
    """TPU-native ALS solver over row-compressed ratings.

    Parameters mirror doALS (reference als.h:676-681): the training CSR,
    its transpose (the CSC view), the test COO, and an ALSConfig carrying
    m, n, f, lambda, iters, batching and solver/precision flags.
    """

    def __init__(self, cfg: ALSConfig, train_csr: CSRMatrix,
                 train_csc: Optional[CSRMatrix] = None,
                 test_coo: Optional[COOMatrix] = None):
        from cumf_als_tpu.utils.io import transpose_csr
        self.cfg = cfg
        self.train_csr = train_csr
        self.train_csc = train_csc or transpose_csr(train_csr)
        self.test_coo = test_coo
        t0 = seconds()
        self.plan_x = self._device_plan(build_update_plan(
            self.train_csr, cfg.min_bucket_width, cfg.max_bucket_width,
            cfg.chunk_nnz, cfg.chunk_rows))
        self.plan_theta = self._device_plan(build_update_plan(
            self.train_csc, cfg.min_bucket_width, cfg.max_bucket_width,
            cfg.chunk_nnz, cfg.chunk_rows))
        self.plan_seconds = seconds() - t0

    @staticmethod
    def _device_plan(plan: UpdatePlan):
        return plan, [DeviceChunk(c) for c in plan.chunks]

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

    # ----- one phase -----
    def _update_phase(self, table: jnp.ndarray, current: jnp.ndarray,
                      plan_pair, collect_rmse_terms: bool):
        """Solve every row of `current` against fixed `table`. Returns the
        new factor and, when requested, the fused-RMSE accumulators."""
        cfg = self.cfg
        plan, chunks = plan_pair
        table_ext = extend_table(table)
        se_acc = 0.0
        for ch in chunks:
            a, b = gram_rhs(table_ext, ch.cols, ch.vals, ch.nnz, cfg.lam,
                            precision=cfg.gram_precision,
                            factor_dtype=cfg.factor_dtype,
                            gram_dtype=cfg.gram_dtype)
            x0 = jnp.take(current, ch.rows, axis=0, mode="fill",
                          fill_value=0.0)
            solved = solve(a, b, x0, solver=cfg.solver,
                           cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol)
            solved = solved * (ch.nnz > 0)[:, None]
            current = current.at[ch.rows].set(solved, mode="drop")
            if collect_rmse_terms:
                se_acc += float(fused_sq_err(a, b, ch.vals, ch.nnz,
                                             cfg.lam, solved))
        return current, se_acc

    # ----- the training loop -----
    def run(self, x0: np.ndarray, theta0: np.ndarray,
            start_iter: int = 0) -> ALSResult:
        cfg = self.cfg
        x = self._pad_f(x0)
        theta = self._pad_f(theta0)
        # Zero factors of empty rows/cols up front: they are excluded
        # from every update plan, so whatever they were initialized to
        # would otherwise persist. Zero factors mean prediction 0 for
        # their test entries — the SURPASS_NAN-intended semantics.
        x = x * jnp.asarray(
            (np.diff(self.train_csr.indptr) > 0).astype(np.float32))[:, None]
        theta = theta * jnp.asarray(
            (np.diff(self.train_csc.indptr) > 0).astype(np.float32))[:, None]

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
            x, _ = self._update_phase(theta, x, self.plan_x, False)
            x.block_until_ready()
            tx = seconds() - t0
            if cfg.debug_timing:
                print(f"update X run {tx:f} seconds, gridSize: {cfg.m}, "
                      f"blockSize {cfg.f}.")

            if cfg.verbose:
                print(f"---------------------------------- ALS iteration "
                      f"{it}, update theta ----------------------------------")
            t0 = seconds()
            want_fused = cfg.train_rmse_method == "fused"
            theta, se_acc = self._update_phase(
                x, theta, self.plan_theta, want_fused)
            theta.block_until_ready()
            tth = seconds() - t0
            if cfg.debug_timing:
                print(f"update theta run {tth:f} seconds, gridSize: "
                      f"{cfg.n}, blockSize {cfg.f}.")

            t0 = seconds()
            if want_fused:
                train_rmse = float(np.sqrt(max(se_acc, 0.0) /
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
