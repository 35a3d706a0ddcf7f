"""Fused Pallas Gram+CG kernel: the hermitian+solver hot path on-chip.

The reference tried to fuse Gram formation and CG into one CUDA kernel
(alsUpdateFeature100, reference cg.cu:726-1189) and abandoned it for
register pressure (als.cu:809-812). On TPU the fusion works: a Pallas
kernel tiles the gathered factor tensor G (R, P, f) over the contraction
axis, accumulates the f x f Gram blocks in VMEM via the MXU, adds the
regularizer, and runs the reference's CG iteration (warm start, fixed
iteration count, per-system early-exit masking — cg.cu:36-231) on the
VPU with A never leaving VMEM. HBM traffic drops from
(G + A write + 6x A matvec reads) to (G read + x write).

The gather producing G stays in XLA (Mosaic has no vectorized row
gather; measured XLA gather is the fastest primitive on v5e).
"""

from __future__ import annotations

import functools
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _p_block(width: int, f: int = 128, g_itemsize: int = 4) -> int:
    """Contraction-axis block size: divides the bucket width and is a
    lane-legal tile (multiple of 128, or the full width). Bigger tiles
    amortize Mosaic's per-matmul overhead (measured 2.9 -> 2.4 ns/nnz
    going 512 -> 1024 on v5e), bounded by VMEM via _row_block. Widths
    are q*2^k for q in {1,3,5,7} (ops/tiling.make_width_grid).

    The cap is the widest tile whose minimum 8-row block still fits
    the empirical VMEM footprint (see _per_row_bytes) under the 16 MB
    scoped-vmem limit. Widths are q*2^k (k >= 4), so a multiple-of-16
    divisor always exists."""
    room = _VMEM_BUDGET // 8 - 16 * f * f - 32 * f
    unit = (29 * f) // 5 + _g_stage_bytes(1, f, g_itemsize)
    cap = max(16, room // unit)
    if width <= cap:
        return width
    # sub-width tiles must be lane-legal in the (rb, pb) vals block:
    # multiples of 128 only (a full-width tile is legal at any width)
    for cand in (1280, 1152, 1024, 896, 768, 640, 512, 384, 256, 128):
        if cand <= cap and width % cand == 0:
            return cand
    # no legal divisor: full width — the kernel wrappers pad the
    # contraction axis to a multiple of 128 when this would not fit
    # the VMEM budget even at the 8-row minimum block (_maybe_pad_p)
    return width


def _maybe_pad_p(g, vals, f: int):
    """Pad the contraction axis to the next multiple of 128 when the
    only legal tiling (full width) cannot fit the VMEM budget at the
    minimum row block — e.g. width 960 at f=256/f32. Zero columns are
    inert in A, b and r^2."""
    p = g.shape[1]
    gi = jnp.dtype(g.dtype).itemsize
    pb = _p_block(p, f, gi)
    if pb == p and 8 * _per_row_bytes(pb, f, gi) > _VMEM_BUDGET \
            and p % 128:
        p_new = -(-p // 128) * 128
        g = jnp.pad(g, ((0, 0), (0, p_new - p), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, p_new - p)))
    return g, vals


# Scoped-vmem budget the block sizing targets; the hardware/compiler
# limit is 16 MB and _per_row_bytes is an exact fit of three measured
# points, so ~6 % slack suffices.
_VMEM_BUDGET = 15 << 20


def _g_stage_bytes(pb: int, f: int, g_itemsize: int) -> int:
    """Storage-dtype staging bytes of the fused kernel's G block.

    bf16 (r2 calibration): ~0.8 double-buffered input blocks ->
    1.6 B/slot. f32 (r4 recalibration): the r2 fit of 3.2 B/slot
    under-predicted — the on-TPU parity sweep caught width 1280/f32 at
    rb=8 compiling to a 17.21 MB stack vs the modeled 13.9 MB
    (round4_logs/tpu_parity.log), which solves to ~5.7 B/slot, i.e.
    the f32 path stages ~1.4 buffered copies, not 0.8. Kept as a
    per-itemsize fit so the three r2 bf16/f32 anchor points and the r4
    point all hold."""
    if g_itemsize >= 4:
        return (57 * pb * f * g_itemsize) // 40
    return (4 * pb * f * g_itemsize) // 5


def _per_row_bytes(pb: int, f: int, g_itemsize: int) -> int:
    """Empirical per-row VMEM footprint of the fused kernel (v5e).

    Calibrated on measured compile-time OOM stack sizes: width 240/
    f32/rb 32 -> 16.31 MB (~510 KB/row), width 16/bf16/rb 64 ->
    16.42 MB (~257 KB/row), width 1920/bf16/rb 8 -> 16.08 MB
    (~2.01 MB/row), width 1280/f32/rb 8 -> 17.21 MB (~2.15 MB/row,
    r4 parity sweep). Shape:

        bytes/row = 5.8 * pb * f  +  _g_stage_bytes  +  ~248 KB

    i.e. ~1.5 f32 copies of the G block (the vals*G broadcast temporary
    for the b accumulation + dot staging) + double-buffered input
    blocks in storage dtype + a *constant* ~4 A-sized f32 buffers (A
    scratch, regularized copy, CG matvec broadcast temp, out staging).
    Earlier models missed the dtype-independent f32 copies and the
    constant term, which is why wide-f32, narrow-bf16 AND wide-bf16
    chunks each blew the 16 MB limit in different ways."""
    return (29 * pb * f) // 5 + _g_stage_bytes(pb, f, g_itemsize) \
        + 16 * f * f + 32 * f


def _row_block(width: int, f: int, g_itemsize: int = 4) -> int:
    """Rows per grid step, bounding the kernel's VMEM footprint via the
    empirical _per_row_bytes model. At least 8 — the 2-D operand blocks
    need 8-sublane tiles."""
    pb = _p_block(width, f, g_itemsize)
    rb = max(8, _VMEM_BUDGET // _per_row_bytes(pb, f, g_itemsize))
    # power-of-two, <= 256, and must divide the (pow2-or-q*2^k) row count
    rb = min(256, 1 << (rb.bit_length() - 1))
    return max(8, rb)


def _cg_per_row_bytes(f: int, a_itemsize: int) -> int:
    """Empirical per-row VMEM footprint of the standalone CG kernel
    (v5e): the double-buffered storage-dtype A block plus ~2.2 A-sized
    f32 buffers (the f32 cast and the matvec broadcast temporary).
    Pinned by two measured points at f=128: bf16 A at rb=64 runs at
    ~13 MB scoped (proven in production Netflix runs); f32 A at rb=64
    OOMs at 17.40 MB. Both solve to

        bytes/row = (2*itemsize + 8.7) * f * f  (+ CG vectors, ~64*f)
    """
    return ((20 * a_itemsize + 87) * f * f) // 10 + 64 * f


def _cg_row_block(f: int, a_itemsize: int) -> int:
    rb = max(8, _VMEM_BUDGET // _cg_per_row_bytes(f, a_itemsize))
    return 1 << (rb.bit_length() - 1)


def _classify_compile_oom(exc: BaseException):
    """Classify an exception as a Mosaic scoped-VMEM compile OOM.

    Returns "direct" for an explicit vmem-allocation message, "opaque"
    for a remote-compile-helper failure (the tunneled chip used here
    keeps the Mosaic OOM detail in the compile server's log; the
    client-side exception is an opaque "HTTP 500: tpu_compile_helper
    subprocess exit code 1"), and None otherwise."""
    msg = str(exc).lower()
    if "vmem" in msg and "allocat" in msg:
        return "direct"
    if "tpu_compile_helper" in msg or "remote_compile" in msg:
        return "opaque"
    return None


def _lower_vmem_budget(kind: str) -> bool:
    """Shrink the sizing budget all the kernel block models target and
    clear jit caches so re-tracing picks the new blocks up. The models
    are empirical fits of measured footprints; on a toolchain where a
    fit is off, this turns a fatal mid-run crash into a recompile with
    smaller blocks. Returns False once the budget floor is reached."""
    global _VMEM_BUDGET
    if _VMEM_BUDGET <= (9 << 20):
        return False
    _VMEM_BUDGET -= (2 << 20)
    jax.clear_caches()
    if kind == "opaque":
        # ADVICE r2: opaque-triggered backoffs must be diagnosable from
        # the driver log (each costs a clear_caches + full recompile).
        print(f"[pallas] opaque remote-compile failure: lowering VMEM "
              f"budget to {_VMEM_BUDGET >> 20} MiB and retrying",
              file=sys.stderr, flush=True)
    return True


def vmem_oom_backoff(exc: BaseException) -> bool:
    """Recognize a compile-time Mosaic scoped-VMEM OOM and shrink the
    kernel sizing budget. Returns True when the budget was lowered —
    the caller must retry the failed dispatch. Returns False for any
    other error, or once the budget floor is reached."""
    kind = _classify_compile_oom(exc)
    if kind is None:
        return False
    return _lower_vmem_budget(kind)


def call_with_vmem_backoff(fn, *args, uses_pallas: bool = True, **kwargs):
    """Run fn, retrying on compile-time scoped-VMEM OOM with smaller
    kernel blocks. Used by the model run loops around phase dispatches,
    where a retry is safe: the OOM is raised at compile time, before
    any donated buffer is consumed.

    uses_pallas: whether the dispatch contains pallas_call kernels
    whose block sizing the budget actually controls. When False, an
    OPAQUE remote-compile 500 re-raises at once — a genuine XLA
    miscompile must surface on first error instead of costing three
    recompiles (VERDICT r2 #8). A DIRECT "vmem ... allocating" message
    still retries regardless: it can only come from a Mosaic kernel
    compile, so the static gate miscomputing (a path that reaches a
    pallas_call the gate didn't account for) must not turn a
    recoverable OOM into a fatal one.

    An OPAQUE failure is first retried once at the UNCHANGED budget:
    transient tunnel/compile-server flakes then succeed without
    permanently shrinking every kernel in the process (ADVICE r2)."""
    opaque_retried = False
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered by message
            kind = _classify_compile_oom(e)
            if kind is None or (kind == "opaque" and not uses_pallas):
                raise
            if kind == "opaque" and not opaque_retried:
                opaque_retried = True
                print("[pallas] opaque remote-compile failure: retrying "
                      "once at the unchanged VMEM budget "
                      f"({_VMEM_BUDGET >> 20} MiB)",
                      file=sys.stderr, flush=True)
                continue
            if not _lower_vmem_budget(kind):
                raise


def _cg_loop(a, b, x, cg_iters: int, cg_tol: float,
             debug: bool = False, matvec_impl: str = "vpu"):
    """The reference CG iteration (cg.cu:36-231) on the VPU, batched over
    the rows of a VMEM-resident A (rb, f, f). Warm start from x, fixed
    iteration count, per-system early exit at rsnew < cg_tol applied
    *after* x took that iteration's alpha — exactly ops/solve.solve_cg,
    with masks carried as f32 (1-D bool loop carries trip a Mosaic
    layout bug on v5e).

    matvec_impl: "vpu" broadcasts A against p and lane-reduces on the
    VPU (the measured-best default); "mxu" issues a batched dot_general
    so the per-system matvec rides the (otherwise idle during CG)
    systolic array — A/B-able via scripts/bench_cg_matvec.py."""

    if matvec_impl == "mxu":
        def matvec(p):
            return jax.lax.dot_general(
                a, p, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
    else:
        def matvec(p):
            return jnp.sum(a * p[:, None, :], axis=-1)

    r = b - matvec(x)
    p = r
    rsold = jnp.sum(r * r, axis=-1, keepdims=True)
    active = jnp.ones_like(rsold)

    def body(carry):
        it, x, r, p, rsold, active = carry
        ap = matvec(p)
        pap = jnp.sum(p * ap, axis=-1, keepdims=True)
        nonzero = (jnp.abs(pap) > 0).astype(jnp.float32)
        safe = pap + (1.0 - nonzero)
        alpha = active * nonzero * rsold / safe
        x = x + alpha * p
        r = r - alpha * ap
        rsnew = jnp.sum(r * r, axis=-1, keepdims=True)
        if debug:
            # in-kernel CG tracing for system 0 of grid block 0 —
            # the reference's DEBUG printf (cg.cu:93-111) analog
            @pl.when(pl.program_id(0) == 0)
            def _():
                pl.debug_print(
                    "cg it={} rsold={} pap={} rsnew={}",
                    it, rsold[0, 0], pap[0, 0], rsnew[0, 0])
        still = active * (rsnew >= cg_tol).astype(jnp.float32)
        safe_old = rsold + (rsold <= 0).astype(jnp.float32)
        beta = still * rsnew / safe_old
        p = still * (r + beta * p) + (1.0 - still) * p
        rsold = still * rsnew + (1.0 - still) * rsold
        return it + 1, x, r, p, rsold, still

    # Block-level early exit (r3): once EVERY system in the block has
    # taken its per-system exit (rsnew < cg_tol — cg.cu:195's break),
    # the remaining fixed iterations would be masked no-ops; a while
    # loop skips them with bit-identical results. In steady-state ALS
    # the warm-started solves converge in 1-3 iterations, so this
    # erases most of the CG tail the reference always pays.
    def cond(carry):
        it, x, r, p, rsold, active = carry
        return jnp.logical_and(it < cg_iters, jnp.max(active) > 0)

    _, x, *_ = jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), x, r, p, rsold, active))
    return x


def _kernel(g_ref, vals_ref, nnz_ref, x0_ref, out_ref, se_ref, a_scr,
            b_scr, r2_scr,
            *, lam: float, cg_iters: int, cg_tol: float, n_p: int,
            debug: bool = False, matvec_impl: str = "vpu"):
    pb = pl.program_id(1)
    f = out_ref.shape[-1]

    @pl.when(pb == 0)
    def _():
        a_scr[...] = jnp.zeros_like(a_scr)
        b_scr[...] = jnp.zeros_like(b_scr)
        r2_scr[...] = jnp.zeros_like(r2_scr)

    g = g_ref[...].astype(jnp.float32)              # (R_b, P_b, f)
    a_scr[...] += jax.lax.dot_general(
        g, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (R_b, f, f)
    # vals may arrive bf16 (compact device plans, r5): square in f32
    vblk = vals_ref[...].astype(jnp.float32)
    b_scr[...] += jnp.sum(vblk[:, :, None] * g, axis=1)
    r2_scr[...] += jnp.sum(vblk * vblk, axis=1, keepdims=True)

    @pl.when(pb == n_p - 1)
    def _():
        nnz = nnz_ref[...][:, 0]                     # (R_b,)
        diag = nnz * lam + (nnz == 0).astype(jnp.float32)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (f, f), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
               ).astype(jnp.float32)
        a = a_scr[...] + diag[:, None, None] * eye[None]
        b = b_scr[...]
        x = _cg_loop(a, b, x0_ref[...].astype(jnp.float32),
                     cg_iters, cg_tol, debug=debug,
                     matvec_impl=matvec_impl)
        live = (nnz > 0).astype(jnp.float32)[:, None]
        x = x * live
        out_ref[...] = x
        # free train-RMSE pieces (exact identity, see ops/rmse.py):
        # se_row = sum r^2 - 2 x.b + x^T (A - diag I) x
        cross = jnp.sum(x * b, axis=-1, keepdims=True)
        aq = jnp.sum(a * x[:, :, None], axis=-2)
        quad = (jnp.sum(x * aq, axis=-1, keepdims=True) -
                diag[:, None] * jnp.sum(x * x, axis=-1, keepdims=True))
        se_ref[...] = jnp.maximum(r2_scr[...] - 2.0 * cross + quad, 0.0)


def _kernel_aug(g_ref, vals_ref, nnz_ref, x0_ref, out_ref, se_ref,
                a_scr, *,
                lam: float, cg_iters: int, cg_tol: float, n_p: int,
                debug: bool = False, matvec_impl: str = "vpu"):
    """Augmented-lane variant (r3): the rating value is spliced into
    lane f-1 of G *in VMEM* (lane f-1 of the gathered table is zero, so
    it is one masked VPU add), then ONE MXU `dot_general` accumulates
    the Gram A (the (f-1)x(f-1) block), the RHS b (row f-1) and the
    per-row sum(r^2) (the corner) together. The separate VPU b/r2
    broadcast passes — and their f32 VMEM temporaries, the largest term
    in the fused kernel's footprint — disappear, and G feeds the MXU in
    its storage dtype (no f32 staging copy). Splicing here rather than
    in XLA matters: a pre-kernel concat does NOT fuse into the gather,
    so it re-materialized the whole gathered G in HBM (measured +0.21
    s/iter on Netflix, round3_logs/netflix_aug.log). Requires true
    factor width <= f-1, which holds whenever F is not a multiple of
    128 (the reference's own F=100 headline shape, main.cpp:33-35,
    pads to 128 lanes)."""
    pb = pl.program_id(1)
    f = out_ref.shape[-1]

    @pl.when(pb == 0)
    def _():
        a_scr[...] = jnp.zeros_like(a_scr)

    g = g_ref[...]                                   # storage dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, f), 2)
    # the minor-dim insert must happen on the f32 vals (Mosaic only
    # supports non-no-op minor-dim inserts for 32-bit types); the
    # masked product then casts down to the storage dtype
    g = g + (vals_ref[...].astype(jnp.float32)[:, :, None] *
             (lane == f - 1).astype(jnp.float32)).astype(g.dtype)
    a_scr[...] += jax.lax.dot_general(
        g, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (R_b, f, f)

    @pl.when(pb == n_p - 1)
    def _():
        nnz = nnz_ref[...][:, 0]                     # (R_b,)
        diag = nnz * lam + (nnz == 0).astype(jnp.float32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (f, f), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
        eye = (row_i == col_i).astype(jnp.float32)
        keep = jnp.logical_and(row_i < f - 1, col_i < f - 1
                               ).astype(jnp.float32)
        a_full = a_scr[...]
        brow = a_full[:, f - 1, :]                   # (R_b, f) = [b | r2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, f), 1)
        b = brow * (lane < f - 1).astype(jnp.float32)
        r2 = jnp.sum(brow * (lane == f - 1).astype(jnp.float32),
                     axis=-1, keepdims=True)
        a = a_full * keep[None] + diag[:, None, None] * eye[None]
        x = _cg_loop(a, b, x0_ref[...].astype(jnp.float32),
                     cg_iters, cg_tol, debug=debug,
                     matvec_impl=matvec_impl)
        live = (nnz > 0).astype(jnp.float32)[:, None]
        x = x * live
        out_ref[...] = x
        # free train-RMSE pieces (exact identity, see ops/rmse.py);
        # the value lane of x is zero, so the masked a/b terms equal
        # the unaugmented kernel's
        cross = jnp.sum(x * b, axis=-1, keepdims=True)
        aq = jnp.sum(a * x[:, :, None], axis=-2)
        quad = (jnp.sum(x * aq, axis=-1, keepdims=True) -
                diag[:, None] * jnp.sum(x * x, axis=-1, keepdims=True))
        se_ref[...] = jnp.maximum(r2 - 2.0 * cross + quad, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("lam", "cg_iters", "cg_tol", "debug",
                                    "matvec_impl"))
def fused_gram_cg_aug(g: jnp.ndarray, vals: jnp.ndarray,
                      nnz: jnp.ndarray, x0: jnp.ndarray,
                      lam: float, cg_iters: int = 6, cg_tol: float = 1e-4,
                      debug: bool = False, matvec_impl: str = "vpu"):
    """Fused Gram+CG over G (R, P, f) with lane f-1 all-zero and vals
    (R, P) the rating values, spliced into lane f-1 in VMEM (padded
    contraction slots hold zero in both, so padding stays inert).
    Returns (x (R, f), se (R, 1)); lane f-1 of x is identically zero."""
    g, vals = _maybe_pad_p(g, vals, g.shape[2])
    r, p, f = g.shape
    gi = jnp.dtype(g.dtype).itemsize
    pb = _p_block(p, f, gi)
    rb = _row_block(p, f, gi)
    while r % rb:
        rb //= 2
    n_p = p // pb
    grid = (r // rb, n_p)
    nnz_f = nnz.astype(jnp.float32).reshape(r, 1)
    kernel = functools.partial(_kernel_aug, lam=float(lam),
                               cg_iters=int(cg_iters),
                               cg_tol=float(cg_tol), n_p=n_p,
                               debug=debug, matvec_impl=matvec_impl)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, pb, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, f), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, f, f), jnp.float32),
        ],
    )(g, vals, nnz_f, x0)


def augment_g(g: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Splice the rating values into lane f-1 of the gathered factor
    block. XLA fuses the slice+concat into the gather's materialization
    (G is written to HBM once either way, as the pallas_call input), so
    the augmentation is free. Values round to the factor dtype; the
    real workloads' rating grids (halves 0.5..5, integers 0..100) are
    exact in bf16."""
    f = g.shape[2]
    return jnp.concatenate(
        [g[:, :, :f - 1], vals[:, :, None].astype(g.dtype)], axis=2)


@functools.partial(jax.jit,
                   static_argnames=("lam", "cg_iters", "cg_tol", "debug",
                                    "matvec_impl"))
def fused_gram_cg(g: jnp.ndarray, vals: jnp.ndarray, nnz: jnp.ndarray,
                  x0: jnp.ndarray, lam: float, cg_iters: int = 6,
                  cg_tol: float = 1e-4, debug: bool = False,
                  matvec_impl: str = "vpu"):
    """Solve one bucket chunk: G (R, P, f) gathered factors, vals (R, P),
    nnz (R,), x0 (R, f) warm start. Returns (x (R, f), se (R, 1)) where
    se holds the per-row training squared error of the solved factors."""
    g, vals = _maybe_pad_p(g, vals, g.shape[2])
    r, p, f = g.shape
    gi = jnp.dtype(g.dtype).itemsize
    pb = _p_block(p, f, gi)
    rb = _row_block(p, f, gi)
    while r % rb:
        rb //= 2
    n_p = p // pb
    grid = (r // rb, n_p)
    nnz_f = nnz.astype(jnp.float32).reshape(r, 1)
    kernel = functools.partial(_kernel, lam=float(lam),
                               cg_iters=int(cg_iters),
                               cg_tol=float(cg_tol), n_p=n_p,
                               debug=debug, matvec_impl=matvec_impl)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, pb, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, f), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, f, f), jnp.float32),
            pltpu.VMEM((rb, f), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
        ],
    )(g, vals, nnz_f, x0)


def _gram_kernel(g_ref, vals_ref, a_ref, b_ref, a_scr, b_scr, *,
                 n_p: int):
    """Gram-only variant: accumulate A, b in VMEM over contraction
    tiles, write both out at the last tile (no solve). Used by the
    panel paths, which must reduce partials across panels before
    solving. Routing the gather through a Pallas consumer measures
    ~20 % faster end-to-end than gather + XLA einsum on v5e."""
    pb = pl.program_id(1)

    @pl.when(pb == 0)
    def _():
        a_scr[...] = jnp.zeros_like(a_scr)
        b_scr[...] = jnp.zeros_like(b_scr)

    g = g_ref[...].astype(jnp.float32)
    a_scr[...] += jax.lax.dot_general(
        g, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    b_scr[...] += jnp.sum(vals_ref[...].astype(jnp.float32)[:, :, None]
                          * g, axis=1)

    @pl.when(pb == n_p - 1)
    def _():
        a_ref[...] = a_scr[...].astype(a_ref.dtype)
        b_ref[...] = b_scr[...]


@functools.partial(jax.jit, static_argnames=("factor_dtype", "out_dtype"))
def gather_gram_out(table_ext, cols, vals, factor_dtype="f32",
                    out_dtype="float32"):
    """XLA gather + Pallas Gram: returns raw (A, b) partials (no
    regularizer — the caller reduces across panels first). A accumulates
    f32 in VMEM; out_dtype="bfloat16" writes the partial bf16 (halving
    its HBM write — the CUMF_TT_FP16 analog, reference als.cu:30-31)."""
    if factor_dtype == "bf16":
        # cast the TABLE, not the gathered copy: the gather then moves
        # half the bytes (and XLA fuses the table cast into one cheap
        # pass over the small factor)
        table_ext = table_ext.astype(jnp.bfloat16)
    g = jnp.take(table_ext, cols, axis=0)
    g, vals = _maybe_pad_p(g, vals, g.shape[2])
    r, p, f = g.shape
    gi = jnp.dtype(g.dtype).itemsize
    pb = _p_block(p, f, gi)
    rb = _row_block(p, f, gi)
    while r % rb:
        rb //= 2
    n_p = p // pb
    a_dtype = jnp.dtype(out_dtype)
    kernel = functools.partial(_gram_kernel, n_p=n_p)
    return pl.pallas_call(
        kernel,
        grid=(r // rb, n_p),
        in_specs=[
            pl.BlockSpec((rb, pb, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, f, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, f, f), a_dtype),
            jax.ShapeDtypeStruct((r, f), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, f, f), jnp.float32),
            pltpu.VMEM((rb, f), jnp.float32),
        ],
    )(g, vals)


def _gram_kernel_aug(g_ref, vals_ref, a_ref, a_scr, *, n_p: int):
    """Gram-out over the in-VMEM-augmented G: the single accumulated
    output A' carries the raw Gram (lanes < f-1), the RHS b (row f-1)
    and the per-row sum(r^2) (corner). The panel paths then
    accumulate/psum ONE buffer and the b scatter-add chain disappears
    entirely. The value lane is spliced here (not in XLA) so the
    gathered G materializes in HBM exactly once — see _kernel_aug."""
    pb = pl.program_id(1)
    f = a_ref.shape[-1]

    @pl.when(pb == 0)
    def _():
        a_scr[...] = jnp.zeros_like(a_scr)

    g = g_ref[...]                                   # storage dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, f), 2)
    # the minor-dim insert must happen on the f32 vals (Mosaic only
    # supports non-no-op minor-dim inserts for 32-bit types); the
    # masked product then casts down to the storage dtype
    g = g + (vals_ref[...].astype(jnp.float32)[:, :, None] *
             (lane == f - 1).astype(jnp.float32)).astype(g.dtype)
    a_scr[...] += jax.lax.dot_general(
        g, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    @pl.when(pb == n_p - 1)
    def _():
        a_ref[...] = a_scr[...].astype(a_ref.dtype)


@functools.partial(jax.jit, static_argnames=("factor_dtype", "out_dtype"))
def gather_gram_aug_out(table_ext, cols, vals, factor_dtype="f32",
                        out_dtype="float32"):
    """XLA gather + augmented Pallas Gram: returns the combined raw
    partial A' (R, f, f) with b in row f-1 and sum(r^2) in the corner.
    Requires lane f-1 of the table to be all zero (true factor width
    < f_pad)."""
    if factor_dtype == "bf16":
        table_ext = table_ext.astype(jnp.bfloat16)
    g = jnp.take(table_ext, cols, axis=0)
    g, vals = _maybe_pad_p(g, vals, g.shape[2])
    r, p, f = g.shape
    gi = jnp.dtype(g.dtype).itemsize
    pb = _p_block(p, f, gi)
    rb = _row_block(p, f, gi)
    while r % rb:
        rb //= 2
    n_p = p // pb
    kernel = functools.partial(_gram_kernel_aug, n_p=n_p)
    return pl.pallas_call(
        kernel,
        grid=(r // rb, n_p),
        in_specs=[
            pl.BlockSpec((rb, pb, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, f, f), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, f, f), jnp.dtype(out_dtype)),
        scratch_shapes=[
            pltpu.VMEM((rb, f, f), jnp.float32),
        ],
    )(g, vals)


@functools.partial(jax.jit, static_argnames=("lam", "cg_iters", "cg_tol",
                                             "factor_dtype", "aug"))
def gather_gram_cg(table_ext, cols, vals, nnz, x0, lam, cg_iters=6,
                   cg_tol=1e-4, factor_dtype="f32", aug=False):
    """XLA gather feeding the fused kernel: one jit for the whole chunk
    update. table_ext is the zero-extended fixed factor. aug=True
    requires lane f-1 of the table to be all zero (true factor width
    < f_pad): the rating values then ride lane f-1 of G and the
    augmented kernel forms A, b and r^2 in one MXU accumulation."""
    if factor_dtype == "bf16":
        table_ext = table_ext.astype(jnp.bfloat16)  # cast BEFORE gather
    g = jnp.take(table_ext, cols, axis=0)
    if aug:
        return fused_gram_cg_aug(g, vals, nnz, x0, lam,
                                 cg_iters=cg_iters, cg_tol=cg_tol)
    return fused_gram_cg(g, vals, nnz, x0, lam, cg_iters=cg_iters,
                         cg_tol=cg_tol)


# ---------------------------------------------------------------------
# Wide-F tier (128 < F <= 256): two-block Gram + blocked CG.
#
# The MXU's lane granule is 128, so a monolithic kernel pads F=130 to
# 256 lanes and pays exactly what F=256 pays — the measured 4.4x cliff
# (VERDICT r3 #2; the reference's get_hermitianT10 scales ~F^2 at
# 10-granularity instead, reference als.cu:575-659). Splitting the
# factor lanes as f = 128 + f2 (f2 the true remainder, padded to 32)
# recovers most of the slack:
#   - Gram: A11 (128x128) + A12 (128xf2) + A22 (f2xf2) = 3 MXU pass
#     units instead of 4 (A21 comes free by symmetry);
#   - HBM: G streams at (128+f2) lanes instead of 256 — the gathered-G
#     DMA is the kernel's dominant traffic;
#   - VMEM: the A-shaped f32 buffers shrink (256+f2)/512-fold, so row
#     blocks grow and per-grid-step overhead drops.
# The blocked CG solves the full (128+f2)-dim system exactly: matvec is
# [A11 p1 + A12 p2, A12^T p1 + A22 p2].
# ---------------------------------------------------------------------


def _per_row_bytes_wide(pb: int, f2: int, g_itemsize: int) -> int:
    """Empirical per-row VMEM footprint of the wide kernel, derived
    from the calibrated _per_row_bytes model: the G staging/broadcast
    copies scale with PHYSICAL lanes (f2 pads to 128 in VMEM, so 256
    total), while the ~4 A-shaped f32 buffers scale with the block
    elements (128*128 + 128*f2pad + f2*f2pad vs 256*256)."""
    fphys = 256
    f2pad = -(-f2 // 128) * 128
    a_elems = 128 * 128 + 128 * f2pad + f2 * f2pad
    return (29 * pb * fphys) // 5 + _g_stage_bytes(pb, fphys, g_itemsize) \
        + 16 * a_elems + 32 * fphys


def _row_block_wide(width: int, f2: int, g_itemsize: int = 4) -> int:
    pb = _p_block(width, 256, g_itemsize)
    rb = max(8, _VMEM_BUDGET // _per_row_bytes_wide(pb, f2, g_itemsize))
    rb = min(256, 1 << (rb.bit_length() - 1))
    return max(8, rb)


def _cg_loop_wide(a11, a12, a22, b1, b2, x1, x2, cg_iters: int,
                  cg_tol: float, matvec_impl: str = "vpu"):
    """_cg_loop on the two-block system [[A11, A12], [A12^T, A22]]:
    identical semantics (warm start, fixed iters, per-system early exit
    after x takes alpha, block-level early exit), carries split in
    (f1, f2) halves."""

    if matvec_impl == "mxu":
        def matvec(p1, p2):
            dg = functools.partial(jax.lax.dot_general,
                                   preferred_element_type=jnp.float32)
            y1 = dg(a11, p1, dimension_numbers=(((2,), (1,)),
                                                ((0,), (0,)))) + \
                dg(a12, p2, dimension_numbers=(((2,), (1,)),
                                               ((0,), (0,))))
            y2 = dg(a12, p1, dimension_numbers=(((1,), (1,)),
                                                ((0,), (0,)))) + \
                dg(a22, p2, dimension_numbers=(((2,), (1,)),
                                               ((0,), (0,))))
            return y1, y2
    else:
        def matvec(p1, p2):
            y1 = jnp.sum(a11 * p1[:, None, :], axis=-1) + \
                jnp.sum(a12 * p2[:, None, :], axis=-1)
            y2 = jnp.sum(a12 * p1[:, :, None], axis=1) + \
                jnp.sum(a22 * p2[:, None, :], axis=-1)
            return y1, y2

    ax1, ax2 = matvec(x1, x2)
    r1, r2v = b1 - ax1, b2 - ax2
    p1, p2 = r1, r2v
    rsold = (jnp.sum(r1 * r1, axis=-1, keepdims=True) +
             jnp.sum(r2v * r2v, axis=-1, keepdims=True))
    active = jnp.ones_like(rsold)

    def body(carry):
        it, x1, x2, r1, r2v, p1, p2, rsold, active = carry
        ap1, ap2 = matvec(p1, p2)
        pap = (jnp.sum(p1 * ap1, axis=-1, keepdims=True) +
               jnp.sum(p2 * ap2, axis=-1, keepdims=True))
        nonzero = (jnp.abs(pap) > 0).astype(jnp.float32)
        safe = pap + (1.0 - nonzero)
        alpha = active * nonzero * rsold / safe
        x1 = x1 + alpha * p1
        x2 = x2 + alpha * p2
        r1 = r1 - alpha * ap1
        r2v = r2v - alpha * ap2
        rsnew = (jnp.sum(r1 * r1, axis=-1, keepdims=True) +
                 jnp.sum(r2v * r2v, axis=-1, keepdims=True))
        still = active * (rsnew >= cg_tol).astype(jnp.float32)
        safe_old = rsold + (rsold <= 0).astype(jnp.float32)
        beta = still * rsnew / safe_old
        p1 = still * (r1 + beta * p1) + (1.0 - still) * p1
        p2 = still * (r2v + beta * p2) + (1.0 - still) * p2
        rsold = still * rsnew + (1.0 - still) * rsold
        return it + 1, x1, x2, r1, r2v, p1, p2, rsold, still

    def cond(carry):
        it = carry[0]
        active = carry[-1]
        return jnp.logical_and(it < cg_iters, jnp.max(active) > 0)

    _, x1, x2, *_ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), x1, x2, r1, r2v, p1, p2, rsold, active))
    return x1, x2


def _kernel_wide(g1_ref, g2_ref, vals_ref, nnz_ref, x01_ref, x02_ref,
                 out1_ref, out2_ref, se_ref,
                 a11_scr, a12_scr, a22_scr, b1_scr, b2_scr, r2_scr, *,
                 lam: float, cg_iters: int, cg_tol: float, n_p: int,
                 matvec_impl: str = "vpu"):
    pb = pl.program_id(1)
    f1 = out1_ref.shape[-1]
    f2 = out2_ref.shape[-1]

    @pl.when(pb == 0)
    def _():
        a11_scr[...] = jnp.zeros_like(a11_scr)
        a12_scr[...] = jnp.zeros_like(a12_scr)
        a22_scr[...] = jnp.zeros_like(a22_scr)
        b1_scr[...] = jnp.zeros_like(b1_scr)
        b2_scr[...] = jnp.zeros_like(b2_scr)
        r2_scr[...] = jnp.zeros_like(r2_scr)

    g1 = g1_ref[...].astype(jnp.float32)            # (R_b, P_b, f1)
    g2 = g2_ref[...].astype(jnp.float32)            # (R_b, P_b, f2)
    dn = (((1,), (1,)), ((0,), (0,)))
    a11_scr[...] += jax.lax.dot_general(
        g1, g1, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    a12_scr[...] += jax.lax.dot_general(
        g1, g2, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    a22_scr[...] += jax.lax.dot_general(
        g2, g2, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    vblk = vals_ref[...].astype(jnp.float32)
    b1_scr[...] += jnp.sum(vblk[:, :, None] * g1, axis=1)
    b2_scr[...] += jnp.sum(vblk[:, :, None] * g2, axis=1)
    r2_scr[...] += jnp.sum(vblk * vblk, axis=1, keepdims=True)

    @pl.when(pb == n_p - 1)
    def _():
        nnz = nnz_ref[...][:, 0]
        diag = nnz * lam + (nnz == 0).astype(jnp.float32)

        def eye(k):
            return (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) ==
                    jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
                    ).astype(jnp.float32)

        a11 = a11_scr[...] + diag[:, None, None] * eye(f1)[None]
        a22 = a22_scr[...] + diag[:, None, None] * eye(f2)[None]
        a12 = a12_scr[...]
        b1, b2 = b1_scr[...], b2_scr[...]
        x1, x2 = _cg_loop_wide(a11, a12, a22, b1, b2,
                               x01_ref[...].astype(jnp.float32),
                               x02_ref[...].astype(jnp.float32),
                               cg_iters, cg_tol,
                               matvec_impl=matvec_impl)
        live = (nnz > 0).astype(jnp.float32)[:, None]
        x1 = x1 * live
        x2 = x2 * live
        out1_ref[...] = x1
        out2_ref[...] = x2
        # free train-RMSE identity on the blocked system (ops/rmse.py):
        # se = sum r^2 - 2 x.b + x^T (A - diag I) x
        cross = (jnp.sum(x1 * b1, axis=-1, keepdims=True) +
                 jnp.sum(x2 * b2, axis=-1, keepdims=True))
        aq1 = (jnp.sum(a11 * x1[:, None, :], axis=-1) +
               jnp.sum(a12 * x2[:, None, :], axis=-1))
        aq2 = (jnp.sum(a12 * x1[:, :, None], axis=1) +
               jnp.sum(a22 * x2[:, None, :], axis=-1))
        quad = (jnp.sum(x1 * aq1, axis=-1, keepdims=True) +
                jnp.sum(x2 * aq2, axis=-1, keepdims=True) -
                diag[:, None] * (
                    jnp.sum(x1 * x1, axis=-1, keepdims=True) +
                    jnp.sum(x2 * x2, axis=-1, keepdims=True)))
        se_ref[...] = jnp.maximum(r2_scr[...] - 2.0 * cross + quad, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("lam", "cg_iters", "cg_tol",
                                    "matvec_impl"))
def fused_gram_cg_wide(g1: jnp.ndarray, g2: jnp.ndarray,
                       vals: jnp.ndarray, nnz: jnp.ndarray,
                       x01: jnp.ndarray, x02: jnp.ndarray, lam: float,
                       cg_iters: int = 6, cg_tol: float = 1e-4,
                       matvec_impl: str = "vpu"):
    """Two-block fused Gram+CG: g1 (R, P, 128) and g2 (R, P, f2) are
    the lane halves of the gathered factor block (f2 <= 128, multiple
    of 32; dead lanes zero). Returns (x1 (R, 128), x2 (R, f2),
    se (R, 1))."""
    g1, vals = _maybe_pad_p(g1, vals, 256)
    if g2.shape[1] != g1.shape[1]:
        g2 = jnp.pad(g2, ((0, 0), (0, g1.shape[1] - g2.shape[1]),
                          (0, 0)))
    r, p, f1 = g1.shape
    f2 = g2.shape[2]
    gi = jnp.dtype(g1.dtype).itemsize
    pb = _p_block(p, 256, gi)
    rb = _row_block_wide(p, f2, gi)
    while r % rb:
        rb //= 2
    n_p = p // pb
    grid = (r // rb, n_p)
    nnz_f = nnz.astype(jnp.float32).reshape(r, 1)
    kernel = functools.partial(_kernel_wide, lam=float(lam),
                               cg_iters=int(cg_iters),
                               cg_tol=float(cg_tol), n_p=n_p,
                               matvec_impl=matvec_impl)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, pb, f1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb, f2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, f1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, f1), jnp.float32),
            jax.ShapeDtypeStruct((r, f2), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, f1, f1), jnp.float32),
            pltpu.VMEM((rb, f1, f2), jnp.float32),
            pltpu.VMEM((rb, f2, f2), jnp.float32),
            pltpu.VMEM((rb, f1), jnp.float32),
            pltpu.VMEM((rb, f2), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
        ],
    )(g1, g2, vals, nnz_f, x01, x02)


def wide_f2(f: int) -> int:
    """Packed lane width of the second factor block for true width f
    (128 < f <= 256): the remainder padded to a multiple of 32."""
    return min(128, -(-(f - 128) // 32) * 32)


def _kernel_cat(g1_ref, g2_ref, vals_ref, nnz_ref, x0_ref, out_ref,
                se_ref, a_scr, b_scr, r2_scr, *,
                lam: float, cg_iters: int, cg_tol: float, n_p: int,
                matvec_impl: str = "vpu"):
    """Packed-gather variant of _kernel: G arrives as two lane slabs —
    g1 (rb, pb, 128) and the PACKED remainder g2 (rb, pb, f2) — and is
    concat-padded to the monolithic (rb, pb, 256) INSIDE VMEM. The
    Gram/CG body is _kernel's (one big MXU dot at full pipeline
    efficiency — the measured 21 vs 11 TF/s of 256- vs 128-wide output
    tiles is why the two-block _kernel_wide lost); what the packing
    buys is upstream: the XLA row gathers move (128+f2) lanes instead
    of 256 (measured 7.75 -> ~4.8 ns/row on the 256-lane tier)."""
    pb = pl.program_id(1)
    f = out_ref.shape[-1]
    f2 = g2_ref.shape[-1]

    @pl.when(pb == 0)
    def _():
        a_scr[...] = jnp.zeros_like(a_scr)
        b_scr[...] = jnp.zeros_like(b_scr)
        r2_scr[...] = jnp.zeros_like(r2_scr)

    rb_, pb_, _ = g1_ref.shape
    g = jnp.concatenate(
        [g1_ref[...], g2_ref[...],
         jnp.zeros((rb_, pb_, f - 128 - f2), g1_ref.dtype)],
        axis=2).astype(jnp.float32)
    a_scr[...] += jax.lax.dot_general(
        g, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    vblk = vals_ref[...].astype(jnp.float32)
    b_scr[...] += jnp.sum(vblk[:, :, None] * g, axis=1)
    r2_scr[...] += jnp.sum(vblk * vblk, axis=1, keepdims=True)

    @pl.when(pb == n_p - 1)
    def _():
        nnz = nnz_ref[...][:, 0]
        diag = nnz * lam + (nnz == 0).astype(jnp.float32)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (f, f), 0) ==
               jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
               ).astype(jnp.float32)
        a = a_scr[...] + diag[:, None, None] * eye[None]
        b = b_scr[...]
        x = _cg_loop(a, b, x0_ref[...].astype(jnp.float32),
                     cg_iters, cg_tol, matvec_impl=matvec_impl)
        live = (nnz > 0).astype(jnp.float32)[:, None]
        x = x * live
        out_ref[...] = x
        cross = jnp.sum(x * b, axis=-1, keepdims=True)
        aq = jnp.sum(a * x[:, :, None], axis=-2)
        quad = (jnp.sum(x * aq, axis=-1, keepdims=True) -
                diag[:, None] * jnp.sum(x * x, axis=-1, keepdims=True))
        se_ref[...] = jnp.maximum(r2_scr[...] - 2.0 * cross + quad, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("lam", "cg_iters", "cg_tol",
                                    "matvec_impl"))
def fused_gram_cg_cat(g1: jnp.ndarray, g2: jnp.ndarray,
                      vals: jnp.ndarray, nnz: jnp.ndarray,
                      x0: jnp.ndarray, lam: float,
                      cg_iters: int = 6, cg_tol: float = 1e-4,
                      matvec_impl: str = "vpu"):
    """Fused Gram+CG over a lane-packed G: g1 (R, P, 128) + g2
    (R, P, f2 <= 128, multiple of 32), solving the full f_pad=256
    system (x0 (R, 256)). Returns (x (R, 256), se (R, 1))."""
    f = 256
    g1, vals = _maybe_pad_p(g1, vals, f)
    if g2.shape[1] != g1.shape[1]:
        g2 = jnp.pad(g2, ((0, 0), (0, g1.shape[1] - g2.shape[1]),
                          (0, 0)))
    r, p, _ = g1.shape
    f2 = g2.shape[2]
    gi = jnp.dtype(g1.dtype).itemsize
    pb = _p_block(p, f, gi)
    rb = _row_block(p, f, gi)
    while r % rb:
        rb //= 2
    n_p = p // pb
    grid = (r // rb, n_p)
    nnz_f = nnz.astype(jnp.float32).reshape(r, 1)
    kernel = functools.partial(_kernel_cat, lam=float(lam),
                               cg_iters=int(cg_iters),
                               cg_tol=float(cg_tol), n_p=n_p,
                               matvec_impl=matvec_impl)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, pb, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb, f2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, f), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, f, f), jnp.float32),
            pltpu.VMEM((rb, f), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
        ],
    )(g1, g2, vals, nnz_f, x0)


@functools.partial(jax.jit, static_argnames=("lam", "cg_iters", "cg_tol",
                                             "f2", "factor_dtype"))
def gather_gram_cg_wide(table_ext, cols, vals, nnz, x0, lam, f2,
                        cg_iters=6, cg_tol=1e-4, factor_dtype="f32"):
    """Wide-F twin of gather_gram_cg: the (n+1, 256) zero-extended
    table is lane-split ONCE into a (n+1, 128) and a PACKED (n+1, f2)
    table, each gathered separately — the G stream and the kernel then
    cost (128+f2) lanes instead of 256. Returns (x (R, 256), se)."""
    if factor_dtype == "bf16":
        table_ext = table_ext.astype(jnp.bfloat16)
    t1 = table_ext[:, :128]
    t2 = table_ext[:, 128:128 + f2]
    g1 = jnp.take(t1, cols, axis=0)
    g2 = jnp.take(t2, cols, axis=0)
    x1, x2, se = fused_gram_cg_wide(
        g1, g2, vals, nnz, x0[:, :128], x0[:, 128:128 + f2], lam,
        cg_iters=cg_iters, cg_tol=cg_tol)
    x = jnp.concatenate(
        [x1, x2, jnp.zeros((x1.shape[0], 128 - f2), jnp.float32)],
        axis=1)
    return x, se


def _cg_solve_kernel(a_ref, b_ref, x0_ref, out_ref, *, cg_iters: int,
                     cg_tol: float, matvec_impl: str = "vpu"):
    a = a_ref[...].astype(jnp.float32)
    out_ref[...] = _cg_loop(a, b_ref[...],
                            x0_ref[...].astype(jnp.float32),
                            cg_iters, cg_tol, matvec_impl=matvec_impl)


def _cg_solve_reg_kernel(a_ref, diag_ref, b_ref, x0_ref, out_ref, *,
                         cg_iters: int, cg_tol: float,
                         matvec_impl: str = "vpu"):
    """Variant taking the raw (un-regularized) Gram plus the per-system
    Tikhonov diagonal: the diag*I add happens on the f32 VMEM copy, so
    a bf16 A (CUMF_TT_FP16 analog) never has to be upcast in HBM."""
    f = out_ref.shape[-1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (f, f), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
           ).astype(jnp.float32)
    a = a_ref[...].astype(jnp.float32) + \
        diag_ref[...][:, 0][:, None, None] * eye[None]
    out_ref[...] = _cg_loop(a, b_ref[...],
                            x0_ref[...].astype(jnp.float32),
                            cg_iters, cg_tol, matvec_impl=matvec_impl)


def _cg_solve_aug_kernel(a_ref, diag_ref, x0_ref, out_ref, *,
                         cg_iters: int, cg_tol: float,
                         matvec_impl: str = "vpu"):
    """CG over an augmented accumulator A' (b in row f-1, sum(r^2) in
    the corner): b is extracted and the value row/column masked on the
    f32 VMEM copy, so the XLA side never pays an A-sized unpack pass."""
    f = out_ref.shape[-1]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (f, f), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
    eye = (row_i == col_i).astype(jnp.float32)
    keep = jnp.logical_and(row_i < f - 1, col_i < f - 1
                           ).astype(jnp.float32)
    a_full = a_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, f), 1)
    b = a_full[:, f - 1, :] * (lane < f - 1).astype(jnp.float32)
    a = a_full * keep[None] + \
        diag_ref[...][:, 0][:, None, None] * eye[None]
    out_ref[...] = _cg_loop(a, b, x0_ref[...].astype(jnp.float32),
                            cg_iters, cg_tol, matvec_impl=matvec_impl)


@functools.partial(jax.jit, static_argnames=("cg_iters", "cg_tol",
                                             "matvec_impl", "aug"))
def solve_cg_pallas(a: jnp.ndarray, b: Optional[jnp.ndarray],
                    x0: jnp.ndarray,
                    cg_iters: int = 6, cg_tol: float = 1e-4,
                    diag: Optional[jnp.ndarray] = None,
                    matvec_impl: str = "vpu", aug: bool = False):
    """Batched CG with A staged through VMEM exactly once.

    The XLA batched CG (ops/solve.solve_cg) re-reads A (f*f*4 B/system)
    from HBM on every one of its 6+1 matvecs; this kernel DMAs each A
    block to VMEM once and runs the whole iteration there — the same
    traffic shape that motivated the reference's one-block-per-system
    smem CG (cg.cu:36-45, A re-read amortized across iterations by smem
    x/p/r residency). Semantics identical to solve_cg (warm start, fixed
    iters, per-system early exit). Used by the paths that must
    materialize A in HBM (post-psum sharded solves, panel accumulators)
    where the fully-fused Gram+CG kernel cannot apply.

    a: (R, f, f) f32 or bf16; b, x0: (R, f) f32. R need not be aligned.
    diag: optional (R,) f32 Tikhonov diagonal added to the f32 VMEM
    copy of A — lets a bf16 A stay bf16 in HBM instead of being upcast
    by an XLA `a + diag*I` before the solve.
    aug: A is the augmented accumulator (b in row f-1 — pass b=None);
    requires diag.
    """
    r, f, _ = a.shape
    rb = _cg_row_block(f, jnp.dtype(a.dtype).itemsize)
    if r < rb:
        rb = max(8, 1 << ((r - 1).bit_length()))
    r_pad = -(-r // rb) * rb
    if r_pad != r:
        # zero rows solve to zero (alpha guard), so plain zero padding
        # is inert and keeps one compiled shape per (rb, f)
        a = jnp.pad(a, ((0, r_pad - r), (0, 0), (0, 0)))
        if b is not None:
            b = jnp.pad(b, ((0, r_pad - r), (0, 0)))
        x0 = jnp.pad(x0, ((0, r_pad - r), (0, 0)))
        if diag is not None:
            diag = jnp.pad(diag, (0, r_pad - r))
    a_spec = pl.BlockSpec((rb, f, f), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((rb, f), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    if aug:
        if diag is None:
            raise ValueError("aug solve requires diag")
        kernel = functools.partial(_cg_solve_aug_kernel,
                                   cg_iters=int(cg_iters),
                                   cg_tol=float(cg_tol),
                                   matvec_impl=matvec_impl)
        args = (a, diag.astype(jnp.float32).reshape(r_pad, 1), x0)
        in_specs = [a_spec,
                    pl.BlockSpec((rb, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    v_spec]
    elif diag is None:
        kernel = functools.partial(_cg_solve_kernel,
                                   cg_iters=int(cg_iters),
                                   cg_tol=float(cg_tol),
                                   matvec_impl=matvec_impl)
        args = (a, b, x0)
        in_specs = [a_spec, v_spec, v_spec]
    else:
        kernel = functools.partial(_cg_solve_reg_kernel,
                                   cg_iters=int(cg_iters),
                                   cg_tol=float(cg_tol),
                                   matvec_impl=matvec_impl)
        args = (a, diag.astype(jnp.float32).reshape(r_pad, 1), b, x0)
        in_specs = [a_spec,
                    pl.BlockSpec((rb, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    v_spec, v_spec]
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // rb,),
        in_specs=in_specs,
        out_specs=v_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
    )(*args)
    return out[:r]


_STATUS: Optional[bool] = None
_AUG_STATUS: Optional[bool] = None
_CG_STATUS: Optional[bool] = None
_PANEL_AUG_STATUS: Optional[bool] = None
_WIDE_STATUS: Optional[bool] = None


def wide_available() -> bool:
    """Probe-compile the two-block wide-F kernel once (at the packed
    f2=32 shape the F-sweep's F=130..150 points use — the shape most
    likely to trip Mosaic's sub-128 minor-dim handling)."""
    global _WIDE_STATUS
    if _WIDE_STATUS is None:
        try:
            g1 = jnp.ones((8, 16, 128), jnp.float32)
            g2 = jnp.ones((8, 16, 32), jnp.float32).at[:, :, 2:].set(0.0)
            v = jnp.full((8, 16), 2.0, jnp.float32)
            n = jnp.full((8,), 16, jnp.int32)
            x01 = jnp.zeros((8, 128), jnp.float32)
            x02 = jnp.zeros((8, 32), jnp.float32)
            x1, x2, _se = fused_gram_cg_wide(g1, g2, v, n, x01, x02, 0.1)
            a1, a2 = np.asarray(x1), np.asarray(x2)
            _WIDE_STATUS = bool(np.isfinite(a1).all()
                                and np.isfinite(a2).all()
                                and np.abs(a2[:, 2:]).max() == 0.0)
        except Exception:
            _WIDE_STATUS = False
    return _WIDE_STATUS


def wide_enabled(cfg) -> bool:
    """Whether direct fused dispatches should use the two-block wide-F
    kernel: EXPLICIT opt-in only (cfg.wide_kernel == "on"), 128 < f
    (so f_pad is 256), CG solver, and the kernel compiling here.

    Measured on v5e (r4, scripts/bench_wide_f.py + inline A/B at
    R=8192, P=256, bf16): the two-block kernel runs 9.3-9.9 ns/nnz vs
    the monolithic 256-lane kernel's 6.3 — three 128-wide MXU output
    tiles pipeline at ~11 TF/s where one 256-wide tile reaches ~21, so
    the 25% flop saving loses 1.5x in efficiency. The packed-gather
    concat variant (fused_gram_cg_cat) costs +1.0-1.4 ns/nnz for the
    in-VMEM lane concat, cancelling its ~1.8 ns/row gather saving.
    Both are kept for A/B (bench --wide-kernel) and as the recorded
    negative result; the production F>128 answer is the monolithic
    kernel + split-table gathers (docs/PERFORMANCE.md)."""
    if getattr(cfg, "wide_kernel", "off") != "on":
        return False
    if not (128 < cfg.f <= 256) or cfg.f_pad != 256:
        return False
    if cfg.solver != "cg" or cfg.backend != "pallas":
        return False
    return wide_available()


def panel_aug_available() -> bool:
    """Probe-compile every aug kernel a panel path can dispatch — the
    aug gram-out (_gram_kernel_aug) and the aug CG solve
    (_cg_solve_aug_kernel). ADVICE r3: aug_available() probes only the
    fully-fused kernel, so a toolchain where just these two variants
    fail to compile crashed mid-phase instead of falling back to the
    split-buffer path."""
    global _PANEL_AUG_STATUS
    if _PANEL_AUG_STATUS is None:
        try:
            table = jnp.ones((17, 128), jnp.float32).at[:, -1].set(0.0)
            cols = jnp.tile(jnp.arange(16, dtype=jnp.int32), (8, 1))
            vals = jnp.full((8, 16), 2.0, jnp.float32)
            a_part = gather_gram_aug_out(table, cols, vals)
            diag = jnp.full((8,), 1.0, jnp.float32)
            x0 = jnp.zeros((8, 128), jnp.float32)
            out = solve_cg_pallas(a_part, None, x0, diag=diag, aug=True)
            arr = np.asarray(out)
            _PANEL_AUG_STATUS = bool(np.isfinite(arr).all()
                                     and np.abs(arr[:, -1]).max() == 0.0)
        except Exception:
            _PANEL_AUG_STATUS = False
    return _PANEL_AUG_STATUS


def aug_available() -> bool:
    """Probe-compile the augmented-lane fused kernel once."""
    global _AUG_STATUS
    if _AUG_STATUS is None:
        try:
            # lane f-1 must be zero (the kernel splices vals there)
            g = jnp.ones((8, 16, 128), jnp.float32).at[:, :, -1].set(0.0)
            v = jnp.full((8, 16), 2.0, jnp.float32)
            n = jnp.full((8,), 16, jnp.int32)
            x0 = jnp.zeros((8, 128), jnp.float32)
            out, _se = fused_gram_cg_aug(g, v, n, x0, 0.1)
            arr = np.asarray(out)
            _AUG_STATUS = bool(np.isfinite(arr).all()
                               and np.abs(arr[:, -1]).max() == 0.0)
        except Exception:
            _AUG_STATUS = False
    return _AUG_STATUS


def fused_available() -> bool:
    """Probe-compile the kernel once (Mosaic support varies by
    toolchain; fall back to the XLA path when unavailable)."""
    global _STATUS
    if _STATUS is None:
        try:
            g = jnp.ones((8, 16, 128), jnp.float32)
            v = jnp.ones((8, 16), jnp.float32)
            n = jnp.full((8,), 16, jnp.int32)
            x0 = jnp.zeros((8, 128), jnp.float32)
            out, _se = fused_gram_cg(g, v, n, x0, 0.1)
            _STATUS = bool(np.isfinite(np.asarray(out)).all())
        except Exception:
            _STATUS = False
    return _STATUS


def aug_enabled(cfg) -> bool:
    """Whether direct fused dispatches under this config should use the
    augmented-lane kernel.

    Measured on v5e (VERDICT r3 #3 / round3+4 logs): on the DIRECT
    fused path the aug kernel is consistently the slower variant —
    Netflix F=100 0.9958 s/iter split vs 1.006 aug (r3 A/B), 1.026 at
    the r4 aug default — because the separate RHS segment-sum it saves
    is cheaper than the extra masked lane-splice work inside the hot
    kernel. So "auto" resolves to OFF here; "force" keeps the kernel
    reachable for A/Bs. Accumulate-then-solve paths keep their own
    economics (one psum replaces three) — see panel_aug_enabled."""
    if getattr(cfg, "aug_gram", "off") != "force" or cfg.f >= cfg.f_pad:
        return False
    return aug_available()


def panel_aug_enabled(cfg) -> bool:
    """Whether accumulate-then-solve paths (panel/batched-panel/sharded
    reduce) should use the augmented accumulator: one combined A'
    carries b (and sum r^2) through scatter-adds and psums into the
    solve. Gated on CG (cholesky/lu keep split buffers), a free lane,
    no save_model (its dump contract is split (A, b)), f32 accumulators,
    and — on the pallas backend — the kernels compiling. On the XLA
    backend the einsum/unpack twin applies, so the flag/lane/dtype
    gates bind.

    The gram_dtype gate (ADVICE r3): in aug mode the RHS b rides row
    f-1 of the gram_dtype accumulator and the train-RMSE vsq term rides
    its corner; with bf16 accumulators both are rounded at every
    scatter-add/psum, whereas the split-buffer paths deliberately keep
    b (and the vsq psum) in f32. Measured on Netflix: reported train
    RMSE 0.40146 (bf16 aug) vs 0.39284 (split) — so aug applies only
    when the accumulator is f32 and carries b exactly."""
    if cfg.solver != "cg" or getattr(cfg, "save_model", False) or \
            cfg.aug_gram == "off" or cfg.f >= cfg.f_pad:
        return False
    if cfg.gram_dtype != "f32" and cfg.aug_gram != "force":
        return False
    if cfg.backend != "pallas" or not fused_available():
        return True
    return panel_aug_available()


def backend_uses_pallas(cfg) -> bool:
    """Whether phase dispatches under this config contain pallas_call
    kernels whose block sizing the VMEM budget controls — the gate for
    call_with_vmem_backoff's retry loop (a pure-XLA dispatch must
    surface its errors on first raise)."""
    return getattr(cfg, "backend", "") == "pallas" and fused_available()


def cg_solve_available() -> bool:
    """Probe-compile the standalone CG kernel once."""
    global _CG_STATUS
    if _CG_STATUS is None:
        try:
            a = jnp.eye(128, dtype=jnp.float32)[None] * 2.0
            a = jnp.broadcast_to(a, (8, 128, 128))
            b = jnp.ones((8, 128), jnp.float32)
            x0 = jnp.zeros((8, 128), jnp.float32)
            out = solve_cg_pallas(a, b, x0)
            _CG_STATUS = bool(np.allclose(np.asarray(out), 0.5,
                                          atol=1e-5))
        except Exception:
            _CG_STATUS = False
    return _CG_STATUS
