"""Row bucketing / padding plans: the TPU layout for sparse Gram formation.

The reference handles ragged rows with a SCAN_BATCH sliding window inside
its register-tiled kernel (reference als.cu:443-569) plus X_BATCH /
THETA_BATCH memory batching (als.cu:768, 881). On TPU the equivalent
layout decision is made once on the host: rows are grouped into power-of-
two-width buckets, each row's column list padded to the bucket width, and
buckets split into fixed-shape chunks so every device step is a static-
shape gather + batched MXU matmul. Geometric bucket widths bound padding
overhead at <2x and neutralize the heavy degree skew (Netflix movie rows
reach ~230k nonzeros while user rows average ~200 — SURVEY §7).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from cumf_als_tpu.utils.io import CSRMatrix


@dataclasses.dataclass
class PlanChunk:
    """One static-shape unit of work: R rows, each padded to width P.

    Padding contract:
      - `cols` is padded with `num_cols` (one past the gather table), so a
        zero-extended table makes padded gathers contribute nothing;
      - `vals` is padded with 0;
      - ragged tail rows (R padding) have `rows == num_rows` and `nnz == 0`
        and are dropped by the out-of-bounds scatter on write-back.
    """
    width: int            # P
    rows: np.ndarray      # (R,) int32, == num_rows for dummy tail rows
    nnz: np.ndarray       # (R,) int32 true row lengths
    cols: np.ndarray      # (R, P) int32 gather indices into the fixed factor
    vals: np.ndarray      # (R, P) float32 ratings, 0-padded

    @property
    def num_rows(self) -> int:
        return int(self.rows.shape[0])

    @property
    def padded_nnz(self) -> int:
        return self.rows.shape[0] * self.width


@dataclasses.dataclass
class UpdatePlan:
    """Bucketed layout of one side of the ALS update (X- or theta-phase)."""
    num_rows: int         # rows of the factor being updated (m or n)
    num_cols: int         # rows of the gather table (n or m)
    chunks: List[PlanChunk]
    true_nnz: int
    padded_nnz: int

    @property
    def expansion(self) -> float:
        return self.padded_nnz / max(1, self.true_nnz)


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def make_width_grid(min_width: int, max_len: int, fine: bool = True,
                    max_width: Optional[int] = None,
                    octave_points: int = 4) -> List[int]:
    """Bucket widths: powers of two, plus quarter-octave points
    (5/4, 3/2, 7/4 * 2^k) from 16 up when `fine`, plus eighth-octave
    points (9/8, 11/8, 13/8, 15/8 * 2^k) from 64 up when
    octave_points >= 8. Padded rows cost full gather time on TPU (the
    gather is row-rate bound), so expansion is wall-clock, not just
    memory: 4 points/octave bounds the per-row pad at 1.25x (mean
    ~1.09x) vs 2x (mean ~1.33x) for pure powers of two; 8 points bound
    it at 1.125x (mean ~1.05x) where most nonzeros sit. Every grid
    point is a multiple of 4, keeping Pallas lane tiles legal.

    Above `max_width` the fine points are dropped: rows longer than
    max_width still get a bucket (a row's Gram needs all its nonzeros
    together) but only at pure powers of two, bounding the tail of
    compiled shapes for extremely long rows.
    """
    grid = set()
    w = max(8, _next_pow2(min_width))
    top = max(w, _next_pow2(max(1, max_len)))
    while w <= top:
        grid.add(w)
        if fine and (max_width is None or w < max_width):
            grid.add(w * 3 // 2)
            if w >= 16:
                grid.add(w * 5 // 4)
                grid.add(w * 7 // 4)
            if octave_points >= 8 and w >= 64:
                grid.add(w * 9 // 8)
                grid.add(w * 11 // 8)
                grid.add(w * 13 // 8)
                grid.add(w * 15 // 8)
            if octave_points >= 16 and w >= 256:
                # sixteenth-octave points for the long-row octaves,
                # where a single padded row costs hundreds of padded
                # nonzeros: mean overshoot ~2.2% vs ~4.5% at 8 points
                for q in range(17, 32, 2):
                    grid.add(w * q // 16)
        w *= 2
    widths = sorted(x for x in grid
                    if max_width is None or x <= max_width
                    or (x & (x - 1)) == 0)
    # keep only up to the smallest width covering max_len
    cut = next(x for x in widths if x >= max_len)
    return [x for x in widths if x <= cut]


def _round_rows(r: int, cap: int) -> int:
    """Row-count shape for a final (ragged) chunk: the next 4-bit-mantissa
    value that is a multiple of 8 (8..128 step 8, then {8..15}*2^e).

    Dummy tail rows cost a FULL row of gather+Gram work each (every
    padded slot is wall-clock on TPU), and a plan has one ragged chunk
    per (panel, width) group — next-pow2 rounding put 0.32x of Netflix's
    X-phase nonzeros into dummy rows. Mantissa rounding bounds the
    overshoot at 12.5% of one chunk while keeping the set of compiled
    shapes small (<= 8 per octave). Multiples of 8 keep Pallas sublane
    tiles legal."""
    if r >= cap:
        return cap
    r8 = max(8, -(-r // 8) * 8)
    if r8 <= 128:
        return min(cap, r8)
    e = r8.bit_length() - 4
    return min(cap, -(-r8 >> e) << e)


def _rows_per_chunk(width: int, chunk_nnz: int, chunk_rows: int) -> int:
    """Rows per full chunk: floor power of two so every chunk row count
    is pow2 (Pallas block shapes need sublane-divisible tiles)."""
    r = max(8, min(chunk_nnz // width, chunk_rows))
    return 1 << (r.bit_length() - 1)


def build_update_plan(
    csr: CSRMatrix,
    min_width: int = 8,
    max_width: int = 1 << 18,
    chunk_nnz: int = 1 << 22,
    chunk_rows: int = 1 << 14,
    widths: Optional[Sequence[int]] = None,
    octave_points: int = 4,
) -> UpdatePlan:
    """Build the bucketed plan for one phase from row-compressed ratings.

    Rows are bucketed by next_pow2(nnz) clamped to [min_width, ...]; rows
    longer than max_width still get their exact next_pow2 bucket (a row's
    Gram needs all its nonzeros together). Each bucket is split into
    chunks of at most chunk_nnz padded nonzeros AND at most chunk_rows
    rows — the X_BATCH/THETA_BATCH analog. chunk_nnz bounds the transient
    gather buffer (chunk_nnz * f * 4B); chunk_rows bounds the Gram buffer
    (chunk_rows * f^2 * 4B), which otherwise explodes for narrow buckets.
    """
    row_nnz = np.diff(csr.indptr).astype(np.int64)
    max_nnz = int(row_nnz.max()) if row_nnz.size else 0
    if widths is None:
        widths = make_width_grid(min_width, max_nnz, max_width=max_width,
                                 octave_points=octave_points)
    widths = sorted(set(int(w) for w in widths))

    # Assign each row the smallest width >= its nnz (empty rows are left
    # out of the plan entirely; their factors are zeroed by the solver
    # driver, the SURPASS_NAN-intended semantics).
    nonempty = np.nonzero(row_nnz > 0)[0]
    bucket_of = np.searchsorted(widths, row_nnz[nonempty])
    order = np.argsort(bucket_of, kind="stable")
    nonempty = nonempty[order]
    bucket_of = bucket_of[order]

    chunks: List[PlanChunk] = []
    padded_total = 0
    starts = np.searchsorted(bucket_of, np.arange(len(widths) + 1))
    for b, width in enumerate(widths):
        rows_b = nonempty[starts[b]:starts[b + 1]]
        if rows_b.size == 0:
            continue
        rows_per_chunk = _rows_per_chunk(width, chunk_nnz, chunk_rows)
        for lo in range(0, rows_b.size, rows_per_chunk):
            rows_c = rows_b[lo:lo + rows_per_chunk]
            r = rows_c.size
            # Full chunks share one compiled shape; the ragged final
            # chunk is rounded up to a power of two instead of being
            # filled with dummy rows.
            r_pad = rows_per_chunk if r == rows_per_chunk else \
                _round_rows(r, rows_per_chunk)
            chunk = _materialize_chunk(csr, rows_c, width, r_pad)
            chunks.append(chunk)
            padded_total += chunk.padded_nnz
    return UpdatePlan(num_rows=csr.num_rows, num_cols=csr.num_cols,
                      chunks=chunks, true_nnz=int(row_nnz.sum()),
                      padded_nnz=padded_total)


@dataclasses.dataclass
class PanelChunk:
    """A bucket chunk whose gathers address one column *panel* only.

    `cols` are panel-local (0..panel_size-1), padded with `panel_size`
    (the zero row appended to the sliced panel). The chunk produces
    *partial* (A, b) contributions scatter-added into full-phase
    accumulators keyed by `rows`.
    """
    panel: int
    width: int
    rows: np.ndarray   # (R,) int32, == num_rows for dummy tails
    nnz: np.ndarray    # (R,) int32 subrow length
    cols: np.ndarray   # (R, P) int32 panel-local
    vals: np.ndarray   # (R, P) float32


class LazyPanelChunk:
    """A PanelChunk whose padded (cols, vals) are NOT pre-materialized:
    only the subrow descriptors (offset, length, owner row) are held
    (12 B/subrow instead of ~8 B/padded-nnz), and `materialize()`
    produces the padded arrays on demand — the hugewiki-scale streaming
    form, mirroring the reference's per-batch CSR re-slicing
    (reference hugewiki.cu:2508-2516). At 3.1e9 nnz the eager plan
    arrays alone are ~28 GB; lazy plans hold ~0.4 GB."""

    __slots__ = ("panel", "width", "rows", "nnz", "_csr", "_sub_off",
                 "_sub_len", "_sub_rows", "_r_pad", "_base", "_pad_col")

    def __init__(self, csr: CSRMatrix, panel: int, width: int,
                 sub_off: np.ndarray, sub_len: np.ndarray,
                 sub_rows: np.ndarray, r_pad: int, base: int,
                 pad_col: int):
        self.panel = panel
        self.width = width
        self._csr = csr
        self._sub_off = sub_off
        self._sub_len = sub_len.astype(np.int32)
        self._sub_rows = sub_rows
        self._r_pad = r_pad
        self._base = base
        self._pad_col = pad_col
        self.rows = np.full(r_pad, csr.num_rows, np.int32)
        self.rows[:sub_rows.size] = sub_rows
        self.nnz = np.zeros(r_pad, np.int32)
        self.nnz[:sub_len.size] = sub_len

    @property
    def num_rows(self) -> int:
        return self._r_pad

    @property
    def padded_nnz(self) -> int:
        return self._r_pad * self.width

    def materialize(self):
        """(rows, nnz, cols, vals) padded arrays for this chunk."""
        from cumf_als_tpu import native
        csr = self._csr
        k = self._sub_off.shape[0]
        if native.available():
            rows, nnz, cols, vals = native.materialize_subrows(
                csr.indices, csr.data, self._sub_off, self._sub_len,
                self._sub_rows, self._r_pad, self.width, self._base,
                self._pad_col, csr.num_rows)
            return rows, nnz, cols, vals
        width = self.width
        arange_w = np.arange(width, dtype=np.int64)[None, :]
        rows = self.rows
        nnz = self.nnz
        cols = np.full((self._r_pad, width), self._pad_col, np.int32)
        vals = np.zeros((self._r_pad, width), np.float32)
        lens = self._sub_len
        idx = self._sub_off[:, None] + arange_w
        mask = arange_w < lens[:, None]
        idx = np.where(mask, idx, 0)
        cols[:k] = np.where(mask, csr.indices[idx] - self._base,
                            self._pad_col)
        vals[:k] = np.where(mask, csr.data[idx], 0.0)
        return rows, nnz, cols, vals


@dataclasses.dataclass
class PanelPlan:
    """Panelized phase layout: used when the gather table is too large to
    stage in VMEM (~16 ns/row from HBM vs ~8 ns/row when XLA keeps a
    <=64k-row table on chip — measured on v5e) but the factor being
    updated is small enough to hold full (A, b) accumulators. Each row's
    (sorted) column list is split at panel boundaries into subrows; the
    Gram becomes a sum of per-panel partial Grams. This is the TPU
    re-design of the SCAN_BATCH sliding window (reference als.cu:454-480)
    as cache blocking instead of shared-memory staging."""
    num_rows: int
    num_cols: int
    panel_size: int
    n_panels: int
    chunks: List[PanelChunk]
    row_nnz: np.ndarray    # (num_rows,) int32 total nnz per row
    true_nnz: int
    padded_nnz: int

    @property
    def expansion(self) -> float:
        return self.padded_nnz / max(1, self.true_nnz)


def build_panel_plan(csr: CSRMatrix, panel_size: int = 1 << 16,
                     min_width: int = 8, chunk_nnz: int = 1 << 22,
                     chunk_rows: int = 1 << 14,
                     split_width: int = 4096,
                     octave_points: int = 4,
                     lazy: bool = False,
                     ragged: str = "mantissa",
                     min_bucket_rows: int = 0) -> PanelPlan:
    """Split each row's column list at panel boundaries (cols are sorted
    within rows, so subrows are contiguous slices), then bucket subrows
    by power-of-two width per (panel, width).

    Subrows longer than `split_width` are further split into exact
    split_width segments plus a remainder: partial Grams scatter-add
    into per-row accumulators, so a row's nonzeros may be partitioned
    arbitrarily. This removes the wide-bucket tail (few very long
    subrows per (panel, width) group each paying the 8-row minimum
    chunk shape in dummies — 6.5% of Netflix X-phase nonzeros) and
    makes the long-row mass land in one uniform, fully-packed shape."""
    m = csr.num_rows
    n_panels = -(-csr.num_cols // panel_size)
    row_nnz = np.diff(csr.indptr).astype(np.int64)
    nnz_total = int(row_nnz.sum())

    # Subrow table: a subrow is a maximal run of one row's (sorted)
    # columns falling in one panel. Built without per-nonzero int64
    # temporaries (np.repeat/astype over 1e8+ nnz dominate startup on a
    # slow-memory host): run boundaries are panel changes on the flat
    # axis unioned with row starts; owners recovered by searchsorted.
    if panel_size & (panel_size - 1) == 0:
        p_flat = csr.indices >> int(np.log2(panel_size))
    else:
        p_flat = csr.indices // np.int32(panel_size)
    if nnz_total:
        pc = np.flatnonzero(p_flat[1:] != p_flat[:-1]).astype(np.int64) + 1
        indptr64 = np.asarray(csr.indptr[:-1], np.int64)
        starts = np.unique(np.concatenate([pc, indptr64]))
        starts = starts[starts < nnz_total]
        ends = np.concatenate([starts[1:],
                               np.asarray([nnz_total], np.int64)])
        # owner row: largest r with indptr[r] <= start (empty rows share
        # start values and lose the tie to the owning nonempty row)
        sub_rows = (np.searchsorted(csr.indptr, starts, side="right")
                    - 1).astype(np.int32)
        sub_panel = p_flat[starts].astype(np.int32)
    else:
        starts = np.zeros(0, np.int64)
        ends = np.zeros(0, np.int64)
        sub_rows = np.zeros(0, np.int32)
        sub_panel = np.zeros(0, np.int32)
    sub_off = starts
    sub_len = ends - starts

    # Split subrows longer than split_width into exact segments + rest.
    if split_width and sub_len.size and int(sub_len.max()) > split_width:
        n_full = sub_len // split_width
        rem = sub_len - n_full * split_width
        counts = (n_full + (rem > 0)).astype(np.int64)
        idx = np.repeat(np.arange(sub_len.size, dtype=np.int64), counts)
        excl = np.zeros(sub_len.size, np.int64)
        np.cumsum(counts[:-1], out=excl[1:])
        seg_i = np.arange(idx.size, dtype=np.int64) - excl[idx]
        sub_off = sub_off[idx] + seg_i * split_width
        sub_len = np.where(seg_i < n_full[idx], split_width, rem[idx])
        sub_rows = sub_rows[idx]
        sub_panel = sub_panel[idx]

    max_len = int(sub_len.max()) if sub_len.size else 1
    widths = make_width_grid(min_width, max_len,
                             octave_points=octave_points)
    widx = np.searchsorted(widths, sub_len)

    # Sparse-bucket promotion: a (panel, width) group with fewer than
    # min_bucket_rows subrows is merged into the next width up. The
    # batched-panel path (one sub-plan per row batch) otherwise scatters
    # work over hundreds of tiny ragged chunks whose shapes are all
    # distinct — compiled-program count explodes (measured: 740 chunk
    # shapes / 606 fused-group shapes on Yahoo) while the padding cost
    # of promoting a handful of rows one width step is a few percent of
    # one chunk.
    if min_bucket_rows > 1 and sub_len.size:
        nw = len(widths)
        counts = np.bincount(sub_panel.astype(np.int64) * nw + widx,
                             minlength=n_panels * nw).reshape(n_panels,
                                                              nw)
        fmap = np.tile(np.arange(nw), (n_panels, 1))
        for p in range(n_panels):
            c = counts[p].astype(np.int64)
            for b in range(nw - 1):
                if 0 < c[b] < min_bucket_rows:
                    c[b + 1] += c[b]
                    c[b] = 0
                    fmap[p, fmap[p] == b] = b + 1
        widx = fmap[sub_panel, widx]

    # group subrows by (panel, width) with one argsort
    group = sub_panel.astype(np.int64) * len(widths) + widx
    order = np.argsort(group, kind="stable")
    group_sorted = group[order]
    bounds = np.searchsorted(
        group_sorted, np.arange(n_panels * len(widths) + 1))

    from cumf_als_tpu import native
    use_native = native.available()
    chunks: List[PanelChunk] = []
    padded = 0
    for gid in range(n_panels * len(widths)):
        sel = order[bounds[gid]:bounds[gid + 1]]
        if sel.size == 0:
            continue
        p, b = divmod(gid, len(widths))
        width = widths[b]
        base = p * panel_size
        rows_per_chunk = _rows_per_chunk(width, chunk_nnz, chunk_rows)
        arange_w = np.arange(width, dtype=np.int64)[None, :]
        for lo_i in range(0, sel.size, rows_per_chunk):
            part = sel[lo_i:lo_i + rows_per_chunk]
            k = part.size
            if k == rows_per_chunk:
                r_pad = rows_per_chunk
            elif ragged == "pow2":
                # coarser ragged shapes (<= 2x pad) for paths where the
                # mantissa grid would multiply compiled-program count
                # (one sub-plan per row batch: shapes must be shared
                # across batches)
                r_pad = min(rows_per_chunk, max(8, _next_pow2(k)))
            else:
                r_pad = _round_rows(k, rows_per_chunk)
            if lazy:
                chunks.append(LazyPanelChunk(
                    csr, p, width, sub_off[part], sub_len[part],
                    sub_rows[part], r_pad, base, panel_size))
                padded += r_pad * width
                continue
            if use_native:
                rows, nnz, cols, vals = native.materialize_subrows(
                    csr.indices, csr.data, sub_off[part], sub_len[part],
                    sub_rows[part], r_pad, width, base, panel_size, m)
            else:
                rows = np.full(r_pad, m, np.int32)
                nnz = np.zeros(r_pad, np.int32)
                cols = np.full((r_pad, width), panel_size, np.int32)
                vals = np.zeros((r_pad, width), np.float32)
                lens = sub_len[part]
                idx = sub_off[part][:, None] + arange_w
                mask = arange_w < lens[:, None]
                idx = np.where(mask, idx, 0)
                rows[:k] = sub_rows[part]
                nnz[:k] = lens
                cols[:k] = np.where(mask, csr.indices[idx] - base,
                                    panel_size)
                vals[:k] = np.where(mask, csr.data[idx], 0.0)
            chunks.append(PanelChunk(panel=p, width=width, rows=rows,
                                     nnz=nnz, cols=cols, vals=vals))
            padded += r_pad * width
    return PanelPlan(num_rows=m, num_cols=csr.num_cols,
                     panel_size=panel_size, n_panels=n_panels,
                     chunks=chunks,
                     row_nnz=row_nnz.astype(np.int32),
                     true_nnz=int(row_nnz.sum()), padded_nnz=padded)


@dataclasses.dataclass
class SplitChunk:
    """A bucket chunk whose gather indices are split across fixed-size
    table *parts* so every gather operand stays under the fast-tier
    size (measured on v5e: row gathers run ~4.3 ns/row from a <= 64 MB
    operand vs ~13.2 ns/row above 128 MB, independent of index
    locality — scripts/bench_gather.py). The row's G block is the
    concatenation of the per-part gathers along the contraction axis;
    one fused Gram+CG kernel instance still sees the whole row, so no
    partial-Gram accumulators (and none of the panel paths' HBM RMW)
    exist on this path.

    Contract:
      - `parts[i]` is the part id of `cols[i]` (ascending);
      - `cols[i]` is (R, widths[i]) int32 LOCAL to that part, padded
        with part_size (each part's gather table carries one zero
        extension row at index part_size);
      - `vals` is (R, sum(widths)) f32, segment i aligned with cols[i]
        in concatenation order, 0-padded;
      - dummy tail rows have rows == num_rows and nnz == 0.
    """
    parts: tuple          # included part ids, ascending
    widths: tuple         # per included part: padded width
    rows: np.ndarray      # (R,) int32
    nnz: np.ndarray       # (R,) int32 true total row lengths
    cols: tuple           # per included part: (R, W_i) int32 part-local
    vals: np.ndarray      # (R, sum(widths)) float32

    @property
    def num_rows(self) -> int:
        return int(self.rows.shape[0])

    @property
    def width(self) -> int:
        return int(sum(self.widths))

    @property
    def padded_nnz(self) -> int:
        return self.num_rows * self.width


@dataclasses.dataclass
class SplitPlan:
    """Direct (non-accumulating) phase layout over a popularity-
    permuted, part-split gather table: the both-sides-big answer
    (Yahoo-class) that keeps every gather at the fast on-chip-table
    tier without the panel paths' per-row accumulator RMW. `perm` maps
    permuted slot -> original table row; part k of the permuted table
    is rows [k*part_size, (k+1)*part_size). The popularity ordering
    concentrates the nonzero mass in part 0, which keeps the per-part
    padding tails small."""
    num_rows: int
    num_cols: int          # gather-table rows (original space)
    part_size: int
    n_parts: int
    perm: np.ndarray       # (num_cols,) int32
    chunks: List[SplitChunk]
    true_nnz: int
    padded_nnz: int

    @property
    def expansion(self) -> float:
        return self.padded_nnz / max(1, self.true_nnz)


def _merge_tuple_groups(raw_groups, grid_w, max_groups: int):
    """Greedy min-cost merging of lexicographically adjacent width-tuple
    groups: (a) until the group count (one compiled program family per
    group) is at most max_groups, and (b) beyond that whenever a merge
    SAVES padding — merging two groups pads every row to the
    elementwise-max tuple, but NOT merging pays each group's ragged
    chunk tail (8-row minimum + mantissa rounding), which dominates for
    the long tail of tiny tuple groups (measured 6.3x expansion on a
    300-row problem with no merging at all).

    raw_groups: [(lo, hi, widx)] over the lex-sorted row order, widx the
    per-part width-grid INDEX tuple (0 = part unused). Returns
    [(lo, hi, per-part grid widths)].
    """
    import heapq

    n = len(raw_groups)
    if n == 0:
        return []
    lo = [g[0] for g in raw_groups]
    hi = [g[1] for g in raw_groups]
    wid = [g[2] for g in raw_groups]
    rows = [h - l for l, h in zip(lo, hi)]
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    alive = [True] * n
    ver = [0] * n

    def wsum(i):
        return int(grid_w(wid[i]).sum())

    def ragged(r, s):
        # padding the ragged chunk tail costs: dummy rows up to the
        # 8-row floor plus ~6% mantissa rounding of one chunk
        return (max(8, -(-r // 8) * 8) - r) * s + (s * min(r, 128)) // 16

    def cost(i, j):
        wm = np.maximum(wid[i], wid[j])
        sm = int(grid_w(wm).sum())
        merge_pad = rows[i] * (sm - wsum(i)) + rows[j] * (sm - wsum(j))
        save = ragged(rows[i], wsum(i)) + ragged(rows[j], wsum(j)) \
            - ragged(rows[i] + rows[j], sm)
        return merge_pad - save

    heap = []
    for i in range(n - 1):
        heapq.heappush(heap, (cost(i, i + 1), ver[i], ver[i + 1], i,
                              i + 1))
    count = n
    while heap:
        c, vi, vj, i, j = heapq.heappop(heap)
        if not (alive[i] and alive[j]) or ver[i] != vi or ver[j] != vj \
                or nxt[i] != j:
            continue
        if c >= 0 and count <= max_groups:
            break
        # merge j into i
        wid[i] = np.maximum(wid[i], wid[j])
        hi[i] = hi[j]
        rows[i] += rows[j]
        alive[j] = False
        nxt[i] = nxt[j]
        if nxt[i] >= 0:
            prv[nxt[i]] = i
        ver[i] += 1
        count -= 1
        if prv[i] >= 0:
            heapq.heappush(heap, (cost(prv[i], i), ver[prv[i]], ver[i],
                                  prv[i], i))
        if nxt[i] >= 0:
            heapq.heappush(heap, (cost(i, nxt[i]), ver[i], ver[nxt[i]],
                                  i, nxt[i]))
    return [(lo[i], hi[i], grid_w(wid[i])) for i in range(n) if alive[i]]


def build_split_plan(
    csr: CSRMatrix,
    part_size: int,
    min_width: int = 8,
    max_width: int = 1 << 18,
    chunk_nnz: int = 1 << 22,
    chunk_rows: int = 1 << 14,
    octave_points: int = 8,
    by_popularity: bool = True,
    max_groups: int = 96,
) -> SplitPlan:
    """Group rows by their quantized per-part width tuple (see the
    grouping comment below) and materialize per-chunk per-part padded
    column blocks; small tuple groups promote forward to bound the
    compiled-shape count."""
    m, n = csr.num_rows, csr.num_cols
    row_nnz = np.diff(csr.indptr).astype(np.int64)
    nnz_total = int(row_nnz.sum())
    n_parts = max(1, -(-n // part_size))

    # Popularity permutation of the gather table: most-rated columns
    # first, so part 0 carries most of the mass.
    if by_popularity and n_parts > 1:
        pop = np.bincount(csr.indices, minlength=n)
        perm = np.argsort(-pop, kind="stable").astype(np.int32)
    else:
        perm = np.arange(n, dtype=np.int32)
    rank = np.empty(n, np.int32)
    rank[perm] = np.arange(n, dtype=np.int32)

    # Per-nonzero part/local ids and a stable (row, part) grouping.
    new_flat = rank[csr.indices]
    part_flat = (new_flat // part_size).astype(np.int32)
    local_flat = (new_flat - part_flat.astype(np.int64) * part_size
                  ).astype(np.int32)
    row_ids = np.repeat(np.arange(m, dtype=np.int64), row_nnz)
    key = row_ids * n_parts + part_flat
    order = np.argsort(key, kind="stable")
    h = np.bincount(key, minlength=m * n_parts).reshape(m, n_parts)
    grp_off = np.zeros(m * n_parts + 1, np.int64)
    np.cumsum(h.reshape(-1), out=grp_off[1:])
    del key, row_ids, new_flat

    max_nnz = int(row_nnz.max()) if row_nnz.size else 0
    widths = make_width_grid(min_width, max_nnz, max_width=max_width,
                             octave_points=octave_points)
    warr = np.asarray(widths, np.int64)

    # Group rows by their QUANTIZED per-part width tuple, so every row
    # in a group pads each part to ITS OWN quantized width — the
    # chunk-max padding term vanishes by construction. The r4 scheme
    # (bucket by total nnz, order by part-0 count, pad each part to the
    # chunk max) measured 19.8% of all padded slots as chunk-max
    # padding vs 6.0% quantization on Yahoo's X phase
    # (round5_logs/split_decompose_x*.jsonl); tuple grouping removes
    # the former and leaves only quantization + ragged tails. Groups
    # smaller than min_group_rows merge forward into the next group in
    # lexicographic tuple order (elementwise-max widths), bounding the
    # compiled-shape count the way the batched-panel promotion does.
    nonempty = np.nonzero(row_nnz > 0)[0]
    nw = len(warr)
    qidx = np.minimum(np.searchsorted(warr, h[nonempty]), nw - 1)
    qidx = np.where(h[nonempty] > 0, qidx + 1, 0).astype(np.int32)
    o = np.lexsort(tuple(qidx[:, k]
                         for k in range(n_parts - 1, -1, -1)))
    nonempty = nonempty[o]
    q_sorted = qidx[o]

    local_sorted = local_flat[order]
    vals_sorted = np.asarray(csr.data, np.float32)[order]

    if nonempty.size:
        change = np.any(q_sorted[1:] != q_sorted[:-1], axis=1)
        bounds = np.concatenate([[0], np.flatnonzero(change) + 1,
                                 [nonempty.size]])
    else:
        bounds = np.asarray([0, 0])
    def _grid_w(widx):
        return np.where(widx > 0, warr[np.maximum(widx - 1, 0)], 0)

    groups = _merge_tuple_groups(
        [(int(bounds[i]), int(bounds[i + 1]),
          q_sorted[int(bounds[i])].copy())
         for i in range(len(bounds) - 1)
         if bounds[i] < bounds[i + 1]],
        _grid_w, max_groups)

    chunks: List[SplitChunk] = []
    padded_total = 0
    for g_lo, g_hi, wq in groups:
        rows_g = nonempty[g_lo:g_hi]
        width = int(wq.sum())
        rows_per_chunk = _rows_per_chunk(width, chunk_nnz, chunk_rows)
        inc = np.nonzero(wq)[0]
        for lo in range(0, rows_g.size, rows_per_chunk):
            rows_c = rows_g[lo:lo + rows_per_chunk]
            r = rows_c.size
            r_pad = rows_per_chunk if r == rows_per_chunk else \
                _round_rows(r, rows_per_chunk)
            hc = h[rows_c]                       # (r, n_parts)
            cols_parts, vals_parts = [], []
            rows_out = np.full(r_pad, m, np.int32)
            rows_out[:r] = rows_c
            nnz_out = np.zeros(r_pad, np.int32)
            nnz_out[:r] = row_nnz[rows_c]
            for k in inc:
                wk = int(wq[k])
                ck = np.full((r_pad, wk), part_size, np.int32)
                vk = np.zeros((r_pad, wk), np.float32)
                offs = grp_off[rows_c * n_parts + k]
                lens = hc[:, k]
                arange_w = np.arange(wk, dtype=np.int64)[None, :]
                idx = offs[:, None] + arange_w
                mask = arange_w < lens[:, None]
                idx = np.where(mask, idx, 0)
                ck[:r] = np.where(mask, local_sorted[idx], part_size)
                vk[:r] = np.where(mask, vals_sorted[idx], 0.0)
                cols_parts.append(ck)
                vals_parts.append(vk)
            vals_cat = np.concatenate(vals_parts, axis=1) if vals_parts \
                else np.zeros((r_pad, 0), np.float32)
            chunk = SplitChunk(parts=tuple(int(k) for k in inc),
                               widths=tuple(int(wq[k]) for k in inc),
                               rows=rows_out, nnz=nnz_out,
                               cols=tuple(cols_parts), vals=vals_cat)
            chunks.append(chunk)
            padded_total += chunk.padded_nnz
    return SplitPlan(num_rows=m, num_cols=n, part_size=part_size,
                     n_parts=n_parts, perm=perm, chunks=chunks,
                     true_nnz=nnz_total, padded_nnz=padded_total)


@dataclasses.dataclass
class RowBatch:
    """One row batch of a BatchedPanelPlan: a panel sub-plan whose rows
    are batch-local (0..batch_rows-1)."""
    global_ids: np.ndarray   # (B,) int32, == num_rows for padding
    row_nnz: np.ndarray      # (B,) int32 total nnz
    plan: "PanelPlan"        # rows local to the batch


@dataclasses.dataclass
class BatchedPanelPlan:
    """Two-level layout for phases where BOTH sides are big: the gather
    table exceeds panel_size (so panels are needed for on-chip-rate
    gathers) AND the updated factor's full accumulators don't fit (so
    rows are processed in batches with a reusable (B, f, f) buffer).
    Rows are sorted by nnz so batches have uniform widths — the
    "two-level (sorted-by-nnz, bucketed) grid" of SURVEY §7."""
    num_rows: int
    num_cols: int
    panel_size: int
    batch_rows: int
    batches: List[RowBatch]
    true_nnz: int
    padded_nnz: int

    @property
    def expansion(self) -> float:
        return self.padded_nnz / max(1, self.true_nnz)


def build_batched_panel_plan(csr: CSRMatrix, panel_size: int = 1 << 16,
                             batch_rows: int = 1 << 14,
                             min_width: int = 8,
                             chunk_nnz: int = 1 << 22,
                             chunk_rows: int = 1 << 14,
                             split_width: int = 4096,
                             octave_points: int = 4,
                             ragged: str = "mantissa",
                             min_bucket_rows: int = 16
                             ) -> BatchedPanelPlan:
    row_nnz = np.diff(csr.indptr).astype(np.int64)
    order = np.argsort(-row_nnz, kind="stable")
    order = order[row_nnz[order] > 0]
    batches: List[RowBatch] = []
    padded = true = 0
    for lo in range(0, order.size, batch_rows):
        ids = order[lo:lo + batch_rows]
        b = ids.size
        # build the batch's sub-CSR (rows renumbered 0..b-1)
        lens = row_nnz[ids]
        sub_indptr = np.zeros(b + 1, np.int64)
        np.cumsum(lens, out=sub_indptr[1:])
        total = int(sub_indptr[-1])
        # vectorized ragged gather of the batch rows' nonzeros
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(sub_indptr[:-1], lens)
               + np.repeat(np.asarray(csr.indptr)[ids].astype(np.int64),
                           lens))
        sub_idx = csr.indices[pos]
        sub_dat = csr.data[pos]
        sub = CSRMatrix(indptr=sub_indptr, indices=sub_idx, data=sub_dat,
                        num_rows=b, num_cols=csr.num_cols)
        plan = build_panel_plan(sub, panel_size, min_width, chunk_nnz,
                                chunk_rows, split_width=split_width,
                                octave_points=octave_points,
                                ragged=ragged,
                                min_bucket_rows=min_bucket_rows)
        gids = np.full(batch_rows, csr.num_rows, np.int32)
        gids[:b] = ids
        nnz_b = np.zeros(batch_rows, np.int32)
        nnz_b[:b] = lens
        batches.append(RowBatch(global_ids=gids, row_nnz=nnz_b,
                                plan=plan))
        padded += plan.padded_nnz
        true += plan.true_nnz
    return BatchedPanelPlan(num_rows=csr.num_rows, num_cols=csr.num_cols,
                            panel_size=panel_size, batch_rows=batch_rows,
                            batches=batches, true_nnz=true,
                            padded_nnz=padded)


def _materialize_chunk(csr: CSRMatrix, rows: np.ndarray, width: int,
                       r_pad: int) -> PlanChunk:
    from cumf_als_tpu import native
    if native.available():
        rows_in = np.full(r_pad, -1, np.int32)
        rows_in[:rows.size] = rows
        rows_out, nnz, cols, vals = native.materialize_chunk(
            np.asarray(csr.indptr, np.int64), csr.indices, csr.data,
            rows_in, width, csr.num_cols, csr.num_rows, csr.num_rows)
        return PlanChunk(width=width, rows=rows_out, nnz=nnz, cols=cols,
                         vals=vals)
    r = rows.size
    nnz = np.diff(csr.indptr)[rows].astype(np.int32)
    offs = csr.indptr[rows].astype(np.int64)
    idx = offs[:, None] + np.arange(width, dtype=np.int64)[None, :]
    mask = np.arange(width, dtype=np.int32)[None, :] < nnz[:, None]
    idx = np.where(mask, idx, 0)
    cols = np.where(mask, csr.indices[idx], csr.num_cols).astype(np.int32)
    vals = np.where(mask, csr.data[idx], 0.0).astype(np.float32)
    if r_pad > r:
        pad = r_pad - r
        rows = np.concatenate([rows, np.full(pad, csr.num_rows)])
        nnz = np.concatenate([nnz, np.zeros(pad, np.int32)])
        cols = np.concatenate(
            [cols, np.full((pad, width), csr.num_cols, np.int32)])
        vals = np.concatenate([vals, np.zeros((pad, width), np.float32)])
    return PlanChunk(width=width, rows=rows.astype(np.int32), nnz=nnz,
                     cols=cols, vals=vals)
