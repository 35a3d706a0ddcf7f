"""On-disk cache for built update plans.

The reference's startup is an fread of prebuilt binaries (reference
host_utilities.cpp:19-97); ours was a multi-minute plan build per
process. This module persists built plans keyed by (dataset
fingerprint, builder kind, shape knobs) so every later process mmap-loads
them: chunk arrays are stored as flat .npy files and sliced as mmap
views, so load cost is paid lazily during the first device upload.

Layout per entry:  <cache_dir>/<key>/meta.json + <name>.npy
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import List, Optional

import numpy as np

from cumf_als_tpu.ops.tiling import (BatchedPanelPlan, PanelChunk,
                                     PanelPlan, PlanChunk, RowBatch,
                                     SplitChunk, SplitPlan, UpdatePlan)
from cumf_als_tpu.utils.io import CSRMatrix

_VERSION = 4  # bump when the serialized layout or plan semantics change
# v4 (r5): SplitPlan profile-ordered rows (chunk-max padding fix)


def dataset_fingerprint(csr: CSRMatrix) -> str:
    """Cheap content fingerprint: shapes + strided samples + head/tail
    blocks. Strides are page-sparse so mmap'd sources stay cheap."""
    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray(
        [csr.num_rows, csr.num_cols, csr.nnz], np.int64).tobytes())

    def _sample(arr: np.ndarray, k: int = 4096) -> None:
        n = arr.shape[0]
        if n == 0:
            return
        step = max(1, n // k)
        h.update(np.ascontiguousarray(arr[::step][:k]).tobytes())
        h.update(np.ascontiguousarray(arr[:1024]).tobytes())
        h.update(np.ascontiguousarray(arr[-1024:]).tobytes())

    _sample(np.asarray(csr.indptr))
    _sample(csr.indices)
    _sample(csr.data)
    return h.hexdigest()


def plan_key(kind: str, fingerprint: str, params: dict) -> str:
    blob = json.dumps({"v": _VERSION, "kind": kind, "fp": fingerprint,
                       "params": params}, sort_keys=True)
    return kind + "-" + hashlib.blake2b(
        blob.encode(), digest_size=12).hexdigest()


# ---------- chunk-list (de)serialization ----------

def _pack_chunks(chunks) -> dict:
    """Concatenate all chunks' arrays into flat buffers + a manifest of
    (panel, width, r_pad) rows. Works for PlanChunk (panel = -1) and
    PanelChunk alike."""
    meta = np.asarray(
        [(getattr(c, "panel", -1), c.width, c.rows.shape[0])
         for c in chunks], np.int64).reshape(len(chunks), 3)
    cat = (lambda parts, dt: np.concatenate(parts).astype(dt, copy=False)
           if parts else np.zeros(0, dt))
    return {
        "chunk_meta": meta,
        "rows": cat([c.rows for c in chunks], np.int32),
        "nnz": cat([c.nnz for c in chunks], np.int32),
        "cols": cat([c.cols.reshape(-1) for c in chunks], np.int32),
        "vals": cat([c.vals.reshape(-1) for c in chunks], np.float32),
    }


def _unpack_chunks(arrays: dict, cls) -> List:
    meta = np.asarray(arrays["chunk_meta"])
    rows, nnz = arrays["rows"], arrays["nnz"]
    cols, vals = arrays["cols"], arrays["vals"]
    out, ro, co = [], 0, 0
    for panel, width, r in meta:
        panel, width, r = int(panel), int(width), int(r)
        kw = dict(width=width,
                  rows=rows[ro:ro + r], nnz=nnz[ro:ro + r],
                  cols=cols[co:co + r * width].reshape(r, width),
                  vals=vals[co:co + r * width].reshape(r, width))
        if cls is PanelChunk:
            kw["panel"] = panel
        out.append(cls(**kw))
        ro += r
        co += r * width
    return out


def _write_entry(path: str, meta: dict, arrays: dict) -> None:
    """Atomic write: stage into a tmp dir, rename into place."""
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent)
    try:
        for name, arr in arrays.items():
            np.save(os.path.join(tmp, name + ".npy"),
                    np.ascontiguousarray(arr))
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        os.rename(tmp, path)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


def _read_entry(path: str):
    meta_path = os.path.join(path, "meta.json")
    if not os.path.isdir(path) or not os.path.exists(meta_path):
        return None, None
    with open(meta_path) as fh:
        meta = json.load(fh)
    arrays = {}
    for fn in os.listdir(path):
        if fn.endswith(".npy"):
            arrays[fn[:-4]] = np.load(os.path.join(path, fn),
                                      mmap_mode="r")
    return meta, arrays


# ---------- sharded (device-axis) chunk (de)serialization ----------

def _pack_dev_chunks(chunks) -> dict:
    """Pack chunks whose arrays carry a leading device axis:
    rows/nnz (n_dev, R), cols/vals (n_dev, R, P). Works for
    ShardedChunk (panel = -1) and AlignedPanelChunk alike."""
    meta = np.asarray(
        [(getattr(c, "panel", -1), c.width, c.rows.shape[0],
          c.rows.shape[1]) for c in chunks], np.int64
    ).reshape(len(chunks), 4)
    cat = (lambda parts, dt: np.concatenate(parts).astype(dt, copy=False)
           if parts else np.zeros(0, dt))
    return {
        "chunk_meta": meta,
        "rows": cat([c.rows.reshape(-1) for c in chunks], np.int32),
        "nnz": cat([c.nnz.reshape(-1) for c in chunks], np.int32),
        "cols": cat([c.cols.reshape(-1) for c in chunks], np.int32),
        "vals": cat([c.vals.reshape(-1) for c in chunks], np.float32),
    }


def _unpack_dev_chunks(arrays: dict, make) -> List:
    """make(panel, width, rows, nnz, cols, vals) -> chunk object."""
    meta = np.asarray(arrays["chunk_meta"])
    rows, nnz = arrays["rows"], arrays["nnz"]
    cols, vals = arrays["cols"], arrays["vals"]
    out, ro, co = [], 0, 0
    for panel, width, n_dev, r in meta:
        panel, width, n_dev, r = (int(panel), int(width), int(n_dev),
                                  int(r))
        out.append(make(
            panel, width,
            rows[ro:ro + n_dev * r].reshape(n_dev, r),
            nnz[ro:ro + n_dev * r].reshape(n_dev, r),
            cols[co:co + n_dev * r * width].reshape(n_dev, r, width),
            vals[co:co + n_dev * r * width].reshape(n_dev, r, width)))
        ro += n_dev * r
        co += n_dev * r * width
    return out


# ---------- plan-level save/load ----------

def _save_lazy_sharded_row(path: str, plan) -> None:
    """Lazy chunks hold per-device global-row lists only; pack them flat.
    Cuts the hugewiki-scale lazy plan rebuild (~15 min of bucketing +
    subrow scans per process) to an mmap load."""
    chunks = plan.chunks
    meta = {"type": "sharded_row_lazy", "n_dev": int(plan.n_dev),
            "m": int(plan.m), "m_loc": int(plan.m_loc),
            "num_cols": int(plan.num_cols),
            "chunk_meta": [
                [int(c.width), int(c._r)] +
                [int(g.size) for g in c._grows] for c in chunks]}
    cat = (lambda parts, dt: np.concatenate(parts).astype(dt, copy=False)
           if parts else np.zeros(0, dt))
    _write_entry(path, meta, {
        "global_ids": plan.global_ids,
        "grows": cat([g for c in chunks for g in c._grows], np.int64),
        "rows": cat([c.rows.reshape(-1) for c in chunks], np.int32),
        "nnz": cat([c.nnz.reshape(-1) for c in chunks], np.int32)})


def _load_lazy_sharded_row(meta, arrays, csr):
    from cumf_als_tpu.parallel.plan import (LazyShardedChunk,
                                            ShardedRowPlan)
    n_dev = meta["n_dev"]
    chunks, go, ro = [], 0, 0
    grows_flat, rows_f, nnz_f = (arrays["grows"], arrays["rows"],
                                 arrays["nnz"])
    for cm in meta["chunk_meta"]:
        width, r = int(cm[0]), int(cm[1])
        ch = object.__new__(LazyShardedChunk)
        ch.width = width
        ch._csr = csr
        ch._r = r
        grows = []
        for d in range(n_dev):
            k = int(cm[2 + d])
            grows.append(np.asarray(grows_flat[go:go + k]))
            go += k
        ch._grows = grows
        ch.rows = np.asarray(rows_f[ro:ro + n_dev * r]).reshape(n_dev, r)
        ch.nnz = np.asarray(nnz_f[ro:ro + n_dev * r]).reshape(n_dev, r)
        ro += n_dev * r
        chunks.append(ch)
    return ShardedRowPlan(
        n_dev=n_dev, m=meta["m"], m_loc=meta["m_loc"],
        global_ids=np.asarray(arrays["global_ids"]),
        num_cols=meta["num_cols"], chunks=chunks)


def _save_lazy_aligned_steps(path: str, plan) -> None:
    """Cacheable only when every step's sole member references ONE
    shared matrix (the n_dev==1 hugewiki form, where the device
    sub-matrix IS the CSC): the cache stores subrow descriptors and the
    loader re-binds them to the caller's csr."""
    steps = plan.steps
    if any(not hasattr(st, "_per_dev") for st in steps):
        return  # mixed eager/lazy steps: rebuild per process
    mats = {id(ch._csr) for st in steps for ch in st._per_dev
            if ch is not None}
    if len({len(st._per_dev) for st in steps} | {1}) != 1 or \
            len(mats) > 1:
        return  # multi-device lazy steps: rebuild per process
    sent = steps[0]._sentinel if steps else 0
    psize = steps[0]._panel_size if steps else 0
    meta = {"type": "aligned_steps_lazy", "n_panels": int(plan.n_panels),
            "sentinel": int(sent), "panel_size": int(psize),
            "chunk_meta": [
                [int(st.panel), int(st.width), int(st._r),
                 int(st._per_dev[0]._sub_off.shape[0]),
                 int(st._per_dev[0]._base)]
                for st in steps]}
    cat = (lambda parts, dt: np.concatenate(parts).astype(dt, copy=False)
           if parts else np.zeros(0, dt))
    mem = [st._per_dev[0] for st in steps]
    _write_entry(path, meta, {
        "sub_off": cat([c._sub_off for c in mem], np.int64),
        "sub_len": cat([c._sub_len for c in mem], np.int32),
        "sub_rows": cat([c._sub_rows for c in mem], np.int32)})


def _load_lazy_aligned_steps(meta, arrays, csr):
    from cumf_als_tpu.ops.tiling import LazyPanelChunk
    from cumf_als_tpu.parallel.plan import (AlignedSteps,
                                            LazyAlignedPanelChunk)
    sent, psize = meta["sentinel"], meta["panel_size"]
    off_f, len_f, rows_f = (arrays["sub_off"], arrays["sub_len"],
                            arrays["sub_rows"])
    steps, so = [], 0
    for panel, width, r, k, base in meta["chunk_meta"]:
        panel, width, r, k, base = (int(panel), int(width), int(r),
                                    int(k), int(base))
        ch = LazyPanelChunk(
            csr, panel, width, np.asarray(off_f[so:so + k]),
            np.asarray(len_f[so:so + k]),
            np.asarray(rows_f[so:so + k]), r, base, psize)
        so += k
        steps.append(LazyAlignedPanelChunk(panel, width, [ch], r, sent,
                                           psize))
    return AlignedSteps(steps=steps, n_panels=meta["n_panels"])


def save_plan(cache_dir: str, key: str, plan) -> None:
    from cumf_als_tpu.parallel.plan import (AlignedSteps, ReducePlan,
                                            ShardedRowPlan)
    path = os.path.join(cache_dir, key)
    if isinstance(plan, ShardedRowPlan):
        if any(not hasattr(c, "cols") for c in plan.chunks):
            _save_lazy_sharded_row(path, plan)
            return
        meta = {"type": "sharded_row", "n_dev": plan.n_dev, "m": plan.m,
                "m_loc": plan.m_loc, "num_cols": plan.num_cols}
        arrays = _pack_dev_chunks(plan.chunks)
        arrays["global_ids"] = plan.global_ids
        _write_entry(path, meta, arrays)
    elif isinstance(plan, ReducePlan):
        blocks = plan.blocks
        meta = {"type": "reduce", "n_dev": plan.n_dev, "n": plan.n,
                "m_loc": plan.m_loc,
                "block_meta": [
                    (b.width, int(b.rows.shape[0]), int(b.cols.shape[0]))
                    for b in blocks]}
        cat = (lambda parts, dt: np.concatenate(parts).astype(
            dt, copy=False) if parts else np.zeros(0, dt))
        _write_entry(path, meta, {
            "rows": cat([b.rows for b in blocks], np.int32),
            "nnz_total": cat([b.nnz_total for b in blocks], np.int32),
            "nnz_local": cat([b.nnz_local.reshape(-1) for b in blocks],
                             np.int32),
            "cols": cat([b.cols.reshape(-1) for b in blocks], np.int32),
            "vals": cat([b.vals.reshape(-1) for b in blocks],
                        np.float32)})
    elif isinstance(plan, AlignedSteps):
        if any(not hasattr(c, "cols") for c in plan.steps):
            _save_lazy_aligned_steps(path, plan)
            return
        meta = {"type": "aligned_steps", "n_panels": plan.n_panels}
        _write_entry(path, meta, _pack_dev_chunks(plan.steps))
    elif isinstance(plan, SplitPlan):
        meta = {"type": "split", "num_rows": plan.num_rows,
                "num_cols": plan.num_cols, "part_size": plan.part_size,
                "n_parts": plan.n_parts, "true_nnz": plan.true_nnz,
                "padded_nnz": plan.padded_nnz,
                "chunk_meta": [
                    [int(c.rows.shape[0]), list(c.parts),
                     list(c.widths)] for c in plan.chunks]}
        cat = (lambda parts, dt: np.concatenate(parts).astype(
            dt, copy=False) if parts else np.zeros(0, dt))
        _write_entry(path, meta, {
            "perm": plan.perm,
            "rows": cat([c.rows for c in plan.chunks], np.int32),
            "nnz": cat([c.nnz for c in plan.chunks], np.int32),
            "cols": cat([b.reshape(-1) for c in plan.chunks
                         for b in c.cols], np.int32),
            "vals": cat([c.vals.reshape(-1) for c in plan.chunks],
                        np.float32)})
    elif isinstance(plan, UpdatePlan):
        meta = {"type": "update", "num_rows": plan.num_rows,
                "num_cols": plan.num_cols, "true_nnz": plan.true_nnz,
                "padded_nnz": plan.padded_nnz}
        _write_entry(path, meta, _pack_chunks(plan.chunks))
    elif isinstance(plan, PanelPlan):
        meta = {"type": "panel", "num_rows": plan.num_rows,
                "num_cols": plan.num_cols, "panel_size": plan.panel_size,
                "n_panels": plan.n_panels, "true_nnz": plan.true_nnz,
                "padded_nnz": plan.padded_nnz}
        arrays = _pack_chunks(plan.chunks)
        arrays["row_nnz"] = plan.row_nnz
        _write_entry(path, meta, arrays)
    elif isinstance(plan, BatchedPanelPlan):
        meta = {"type": "batched_panel", "num_rows": plan.num_rows,
                "num_cols": plan.num_cols, "panel_size": plan.panel_size,
                "batch_rows": plan.batch_rows, "true_nnz": plan.true_nnz,
                "padded_nnz": plan.padded_nnz,
                "batches": [
                    {"n_chunks": len(b.plan.chunks),
                     "num_rows": b.plan.num_rows,
                     "true_nnz": b.plan.true_nnz,
                     "padded_nnz": b.plan.padded_nnz,
                     "n_panels": b.plan.n_panels}
                    for b in plan.batches]}
        all_chunks = [c for b in plan.batches for c in b.plan.chunks]
        arrays = _pack_chunks(all_chunks)
        arrays["global_ids"] = np.concatenate(
            [b.global_ids for b in plan.batches]) if plan.batches \
            else np.zeros(0, np.int32)
        arrays["batch_row_nnz"] = np.concatenate(
            [b.row_nnz for b in plan.batches]) if plan.batches \
            else np.zeros(0, np.int32)
        arrays["batch_plan_row_nnz"] = np.concatenate(
            [b.plan.row_nnz for b in plan.batches]) if plan.batches \
            else np.zeros(0, np.int32)
        _write_entry(path, meta, arrays)
    else:
        raise TypeError(f"unknown plan type {type(plan)!r}")


def load_plan(cache_dir: str, key: str, csr: Optional[CSRMatrix] = None):
    """csr: required to re-bind lazy (streaming) plan entries; lazy
    entries return None without it."""
    meta, arrays = _read_entry(os.path.join(cache_dir, key))
    if meta is None:
        return None
    if meta["type"] == "sharded_row_lazy":
        return _load_lazy_sharded_row(meta, arrays, csr) \
            if csr is not None else None
    if meta["type"] == "aligned_steps_lazy":
        return _load_lazy_aligned_steps(meta, arrays, csr) \
            if csr is not None else None
    if meta["type"] == "sharded_row":
        from cumf_als_tpu.parallel.plan import (ShardedChunk,
                                                ShardedRowPlan)
        chunks = _unpack_dev_chunks(
            arrays, lambda panel, width, rows, nnz, cols, vals:
            ShardedChunk(width=width, rows=np.asarray(rows),
                         nnz=np.asarray(nnz), cols=cols, vals=vals))
        return ShardedRowPlan(
            n_dev=meta["n_dev"], m=meta["m"], m_loc=meta["m_loc"],
            global_ids=np.asarray(arrays["global_ids"]),
            num_cols=meta["num_cols"], chunks=chunks)
    if meta["type"] == "reduce":
        from cumf_als_tpu.parallel.plan import ReduceBlock, ReducePlan
        n_dev = meta["n_dev"]
        blocks, ro, fo = [], 0, 0
        for width, c, nd in meta["block_meta"]:
            width, c, nd = int(width), int(c), int(nd)
            p = width
            blocks.append(ReduceBlock(
                width=width,
                rows=np.asarray(arrays["rows"][ro:ro + c]),
                nnz_local=np.asarray(
                    arrays["nnz_local"][ro * n_dev:(ro + c) * n_dev]
                ).reshape(nd, c),
                nnz_total=np.asarray(arrays["nnz_total"][ro:ro + c]),
                cols=arrays["cols"][fo:fo + nd * c * p].reshape(nd, c, p),
                vals=arrays["vals"][fo:fo + nd * c * p].reshape(nd, c, p)))
            ro += c
            fo += nd * c * p
        return ReducePlan(n_dev=n_dev, n=meta["n"], m_loc=meta["m_loc"],
                          blocks=blocks)
    if meta["type"] == "aligned_steps":
        from cumf_als_tpu.parallel.plan import (AlignedPanelChunk,
                                                AlignedSteps)
        steps = _unpack_dev_chunks(
            arrays, lambda panel, width, rows, nnz, cols, vals:
            AlignedPanelChunk(panel, width, np.asarray(rows),
                              np.asarray(nnz), cols, vals))
        return AlignedSteps(steps=steps, n_panels=meta["n_panels"])
    if meta["type"] == "split":
        chunks, ro, co, vo = [], 0, 0, 0
        for r, parts, widths in meta["chunk_meta"]:
            r = int(r)
            cols = []
            for w in widths:
                w = int(w)
                cols.append(arrays["cols"][co:co + r * w].reshape(r, w))
                co += r * w
            wsum = int(sum(widths))
            chunks.append(SplitChunk(
                parts=tuple(int(p) for p in parts),
                widths=tuple(int(w) for w in widths),
                rows=np.asarray(arrays["rows"][ro:ro + r]),
                nnz=np.asarray(arrays["nnz"][ro:ro + r]),
                cols=tuple(cols),
                vals=arrays["vals"][vo:vo + r * wsum].reshape(r, wsum)))
            ro += r
            vo += r * wsum
        return SplitPlan(num_rows=meta["num_rows"],
                         num_cols=meta["num_cols"],
                         part_size=meta["part_size"],
                         n_parts=meta["n_parts"],
                         perm=np.asarray(arrays["perm"]),
                         chunks=chunks, true_nnz=meta["true_nnz"],
                         padded_nnz=meta["padded_nnz"])
    if meta["type"] == "update":
        return UpdatePlan(num_rows=meta["num_rows"],
                          num_cols=meta["num_cols"],
                          chunks=_unpack_chunks(arrays, PlanChunk),
                          true_nnz=meta["true_nnz"],
                          padded_nnz=meta["padded_nnz"])
    if meta["type"] == "panel":
        return PanelPlan(num_rows=meta["num_rows"],
                         num_cols=meta["num_cols"],
                         panel_size=meta["panel_size"],
                         n_panels=meta["n_panels"],
                         chunks=_unpack_chunks(arrays, PanelChunk),
                         row_nnz=np.asarray(arrays["row_nnz"]),
                         true_nnz=meta["true_nnz"],
                         padded_nnz=meta["padded_nnz"])
    if meta["type"] == "batched_panel":
        chunks = _unpack_chunks(arrays, PanelChunk)
        batches, ci, off = [], 0, 0
        batch_rows = meta["batch_rows"]
        nr_off = 0
        for b in meta["batches"]:
            sub = PanelPlan(
                num_rows=b["num_rows"], num_cols=meta["num_cols"],
                panel_size=meta["panel_size"], n_panels=b["n_panels"],
                chunks=chunks[ci:ci + b["n_chunks"]],
                row_nnz=np.asarray(
                    arrays["batch_plan_row_nnz"]
                    [nr_off:nr_off + b["num_rows"]]),
                true_nnz=b["true_nnz"], padded_nnz=b["padded_nnz"])
            batches.append(RowBatch(
                global_ids=np.asarray(
                    arrays["global_ids"][off:off + batch_rows]),
                row_nnz=np.asarray(
                    arrays["batch_row_nnz"][off:off + batch_rows]),
                plan=sub))
            ci += b["n_chunks"]
            off += batch_rows
            nr_off += b["num_rows"]
        return BatchedPanelPlan(
            num_rows=meta["num_rows"], num_cols=meta["num_cols"],
            panel_size=meta["panel_size"], batch_rows=batch_rows,
            batches=batches, true_nnz=meta["true_nnz"],
            padded_nnz=meta["padded_nnz"])
    raise ValueError(f"unknown plan entry type {meta['type']!r}")


def cached_transpose(cache_dir: Optional[str], csr: CSRMatrix) -> CSRMatrix:
    """Disk-memoized transpose_csr (the CSC view is pure function of the
    dataset and costs a full counting sort over nnz)."""
    from cumf_als_tpu.utils.io import transpose_csr
    if not cache_dir:
        return transpose_csr(csr)
    key = plan_key("csc", dataset_fingerprint(csr), {})
    path = os.path.join(cache_dir, key)
    meta, arrays = _read_entry(path)
    if meta is not None:
        return CSRMatrix(indptr=np.asarray(arrays["indptr"]),
                         indices=arrays["indices"], data=arrays["data"],
                         num_rows=meta["num_rows"],
                         num_cols=meta["num_cols"])
    csc = transpose_csr(csr)
    try:
        _write_entry(path, {"type": "csc", "num_rows": csc.num_rows,
                            "num_cols": csc.num_cols},
                     {"indptr": np.asarray(csc.indptr),
                      "indices": csc.indices, "data": csc.data})
    except Exception:
        return csc
    # reopen mmap-backed: drops ~2x nnz bytes of anon RSS (matters at
    # hugewiki scale, where the CSC alone is ~25 GB)
    meta, arrays = _read_entry(path)
    if meta is None:
        return csc
    return CSRMatrix(indptr=np.asarray(arrays["indptr"]),
                     indices=arrays["indices"], data=arrays["data"],
                     num_rows=meta["num_rows"], num_cols=meta["num_cols"])


def cached_build(cache_dir: Optional[str], kind: str, csr: CSRMatrix,
                 params: dict, build_fn,
                 csr_for_lazy: Optional[CSRMatrix] = None):
    """Memoize build_fn() on disk. cache_dir None disables caching.
    csr_for_lazy: the matrix lazy (streaming) chunks re-bind to on load
    — the source CSR for row plans, the CSC for theta steps."""
    if not cache_dir:
        return build_fn()
    key = plan_key(kind, dataset_fingerprint(csr), params)
    try:
        plan = load_plan(cache_dir, key, csr=csr_for_lazy)
    except Exception:
        plan = None  # corrupt/stale entry: rebuild
    if plan is not None:
        return plan
    plan = build_fn()
    try:
        save_plan(cache_dir, key, plan)
    except Exception:
        pass  # caching is best-effort
    return plan
