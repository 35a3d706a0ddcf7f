"""Round-5 gather study: can anything beat the 2.9 ns/row XLA gather?

The r2-r4 conclusion was that the XLA row gather is row-rate bound
(~2.9 ns/row fused, ~8 standalone small-table) and that every hand
alternative loses (docs/PERFORMANCE.md "The governing constraint").
Round 5 re-opens the question with three candidates this repo has not
measured:

  E1  lane-count dependence of the XLA row gather (128 vs 256 vs 512
      lanes; bf16/f32): is the rate truly per-ROW (flat in lanes) or
      per-byte above some width? Decides whether any lane-packing
      scheme can pay.
  E2  multi-row slices: lax.gather with slice_sizes (2,L)/(8,L) on
      aligned indices — is the cost per ISSUE or per ROW?
  E3  in-kernel `jnp.take_along_axis(table, idx, axis=0)` — Mosaic
      lowers this to tpu.dynamic_gather (jax 0.9 lowering.py:2465) —
      from a VMEM-resident table, at table heights 8..16k. If this
      runs near VPU rate for tables of a few thousand rows, the
      theta-phase gather (17770-row table) can move INSIDE the fused
      kernel and the 2.9 ns/row floor falls.
  E4  one-hot MXU gather for a VMEM-staged hot block: iota-compare
      one-hot build (pb, K) + (pb, K)@(K, 128) dot, K in {512, 1024}.
      The r2 one-hot negative result was for whole-table panels; a
      popularity hot block changes the economics.

Each experiment prints one JSON line; failures print {"error": ...}
and continue (Mosaic support varies by toolchain).

Usage: python scripts/r5_gather_study.py [--exp E1,E2,...] [--out f]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def emit(rec, fh=None):
    line = json.dumps(rec)
    print(line, flush=True)
    if fh:
        fh.write(line + "\n")
        fh.flush()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="E1,E2,E3,E4")
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    exps = set(args.exp.split(","))
    fh = open(args.out, "a") if args.out else None

    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    def sync(x):
        # block_until_ready does not truly wait through the axon tunnel;
        # a dependent scalar D2H read does (docs/PERFORMANCE.md r3).
        while isinstance(x, (tuple, list)):
            x = x[0]
        return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))

    def bench(fn, *xs, iters=args.iters):
        sync(fn(*xs))
        t0 = time.monotonic()
        for _ in range(iters):
            out = fn(*xs)
        sync(out)
        return (time.monotonic() - t0) / iters

    # ---------------- E1: lane-count dependence -------------------
    if "E1" in exps:
        R, P = 1 << 14, 128           # 2.1M gathered rows per dispatch
        total = R * P
        for n_table in (1 << 14, 17770, 1 << 19):
            idx = jnp.asarray(
                rng.integers(0, n_table, (R, P)), jnp.int32)
            for lanes in (128, 256, 512):
                for dt in ("bfloat16", "float32"):
                    dtype = jnp.dtype(dt)
                    table = jnp.asarray(
                        rng.random((n_table, lanes), np.float32), dtype)

                    @jax.jit
                    def take_sum(t, i):
                        # sum consumer => fused regime, O(1) output
                        g = jnp.take(t, i, axis=0, fill_value=None)
                        return jnp.sum(g.astype(jnp.float32),
                                       axis=(0, 1))

                    try:
                        dt_s = bench(take_sum, table, idx)
                        emit({"exp": "E1", "n_table": n_table,
                              "lanes": lanes, "dtype": dt,
                              "ns_per_row": round(dt_s / total * 1e9, 3),
                              "gbps": round(total * lanes *
                                            dtype.itemsize / dt_s / 1e9,
                                            1)}, fh)
                    except Exception as e:  # noqa: BLE001
                        emit({"exp": "E1", "n_table": n_table,
                              "lanes": lanes, "dtype": dt,
                              "error": str(e)[:200]}, fh)

    # ---------------- E2: multi-row slices ------------------------
    if "E2" in exps:
        from jax import lax
        n_table, lanes = 1 << 17, 128
        table = jnp.asarray(
            rng.random((n_table, lanes), np.float32), jnp.bfloat16)
        R = 1 << 21                    # 2M issues
        for rows_per in (1, 2, 8):
            base = rng.integers(0, n_table - rows_per, (R, 1))
            base = (base // rows_per) * rows_per
            idx = jnp.asarray(base, jnp.int32)
            dnums = lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,))

            @jax.jit
            def g_sum(t, i, rp=rows_per):
                g = lax.gather(t, i, dnums, (rp, lanes),
                               mode="promise_in_bounds")
                return jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))

            try:
                dt_s = bench(g_sum, table, idx)
                emit({"exp": "E2", "rows_per_issue": rows_per,
                      "ns_per_issue": round(dt_s / R * 1e9, 3),
                      "ns_per_row": round(dt_s / (R * rows_per) * 1e9,
                                          3)}, fh)
            except Exception as e:  # noqa: BLE001
                emit({"exp": "E2", "rows_per_issue": rows_per,
                      "error": str(e)[:200]}, fh)

    # ---------------- E3: in-kernel dynamic_gather ----------------
    if "E3" in exps:
        def make_kernel(T, S, lanes, n_reps):
            def kernel(table_ref, idx_ref, out_ref):
                tab = table_ref[...]
                acc = jnp.zeros((S, lanes), jnp.float32)
                for r in range(n_reps):
                    idx = idx_ref[...] + r  # defeat CSE
                    idx = jnp.minimum(idx, T - 1)
                    g = jnp.take_along_axis(
                        tab, jnp.broadcast_to(idx[:, :1], (S, lanes))
                        if idx.ndim == 2 else idx, axis=0)
                    acc = acc + g.astype(jnp.float32)
                out_ref[...] = acc

            return kernel

        S, lanes = 512, 128
        n_reps = 8
        for T in (8, 64, 512, 2048, 8192, 16384):
            for dt in ("float32", "bfloat16"):
                dtype = jnp.dtype(dt)
                table = jnp.asarray(rng.random((T, lanes), np.float32),
                                    dtype)
                # idx broadcast across lanes: same row for all lanes
                idx_np = rng.integers(0, T, (S, lanes))
                idx_np[:] = idx_np[:, :1]  # uniform across lanes
                idx = jnp.asarray(idx_np, jnp.int32)

                kern = make_kernel(T, S, lanes, n_reps)
                try:
                    fn = pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((S, lanes),
                                                       jnp.float32),
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    )
                    fn = jax.jit(functools.partial(fn))
                    dt_s = bench(fn, table, idx)
                    rows = S * n_reps
                    # correctness probe vs numpy
                    out = np.asarray(fn(table, idx))
                    ref = np.zeros((S, lanes), np.float32)
                    tab_np = np.asarray(table, np.float32)
                    for r in range(n_reps):
                        ii = np.minimum(idx_np[:, 0] + r, T - 1)
                        ref += tab_np[ii]
                    ok = bool(np.allclose(out, ref, rtol=2e-2,
                                          atol=1e-2))
                    emit({"exp": "E3", "T": T, "dtype": dt,
                          "ns_per_row": round(dt_s / rows * 1e9, 3),
                          "correct": ok}, fh)
                except Exception as e:  # noqa: BLE001
                    emit({"exp": "E3", "T": T, "dtype": dt,
                          "error": str(e)[:300]}, fh)

    # ---------------- E4: one-hot MXU hot-block -------------------
    if "E4" in exps:
        def make_kernel(K, S, lanes, n_reps):
            def kernel(table_ref, idx_ref, out_ref):
                tab = table_ref[...]            # (K, lanes) bf16
                acc = jnp.zeros((S, lanes), jnp.float32)
                kio = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
                for r in range(n_reps):
                    idx = idx_ref[...][:, :1] + r
                    oh = (kio == idx).astype(jnp.bfloat16)  # (S, K)
                    g = jax.lax.dot_general(
                        oh, tab, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + g
                out_ref[...] = acc
            return kernel

        S, lanes = 512, 128
        n_reps = 8
        for K in (256, 512, 1024, 2048):
            table = jnp.asarray(rng.random((K, lanes), np.float32),
                                jnp.bfloat16)
            idx_np = rng.integers(0, K - n_reps, (S, 128))
            idx_np[:] = idx_np[:, :1]
            idx = jnp.asarray(idx_np, jnp.int32)
            kern = make_kernel(K, S, lanes, n_reps)
            try:
                fn = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((S, lanes),
                                                   jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )
                fn = jax.jit(fn)
                dt_s = bench(fn, table, idx)
                rows = S * n_reps
                out = np.asarray(fn(table, idx))
                tab_np = np.asarray(table, np.float32)
                ref = np.zeros((S, lanes), np.float32)
                for r in range(n_reps):
                    ref += tab_np[idx_np[:, 0] + r]
                ok = bool(np.allclose(out, ref, rtol=2e-2, atol=1e-1))
                emit({"exp": "E4", "K": K,
                      "ns_per_row": round(dt_s / rows * 1e9, 3),
                      "correct": ok}, fh)
            except Exception as e:  # noqa: BLE001
                emit({"exp": "E4", "K": K, "error": str(e)[:300]}, fh)

    if fh:
        fh.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
