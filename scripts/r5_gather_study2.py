"""Round-5 gather study, part 2: grid-amortized in-kernel gather rates.

Fixes the part-1 pitfalls: Mosaic's tpu.dynamic_gather (the lowering of
jnp.take_along_axis(table, idx, axis=0)) requires indices.shape ==
table.shape, and single-invocation micro-kernels are dispatch-bound
through the axon tunnel. Here every kernel runs a grid of `steps`
blocks per call (table held in VMEM across steps via a constant
index_map), so per-call overhead is amortized over ~1M gathered rows.

  E3g  in-kernel dynamic_gather from a VMEM table, T in {512..16k}
  E4g  in-kernel one-hot MXU gather vs K (hot-block candidate)
  E5g  baseline: same grid, same I/O, no gather (loop overhead)

Usage: python scripts/r5_gather_study2.py [--exp ...] [--out f]
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--exp", default="E5g,E3g,E4g")
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=6)
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
    lanes = 128

    def sync(x):
        return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))

    def bench(fn, *xs, iters=args.iters):
        sync(fn(*xs))
        t0 = time.monotonic()
        for _ in range(iters):
            out = fn(*xs)
        sync(out)
        return (time.monotonic() - t0) / iters

    # --------------- E3g: dynamic_gather, gridded ------------------
    if "E3g" in exps:
        for T in (512, 2048, 8192):
            steps = max(1, (1 << 20) // T)
            for dt in ("float32", "bfloat16"):
                dtype = jnp.dtype(dt)
                table = jnp.asarray(rng.random((T, lanes), np.float32),
                                    dtype)
                idx_np = rng.integers(0, T, (steps * T, lanes),
                                      dtype=np.int32)
                idx_np[:] = idx_np[:, :1]
                idx = jnp.asarray(idx_np, jnp.int32)

                def kernel(table_ref, idx_ref, out_ref):
                    g = jnp.take_along_axis(table_ref[...],
                                            idx_ref[...], axis=0)
                    out_ref[...] = jnp.broadcast_to(jnp.sum(
                        g.astype(jnp.float32), axis=0, keepdims=True),
                        out_ref.shape)

                try:
                    fn = jax.jit(pl.pallas_call(
                        kernel,
                        grid=(steps,),
                        in_specs=[
                            pl.BlockSpec((T, lanes), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((T, lanes), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec((8, lanes),
                                               lambda i: (i, 0),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((steps * 8, lanes),
                                                       jnp.float32),
                    ))
                    dt_s = bench(fn, table, idx)
                    rows = steps * T
                    out = np.asarray(fn(table, idx))
                    tab_np = np.asarray(table, np.float32)
                    ref = tab_np[idx_np[:T, 0]].sum(0)
                    ok = bool(np.allclose(out[0], ref, rtol=3e-2,
                                          atol=3e-1))
                    emit({"exp": "E3g", "T": T, "dtype": dt,
                          "ns_per_row": round(dt_s / rows * 1e9, 3),
                          "correct": ok}, fh)
                except Exception as e:  # noqa: BLE001
                    emit({"exp": "E3g", "T": T, "dtype": dt,
                          "error": repr(e)[:300]}, fh)

    # --------------- E4g: one-hot MXU gather, gridded --------------
    if "E4g" in exps:
        S = 1024
        steps = 256
        for K in (256, 512, 1024):
            table = jnp.asarray(rng.random((K, lanes), np.float32),
                                jnp.bfloat16)
            idx_np = rng.integers(0, K, (steps * S, 128), dtype=np.int32)
            idx_np[:] = idx_np[:, :1]
            idx = jnp.asarray(idx_np, jnp.int32)

            def kernel(table_ref, idx_ref, out_ref, K=K):
                kio = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
                oh = (kio == idx_ref[...][:, :1]).astype(jnp.bfloat16)
                g = jax.lax.dot_general(
                    oh, table_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[...] = jnp.broadcast_to(
                    jnp.sum(g, axis=0, keepdims=True), out_ref.shape)

            try:
                fn = jax.jit(pl.pallas_call(
                    kernel,
                    grid=(steps,),
                    in_specs=[
                        pl.BlockSpec((K, lanes), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((S, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((8, lanes), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((steps * 8, lanes),
                                                   jnp.float32),
                ))
                dt_s = bench(fn, table, idx)
                rows = steps * S
                out = np.asarray(fn(table, idx))
                tab_np = np.asarray(table, np.float32)
                ref = tab_np[idx_np[:S, 0]].sum(0)
                ok = bool(np.allclose(out[0], ref, rtol=3e-2, atol=3.0))
                emit({"exp": "E4g", "K": K,
                      "ns_per_row": round(dt_s / rows * 1e9, 3),
                      "correct": ok}, fh)
            except Exception as e:  # noqa: BLE001
                emit({"exp": "E4g", "K": K, "error": repr(e)[:300]}, fh)

    # --------------- E5g: no-gather baseline -----------------------
    if "E5g" in exps:
        T = 2048
        steps = (1 << 20) // T
        table = jnp.asarray(rng.random((T, lanes), np.float32),
                            jnp.bfloat16)
        blk = jnp.asarray(rng.random((steps * T, lanes), np.float32),
                          jnp.bfloat16)

        def kernel(table_ref, blk_ref, out_ref):
            g = blk_ref[...].astype(jnp.float32)
            out_ref[...] = jnp.broadcast_to(
                jnp.sum(g, axis=0, keepdims=True), out_ref.shape)

        try:
            fn = jax.jit(pl.pallas_call(
                kernel,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((T, lanes), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, lanes), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, lanes), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((steps * 8, lanes),
                                               jnp.float32),
            ))
            dt_s = bench(fn, table, blk)
            rows = steps * T
            emit({"exp": "E5g", "T": T,
                  "ns_per_row": round(dt_s / rows * 1e9, 3)}, fh)
        except Exception as e:  # noqa: BLE001
            emit({"exp": "E5g", "error": repr(e)[:300]}, fh)

    if fh:
        fh.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
