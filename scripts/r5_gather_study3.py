"""Round-5 gather study, part 3: single-invocation kernels with an
overhead-subtraction baseline (the gridded variant hangs this tunnel's
remote compiler; the ungridded part-1 kernels compiled fine but were
dispatch-bound — so measure the dispatch floor explicitly and size the
work to dominate it).

  E0   dispatch floor: trivial kernel, same I/O shapes
  E4s  one-hot MXU gather: (S, K) iota-compare one-hot + (S,K)@(K,128)
       dot, S*reps rows per call, K in {256, 512, 1024}
  E6   the E4s one-hot folded into a Gram-shaped consumer: does the
       one-hot gather co-schedule with an A += G^T G accumulation the
       way the production kernel would use it?

Usage: python scripts/r5_gather_study3.py [--out f]
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
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args()
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

    S = 4096
    reps = 16

    # ---------------- E0: dispatch floor ---------------------------
    table0 = jnp.asarray(rng.random((1024, lanes), np.float32),
                         jnp.bfloat16)
    idx0 = jnp.asarray(rng.integers(0, 1024, (S, lanes)), jnp.int32)

    def trivial(table_ref, idx_ref, out_ref):
        out_ref[...] = (idx_ref[...].astype(jnp.float32) +
                        jnp.sum(table_ref[...].astype(jnp.float32)))

    try:
        fn0 = jax.jit(pl.pallas_call(
            trivial,
            out_shape=jax.ShapeDtypeStruct((S, lanes), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        floor = bench(fn0, table0, idx0)
        emit({"exp": "E0", "dispatch_ms": round(floor * 1e3, 3)}, fh)
    except Exception as e:  # noqa: BLE001
        floor = 0.0
        emit({"exp": "E0", "error": repr(e)[:300]}, fh)

    # ---------------- E4s: one-hot MXU gather ----------------------
    for K in (256, 512, 1024):
        table = jnp.asarray(rng.random((K, lanes), np.float32),
                            jnp.bfloat16)
        idx_np = rng.integers(0, K - reps, (S, lanes), dtype=np.int32)
        idx_np[:] = idx_np[:, :1]
        idx = jnp.asarray(idx_np, jnp.int32)

        def kern(table_ref, idx_ref, out_ref, K=K):
            tab = table_ref[...]
            kio = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
            idx_col = idx_ref[...][:, :1]
            acc = jnp.zeros((S, lanes), jnp.float32)
            for r in range(reps):
                oh = (kio == idx_col + r).astype(jnp.bfloat16)
                acc += jax.lax.dot_general(
                    oh, tab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[...] = acc

        try:
            fn = jax.jit(pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, lanes), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ))
            dt_s = bench(fn, table, idx)
            rows = S * reps
            out = np.asarray(fn(table, idx))
            tab_np = np.asarray(table, np.float32)
            ref = np.zeros((S, lanes), np.float32)
            for r in range(reps):
                ref += tab_np[idx_np[:, 0] + r]
            ok = bool(np.allclose(out, ref, rtol=3e-2, atol=1.0))
            emit({"exp": "E4s", "K": K,
                  "ns_per_row_raw": round(dt_s / rows * 1e9, 3),
                  "ns_per_row_net": round((dt_s - floor) / rows * 1e9,
                                          3),
                  "correct": ok}, fh)
        except Exception as e:  # noqa: BLE001
            emit({"exp": "E4s", "K": K, "error": repr(e)[:300]}, fh)

    # ---------------- E6: one-hot gather + Gram --------------------
    # Production shape: contraction tiles feed A += G^T G. Measure the
    # one-hot gather with the Gram consumer attached (vs E4s's plain
    # accumulate) to see co-scheduling on MXU.
    K = 512
    table = jnp.asarray(rng.random((K, lanes), np.float32), jnp.bfloat16)
    RB, PB = 64, 512           # 32k slots/call, Gram (RB,128,128)
    idx_np = rng.integers(0, K, (RB, PB), dtype=np.int32)
    idx = jnp.asarray(idx_np, jnp.int32)

    def kern_gram(table_ref, idx_ref, a_ref):
        tab = table_ref[...]
        kio = jax.lax.broadcasted_iota(jnp.int32, (RB, PB, K), 2)
        oh = (kio == idx_ref[...][:, :, None]).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, tab, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)        # (RB, PB, 128)
        a_ref[...] = jax.lax.dot_general(
            g, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (RB, 128, 128)

    try:
        fn = jax.jit(pl.pallas_call(
            kern_gram,
            out_shape=jax.ShapeDtypeStruct((RB, lanes, lanes),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        dt_s = bench(fn, table, idx)
        rows = RB * PB
        out = np.asarray(fn(table, idx))
        tab_np = np.asarray(table, np.float32)
        g_ref = tab_np[idx_np]                          # (RB, PB, 128)
        a_ref_np = np.einsum("rpf,rpg->rfg", g_ref, g_ref)
        ok = bool(np.allclose(out, a_ref_np, rtol=5e-2,
                              atol=np.abs(a_ref_np).max() * 2e-2))
        emit({"exp": "E6", "K": K,
              "ns_per_row_raw": round(dt_s / rows * 1e9, 3),
              "ns_per_row_net": round((dt_s - floor) / rows * 1e9, 3),
              "correct": ok}, fh)
    except Exception as e:  # noqa: BLE001
        emit({"exp": "E6", "K": K, "error": repr(e)[:300]}, fh)

    if fh:
        fh.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
