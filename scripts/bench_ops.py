"""Op-level microbenchmarks: the BASELINE.json secondary metric
(batched f x f solve GFLOP/s) plus the rates that govern the design
(gather ns/row, Gram einsum TF/s, fused kernel ns/nnz).

Usage: python scripts/bench_ops.py [--f 128] [--batch 8192]
Prints one JSON line per op.
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args()

    sys.path.insert(0, ".")
    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from cumf_als_tpu.ops.solve import solve_cg, solve_cholesky

    def sync(x):
        return float(jnp.sum(x[..., :1, :1] if x.ndim > 1 else x[:1]))

    def bench(fn, *a, n=10):
        o = fn(*a)
        o = o[0] if isinstance(o, tuple) else o
        sync(o)
        t0 = time.monotonic()
        for _ in range(n):
            o = fn(*a)
        o = o[0] if isinstance(o, tuple) else o
        sync(o)
        return (time.monotonic() - t0) / n

    r, f, w = args.batch, args.f, args.width
    rng = np.random.RandomState(0)
    m = rng.standard_normal((r, f, f)).astype(np.float32)
    a = (np.einsum("rij,rkj->rik", m, m) / f +
         2 * np.eye(f, dtype=np.float32))
    b = rng.standard_normal((r, f)).astype(np.float32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    x0 = jnp.zeros_like(jb)

    # batched Cholesky solve: ~ (1/3 f^3 + 2 f^2) MACs per system
    dt = bench(solve_cholesky, ja, jb)
    flops = r * (f ** 3 / 3 + 2 * f * f) * 2
    print(json.dumps({"op": "batched_cholesky", "batch": r, "f": f,
                      "ms": round(dt * 1e3, 2),
                      "gflops": round(flops / dt / 1e9, 1)}))

    # batched CG-6: 7 matvecs (init + 6 iters) of 2 f^2 flops
    dt = bench(lambda: solve_cg(ja, jb, x0, cg_iters=6, cg_tol=0.0))
    flops = r * 7 * 2 * f * f
    print(json.dumps({"op": "batched_cg6", "batch": r, "f": f,
                      "ms": round(dt * 1e3, 2),
                      "gflops": round(flops / dt / 1e9, 1)}))

    # batched CG-6 via the VMEM-resident Pallas kernel (A read once)
    from cumf_als_tpu.ops.pallas_solve import (cg_solve_available,
                                               solve_cg_pallas)
    if cg_solve_available():
        dt = bench(lambda: solve_cg_pallas(ja, jb, x0, cg_iters=6,
                                           cg_tol=0.0))
        flops = r * 7 * 2 * f * f
        print(json.dumps({"op": "batched_cg6_pallas", "batch": r,
                          "f": f, "ms": round(dt * 1e3, 2),
                          "gflops": round(flops / dt / 1e9, 1)}))
        jab = ja.astype(jnp.bfloat16)
        dt = bench(lambda: solve_cg_pallas(jab, jb, x0, cg_iters=6,
                                           cg_tol=0.0))
        print(json.dumps({"op": "batched_cg6_pallas_bf16a", "batch": r,
                          "f": f, "ms": round(dt * 1e3, 2),
                          "gflops": round(flops / dt / 1e9, 1)}))

    # Gram einsum
    g = jnp.asarray(rng.standard_normal((r, w, f)).astype(np.float32))
    ein = jax.jit(lambda g: jnp.einsum(
        "rpf,rpg->rfg", g, g, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32))
    dt = bench(ein, g)
    print(json.dumps({"op": "gram_einsum", "batch": r, "width": w,
                      "f": f, "ms": round(dt * 1e3, 2),
                      "tflops": round(2 * r * w * f * f / dt / 1e12, 2)}))

    # fused Pallas gram+cg
    from cumf_als_tpu.ops.pallas_solve import fused_available, fused_gram_cg
    if fused_available():
        vals = jnp.asarray(rng.uniform(1, 5, (r, w)).astype(np.float32))
        nnz = jnp.asarray(np.full(r, w, np.int32))
        dt = bench(lambda: fused_gram_cg(g, vals, nnz, x0, 0.05))
        print(json.dumps({"op": "fused_gram_cg", "batch": r, "width": w,
                          "f": f, "ms": round(dt * 1e3, 2),
                          "ns_per_nnz": round(dt / (r * w) * 1e9, 2)}))

    # gather rates
    for t_rows, name in ((1 << 14, "gather_small_table"),
                         (480190, "gather_big_table")):
        tbl = jnp.asarray(
            rng.standard_normal((t_rows, f)).astype(np.float32))
        idx = jnp.asarray(
            rng.randint(0, t_rows, 1 << 21).astype(np.int32))
        gat = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = bench(gat, tbl, idx, n=3)
        print(json.dumps({"op": name, "table_rows": t_rows, "f": f,
                          "ms": round(dt * 1e3, 1),
                          "ns_per_row": round(dt / (1 << 21) * 1e9, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
