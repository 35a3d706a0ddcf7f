"""Where does the F>128 (f_pad=256) time go? (VERDICT r3 #2)

Times the fused Gram+CG kernel and the XLA row gather at f=128 vs
f=256 on MATCHED gathered-G volume, so the padding cliff decomposes
into gather bytes / kernel DMA / MXU flops / grid-step overhead before
any wide-F kernel design is committed. Also sweeps the kernel's row
block to expose per-grid-step overhead (the _row_block model gives
rb=8 at f=256).

Run on the real chip, host otherwise idle.
Usage: python scripts/bench_wide_f.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from cumf_als_tpu.ops import pallas_solve as ps

    print(f"devices: {jax.devices()}", file=sys.stderr)

    def sync(x):
        return float(jnp.sum(x[..., :1, :1].astype(jnp.float32)))

    def bench(fn, *a, n=6):
        out = fn(*a)
        out = out[0] if isinstance(out, tuple) else out
        sync(out)
        t0 = time.monotonic()
        for _ in range(n):
            out = fn(*a)
            out = out[0] if isinstance(out, tuple) else out
        sync(out)
        return (time.monotonic() - t0) / n

    rng = np.random.default_rng(0)
    lam = 0.048

    # Netflix theta-phase-like: many rows, width 256. Rows scale down
    # with f so G stays ~0.5-2 GB (the f=256/f32 32k-row case OOMs HBM).
    for f, r, w, dt in [(128, 1 << 15, 256, "f32"),
                        (256, 1 << 13, 256, "f32"),
                        (128, 1 << 15, 256, "bf16"),
                        (256, 1 << 13, 256, "bf16"),
                        (128, 1 << 13, 1024, "f32"),
                        (256, 1 << 11, 1024, "f32")]:
        g = jnp.asarray(rng.standard_normal((r, w, f)) * 0.3,
                        jnp.bfloat16 if dt == "bf16" else jnp.float32)
        vals = jnp.asarray(rng.random((r, w)), jnp.float32)
        nnz = jnp.full((r,), w, jnp.int32)
        x0 = jnp.zeros((r, f), jnp.float32)

        def fused(g, vals, nnz, x0):
            return ps.fused_gram_cg(g, vals, nnz, x0, lam, cg_iters=6,
                                    cg_tol=1e-4)

        sec = bench(fused, g, vals, nnz, x0)
        gi = jnp.dtype(g.dtype).itemsize
        pb = ps._p_block(w, f, gi)
        rb = ps._row_block(w, f, gi)
        nnz_tot = r * w
        print(json.dumps({
            "op": "fused_gram_cg", "f": f, "rows": r, "width": w,
            "dtype": dt, "pb": pb, "rb": rb,
            "grid_steps": (r // rb) * (w // pb),
            "sec": round(sec, 4),
            "ns_per_nnz": round(sec / nnz_tot * 1e9, 3),
            "mxu_tflops": round(2 * nnz_tot * f * f / sec / 1e12, 2),
        }), flush=True)

    # gather rate at 128 vs 256 lanes, small + big tables (f32)
    for n_rows, f in [(17770, 128), (17770, 256),
                      (480189, 128), (480189, 256)]:
        table = jnp.asarray(rng.standard_normal((n_rows, f)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n_rows, 1 << 22), jnp.int32)

        def take(t, i):
            return jnp.take(t, i, axis=0)

        dt = bench(jax.jit(take), table, idx)
        print(json.dumps({
            "op": "gather", "table_rows": n_rows, "f": f,
            "table_mb": round(n_rows * f * 4 / 1e6, 1),
            "sec": round(dt, 4),
            "ns_per_row": round(dt / (1 << 22) * 1e9, 2),
            "gb_per_s": round((1 << 22) * f * 4 / dt / 1e9, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
