"""Microbenchmark: XLA row-gather throughput vs table size / locality.

Decides the Yahoo-class design (VERDICT r3 #1): the X/theta phases on
both-sides-big workloads are gather-bound — Yahoo ran ~31.8 ns/nnz vs
Netflix ~10 because the 625k/1M-row factor tables gather at the HBM
tier. This measures, on the real chip:

  1. ns per gathered row vs table size (does a "small table" fast tier
     exist, and where is the cliff?),
  2. whether index LOCALITY alone (indices concentrated in a hot
     prefix of a big table) recovers the fast tier — if yes, a
     popularity permutation of the factor table fixes Yahoo with no
     plan-structure change; if no, the hot rows must live in a
     physically separate small table (two-gather hot/cold split),
  3. whether sorting the index stream helps (DMA coalescing),
  4. f32 vs bf16 tables (byte-bound or transaction-bound?).

Usage: python scripts/bench_gather.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--rows", type=int, default=1 << 15,
                   help="R of the (R, P) index block")
    p.add_argument("--p", type=int, default=128)
    args = p.parse_args()

    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    R, P = args.rows, args.p
    total = R * P

    @jax.jit
    def take(table, idx):
        return jnp.take(table, idx, axis=0)

    def sync(x):
        # block_until_ready does not truly wait through the axon tunnel
        # (docs/PERFORMANCE.md r3); a dependent scalar D2H read does.
        return float(jnp.sum(x[:1, :1, :1].astype(jnp.float32)))

    def bench(table, idx, iters=4):
        sync(take(table, idx))
        t0 = time.monotonic()
        for _ in range(iters):
            out = take(table, idx)
        sync(out)
        return (time.monotonic() - t0) / iters

    rng = np.random.default_rng(0)
    sizes = [1 << 13, 1 << 16, 1 << 17, 1 << 18, 1 << 20] if args.quick \
        else [1 << 13, 1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 18,
              1 << 19, 1 << 20]
    dtypes = ["bfloat16"] if args.quick else ["bfloat16", "float32"]
    hot = 1 << 16
    print(f"gather block: ({R}, {P}) = {total/1e6:.2f}M rows/dispatch")
    print(f"{'n_table':>9} {'dtype':>8} {'mode':>8} {'ms':>8} "
          f"{'ns/row':>8} {'GB/s':>7}")
    for n in sizes:
        for dt in dtypes:
            dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            table = jnp.asarray(rng.random((n, 128), np.float32), dtype)
            row_b = 128 * (2 if dt == "bfloat16" else 4)
            modes = {"uniform": rng.integers(0, n, (R, P))}
            if n > hot:
                # 90% of indices land in the first `hot` rows
                h = rng.integers(0, hot, (R, P))
                c = rng.integers(0, n, (R, P))
                pick = rng.random((R, P)) < 0.9
                modes["hot90"] = np.where(pick, h, c)
            modes["sorted"] = np.sort(modes["uniform"], axis=None
                                      ).reshape(R, P)
            for mode, idx_np in modes.items():
                idx = jnp.asarray(idx_np.astype(np.int32))
                dt_s = bench(table, idx)
                ns = dt_s * 1e9 / total
                gbs = total * row_b / dt_s / 1e9
                print(f"{n:>9} {dt:>8} {mode:>8} {dt_s*1e3:>8.2f} "
                      f"{ns:>8.2f} {gbs:>7.1f}", flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
