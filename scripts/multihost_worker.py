"""One process of a multi-host ShardedALS smoke run.

Each process owns a slice of a CPU "cluster" (gloo collectives over
localhost stand in for DCN): `init_distributed` brings up
jax.distributed, the global mesh spans every process's devices, and the
same SPMD iteration programs that run on one host scale across the
process boundary unchanged. The reference has no multi-host path at all
(its topology is OpenMP threads over one box's GPUs,
reference hugewiki.cu:2447-2496, README.md:115); this exercises the
claim that replaces it.

Usage (spawned per process by tests/test_multihost.py):
  python scripts/multihost_worker.py --coordinator localhost:PORT \
      --num-processes 2 --process-id I --out OUT.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--devices-per-process", type=int, default=2)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--out", default="")
    args = p.parse_args()

    # The environment may pre-register an accelerator backend via
    # sitecustomize and pin JAX_PLATFORMS; the config API wins as long
    # as no backend is initialized (same pattern as tests/conftest.py).
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_process)

    from cumf_als_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.devices_per_process, \
        (n_global, jax.process_count())

    import numpy as np

    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors, synthetic_ratings
    from cumf_als_tpu.parallel.sharded_als import ShardedALS

    # every process generates the identical problem (stands in for the
    # shared filesystem of a real pod job)
    train, test = synthetic_ratings(m=96, n=80, nnz=2500, nnz_test=300,
                                    seed=7)
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=args.iters, solver="cholesky", verbose=False,
                    chunk_nnz=1 << 11)
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
    model = ShardedALS(cfg, train, None, test, block_rows=32)
    assert model.n_dev == n_global
    res = model.run(x0, th0)
    if args.process_id == 0 and args.out:
        with open(args.out, "w") as fh:
            json.dump({"n_devices": n_global,
                       "n_processes": jax.process_count(),
                       "train_rmse": [h.train_rmse for h in res.history],
                       "test_rmse": [h.test_rmse for h in res.history],
                       "x_sum": float(np.abs(res.x).sum())}, fh)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
