#!/usr/bin/env python
"""Diagnose the mesh=1 ShardedALS overhead (VERDICT r3 #4): time each
phase of the grouped iteration separately with device syncs, using the
exact bench.py configuration, so the prod 2.70 s/iter decomposes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cumf_als_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import CACHE_DIR, load_workload  # noqa: E402
from cumf_als_tpu.config import ALSConfig  # noqa: E402
from cumf_als_tpu.data.synthetic import init_factors  # noqa: E402
from cumf_als_tpu.parallel.sharded_als import ShardedALS  # noqa: E402

print(f"devices: {jax.devices()}", flush=True)
train, test = load_workload("netflix", 1.0)
cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=100,
                nnz=train.nnz, nnz_test=test.nnz, lam=0.048,
                iters=10, solver="cg", factor_dtype="bf16",
                plan_cache_dir=os.path.join(CACHE_DIR, "plans"),
                train_rmse_method="fused", verbose=False,
                debug_timing=False)
t0 = time.monotonic()
model = ShardedALS(cfg, train, None, test, n_devices=1)
print(f"plans built in {time.monotonic() - t0:.1f}s "
      f"({len(model.row_plan.chunks)} chunks, "
      f"{len(model.reduce_plan.blocks)} reduce blocks, "
      f"x_steps={'panel' if model.x_steps is not None else None})",
      flush=True)

x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=cfg.seed)
th0 = th0 * (np.diff(model.train_csc.indptr) > 0).astype(np.float32)[:, None]
x0 = x0 * (np.diff(model.train_csr.indptr) > 0).astype(np.float32)[:, None]
x = model.shard_x(x0)
theta = model.replicate_theta(th0)
device_data = model.device_plan()
chunk_data, block_data = device_data

from cumf_als_tpu.ops.pallas_solve import (  # noqa: E402
    backend_uses_pallas, call_with_vmem_backoff)


def x_phase(x, theta):
    if model.x_steps is not None:
        return model._run_x_panel_phase(x, theta, chunk_data, jitted=True)
    for lo in range(0, len(chunk_data), model.GROUP_BLOCKS):
        idxs = range(lo, min(lo + model.GROUP_BLOCKS, len(chunk_data)))
        fn = model._x_chunk_group_fn(list(idxs))
        x = call_with_vmem_backoff(
            fn, theta, x, tuple(chunk_data[i] for i in idxs),
            uses_pallas=backend_uses_pallas(cfg))
    return x


def theta_phase(x, theta):
    se_acc = jnp.zeros((), jnp.float32)
    for lo in range(0, len(block_data), model.GROUP_BLOCKS):
        idxs = range(lo, min(lo + model.GROUP_BLOCKS, len(block_data)))
        fn = model._theta_group_fn(list(idxs))
        theta, se_acc = call_with_vmem_backoff(
            fn, x, theta, se_acc, tuple(block_data[i] for i in idxs),
            uses_pallas=backend_uses_pallas(cfg))
    return theta, se_acc


for it in range(4):
    t0 = time.monotonic()
    x = x_phase(x, theta)
    jax.block_until_ready(x)
    tx = time.monotonic() - t0
    t0 = time.monotonic()
    theta, se_acc = theta_phase(x, theta)
    jax.block_until_ready(theta)
    tth = time.monotonic() - t0
    t0 = time.monotonic()
    se = float(se_acc)
    tse = time.monotonic() - t0
    rows, cols, vals, wght, nnz_test = model._test_plan
    t0 = time.monotonic()
    se_t = float(model._coo_sq_err_fn()(x, theta, rows, cols, vals, wght))
    ttest = time.monotonic() - t0
    print(f"iter {it}: x={tx:.3f}s theta={tth:.3f}s se_sync={tse:.3f}s "
          f"test={ttest:.3f}s total={tx + tth + tse + ttest:.3f}s "
          f"train_rmse={np.sqrt(max(se, 0) / model.train_csr.nnz):.4f}",
          flush=True)
