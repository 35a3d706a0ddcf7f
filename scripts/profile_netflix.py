"""Profile 2 Netflix iterations, then summarize the trace by op."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

from cumf_als_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax  # noqa: E402

from bench import load_workload  # noqa: E402
from cumf_als_tpu.config import ALSConfig  # noqa: E402
from cumf_als_tpu.data.synthetic import init_factors  # noqa: E402
from cumf_als_tpu.models.als import ALS  # noqa: E402

train, test = load_workload("netflix", 1.0)
cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=100,
                nnz=train.nnz, nnz_test=test.nnz, lam=0.048, iters=2,
                solver="cg", factor_dtype="bf16", backend="pallas",
                plan_cache_dir=".bench_cache/plans",
                train_rmse_method="fused", verbose=False,
                debug_timing=True)
model = ALS(cfg, train, None, test)
x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
# warm up compiles first (run once untraced)
model.run(x0, th0)
prof_dir = "/tmp/alsprof"
os.system(f"rm -rf {prof_dir}")
with jax.profiler.trace(prof_dir):
    model.run(x0, th0)

# summarize
files = glob.glob(prof_dir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, file=sys.stderr)
tot = defaultdict(float)
cnt = defaultdict(int)
for fn in files:
    with gzip.open(fn, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e6  # us -> s
        args = ev.get("args") or {}
        # keep only device (TensorCore) lanes: heuristic on names
        tot[name] += dur
        cnt[name] += 1
out = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
for name, t in out:
    print(f"{t:9.4f}s x{cnt[name]:5d}  {name[:110]}")
