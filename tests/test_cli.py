"""CLI tests: the 9-positional-arg contract, flags, and strategy
factory routing."""

import numpy as np
import pytest

from cumf_als_tpu.cli import build_parser, config_from_args, main
from cumf_als_tpu.models.factory import make_model


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from cumf_als_tpu.data.synthetic import synthetic_ratings
    from cumf_als_tpu.utils.io import write_dataset
    d = tmp_path_factory.mktemp("ds")
    train, test = synthetic_ratings(m=50, n=40, nnz=900, nnz_test=120,
                                    rank=4, seed=5)
    write_dataset(str(d), train, test)
    return str(d), train, test


def test_usage_without_args(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "Usage: give M, N, F, NNZ" in out


def test_cli_end_to_end(dataset_dir, capsys):
    d, train, test = dataset_dir
    rc = main([str(train.num_rows), str(train.num_cols), "16",
               str(train.nnz), str(test.nnz), "0.05", "1", "1", d,
               "--iters", "2", "--solver", "cholesky"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Train RMSE in iter 1" in out
    assert "Test RMSE in iter 1" in out
    assert "doALS takes seconds" in out
    assert "ALS Done." in out


def test_factory_routing(dataset_dir):
    from cumf_als_tpu.models.als import ALS
    from cumf_als_tpu.models.out_of_core import OutOfCoreALS
    from cumf_als_tpu.parallel.sharded_als import ShardedALS
    d, train, test = dataset_dir
    args = build_parser().parse_args(
        [str(train.num_rows), str(train.num_cols), "16", str(train.nnz),
         str(test.nnz), "0.05", "1", "1", d])
    cfg = config_from_args(args)
    assert isinstance(make_model(cfg, train, None, test), ALS)
    assert isinstance(
        make_model(cfg.replace(host_offload_x=True), train, None, test),
        OutOfCoreALS)
    assert isinstance(
        make_model(cfg.replace(mesh_shape=(2,)), train, None, test),
        ShardedALS)


def test_cli_metrics_jsonl(dataset_dir, tmp_path, capsys):
    import json
    d, train, test = dataset_dir
    # metrics_jsonl comes via config; run the model directly
    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors
    from cumf_als_tpu.models.als import do_als
    path = str(tmp_path / "metrics.jsonl")
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=2, verbose=False, debug_timing=False,
                    metrics_jsonl=path)
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f)
    do_als(train, None, test, th0, x0, cfg)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert {"iteration", "train_rmse", "test_rmse",
            "x_seconds"} <= set(lines[0])


def test_cli_x_placement_device(tmp_path):
    """--x-placement device drives the sharded+OOC HBM-resident-X mode
    from the CLI surface (the full-hugewiki run mode)."""
    import subprocess
    import sys
    import numpy as np
    from cumf_als_tpu.data.synthetic import synthetic_ratings
    from cumf_als_tpu.utils.io import write_dataset
    train, test = synthetic_ratings(m=120, n=90, nnz=3000, nnz_test=400,
                                    seed=5)
    d = tmp_path / "ds"
    d.mkdir()
    write_dataset(str(d), train, test)
    out = subprocess.run(
        [sys.executable, "-m", "cumf_als_tpu.cli", "120", "90", "16",
         str(train.nnz), str(test.nnz), "0.05", "1", "1", str(d),
         "--iters", "2", "--solver", "cholesky", "--mesh", "2",
         "--out-of-core", "--x-placement", "device",
         "--plan-cache", "off"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Test RMSE in iter 1" in out.stdout
    rmses = [float(line.rsplit(":", 1)[1])
             for line in out.stdout.splitlines()
             if "Train RMSE" in line]
    assert rmses[-1] < rmses[0]
