"""The per-iteration state-dir driver flow (scripts/hugewiki_full.py).

The full-hugewiki run executes one ALS iteration per process to bound
the tunnel client's H2D leak (docs/PERFORMANCE.md); the resumed
trajectory must match an uninterrupted run. The reference's analog is
out-of-band: its hugewiki app has no resume at all
(hugewiki.cu:2863-2872, commented-out model save)."""

import importlib.util
import json
import os

import numpy as np
import pytest

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "hugewiki_full.py")


@pytest.fixture()
def hugewiki_main(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("hugewiki_full",
                                                  _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import bench
    monkeypatch.setattr(bench, "CACHE_DIR", str(tmp_path / "cache"))
    return mod.main


@pytest.mark.slow  # ~20s CPU: resume-equivalence is slow-gate coverage
def test_state_dir_matches_single_process(hugewiki_main, tmp_path,
                                          capsys):
    scale, iters = 0.0002, 2
    # uninterrupted 2-iteration run. Cold CG starts on BOTH sides: the
    # state-dir mode persists theta alone (X is deliberately not
    # persisted — D2H of the full-scale shard costs minutes per GB on
    # the tunnel), so a restarted iteration cannot warm-start and the
    # identity contract is over cold-start semantics (--x-warm-start
    # auto already resolves to off under --state-dir).
    assert hugewiki_main(["--scale", str(scale), "--iters", str(iters),
                          "--f", "16", "--x-warm-start", "off"]) == 0
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # same run, one iteration per invocation through the state dir
    sd = str(tmp_path / "state")
    for _ in range(iters):
        assert hugewiki_main(
            ["--scale", str(scale), "--iters", str(iters), "--f", "16",
             "--state-dir", sd]) == 0
        capsys.readouterr()
    with open(os.path.join(sd, "state.json")) as fh:
        st = json.load(fh)
    assert st["next_iter"] == iters
    assert len(st["history"]) == iters

    for i, h in enumerate(st["history"]):
        assert h["iter"] == i
        assert np.isclose(h["train_rmse"], single["train_rmse"][i],
                          atol=2e-4)
        assert np.isclose(h["test_rmse"], single["test_rmse"][i],
                          atol=2e-4)
    # a further invocation is a no-op that reports the final state
    assert hugewiki_main(
        ["--scale", str(scale), "--iters", str(iters), "--f", "16",
         "--state-dir", sd]) == 0
    out = capsys.readouterr().out
    assert json.loads(out.strip())["next_iter"] == iters
