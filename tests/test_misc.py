"""Smaller-surface tests: timers, gradient-enabled TF export, config
validation, checkpoint artifacts."""

import numpy as np
import pytest

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.utils.timing import PhaseTimer, seconds


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.report() and "b:" in t.report()
    assert seconds() > 0


def test_config_validation():
    with pytest.raises(ValueError):
        ALSConfig(m=10, n=10, f=0)
    with pytest.raises(ValueError):
        ALSConfig(m=10, n=10, f=8, solver="qr")
    with pytest.raises(ValueError):
        ALSConfig(m=10, n=10, f=8, use_panels="always")
    cfg = ALSConfig(m=10, n=10, f=100)
    assert cfg.f_pad == 128
    assert ALSConfig(m=10, n=10, f=129).f_pad == 256
    assert cfg.replace(f=8).f == 8


def test_tf_predict_gradient():
    tf = pytest.importorskip("tensorflow")
    from cumf_als_tpu.integrations.tf_op import make_tf_predict
    fn = make_tf_predict(with_gradient=True)
    f, m, n = 8, 6, 5
    rng = np.random.RandomState(0)
    xt = tf.constant(rng.standard_normal((f, m)).astype(np.float32))
    tt = tf.constant(rng.standard_normal((f, n)).astype(np.float32))
    rows = tf.constant(np.array([0, 2], np.int32))
    cols = tf.constant(np.array([1, 3], np.int32))
    with tf.GradientTape() as tape:
        tape.watch(xt)
        out = fn(xt, tt, rows, cols)
        loss = tf.reduce_sum(out * out)
    g = tape.gradient(loss, xt)
    assert g is not None and np.isfinite(g.numpy()).all()


def test_save_model_artifacts(tmp_path, small_problem):
    from cumf_als_tpu.data.synthetic import init_factors
    from cumf_als_tpu.models.als import do_als
    train, test = small_problem
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=2, verbose=False, debug_timing=False,
                    save_model=True, save_model_dir=str(tmp_path))
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=0)
    do_als(train, None, test, th0, x0, cfg)
    # CUMF_SAVE_MODEL-analog raw float dumps per iteration
    for it in range(2):
        xt = tmp_path / f"XT_iter{it:03d}.bin"
        assert xt.exists()
        arr = np.fromfile(xt, np.float32)
        assert arr.size == cfg.m * cfg.f
    # Gram-level dumps (reference als.cu:800-807 tt/xx granularity):
    # tt = theta Gram feeding the X update, xx = X Gram feeding theta,
    # plus the matching RHS slices; all at the padded feature width
    f_pad = cfg.f_pad
    for it in range(2):
        for tag, rhs in (("tt", "ytheta"), ("xx", "yTX")):
            a = np.fromfile(tmp_path / f"{tag}_iter{it:03d}.bin",
                            np.float32)
            assert a.size > 0 and a.size % (f_pad * f_pad) == 0
            b = np.fromfile(tmp_path / f"{rhs}_iter{it:03d}.bin",
                            np.float32)
            assert b.size == (a.size // f_pad)
            assert np.isfinite(a).all() and np.isfinite(b).all()
