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


def test_stream_cache_roundtrip(tmp_path):
    """utils/stream_cache.py: build-once / mmap-forever store."""
    import numpy as np
    from cumf_als_tpu.utils.stream_cache import StreamCache
    sc = StreamCache(str(tmp_path), "k1")
    assert not sc.ready
    sc.begin()
    a0 = np.arange(24, dtype=np.int32).reshape(2, 12)
    v0 = np.linspace(0, 1, 8).astype(np.float16)
    sc.put(0, dict(rows=a0, vals=v0))
    sc.put(3, dict(rows=a0 * 2, vals=v0 * 2))
    sc.finish()
    assert sc.ready
    # fresh instance reads the same entries back, zero-copy
    sc2 = StreamCache(str(tmp_path), "k1")
    assert sc2.ready
    e = sc2.get(0)
    np.testing.assert_array_equal(e["rows"], a0)
    np.testing.assert_array_equal(e["vals"], v0)
    e3 = sc2.get(3)
    np.testing.assert_array_equal(e3["rows"], a0 * 2)
    assert sc2.get(1) is None
    # interrupted build (no finish) leaves nothing behind
    sc3 = StreamCache(str(tmp_path), "k2")
    sc3.begin()
    sc3.put(0, dict(rows=a0))
    del sc3
    assert not StreamCache(str(tmp_path), "k2").ready


@pytest.mark.slow  # ~13s CPU
def test_stream_cache_used_by_lazy_sharded_ooc(tmp_path, monkeypatch):
    """Lazy sharded-OOC runs persist their compacted streams and
    produce identical trajectories when re-run from the cache."""
    import numpy as np
    import cumf_als_tpu.parallel.sharded_ooc as so
    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.data.synthetic import init_factors, synthetic_ratings
    monkeypatch.setattr(so, "LAZY_NNZ_THRESHOLD", 1)
    train, test = synthetic_ratings(m=300, n=220, nnz=12000,
                                    nnz_test=1500, rank=6, noise=0.1,
                                    seed=7)
    cfg = ALSConfig(m=train.num_rows, n=train.num_cols, f=16, lam=0.05,
                    iters=2, solver="cholesky", verbose=False,
                    debug_timing=False, chunk_nnz=1 << 11,
                    panel_size=64, chunk_rows=64,
                    x_placement="device", stream_val_dtype="f16",
                    plan_cache_dir=str(tmp_path))
    x0, th0 = init_factors(cfg.m, cfg.n, cfg.f, seed=1)
    m1 = so.ShardedOutOfCoreALS(cfg, train, None, test, n_devices=2)
    assert m1._x_stream is not None and not m1._x_stream.ready
    r1 = m1.run(x0, th0)
    assert m1._x_stream.ready and m1._theta_stream.ready
    m2 = so.ShardedOutOfCoreALS(cfg, train, None, test, n_devices=2)
    assert m2._x_stream.ready  # second process mmap-loads the streams
    r2 = m2.run(x0, th0)
    for a, b in zip(r1.history, r2.history):
        assert a.train_rmse == b.train_rmse
        assert a.test_rmse == b.test_rmse


class TestCompactDevicePlans:
    def test_cols_uint16_when_fits(self):
        import numpy as np
        import jax.numpy as jnp
        from cumf_als_tpu.models.als import _compact_cols, _compact_vals
        small = np.asarray([[0, 5, 65535]], np.int32)
        big = np.asarray([[0, 70000]], np.int32)
        assert _compact_cols(small).dtype == jnp.uint16
        assert _compact_cols(big).dtype == jnp.int32

    def test_vals_bf16_only_when_exact(self):
        import numpy as np
        import jax.numpy as jnp
        from cumf_als_tpu.models.als import _compact_vals
        halves = np.asarray([[0.5, 4.5, 0.0, 100.0]], np.float32)
        lossy = np.asarray([[0.3, 1.7]], np.float32)
        assert _compact_vals(halves).dtype == jnp.bfloat16
        assert _compact_vals(lossy).dtype == jnp.float32
        # device copies are stored FLAT (lane-padding avoidance)
        np.testing.assert_array_equal(
            np.asarray(_compact_vals(halves), np.float32),
            halves.reshape(-1))
