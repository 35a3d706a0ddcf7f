"""Integration-op tests: the reference's TF smoke test re-created
(reference tensorflow/cumf_as_tensorflow_ops_test.py:45-53) plus the
torch twin."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(small_problem):
    train, test = small_problem
    return train, test


def test_torch_do_als(tiny):
    from cumf_als_tpu.integrations.torch_op import TorchMF, do_als
    train, test = tiny
    thetat, xt, rmse = do_als(
        torch.from_numpy(np.asarray(train.indptr, np.int64)),
        torch.from_numpy(train.indices), torch.from_numpy(train.data),
        torch.from_numpy(test.row), torch.from_numpy(test.col),
        torch.from_numpy(test.data), train.num_rows, train.num_cols,
        16, 0.05, iters=3)
    assert thetat.shape == (16, train.num_cols)
    assert xt.shape == (16, train.num_rows)
    assert rmse.shape == (1, 1)
    assert float(rmse) < 1.5
    mf = TorchMF(xt, thetat)
    pred = mf.predict(torch.from_numpy(test.row.astype(np.int64)),
                      torch.from_numpy(test.col.astype(np.int64)))
    e = pred.numpy() - test.data
    assert np.sqrt(np.mean(e * e)) == pytest.approx(float(rmse), rel=1e-3)


def test_tf_do_als(tiny):
    tf = pytest.importorskip("tensorflow")
    from cumf_als_tpu.integrations.tf_op import do_als
    train, test = tiny
    thetat, xt, rmse = do_als(
        tf.constant(np.asarray(train.indptr, np.int32)),
        tf.constant(train.indices), tf.constant(train.data),
        tf.constant(np.zeros(1, np.int32)),  # cscrow (unused: derived)
        tf.constant(np.zeros(1, np.int32)),
        tf.constant(np.zeros(1, np.float32)),
        tf.constant(np.zeros(1, np.int32)),  # coorow
        tf.constant(test.row), tf.constant(test.col),
        tf.constant(test.data),
        tf.constant(train.num_rows), tf.constant(train.num_cols),
        tf.constant(16), tf.constant(train.nnz, tf.int64),
        tf.constant(test.nnz, tf.int64), tf.constant(0.05),
        tf.constant(3), tf.constant(1), tf.constant(1), tf.constant(0))
    assert tuple(thetat.shape) == (16, train.num_cols)
    assert tuple(xt.shape) == (16, train.num_rows)
    assert float(rmse.numpy()[0, 0]) < 1.5


def test_tf_predict_native_graph(tiny):
    tf = pytest.importorskip("tensorflow")
    from cumf_als_tpu.integrations.tf_op import make_tf_predict
    train, _ = tiny
    f = 8
    rng = np.random.RandomState(0)
    xt = rng.standard_normal((f, train.num_rows)).astype(np.float32)
    thetat = rng.standard_normal((f, train.num_cols)).astype(np.float32)
    rows = np.array([0, 3, 5], np.int32)
    cols = np.array([1, 2, 0], np.int32)
    fn = make_tf_predict()
    got = fn(tf.constant(xt), tf.constant(thetat), tf.constant(rows),
             tf.constant(cols)).numpy()
    ref = np.einsum("fi,fi->i", xt[:, rows], thetat[:, cols])
    np.testing.assert_allclose(got, ref, rtol=1e-5)
