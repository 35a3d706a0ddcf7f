"""TensorFlow surface: the DoAls custom-op re-exposed TPU-natively.

The reference wraps its whole solver as a CPU-placed TF op with 20 input
tensors and 3 outputs — thetat (f, n), xt (f, m), rmse (1, 1) —
initializing the factors inside the op with 0.1*rand (reference
tensorflow/als_tf.cc:7-30, 120-126; note the CLI uses 0.2, main.cpp:75).
Here:

  - do_als(...)   : same tensor signature/semantics, backed by the JAX
                    solver (tf.py_function boundary, like the reference's
                    CPU-op-invoking-GPUs structure).
  - make_tf_predict(): the serving-path forward exported to a NATIVE TF
                    graph function via jax2tf (no python boundary), the
                    piece the reference wished it had ("wrap individual
                    cuMF kernels as TF ops", als_tf.cc:3-5).
"""

from __future__ import annotations

import numpy as np


def _require_tf():
    try:
        import tensorflow as tf
        return tf
    except ImportError as e:
        raise ImportError(
            "tensorflow is not installed; the TF surface is optional — "
            "use cumf_als_tpu.integrations.torch_op or the Python API"
        ) from e


def do_als(csrrow, csrcol, csrval, cscrow, csccol, cscval, coorow,
           coorowtest, coocoltest, coovaltest, m, n, f, nnz, nnz_test,
           lambda_, iters, xbatch, thetabatch, deviceid):
    """DoAls-equivalent. Returns (thetat (f, n), xt (f, m), rmse (1, 1)).

    Argument order and meaning mirror REGISTER_OP("DoAls")
    (als_tf.cc:7-30). xbatch/thetabatch/deviceid are accepted for
    signature parity; batching is automatic (chunked plans) and device
    placement is JAX's.
    """
    tf = _require_tf()

    def _run(csrrow, csrcol, csrval, coorowtest, coocoltest, coovaltest,
             m, n, f, nnz, nnz_test, lambda_, iters):
        from cumf_als_tpu.config import ALSConfig
        from cumf_als_tpu.models.als import ALS
        from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix
        m, n, f = int(m), int(n), int(f)
        csr = CSRMatrix(indptr=np.asarray(csrrow, np.int64),
                        indices=np.asarray(csrcol, np.int32),
                        data=np.asarray(csrval, np.float32),
                        num_rows=m, num_cols=n)
        test = COOMatrix(row=np.asarray(coorowtest, np.int32),
                         col=np.asarray(coocoltest, np.int32),
                         data=np.asarray(coovaltest, np.float32),
                         num_rows=m, num_cols=n)
        cfg = ALSConfig(m=m, n=n, f=f, nnz=int(nnz),
                        nnz_test=int(nnz_test), lam=float(lambda_),
                        iters=int(iters), verbose=False,
                        debug_timing=False)
        # init inside the op, 0.1 scale (als_tf.cc:120-126)
        rng = np.random.RandomState(0)
        theta0 = (0.1 * rng.random_sample((n, f))).astype(np.float32)
        x0 = np.zeros((m, f), np.float32)
        model = ALS(cfg, csr, None, test)
        res = model.run(x0, theta0)
        rmse = np.asarray([[res.final_test_rmse]], np.float32)
        return res.theta.T.copy(), res.x.T.copy(), rmse

    thetat, xt, rmse = tf.py_function(
        _run,
        [csrrow, csrcol, csrval, coorowtest, coocoltest, coovaltest,
         m, n, f, nnz, nnz_test, lambda_, iters],
        [tf.float32, tf.float32, tf.float32])
    return thetat, xt, rmse


def make_tf_predict(with_gradient: bool = False):
    """jax2tf-export the prediction forward as a native TF function:
    predict(xt (f, m), thetat (f, n), rows, cols) -> ratings."""
    tf = _require_tf()
    import jax.numpy as jnp
    from jax.experimental import jax2tf

    def predict(xt, thetat, rows, cols):
        xg = jnp.take(xt.T, rows, axis=0)
        tg = jnp.take(thetat.T, cols, axis=0)
        return jnp.sum(xg * tg, axis=-1)

    fn = jax2tf.convert(predict, with_gradient=with_gradient)
    return tf.function(fn, autograph=False)
