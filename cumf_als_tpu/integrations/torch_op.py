"""PyTorch surface: the DoAls op for torch users.

The reference only shipped a TensorFlow wrapper (reference
tensorflow/als_tf.cc); this framework exposes the same op surface to
PyTorch — the more common host framework today — with identical tensor
layout conventions: thetat (f, n), xt (f, m), rmse (1, 1), factors
initialized inside the op with 0.1*rand (als_tf.cc:120-126).
"""

from __future__ import annotations

import numpy as np


def _require_torch():
    try:
        import torch
        return torch
    except ImportError as e:
        raise ImportError("torch is not installed") from e


def do_als(csrrow, csrcol, csrval, coorowtest, coocoltest, coovaltest,
           m: int, n: int, f: int, lambda_: float, iters: int = 10,
           solver: str = "cg"):
    """Run ALS over torch CPU tensors. Returns (thetat, xt, rmse) torch
    tensors with the DoAls layout."""
    torch = _require_torch()
    from cumf_als_tpu.config import ALSConfig
    from cumf_als_tpu.models.als import ALS
    from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix

    csr = CSRMatrix(indptr=csrrow.numpy().astype(np.int64),
                    indices=csrcol.numpy().astype(np.int32),
                    data=csrval.numpy().astype(np.float32),
                    num_rows=m, num_cols=n)
    test = COOMatrix(row=coorowtest.numpy().astype(np.int32),
                     col=coocoltest.numpy().astype(np.int32),
                     data=coovaltest.numpy().astype(np.float32),
                     num_rows=m, num_cols=n)
    cfg = ALSConfig(m=m, n=n, f=f, nnz=csr.nnz, nnz_test=test.nnz,
                    lam=float(lambda_), iters=iters, solver=solver,
                    verbose=False, debug_timing=False)
    rng = np.random.RandomState(0)
    theta0 = (0.1 * rng.random_sample((n, f))).astype(np.float32)
    x0 = np.zeros((m, f), np.float32)
    model = ALS(cfg, csr, None, test)
    res = model.run(x0, theta0)
    return (torch.from_numpy(res.theta.T.copy()),
            torch.from_numpy(res.x.T.copy()),
            torch.tensor([[res.final_test_rmse]], dtype=torch.float32))


class TorchMF:
    """Serving-side wrapper: holds trained factors as torch tensors and
    predicts ratings for (row, col) index tensors."""

    def __init__(self, xt, thetat):
        torch = _require_torch()
        self.x = xt.T.contiguous() if xt.shape[0] != xt.shape[1] else xt.T
        self.theta = thetat.T.contiguous()
        self._torch = torch

    def predict(self, rows, cols):
        return (self.x[rows.long()] * self.theta[cols.long()]).sum(-1)
