"""cumf_als_tpu: a TPU-native ALS matrix-factorization framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of
cuMF/cumf_als (reference at /root/reference): sparse-rating Gram
formation on the MXU, batched Cholesky/CG f x f solvers, psum-based
multi-chip model+data parallelism, and out-of-core factor streaming —
preserving the reference's CLI semantics, binary data contract and
RMSE reporting (see SURVEY.md).
"""

from cumf_als_tpu.config import ALSConfig, HUGEWIKI, ML10M, NETFLIX, YAHOO
from cumf_als_tpu.models.als import ALS, ALSResult, do_als
from cumf_als_tpu.models.factory import make_model
from cumf_als_tpu.utils.io import (COOMatrix, CSRMatrix, coo_to_csr,
                                   load_csr, load_csc_as_csr,
                                   load_test_coo, transpose_csr,
                                   write_dataset)

__version__ = "0.1.0"


def __getattr__(name):
    # heavier strategy classes import lazily (they pull in jax.sharding)
    if name == "ShardedALS":
        from cumf_als_tpu.parallel.sharded_als import ShardedALS
        return ShardedALS
    if name == "OutOfCoreALS":
        from cumf_als_tpu.models.out_of_core import OutOfCoreALS
        return OutOfCoreALS
    raise AttributeError(name)


__all__ = [
    "ALS", "ALSConfig", "ALSResult", "COOMatrix", "CSRMatrix",
    "HUGEWIKI", "ML10M", "NETFLIX", "OutOfCoreALS", "ShardedALS",
    "YAHOO", "coo_to_csr", "do_als", "load_csr", "load_csc_as_csr",
    "load_test_coo", "make_model", "transpose_csr", "write_dataset",
]
