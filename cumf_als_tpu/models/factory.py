"""Model factory: pick the execution strategy from the config.

The reference makes this choice at compile time (als.cu single-GPU vs the
hugewiki binary with GPU_COUNT/X_BATCH hardcoded, hugewiki.cu:27-42);
here it is one config switch:

  - mesh_shape + host_offload_x -> ShardedOutOfCoreALS (the full
                             hugewiki program: sharded ratings, X shards
                             host-resident and streamed, psum reduction)
  - mesh_shape set        -> ShardedALS (multi-chip SPMD over ICI)
  - host_offload_x        -> OutOfCoreALS (X host-resident, panels
                             streamed; the hugewiki out-of-core path)
  - otherwise             -> ALS (single device, in-memory)
"""

from __future__ import annotations

from typing import Optional

from cumf_als_tpu.config import ALSConfig
from cumf_als_tpu.utils.io import COOMatrix, CSRMatrix


def make_model(cfg: ALSConfig, train_csr: CSRMatrix,
               train_csc: Optional[CSRMatrix] = None,
               test_coo: Optional[COOMatrix] = None):
    if cfg.mesh_shape:
        n_dev = 1
        for d in cfg.mesh_shape:
            n_dev *= d
        if cfg.host_offload_x:
            from cumf_als_tpu.parallel.sharded_ooc import \
                ShardedOutOfCoreALS
            return ShardedOutOfCoreALS(cfg, train_csr, train_csc,
                                       test_coo, n_devices=n_dev)
        from cumf_als_tpu.parallel.sharded_als import ShardedALS
        return ShardedALS(cfg, train_csr, train_csc, test_coo,
                          n_devices=n_dev)
    if cfg.host_offload_x:
        from cumf_als_tpu.models.out_of_core import OutOfCoreALS
        return OutOfCoreALS(cfg, train_csr, train_csc, test_coo)
    from cumf_als_tpu.models.als import ALS
    return ALS(cfg, train_csr, train_csc, test_coo)
