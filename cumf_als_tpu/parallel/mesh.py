"""Device mesh helpers: the communication layer of the framework.

Replaces the reference's hand-rolled multi-GPU backend — CUDA P2P
enablement, anchor-GPU gather + cublasSaxpy reduction, D2D broadcast and
OpenMP per-GPU threads (reference hugewiki/common.h:19-36,
hugewiki.cu:2703-2745) — with a jax.sharding.Mesh whose collectives
(psum over ICI) are emitted by XLA SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n_devices. The ALS parallelism vocabulary
    (SURVEY §2: model-parallel row solves, data-parallel Gram reduction,
    replicated small factor) needs one axis; ICI ring topology makes the
    psum ride neighbor links."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize. After this,
    make_mesh() sees all hosts' devices and the same shard_map programs
    scale over DCN + ICI — the reference's single-box OpenMP topology
    (hugewiki.cu:2447) has no multi-host path at all. No-op when JAX
    auto-detects the cluster (TPU pods)."""
    import jax
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def sharded_along(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
