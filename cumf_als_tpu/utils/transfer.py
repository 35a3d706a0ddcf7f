"""Chunked host->device transfer riding the tunnel's small-RPC fast path.

The TPU in this environment is reached through a tunneled PJRT client
whose host->device path is strongly size-dependent (measured, v5e via
axon relay, round 3):

  | transfer                  | sustained rate |
  |---------------------------|----------------|
  | ``device_put`` <= ~4 MB   | 0.6-3.7 GB/s (plateaus ~150 MB/s
  |                           |   once the client's leak passes ~1.5 GB)
  | ``device_put`` >= ~16 MB  | ~30-70 MB/s    |
  | jit called with numpy arg | ~13-25 MB/s    |
  | device->host (any size)   | ~30-40 MB/s    |

``fast_put`` exploits the small-RPC path: the host array is viewed as
bytes, split into <=4 MB pieces, each piece ``jax.device_put`` (async,
pipelined by the client), and the typed array is reassembled ON DEVICE
by a cached jitted concat+bitcast — HBM-rate, off the host path. Net
effect: bulk H2D runs ~7x faster than the raw-numpy-jit-arg transport
the streamed (out-of-core) paths used before.

This matters exactly where the reference re-uploads CSR slices per
batch (reference hugewiki/hugewiki.cu:2508-2516): the hugewiki-scale
streamed phases move ~30 GB per ALS iteration. On a direct-attached
TPU (no tunnel) fast_put degenerates gracefully: one extra device-side
copy per array, dwarfed by PCIe/DMA rates.

The device->host direction has NO fast path (hard ~35 MB/s regardless
of chunking — measured); the streamed model paths are therefore
designed to avoid D2H instead (see parallel/sharded_ooc.py's
device-resident X placement).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# 4 MB pieces: measured knee of the fast path (2 MB is marginally
# faster per byte early on but doubles per-piece dispatch overhead).
PIECE_BYTES = int(os.environ.get("CUMF_PUT_PIECE_BYTES", 4 << 20))

_ASSEMBLE_CACHE: dict = {}


def _single_device_of(sharding_or_device):
    """The one device a fast_put can target, or None (multi-device)."""
    if sharding_or_device is None:
        return jax.devices()[0]
    if isinstance(sharding_or_device, jax.Device):
        return sharding_or_device
    try:
        ds = sharding_or_device._addressable_device_assignment
    except AttributeError:
        try:
            ds = tuple(sharding_or_device.device_set)
        except Exception:
            return None
    return ds[0] if len(ds) == 1 else None


def _assemble(n_pieces: int, last_bytes: int, dtype: np.dtype,
              shape: tuple, out_sharding):
    key = (n_pieces, last_bytes, str(dtype), shape, out_sharding)
    fn = _ASSEMBLE_CACHE.get(key)
    if fn is not None:
        return fn
    itemsize = dtype.itemsize
    jdt = jnp.dtype(dtype)

    def assemble(*pieces):
        flat = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        arr = jax.lax.bitcast_convert_type(
            flat.reshape(-1, itemsize), jdt)
        return arr.reshape(shape)

    fn = jax.jit(assemble, out_shardings=out_sharding)
    _ASSEMBLE_CACHE[key] = fn
    return fn


def fast_put(arr: np.ndarray, sharding_or_device=None,
             piece_bytes: Optional[int] = None) -> jax.Array:
    """device_put `arr`, using the chunked small-RPC fast path when the
    target is a single device and the array is big enough to care.

    ``sharding_or_device``: a jax.Device, a Sharding, or None (default
    device). Multi-device shardings fall back to plain device_put (the
    simulated CPU meshes used in tests transfer at memcpy rate)."""
    arr = np.ascontiguousarray(arr)
    piece = piece_bytes or PIECE_BYTES
    dev = _single_device_of(sharding_or_device)
    target = sharding_or_device if sharding_or_device is not None else dev
    if (dev is None or arr.nbytes <= piece or dev.platform == "cpu"
            or jnp.dtype(arr.dtype).itemsize != arr.dtype.itemsize):
        # the dtype guard: under x64-disabled JAX an int64/float64 host
        # array is downcast on transfer — bitcast reassembly can't
        # reproduce that, so take the plain (downcasting) path
        return jax.device_put(arr, target)
    flat = arr.reshape(-1).view(np.uint8)
    nb = flat.shape[0]
    n_pieces = -(-nb // piece)
    last = nb - (n_pieces - 1) * piece
    pieces = [
        jax.device_put(flat[i * piece:min(nb, (i + 1) * piece)], dev)
        for i in range(n_pieces)
    ]
    out_sharding = (sharding_or_device
                    if not isinstance(sharding_or_device, jax.Device)
                    and sharding_or_device is not None else
                    jax.sharding.SingleDeviceSharding(dev))
    out = _assemble(n_pieces, last, arr.dtype, arr.shape,
                    out_sharding)(*pieces)
    for p in pieces:
        p.delete()
    return out
