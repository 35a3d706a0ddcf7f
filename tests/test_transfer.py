"""fast_put: chunked H2D transport (utils/transfer.py).

On the CPU test backend the tunnel fast path is bypassed by default;
these tests force the chunked piece+assemble code path with a tiny
piece size to verify byte-exact reassembly for every stream dtype the
models use."""

import numpy as np
import pytest

import jax

from cumf_als_tpu.utils import transfer


def _roundtrip(arr, piece):
    dev = jax.devices()[0]
    flat = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
    nb = flat.shape[0]
    n_pieces = -(-nb // piece)
    last = nb - (n_pieces - 1) * piece
    pieces = [jax.device_put(flat[i * piece:min(nb, (i + 1) * piece)], dev)
              for i in range(n_pieces)]
    out = transfer._assemble(
        n_pieces, last, arr.dtype, arr.shape,
        jax.sharding.SingleDeviceSharding(dev))(*pieces)
    return np.asarray(out)


@pytest.mark.parametrize("dtype", ["float32", "float16", "uint16",
                                   "int32", "uint8"])
def test_assemble_roundtrip_dtypes(dtype):
    rng = np.random.RandomState(0)
    arr = (rng.standard_normal(3 * 1024) * 100).astype(dtype)
    arr = arr.reshape(3, 1024)
    out = _roundtrip(arr, piece=1 << 10)  # 1 KB pieces
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_assemble_roundtrip_bf16():
    import ml_dtypes
    rng = np.random.RandomState(1)
    arr = rng.standard_normal((7, 256)).astype(ml_dtypes.bfloat16)
    out = _roundtrip(arr, piece=1 << 9)
    np.testing.assert_array_equal(out.view(np.uint16),
                                  np.asarray(arr).view(np.uint16))


def test_fast_put_x64_dtype_falls_back():
    # int64 would be downcast by JAX under x64-disabled; fast_put must
    # take the plain device_put path (same downcast semantics)
    a = np.arange(1 << 12, dtype=np.int64)
    out = transfer.fast_put(a, piece_bytes=1 << 10)
    np.testing.assert_array_equal(np.asarray(out), a)


def test_fast_put_small_and_noncontiguous():
    # small arrays short-circuit to plain device_put
    a = np.arange(17, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(transfer.fast_put(a)), a)
    # non-contiguous input is handled (ascontiguousarray)
    b = np.arange(64, dtype=np.float32).reshape(8, 8)[:, ::2]
    np.testing.assert_array_equal(np.asarray(transfer.fast_put(b)), b)


def test_fast_put_respects_sharding():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:1])
    mesh = Mesh(devs, ("d",))
    sh = NamedSharding(mesh, P("d"))
    a = np.arange(32, dtype=np.float32).reshape(1, 32)
    out = transfer.fast_put(a, sh)
    assert out.sharding == sh
    np.testing.assert_array_equal(np.asarray(out), a)
