"""A/B microbench of the fused-kernel CG matvec layout.

The batched CG matvec inside ops/pallas_solve._kernel can contract over
the lane axis (sum(a * p[:, None, :], axis=-1)) or — A being symmetric —
over the sublane axis (sum(a * p[:, :, None], axis=-2)). This measures
both forms end-to-end through fused_gram_cg on the attached chip at
theta-phase-like shapes, and the CG-free gram-out kernel as the floor.

Usage: python scripts/bench_cg_matvec.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from cumf_als_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def sync(o):
    """Force execution by fetching a value — on the tunneled device
    backend block_until_ready() can return before the computation
    actually runs (measured: µs-scale 'times' for ms-scale kernels)."""
    o = o[0] if isinstance(o, tuple) else o
    import jax.numpy as jnp
    return float(jnp.sum(o[..., :1, :1] if o.ndim > 1 else o[:1]))


def bench(fn, *a, n=20):
    sync(fn(*a))
    t0 = time.monotonic()
    for _ in range(n):
        o = fn(*a)
    sync(o)
    return (time.monotonic() - t0) / n


def main():
    import cumf_als_tpu.ops.pallas_solve as ps

    r, p, f = 8192, 256, 128
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.standard_normal((r, p, f)).astype(np.float32) * 0.1)
    vals = jnp.asarray(rng.uniform(1, 5, (r, p)).astype(np.float32))
    nnz = jnp.asarray(rng.randint(p // 2, p, r).astype(np.int32))
    x0 = jnp.zeros((r, f), jnp.float32)

    out = {}
    dt = bench(lambda: ps.fused_gram_cg(g, vals, nnz, x0, 0.05))
    out["fused_gram_cg_ns_per_nnz"] = round(dt / (r * p) * 1e9, 3)

    # gram-only floor (no CG) via gather_gram_out on a pre-gathered
    # stand-in: feed an identity gather (table == g reshaped) is not
    # representative; instead reuse the kernel's gram stage by calling
    # fused_gram_cg with cg_iters=0 (solve degenerates to x0 handling).
    dt0 = bench(lambda: ps.fused_gram_cg(g, vals, nnz, x0, 0.05,
                                         cg_iters=0))
    out["gram_only_ns_per_nnz"] = round(dt0 / (r * p) * 1e9, 3)
    out["cg6_ns_per_nnz"] = round((dt - dt0) / (r * p) * 1e9, 3)
    out["cg6_ns_per_row"] = round((dt - dt0) / r * 1e9, 1)

    # MXU batched-matvec variant (idle systolic array during CG)
    try:
        dtm = bench(lambda: ps.fused_gram_cg(g, vals, nnz, x0, 0.05,
                                             matvec_impl="mxu"))
        out["cg6_mxu_ns_per_row"] = round((dtm - dt0) / r * 1e9, 1)
        ref = np.asarray(ps.fused_gram_cg(g, vals, nnz, x0, 0.05)[0])
        got = np.asarray(ps.fused_gram_cg(g, vals, nnz, x0, 0.05,
                                          matvec_impl="mxu")[0])
        out["mxu_max_abs_diff"] = float(np.max(np.abs(ref - got)))
    except Exception as e:  # noqa: BLE001 — record unsupported lowering
        out["cg6_mxu_error"] = str(e).split("\n")[0][:160]

    # standalone CG solver A/B at panel-solve shapes
    rs, fs = 8192, 128
    gs = rng.standard_normal((rs, 16, fs)).astype(np.float32)
    a_s = jnp.asarray(np.einsum("rpf,rpg->rfg", gs, gs) +
                      np.eye(fs, dtype=np.float32) * 20.0)
    b_s = jnp.asarray(rng.standard_normal((rs, fs)).astype(np.float32))
    z = jnp.zeros((rs, fs), jnp.float32)
    for impl in ("vpu", "mxu"):
        try:
            d = bench(lambda impl=impl: ps.solve_cg_pallas(
                a_s, b_s, z, matvec_impl=impl))
            out[f"solve_cg_{impl}_ns_per_row"] = round(d / rs * 1e9, 1)
        except Exception as e:  # noqa: BLE001
            out[f"solve_cg_{impl}_error"] = str(e).split("\n")[0][:160]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
