#!/usr/bin/env python
"""On-TPU numerical parity sweep over the Pallas block-sizing space.

VERDICT r3 weak #7: unit tests run the kernels in interpreter mode on
CPU and `fused_available()` probes one shape, so nothing checked on the
real chip that the (_p_block, _row_block) corners the empirical VMEM
models pick produce CORRECT numbers (a mis-tiled block would read the
wrong slots, not OOM). This sweep drives each kernel wrapper through
the corners of that space — full-width tiles, 128-multiple sub-tiles,
the _maybe_pad_p edge (width 960 @ f=256/f32), rb=8 minimum blocks —
and compares against the pure-XLA twin (ops/solve.solve_cg on an
einsum Gram) at f32/bf16-appropriate tolerances.

Emits one JSON line per case and a final summary line; exit code 1 on
any failure. Runs in ~2-5 min on a warm compile cache.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _problem(rng, r, p, f, dtype, f_true=None, aug=False):
    """Random masked bucket chunk: rows with nnz in [1, p], zero-padded
    slots, lanes >= f_true zeroed (the extended-table contract)."""
    f_true = f_true or f
    g = rng.uniform(-0.7, 0.7, (r, p, f)).astype(np.float32)
    g[:, :, f_true:] = 0.0
    if aug:
        g[:, :, f - 1] = 0.0
    vals = rng.uniform(0.5, 4.5, (r, p)).astype(np.float32)
    nnz = rng.integers(1, p + 1, (r,)).astype(np.int32)
    mask = np.arange(p)[None, :] < nnz[:, None]
    g *= mask[:, :, None]
    vals *= mask
    x0 = np.zeros((r, f), np.float32)
    jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    return (jnp.asarray(g, jdt), jnp.asarray(vals), jnp.asarray(nnz),
            jnp.asarray(x0))


def _reference_x(g, vals, nnz, x0, lam, cg_iters=6):
    """XLA twin: einsum Gram (f32 accumulate, HIGHEST) + solve_cg."""
    from cumf_als_tpu.ops.solve import solve_cg
    f = g.shape[2]
    a = jnp.einsum("rpf,rpg->rfg", g, g,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    a = a + (nnz.astype(jnp.float32) * lam)[:, None, None] \
        * jnp.eye(f, dtype=jnp.float32)
    b = jnp.einsum("rp,rpf->rf", vals, g.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return a, b, solve_cg(a, b, x0, cg_iters=cg_iters)


def _check(name, got, want, tol, results):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = max(1e-6, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / denom
    ok = bool(np.isfinite(got).all()) and err < tol
    rec = {"case": name, "rel_err": round(err, 8), "tol": tol, "ok": ok}
    print(json.dumps(rec), flush=True)
    results.append(rec)


def main():
    from cumf_als_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import cumf_als_tpu.ops.pallas_solve as ps

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)
    if dev.platform == "cpu":
        print(json.dumps({"note": "no TPU; nothing to check"}))
        return 0

    rng = np.random.default_rng(0)
    results = []
    # lam=2 keeps every random system's condition number O(10): with
    # nnz as low as 1 and rank << f, lam=0.048 gives cond ~1e3 and the
    # two CG-6 implementations legitimately diverge (CG on a barely-
    # regularized rank-deficient A amplifies rounding-order noise to
    # ~15% — measured). Parity here checks TILING correctness, not CG
    # robustness; the trajectory tests own the ill-conditioned regime.
    lam = 2.0
    TOL = {"f32": 2e-3, "bf16": 3e-2}

    def run_case(name, tol, kernel_fn, ref_fn):
        """Run one corner; kernel calls go through the production
        VMEM backoff (a first-try scoped-vmem OOM is production
        behavior, not a failure — but record that it happened)."""
        try:
            want = ref_fn()
            got = ps.call_with_vmem_backoff(kernel_fn)
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            rec = {"case": name, "ok": False, "error": str(e)[:200]}
            print(json.dumps(rec), flush=True)
            results.append(rec)
            return
        _check(name, got, want, tol, results)

    # fused_gram_cg corners: (width, dtype, f) hitting full-width tiles
    # (16, 1280@f32, 1792@bf16), 128-multiple sub-tiles (1536->768,
    # 2048->1024, 3584->896), rb=8 (32768), the f=256 tier (384 full,
    # 512->256) and the _maybe_pad_p edge (960 @ f=256/f32).
    cases = [
        (16, "f32", 128), (1280, "f32", 128), (1536, "f32", 128),
        (3584, "f32", 128), (32768, "f32", 128),
        (1792, "bf16", 128), (2048, "bf16", 128),
        (384, "f32", 256), (512, "f32", 256), (960, "f32", 256),
        (1024, "bf16", 256),
    ]
    for width, dtype, f in cases:
        r = 64 if width >= 4096 else 256
        g, vals, nnz, x0 = _problem(rng, r, width, f, dtype, f_true=f - 28)
        run_case(f"fused_gram_cg w={width} {dtype} f={f}", TOL[dtype],
                 lambda g=g, vals=vals, nnz=nnz, x0=x0:
                     ps.fused_gram_cg(g, vals, nnz, x0, lam)[0],
                 lambda g=g, vals=vals, nnz=nnz, x0=x0:
                     _reference_x(g, vals, nnz, x0, lam)[2])

    # augmented-lane kernel: vals ride lane f-1; x lane f-1 must be 0
    for width, dtype in [(1280, "f32"), (2048, "bf16")]:
        g, vals, nnz, x0 = _problem(rng, 256, width, 128, dtype,
                                    f_true=100, aug=True)
        run_case(f"fused_gram_cg_aug w={width} {dtype}", TOL[dtype],
                 lambda g=g, vals=vals, nnz=nnz, x0=x0:
                     ps.fused_gram_cg_aug(g, vals, nnz, x0, lam)[0],
                 lambda g=g, vals=vals, nnz=nnz, x0=x0:
                     _reference_x(g, vals, nnz, x0, lam)[2])

    # gram-out partials (panel paths): raw (A, b) vs einsum
    for width, dtype in [(1280, "f32"), (3584, "bf16")]:
        g, vals, nnz, x0 = _problem(rng, 256, width, 128, dtype,
                                    f_true=100)
        table = jnp.concatenate(
            [jnp.asarray(rng.uniform(-0.7, 0.7, (width, 128)),
                         g.dtype),
             jnp.zeros((1, 128), g.dtype)])
        cols = jnp.asarray(
            rng.integers(0, width, (256, width)).astype(np.int32))
        gt = jnp.take(table, cols, axis=0)
        a_t = jnp.einsum("rpf,rpg->rfg", gt, gt,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        b_t = jnp.einsum("rp,rpf->rf", vals, gt.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        run_case(f"gather_gram_out A w={width} {dtype}", TOL[dtype],
                 lambda table=table, cols=cols, vals=vals:
                     ps.gather_gram_out(table, cols, vals,
                                        factor_dtype="f32")[0],
                 lambda a_t=a_t: a_t)
        run_case(f"gather_gram_out b w={width} {dtype}", TOL[dtype],
                 lambda table=table, cols=cols, vals=vals:
                     ps.gather_gram_out(table, cols, vals,
                                        factor_dtype="f32")[1],
                 lambda b_t=b_t: b_t)

    # standalone VMEM-resident CG solve vs the XLA loop
    from cumf_als_tpu.ops.solve import solve_cg
    for dtype in ("f32", "bf16"):
        g, vals, nnz, x0 = _problem(rng, 512, 256, 128, "f32",
                                    f_true=100)
        a, b, _x = _reference_x(g, vals, nnz, x0, lam)
        a_s = a.astype(jnp.bfloat16) if dtype == "bf16" else a
        run_case(f"solve_cg_pallas {dtype}", TOL[dtype],
                 lambda a_s=a_s, b=b, x0=x0:
                     ps.solve_cg_pallas(a_s, b, x0),
                 lambda a_s=a_s, b=b, x0=x0: solve_cg(a_s, b, x0))

    # split-path concat kernel: two lane blocks vs the monolithic 256
    if hasattr(ps, "fused_gram_cg_cat"):
        g, vals, nnz, x0 = _problem(rng, 256, 512, 256, "bf16",
                                    f_true=200)
        run_case("fused_gram_cg_cat w=512 bf16 f=256", TOL["bf16"],
                 lambda g=g, vals=vals, nnz=nnz, x0=x0:
                     ps.fused_gram_cg_cat(g[:, :, :128], g[:, :, 128:],
                                          vals, nnz, x0, lam)[0],
                 lambda g=g, vals=vals, nnz=nnz, x0=x0:
                     _reference_x(g, vals, nnz, x0, lam)[2])

    n_bad = sum(not r["ok"] for r in results)
    print(json.dumps({"cases": len(results), "failed": n_bad}),
          flush=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
