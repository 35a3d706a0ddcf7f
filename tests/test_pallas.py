"""Pallas fused Gram+CG kernel tests (interpreter mode on CPU — the
compiled path is exercised on real hardware by bench.py; SURVEY §5 notes
interpreter-mode tests are the TPU analog of the reference's cuda-memcheck
debug builds)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

import cumf_als_tpu.ops.pallas_solve as ps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", patched)
    yield


def _problem(r, p, f, seed=0, zero_rows=()):
    rng = np.random.RandomState(seed)
    g = (rng.standard_normal((r, p, f)) * 0.3).astype(np.float32)
    vals = rng.uniform(1, 5, (r, p)).astype(np.float32)
    nnz = rng.randint(1, p + 1, (r,)).astype(np.int32)
    for z in zero_rows:
        nnz[z] = 0
    mask = np.arange(p)[None, :] < nnz[:, None]
    return g * mask[:, :, None], vals * mask, nnz


def _reference(g, vals, nnz, lam, f):
    r = g.shape[0]
    x = np.zeros((r, f))
    se = np.zeros(r)
    for i in range(r):
        a = g[i].T @ g[i] + (nnz[i] * lam + (nnz[i] == 0)) * np.eye(f)
        b = g[i].T @ vals[i]
        x[i] = np.linalg.solve(a, b) * (nnz[i] > 0)
        e = vals[i][:nnz[i]] - g[i][:nnz[i]] @ x[i]
        se[i] = np.sum(e * e)
    return x, se


def test_fused_gram_cg_matches_exact_solve():
    r, p, f, lam = 16, 48, 128, 0.05
    g, vals, nnz = _problem(r, p, f, zero_rows=(3,))
    x, se = ps.fused_gram_cg(jnp.asarray(g), jnp.asarray(vals),
                             jnp.asarray(nnz),
                             jnp.zeros((r, f), jnp.float32), lam,
                             cg_iters=40, cg_tol=1e-12)
    ref_x, ref_se = _reference(g, vals, nnz, lam, f)
    np.testing.assert_allclose(np.asarray(x), ref_x, atol=2e-3)
    np.testing.assert_allclose(np.asarray(se)[:, 0], ref_se,
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(x)[3], 0.0)


def test_fused_matches_xla_cg_semantics():
    """Same iterates as ops.solve.solve_cg (reference cg.cu semantics)."""
    from cumf_als_tpu.ops.solve import solve_cg
    r, p, f, lam = 8, 24, 128, 0.1
    g, vals, nnz = _problem(r, p, f, seed=3)
    a = np.einsum("rpf,rpg->rfg", g, g) + \
        (nnz * lam)[:, None, None] * np.eye(f, dtype=np.float32)
    b = np.einsum("rp,rpf->rf", vals, g)
    x0 = np.zeros((r, f), np.float32)
    ref = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(x0), cg_iters=6, cg_tol=1e-4))
    got, _ = ps.fused_gram_cg(jnp.asarray(g), jnp.asarray(vals),
                              jnp.asarray(nnz), jnp.asarray(x0), lam,
                              cg_iters=6, cg_tol=1e-4)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_gather_gram_cg_end_to_end():
    rng = np.random.RandomState(1)
    n, f, r, p = 50, 128, 16, 24
    table = rng.standard_normal((n, f)).astype(np.float32) * 0.3
    table_ext = jnp.concatenate(
        [jnp.asarray(table), jnp.zeros((1, f))], axis=0)
    cols = rng.randint(0, n, (r, p)).astype(np.int32)
    nnz = rng.randint(1, p + 1, (r,)).astype(np.int32)
    mask = np.arange(p)[None, :] < nnz[:, None]
    cols = np.where(mask, cols, n).astype(np.int32)
    vals = (rng.uniform(1, 5, (r, p)) * mask).astype(np.float32)
    x, se = ps.gather_gram_cg(table_ext, jnp.asarray(cols),
                              jnp.asarray(vals), jnp.asarray(nnz),
                              jnp.zeros((r, f), jnp.float32), 0.05,
                              cg_iters=40, cg_tol=1e-12)
    g = np.where(mask[:, :, None], table[np.minimum(cols, n - 1)], 0.0)
    ref_x, _ = _reference(g, vals, nnz, 0.05, f)
    np.testing.assert_allclose(np.asarray(x), ref_x, atol=2e-3)


class TestAugmentedGram:
    """Augmented-lane kernel (r3): rating values ride lane f-1 of G and
    one MXU accumulation forms A, b and sum(r^2) together. Requires the
    true factor width < f_pad, so the problems here zero lanes >= 100
    (the F=100-padded-to-128 headline shape)."""

    def _aug_problem(self, r, p, f, f_true, seed=0, zero_rows=()):
        g, vals, nnz = _problem(r, p, f, seed=seed, zero_rows=zero_rows)
        g[:, :, f_true:] = 0.0
        return g, vals, nnz

    def test_matches_unaugmented_kernel(self):
        r, p, f, lam = 16, 48, 128, 0.05
        g, vals, nnz = self._aug_problem(r, p, f, 100, zero_rows=(3,))
        args = (jnp.asarray(nnz), jnp.zeros((r, f), jnp.float32), lam)
        x_ref, se_ref = ps.fused_gram_cg(jnp.asarray(g),
                                         jnp.asarray(vals), *args,
                                         cg_iters=6, cg_tol=1e-4)
        x, se = ps.fused_gram_cg_aug(jnp.asarray(g), jnp.asarray(vals),
                                     *args, cg_iters=6, cg_tol=1e-4)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(se), np.asarray(se_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(x)[:, -1], 0.0)

    def test_matches_exact_solve(self):
        r, p, f, lam = 16, 40, 128, 0.1
        g, vals, nnz = self._aug_problem(r, p, f, 100, seed=5,
                                         zero_rows=(1, 7))
        x, se = ps.fused_gram_cg_aug(jnp.asarray(g), jnp.asarray(vals),
                                     jnp.asarray(nnz),
                                     jnp.zeros((r, f), jnp.float32),
                                     lam, cg_iters=60, cg_tol=1e-12)
        ref_x, ref_se = _reference(g, vals, nnz, lam, f)
        np.testing.assert_allclose(np.asarray(x), ref_x, atol=2e-3)
        np.testing.assert_allclose(np.asarray(se)[:, 0], ref_se,
                                   rtol=1e-2, atol=1e-2)

    def test_gather_gram_cg_aug(self):
        rng = np.random.RandomState(2)
        n, f, f_true, r, p = 50, 128, 100, 16, 24
        table = np.zeros((n, f), np.float32)
        table[:, :f_true] = rng.standard_normal((n, f_true)) * 0.3
        table_ext = jnp.concatenate(
            [jnp.asarray(table), jnp.zeros((1, f))], axis=0)
        cols = rng.randint(0, n, (r, p)).astype(np.int32)
        nnz = rng.randint(1, p + 1, (r,)).astype(np.int32)
        mask = np.arange(p)[None, :] < nnz[:, None]
        cols = np.where(mask, cols, n).astype(np.int32)
        vals = (rng.uniform(1, 5, (r, p)) * mask).astype(np.float32)
        x, _ = ps.gather_gram_cg(table_ext, jnp.asarray(cols),
                                 jnp.asarray(vals), jnp.asarray(nnz),
                                 jnp.zeros((r, f), jnp.float32), 0.05,
                                 cg_iters=40, cg_tol=1e-12, aug=True)
        g = np.where(mask[:, :, None], table[np.minimum(cols, n - 1)],
                     0.0)
        ref_x, _ = _reference(g, vals, nnz, 0.05, f)
        np.testing.assert_allclose(np.asarray(x), ref_x, atol=2e-3)


def test_solve_cg_pallas_matches_xla_cg():
    """Standalone VMEM-resident CG (A read once) vs ops.solve.solve_cg:
    identical iterates including warm start, early exit and zero-system
    guards; R deliberately not a multiple of the row block (pad path)."""
    from cumf_als_tpu.ops.solve import solve_cg
    rng = np.random.RandomState(7)
    r, f = 21, 128
    q = rng.standard_normal((r, f, f)).astype(np.float32) * 0.1
    a = np.einsum("rkf,rkg->rfg", q, q) + \
        3.0 * np.eye(f, dtype=np.float32)
    a[5] = np.eye(f)  # an instantly-converging system (early exit)
    b = rng.standard_normal((r, f)).astype(np.float32)
    x0 = rng.standard_normal((r, f)).astype(np.float32) * 0.1
    ref = np.asarray(solve_cg(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(x0), cg_iters=6, cg_tol=1e-4))
    got = np.asarray(ps.solve_cg_pallas(jnp.asarray(a), jnp.asarray(b),
                                        jnp.asarray(x0), cg_iters=6,
                                        cg_tol=1e-4))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_solve_cg_pallas_bf16_a():
    """bf16 A storage (CUMF_TT_FP16 analog) through the kernel."""
    from cumf_als_tpu.ops.solve import solve_cg
    rng = np.random.RandomState(11)
    r, f = 8, 128
    q = rng.standard_normal((r, f, f)).astype(np.float32) * 0.1
    a = np.einsum("rkf,rkg->rfg", q, q) + \
        2.0 * np.eye(f, dtype=np.float32)
    b = rng.standard_normal((r, f)).astype(np.float32)
    x0 = np.zeros((r, f), np.float32)
    a_bf = jnp.asarray(a).astype(jnp.bfloat16)
    ref = np.asarray(solve_cg(a_bf, jnp.asarray(b), jnp.asarray(x0),
                              cg_iters=6, cg_tol=1e-4))
    got = np.asarray(ps.solve_cg_pallas(a_bf, jnp.asarray(b),
                                        jnp.asarray(x0), cg_iters=6,
                                        cg_tol=1e-4))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_solve_cg_pallas_diag_variant():
    """Raw A + in-kernel Tikhonov diag == pre-regularized A solve."""
    rng = np.random.RandomState(3)
    r, f = 16, 128
    q = rng.standard_normal((r, f, f)).astype(np.float32) * 0.1
    a_raw = np.einsum("rkf,rkg->rfg", q, q).astype(np.float32)
    diag = rng.uniform(1.0, 3.0, r).astype(np.float32)
    a_reg = a_raw + diag[:, None, None] * np.eye(f, dtype=np.float32)
    b = rng.standard_normal((r, f)).astype(np.float32)
    x0 = np.zeros((r, f), np.float32)
    ref = np.asarray(ps.solve_cg_pallas(jnp.asarray(a_reg),
                                        jnp.asarray(b), jnp.asarray(x0)))
    got = np.asarray(ps.solve_cg_pallas(jnp.asarray(a_raw),
                                        jnp.asarray(b), jnp.asarray(x0),
                                        diag=jnp.asarray(diag)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_kernel_vmem_sizing_under_scoped_limit():
    """Block sizing must keep every compilable (width, f, dtype) combo
    under the 16 MB Mosaic scoped-vmem limit (with headroom for the
    out-block buffers the model folds into its 3x-G factor). Regression
    for the width-240/f32 compile-time OOM that killed every CLI F-sweep
    run: f32 G at rb 32 compiled to a 16.31 MB stack."""
    from cumf_als_tpu.ops.tiling import make_width_grid
    widths = set(make_width_grid(16, 1 << 18, octave_points=8))
    widths |= set(make_width_grid(16, 1 << 18, octave_points=4))
    for f in (128, 256):
        for gi in (2, 4):
            for w in sorted(widths):
                pb = ps._p_block(w, f, gi)
                assert w % pb == 0, (w, f, gi, pb)
                # lane-legal: full width or a multiple of 128
                assert pb == w or pb % 128 == 0, (w, f, gi, pb)
                if pb == w and w % 128 and \
                        8 * ps._per_row_bytes(pb, f, gi) > \
                        ps._VMEM_BUDGET:
                    # wrapper pads the contraction axis (_maybe_pad_p)
                    w = -(-w // 128) * 128
                    pb = ps._p_block(w, f, gi)
                rb = ps._row_block(w, f, gi)
                assert rb * ps._per_row_bytes(pb, f, gi) <= \
                    ps._VMEM_BUDGET, (w, f, gi, pb, rb)
                # the empirical exact fit must stay under the 16 MB
                # hardware scoped-vmem limit with slack
                fit = (5.8 + 0.8 * gi) * pb * f + 254 * 1024 * \
                    (f * f) / (128 * 128)
                assert rb * fit <= 15.2 * 2 ** 20, (w, f, gi, pb, rb)
    # the measured OOM shapes must now fit with margin
    assert ps._row_block(240, 128, 4) <= 16
    assert ps._row_block(16, 128, 2) <= 32
    assert ps._p_block(1920, 128, 2) <= 640
    # and the hot Netflix theta shape keeps its proven block size
    assert ps._p_block(224, 128, 2) == 224
    assert ps._row_block(224, 128, 2) == 32


def test_cg_solver_vmem_sizing():
    """solve_cg_pallas block sizing, pinned by two hardware-measured
    points at f=128: bf16 A at rb=64 runs (~13 MB scoped, the production
    Netflix configuration) while f32 A at rb=64 OOM'd at 17.40 MB — the
    f32 case must therefore size down, the bf16 case must not."""
    assert ps._cg_row_block(128, 2) == 64
    assert ps._cg_row_block(128, 4) <= 32
    for f in (128, 256):
        for it in (2, 4):
            rb = ps._cg_row_block(f, it)
            assert rb >= 8
            assert rb * ps._cg_per_row_bytes(f, it) <= ps._VMEM_BUDGET
            # the measured-fit footprint stays under the 16 MB limit
            fit = (2 * it + 8.7) * f * f
            assert rb * fit <= 15.5 * 2 ** 20, (f, it, rb)


def test_vmem_oom_backoff():
    """The runtime backoff recognizes only Mosaic scoped-VMEM compile
    errors, shrinks the sizing budget monotonically down to a floor,
    and leaves any other exception alone."""
    start = ps._VMEM_BUDGET
    try:
        oom = RuntimeError(
            "INTERNAL: ... Ran out of memory in memory space vmem while "
            "allocating on stack for %fused_gram_cg ... Scoped "
            "allocation with size 16.42M and limit 16.00M ...")
        assert ps.vmem_oom_backoff(oom)
        assert ps._VMEM_BUDGET == start - (2 << 20)
        assert not ps.vmem_oom_backoff(ValueError("unrelated"))
        assert ps._VMEM_BUDGET == start - (2 << 20)
        # remote-compile toolchains surface compile OOMs as opaque
        # HTTP 500s from the compile helper — treated as possible OOMs
        opaque = RuntimeError(
            "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1")
        assert ps.vmem_oom_backoff(opaque)
        assert ps._VMEM_BUDGET == start - (4 << 20)
        # drains to the floor, then reports unrecoverable
        while ps.vmem_oom_backoff(oom):
            pass
        assert ps._VMEM_BUDGET >= (9 << 20)

        # call_with_vmem_backoff retries until the call stops raising
        calls = []

        def flaky():
            calls.append(ps._VMEM_BUDGET)
            if len(calls) < 2:
                raise RuntimeError("Ran out of memory in memory space "
                                   "vmem while allocating on stack")
            return "ok"

        ps._VMEM_BUDGET = start
        assert ps.call_with_vmem_backoff(flaky) == "ok"
        assert len(calls) == 2 and calls[1] < calls[0]
    finally:
        ps._VMEM_BUDGET = start


def test_cg_matvec_impl_parity():
    """The MXU batched-matvec CG variant must produce the same iterates
    as the VPU lane-reduction default (same math, different unit)."""
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.standard_normal((8, 16, 128)).astype(np.float32))
    vals = jnp.asarray(rng.uniform(1, 5, (8, 16)).astype(np.float32))
    nnz = jnp.asarray(rng.randint(1, 16, 8).astype(np.int32))
    x0 = jnp.zeros((8, 128), jnp.float32)
    ref, se_ref = ps.fused_gram_cg(g, vals, nnz, x0, 0.05)
    got, se_got = ps.fused_gram_cg(g, vals, nnz, x0, 0.05,
                                   matvec_impl="mxu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(se_got), np.asarray(se_ref),
                               rtol=1e-4, atol=1e-4)

    a = jnp.asarray(np.einsum("rpf,rpg->rfg", np.asarray(g),
                              np.asarray(g)) +
                    np.eye(128, dtype=np.float32) * 5.0)
    b = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    z = jnp.zeros((8, 128), jnp.float32)
    r1 = np.asarray(ps.solve_cg_pallas(a, b, z))
    r2 = np.asarray(ps.solve_cg_pallas(a, b, z, matvec_impl="mxu"))
    np.testing.assert_allclose(r2, r1, rtol=2e-5, atol=2e-5)


def test_backoff_opaque_retry_and_pallas_gate():
    """r3 hardening (VERDICT r2 #8 + ADVICE): an opaque remote-compile
    failure is retried ONCE at the unchanged budget before it starts
    consuming backoff steps, and dispatches without pallas kernels
    re-raise immediately instead of burning three recompiles."""
    start = ps._VMEM_BUDGET
    opaque_msg = ("INTERNAL: http://127.0.0.1:8083/remote_compile: "
                  "HTTP 500: tpu_compile_helper subprocess exit code 1")
    try:
        # transient flake: fails once opaquely, then succeeds — the
        # budget must be untouched afterwards
        calls = []

        def flaky_opaque():
            calls.append(ps._VMEM_BUDGET)
            if len(calls) < 2:
                raise RuntimeError(opaque_msg)
            return "ok"

        assert ps.call_with_vmem_backoff(flaky_opaque) == "ok"
        assert len(calls) == 2
        assert ps._VMEM_BUDGET == start

        # deterministic opaque failure: retry-once, then bounded budget
        # steps, then the original error surfaces
        n_calls = [0]

        def always_opaque():
            n_calls[0] += 1
            raise RuntimeError(opaque_msg)

        import pytest
        with pytest.raises(RuntimeError, match="tpu_compile_helper"):
            ps.call_with_vmem_backoff(always_opaque)
        assert ps._VMEM_BUDGET == (9 << 20)  # drained to the floor
        ps._VMEM_BUDGET = start

        # non-pallas dispatch: the same opaque error re-raises at once
        n_calls = [0]

        def opaque_xla():
            n_calls[0] += 1
            raise RuntimeError(opaque_msg)

        with pytest.raises(RuntimeError, match="tpu_compile_helper"):
            ps.call_with_vmem_backoff(opaque_xla, uses_pallas=False)
        assert n_calls[0] == 1
        assert ps._VMEM_BUDGET == start
    finally:
        ps._VMEM_BUDGET = start
