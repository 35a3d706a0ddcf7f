"""Regression: cg_tol must reach the pallas CG solve as a static Python
float. The VMEM-resident CG kernel bakes cg_tol into the compiled kernel
(ops/pallas_solve.py::solve_cg_pallas does float(cg_tol)), so every jit
between the config and that call must declare cg_tol static. Round-3
full-scale sweep runs at F<=120 crashed with ConcretizationTypeError in
models/als._solve_slice_aug because its jit traced cg_tol (the CPU test
suite never caught it: cg_solve_available() is False off-TPU, so the
pallas route was gated off). Here we force the route open with a stub
that enforces the float contract."""

import jax.numpy as jnp
import numpy as np
import pytest

import cumf_als_tpu.ops.pallas_solve as ps
from cumf_als_tpu.models.als import _solve_slice, _solve_slice_aug


def _stub_solve_cg_pallas(a, b, x0, cg_iters=6, cg_tol=1e-4, diag=None,
                          matvec_impl="vpu", aug=False):
    # same static contract as the real kernel: concretize cg_tol/cg_iters
    cg_tol = float(cg_tol)
    cg_iters = int(cg_iters)
    f = a.shape[-1]
    af = a.astype(jnp.float32)
    if aug:
        lane = jnp.arange(f)
        b = af[:, f - 1, :] * (lane < f - 1)
        keep = (lane < f - 1).astype(jnp.float32)
        af = af * keep[None, :, None] * keep[None, None, :]
    if diag is not None:
        af = af + diag.astype(jnp.float32)[:, None, None] * \
            jnp.eye(f, dtype=jnp.float32)
    from cumf_als_tpu.ops.solve import solve_cg
    return solve_cg(af, b, x0, cg_iters=cg_iters, cg_tol=cg_tol)


@pytest.fixture
def forced_pallas_route(monkeypatch):
    monkeypatch.setattr(ps, "cg_solve_available", lambda: True)
    monkeypatch.setattr(ps, "solve_cg_pallas", _stub_solve_cg_pallas)


def _problem(rng, r, f, aug):
    g = rng.standard_normal((r, 4, f)).astype(np.float32)
    if aug:
        g[:, :, f - 1] = 0.0
    a = np.einsum("rpf,rpg->rfg", g, g).astype(np.float32)
    if aug:
        vals = rng.standard_normal((r, 4)).astype(np.float32)
        b = np.einsum("rp,rpf->rf", vals, g)
        a[:, f - 1, :f - 1] = b[:, :f - 1]
        a[:, :f - 1, f - 1] = b[:, :f - 1]
    x0 = np.zeros((r, f), np.float32)
    nnz = np.full((r,), 4, np.int32)
    return a, x0, nnz


def test_solve_slice_aug_cg_tol_is_static(forced_pallas_route):
    rng = np.random.default_rng(7)
    r, f = 24, 128  # unusual batch so this test gets a fresh trace
    a, x0, nnz = _problem(rng, r, f, aug=True)
    out = _solve_slice_aug(jnp.asarray(a), jnp.asarray(x0),
                           jnp.asarray(nnz), jnp.asarray(0, jnp.int32),
                           0.05, r, "cg", 6, 1e-4, backend="pallas")
    assert np.isfinite(np.asarray(out)).all()
    # the augmented lane must stay zero in the solution
    assert np.abs(np.asarray(out)[:, f - 1]).max() == 0.0


def test_solve_slice_cg_tol_is_static(forced_pallas_route):
    rng = np.random.default_rng(8)
    r, f = 24, 128
    a, x0, nnz = _problem(rng, r, f, aug=False)
    b = rng.standard_normal((r, f)).astype(np.float32)
    out = _solve_slice(jnp.asarray(a), jnp.asarray(b), jnp.asarray(x0),
                       jnp.asarray(nnz), jnp.asarray(0, jnp.int32),
                       0.05, r, "cg", 6, 1e-4, backend="pallas")
    assert np.isfinite(np.asarray(out)).all()
