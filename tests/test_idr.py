"""IDR(s) solver tests (reference src/idrsolver/IDRSolverDecl.H and
src/tests — the reference exercises IDR as an alternative templated
Krylov solver on model operators)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.solvers.idr import idr_host


def _make_system(n, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 4.0 + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    xex = rng.standard_normal(n)
    return A, xex, A @ xex


def test_idr_converges():
    A, xex, b = _make_system(120)
    res = idr_host(lambda v: jnp.asarray(A) @ v, b, s=4, tol=1e-10,
                   maxiter=300)
    assert res.converged
    assert np.linalg.norm(np.asarray(res.x) - xex) <= 1e-7 * \
        np.linalg.norm(xex)


def test_idr_preconditioned():
    A, xex, b = _make_system(120, seed=5)
    Dinv = 1.0 / np.diag(A)
    res = idr_host(lambda v: jnp.asarray(A) @ v, b, s=2,
                   prec=lambda v: jnp.asarray(Dinv) * v,
                   tol=1e-10, maxiter=300)
    assert res.converged
    assert np.linalg.norm(np.asarray(res.x) - xex) <= 1e-7 * \
        np.linalg.norm(xex)


def test_idr_vs_residual_definition():
    """relres reported must match the true residual."""
    A, xex, b = _make_system(80, seed=9)
    res = idr_host(lambda v: jnp.asarray(A) @ v, b, s=4, tol=1e-8,
                   maxiter=200, smoothing=False)
    r = b - A @ np.asarray(res.x)
    assert abs(np.linalg.norm(r) / np.linalg.norm(b) - res.relres) < 1e-6
