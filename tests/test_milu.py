"""Tests for the native C++ multilevel ILU (the MRILU analog,
reference mrilu/precon + src/mrilucpp) and the SolverFactory."""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.ops.stencil import (stencil_to_csr, stencil_to_dense,
                                   to_flat, from_flat)
from iemic_tpu.solvers.fgmres import fgmres_host


@pytest.fixture(scope="module")
def small_jac():
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 6, "Global Grid-Size m": 6,
        "Global Grid-Size l": 4, "Periodic": False,
        "Starting Parameters": {"Combined Forcing": 0.0,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0},
    }})
    rng = np.random.default_rng(5)
    ocean.set_state(jnp.asarray(0.01 * rng.standard_normal(
        ocean.state.shape)))
    ocean.compute_jacobian()
    return ocean


def test_csr_matches_dense(small_jac):
    An = np.asarray(small_jac.jac)
    data, indices, indptr = stencil_to_csr(An, periodic=False)
    dense = stencil_to_dense(An, periodic=False)
    ndim = dense.shape[0]
    rebuilt = np.zeros_like(dense)
    for i in range(ndim):
        for p in range(indptr[i], indptr[i + 1]):
            rebuilt[i, indices[p]] += data[p]
    assert np.allclose(rebuilt, dense)


def test_csr_matches_matvec_periodic():
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 6, "Global Grid-Size m": 6,
        "Global Grid-Size l": 3, "Periodic": True,
        "Starting Parameters": {"Combined Forcing": 0.0,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0},
    }})
    ocean.compute_jacobian()
    An = np.asarray(ocean.jac)
    data, indices, indptr = stencil_to_csr(An, periodic=True)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(ocean.state.size)
    y_csr = np.zeros_like(v)
    for i in range(len(v)):
        for p in range(indptr[i], indptr[i + 1]):
            y_csr[i] += data[p] * v[indices[p]]
    from iemic_tpu.ops.stencil import apply_stencil
    vf = from_flat(jnp.asarray(v), 3, 6, 6)
    y_st = np.asarray(to_flat(apply_stencil(ocean.jac, vf,
                                            periodic=True)))
    assert np.allclose(y_csr, y_st, atol=1e-11)


def test_milu_exact_when_no_dropping(small_jac):
    """droptol=0 makes the multilevel elimination exact: M^-1 b
    reproduces the direct solution.  The raw THCM Jacobian is singular
    (pressure null modes), which would pollute an exactness check
    through the regularized bottom pivots, so test on the shifted
    matrix J + 10 I — the same stencil structure, nonsingular."""
    from iemic_tpu.native import milu
    An = np.asarray(small_jac.jac).copy()
    for a in range(6):
        An[4, a, a] += 10.0
    data, indices, indptr = stencil_to_csr(An, periodic=False)
    fac = milu.factor(data, indices, indptr, droptol=0.0)
    dense = stencil_to_dense(An, periodic=False)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(dense.shape[0])
    b = dense @ x_true
    x = fac.solve(b)
    r = dense @ x - b
    assert np.linalg.norm(r) < 1e-8 * max(np.linalg.norm(b), 1.0)


def test_milu_preconditions_fgmres(small_jac):
    """With dropping, MILU is approximate but slashes FGMRES work."""
    from iemic_tpu.native import milu
    ocean = small_jac
    An = np.asarray(ocean.jac)
    data, indices, indptr = stencil_to_csr(An, periodic=False)
    fac = milu.factor(data, indices, indptr, droptol=1e-4)
    assert fac.levels >= 1

    shape = ocean.state.shape
    rng = np.random.default_rng(2)
    xt = jnp.asarray(rng.standard_normal(shape))
    b = np.asarray(to_flat(ocean.apply_matrix(xt)))

    def mv(v):
        vf = from_flat(jnp.asarray(np.asarray(v)), 4, 6, 6)
        return np.asarray(to_flat(ocean.apply_matrix(vf)))

    def pc(v):
        return fac.solve(np.asarray(v))

    _, plain = fgmres_host(mv, b, tol=1e-8, maxiter=150)
    _, prec = fgmres_host(mv, b, prec=pc, tol=1e-8, maxiter=150)
    assert float(prec.relres) < 1e-7
    assert int(prec.iters) < int(plain.iters)


def test_factory_dispatch(small_jac):
    from iemic_tpu.solvers.factory import (make_preconditioner,
                                           make_krylov,
                                           spectrum_analysis)
    ocean = small_jac
    cfg = ocean.cfg
    for method in ("None", "Columns", "BGS", "MILU"):
        build, apply = make_preconditioner(
            {"Method": method}, landm=np.asarray(ocean.landm),
            periodic=False, grid_shape=(cfg.l, cfg.m, cfg.n))
        fac = build(ocean.jac)
        rng = np.random.default_rng(3)
        r = jnp.asarray(rng.standard_normal(ocean.state.shape))
        z = apply(fac, r)
        assert np.shape(z) == np.shape(r)
        assert np.isfinite(np.asarray(z)).all()

    solve = make_krylov({"Method": "FGMRES", "Tolerance": 1e-6,
                         "Max iterations": 50})
    b = jnp.asarray(np.random.default_rng(4).standard_normal(8))
    x, res = solve(lambda v: 2.0 * v, b)
    assert np.allclose(np.asarray(x), np.asarray(b) / 2.0)

    ritz = spectrum_analysis(
        lambda v: 3.0 * v, lambda v: v / 3.0, 16, nsample=8)
    assert np.allclose(ritz.real, 1.0, atol=1e-8)


def test_milu_cmk_ordering_equivalent(small_jac):
    """The CMK pre-ordering (mrilu/precon preprocessing analog) is a
    symmetric permutation: with droptol=0 the preconditioner stays an
    exact solve, CMK on or off."""
    from iemic_tpu.native import milu
    An = np.asarray(small_jac.jac).copy()
    for a in range(6):
        An[4, a, a] += 10.0
    data, indices, indptr = stencil_to_csr(An, periodic=False)
    dense = stencil_to_dense(An, periodic=False)
    rng = np.random.default_rng(3)
    b = dense @ rng.standard_normal(dense.shape[0])
    for use_cmk in (False, True):
        fac = milu.MILU(data, indices, indptr, droptol=0.0,
                        use_cmk=use_cmk)
        x = fac.solve(b)
        assert np.linalg.norm(dense @ x - b) < 1e-8 * np.linalg.norm(b)


def test_milu_native_gmres_driver(small_jac):
    """The native restarted-GMRES driver (mrilu/precon/gmres.F90
    analog) converges on the shifted Jacobian using the factorization
    as right preconditioner."""
    from iemic_tpu.native import milu
    An = np.asarray(small_jac.jac).copy()
    for a in range(6):
        An[4, a, a] += 10.0
    data, indices, indptr = stencil_to_csr(An, periodic=False)
    dense = stencil_to_dense(An, periodic=False)
    rng = np.random.default_rng(4)
    x_true = rng.standard_normal(dense.shape[0])
    b = dense @ x_true
    fac = milu.MILU(data, indices, indptr, droptol=1e-3)
    x, iters, relres = fac.gmres(b, tol=1e-10, maxiter=300)
    assert relres < 1e-9
    assert iters < 300
    assert np.linalg.norm(x - x_true) < 1e-6 * np.linalg.norm(x_true)
