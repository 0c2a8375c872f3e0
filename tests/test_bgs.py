"""Block Gauss-Seidel (De Niet-Wubs) preconditioner tests."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.solvers.fgmres import _fgmres_flat

from test_continuation_2dmoc import make_2dmoc_ocean


def test_bgs_beats_columns_on_2dmoc():
    """On the 2DMOC Newton system the physics-based sweep should need
    no more outer FGMRES iterations than plain column-block Jacobi."""
    ocean = make_2dmoc_ocean(n=3, m=6, l=6)
    ocean.set_par("Combined Forcing", 0.1)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    An = ocean.jac
    sh = ocean.state.shape
    b = (-ocean.rhs).reshape(-1)
    nullq = ocean._get_deflator()

    def mv(v):
        return ocean._apply_impl(An, v.reshape(sh)).reshape(-1)

    from iemic_tpu.solvers.preconditioner import (build_column_blocks,
                                                  apply_column_prec)
    Binv = build_column_blocks(An)

    def pc_col(v):
        z = apply_column_prec(Binv, v.reshape(sh)).reshape(-1)
        return z - nullq @ (nullq.T @ z) if nullq is not None else z

    prec = bgs.build(An, ocean.landm, periodic=True)

    def pc_bgs(v):
        z = bgs.apply(prec, v.reshape(sh), periodic=True).reshape(-1)
        return z - nullq @ (nullq.T @ z) if nullq is not None else z

    r_col = _fgmres_flat(mv, pc_col, b, jnp.zeros_like(b),
                         jnp.asarray(1e-8), 300)
    r_bgs = _fgmres_flat(mv, pc_bgs, b, jnp.zeros_like(b),
                         jnp.asarray(1e-8), 300)
    assert bool(r_bgs.converged)
    assert int(r_bgs.iters) <= int(r_col.iters)


def test_bgs_through_ocean_solve():
    """Preconditioning='BGS' end to end through Ocean.solve."""
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 4, "Global Grid-Size m": 4,
        "Global Grid-Size l": 3,
        "Starting Parameters": {"Combined Forcing": 0.1,
                                "Temperature Forcing": 10.0}}},
        solver_params={"Preconditioning": "BGS",
                       "FGMRES tolerance": 1e-8,
                       "FGMRES iterations": 300,
                       "Precision": "Double"})
    ocean.compute_rhs()
    ocean.compute_jacobian()
    x = ocean.solve(-ocean.rhs)
    res = ocean.apply_matrix(x) + ocean.rhs
    assert float(jnp.linalg.norm(res)) < 1e-7 * max(
        1.0, float(jnp.linalg.norm(ocean.rhs)))


def test_column_tridiag_solve_gauges_deficient_rows():
    """The vertical hydrostatic/continuity solves must stay bounded in
    the presence of dummy rows and 1e-10 diagonal stubs."""
    rng = np.random.default_rng(0)
    l, m, n = 6, 3, 3
    diag = jnp.asarray(np.full((1, 1, l, m, n), -6.0))
    up = jnp.asarray(np.full((1, 1, l, m, n), 6.0))
    down = jnp.zeros((1, 1, l, m, n))
    # surface row: 1e-10 stub like the assembly produces
    diag = diag.at[0, 0, l - 1].set(1e-10)
    up = up.at[0, 0, l - 1].set(0.0)
    b = jnp.asarray(rng.standard_normal((1, l, m, n)))
    x = bgs._column_tridiag_solve(diag, down, up, b)
    assert float(jnp.abs(x).max()) < 1e3
    # gauged row -> zero solution there
    np.testing.assert_allclose(np.asarray(x[0, l - 1]), 0.0, atol=1e-12)


def test_bgs_permutations_and_symmetric():
    """All three sweep orderings (TRIOS_BlockPreconditioner.H:93-99)
    and the symmetric-GS SolveUpper correction give convergent
    preconditioners on the 2DMOC Newton system."""
    ocean = make_2dmoc_ocean(n=3, m=6, l=6)
    ocean.set_par("Combined Forcing", 0.1)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    An = ocean.jac
    sh = ocean.state.shape
    b = (-ocean.rhs).reshape(-1)
    nullq = ocean._get_deflator()

    def mv(v):
        return ocean._apply_impl(An, v.reshape(sh)).reshape(-1)

    prec = bgs.build(An, ocean.landm, periodic=True)
    results = {}
    for perm, sym in [(1, False), (2, False), (3, False), (1, True)]:
        def pc(v, perm=perm, sym=sym):
            z = bgs.apply(prec, v.reshape(sh), periodic=True,
                          permutation=perm, symmetric=sym).reshape(-1)
            return z - nullq @ (nullq.T @ z) if nullq is not None else z
        res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b),
                           jnp.asarray(1e-8), 300)
        results[(perm, sym)] = (bool(res.converged), int(res.iters))
        assert bool(res.converged), f"perm={perm} sym={sym} diverged"
    # every ordering must be in the same effort ballpark as M1
    base = results[(1, False)][1]
    for key, (_, iters) in results.items():
        assert iters <= 4 * base + 20, f"{key}: {iters} vs {base}"


def test_bgs_rhomu_transform():
    """rho-mu orthogonal transform of the TS block (setup_rhomu,
    TRIOS_BlockPreconditioner.C:1376-1419): on a convectively-
    adjusting state (Mixing=1, P_VC != 0) the transformed sweep is a
    convergent preconditioner and its ATS subsolve does not degrade
    the outer effort relative to the untransformed sweep."""
    ocean = make_2dmoc_ocean(n=3, m=6, l=6)
    ocean.set_par("Combined Forcing", 0.5)
    ocean.set_par("P_VC", 6.37)        # convective adjustment on
    ocean.compute_rhs()
    ocean.compute_jacobian()
    An = ocean.jac
    sh = ocean.state.shape
    b = (-ocean.rhs).reshape(-1)
    nullq = ocean._get_deflator()

    def mv(v):
        return ocean._apply_impl(An, v.reshape(sh)).reshape(-1)

    # Q is an involution: Q @ Q = I
    prec_rm = bgs.build(An, ocean.landm, periodic=True, rhomu=True)
    Q = np.asarray(prec_rm.Qts)
    np.testing.assert_allclose(Q @ Q, np.eye(2), atol=1e-12)
    # the transformed stencil really is the sandwich Q A_TS Q
    sub = np.asarray(An)[:, 4:6, 4:6]
    want = np.einsum('ab,pbckji,cd->padkji', Q, sub, Q)
    np.testing.assert_allclose(np.asarray(prec_rm.ts_rm), want,
                               atol=1e-12 * max(np.abs(want).max(), 1.0))

    prec = bgs.build(An, ocean.landm, periodic=True)
    iters = {}
    for name, p in [("plain", prec), ("rhomu", prec_rm)]:
        def pc(v, p=p):
            z = bgs.apply(p, v.reshape(sh), periodic=True).reshape(-1)
            return z - nullq @ (nullq.T @ z) if nullq is not None else z
        res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b),
                           jnp.asarray(1e-8), 300)
        assert bool(res.converged), f"{name} diverged"
        iters[name] = int(res.iters)
    assert iters["rhomu"] <= iters["plain"] + 10, iters
