"""Ocean core correctness tests.

Mirrors the reference test strategy (SURVEY §4 / src/tests/test_ocean.C
and the NumericalJacobian ``testEntries`` pattern of
TestDefinitions.H:72-100): trivial-state RHS, analytic-vs-FD Jacobian
on tiny grids, mass matrix contents.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iemic_tpu.config import ParameterList
from iemic_tpu.models.ocean import Ocean


def make_ocean(n=4, m=4, l=4, periodic=False, coriolis=1, sres=1,
               forcing_type=0, topo=1, **thcm_extra):
    thcm = {
        "Global Grid-Size n": n,
        "Global Grid-Size m": m,
        "Global Grid-Size l": l,
        "Periodic": periodic,
        "Global Bound xmin": 286.0,
        "Global Bound xmax": 350.0,
        "Global Bound ymin": 10.0,
        "Global Bound ymax": 74.0,
        "Coriolis Force": coriolis,
        "Restoring Salinity Profile": sres,
        "Forcing Type": forcing_type,
        "Topography": topo,
    }
    thcm.update(thcm_extra)
    return Ocean({"THCM": thcm})


def test_trivial_state_rhs_zero():
    """RHS(0) with zero forcing parameters vanishes
    (test_ocean.C:33-41)."""
    ocean = make_ocean()
    ocean.compute_rhs()
    nrm = float(jnp.linalg.norm(ocean.rhs))
    assert nrm < 1e-12


def test_rhs_zero_state_with_forcing_is_forcing_only():
    """With combined forcing on, F(0) = -Frc (sign convention of
    THCM.C:1000-1003)."""
    ocean = make_ocean()
    ocean.set_par("Combined Forcing", 1.0)
    ocean.set_par("Temperature Forcing", 10.0)
    ocean.set_par("Wind Forcing", 1.0)
    ocean.compute_rhs()
    nrm = float(jnp.linalg.norm(ocean.rhs))
    assert nrm > 1e-3  # nontrivial forcing


def _project(z, ocean):
    """Project a state onto the manifold of physically reachable states:
    u, v vanish on their Dirichlet boundary rows (northern wall, and the
    eastern wall for non-periodic domains) and on land points.  The
    reference's velocity boundary handling (usol, usrc.F90:1029-1102)
    zeroes the ghost copies of these points, so analytic-Jacobian ==
    d(rhs)/dx only holds on this subspace — converged states always lie
    in it (the boundary rows are identity rows with zero rhs)."""
    m = ocean.grid.m
    z = z.at[0:2, :, m - 1, :].set(0.0)
    if not ocean.grid.periodic:
        z = z.at[0:2, :, :, ocean.grid.n - 1].set(0.0)
    l, n = ocean.grid.l, ocean.grid.n
    land = ocean.landm[1:l + 1, 1:m + 1, 1:n + 1] != 0
    # zero all variables on non-ocean cells (identity rows there)
    z = jnp.where(jnp.asarray(land)[None], 0.0, z)
    # u/v velocity points adjacent to land are also Dirichlet
    import numpy as _np
    Lp = _np.zeros((l, m + 1, n + 1), dtype=bool)
    Lp[:, :m, :n] = land
    if ocean.grid.periodic:
        # the east cell of the seam velocity point wraps to column 0
        Lp[:, :m, n] = land[:, :, 0]
    uvzero = (Lp[:, :m, :n] | Lp[:, 1:, :n] | Lp[:, :m, 1:]
              | Lp[:, 1:, 1:])
    z = z.at[0:2].set(jnp.where(jnp.asarray(uvzero)[None], 0.0, z[0:2]))
    return z


def _fd_check(ocean, seed=0, eps=1e-6, tol=2e-5):
    """Analytic Jacobian action vs central finite differences of the
    residual, on a random state and random directions."""
    rng = np.random.default_rng(seed)
    shape = ocean.state.shape
    x = _project(jnp.asarray(0.1 * rng.standard_normal(shape)), ocean)
    ocean.set_state(x)
    ocean.compute_jacobian()

    def F(xx):
        return ocean._rhs_fn(xx, ocean.par, ocean.fields, ocean.cpl,
                             ocean.int_correction)

    for _ in range(3):
        v = _project(jnp.asarray(rng.standard_normal(shape)), ocean)
        jv = ocean.apply_matrix(v)
        fd = (F(x + eps * v) - F(x - eps * v)) / (2 * eps)
        err = float(jnp.linalg.norm(jv - fd) / (1 + jnp.linalg.norm(jv)))
        assert err < tol, f"FD mismatch: {err}"


def test_fd_jacobian_linear_regime():
    """Linear-only physics: the Jacobian is exactly the RHS operator."""
    ocean = make_ocean()
    _fd_check(ocean)


def test_fd_jacobian_full_nonlinear():
    """All nonlinear terms active: advection (Rossby number), nonlinear
    EOS, full forcing."""
    ocean = make_ocean()
    ocean.set_par("Combined Forcing", 0.5)
    ocean.set_par("Temperature Forcing", 10.0)
    ocean.set_par("Salinity Forcing", 1.0)
    ocean.set_par("Wind Forcing", 1.0)
    ocean.set_par("NLES", 0.3)
    # Rossby number nonzero -> momentum advection active
    assert ocean.get_par("Rossby-Number") > 0
    _fd_check(ocean, seed=1)


def test_fd_jacobian_periodic():
    ocean = make_ocean(periodic=True, n=6)
    ocean.set_par("Combined Forcing", 0.3)
    ocean.set_par("Temperature Forcing", 5.0)
    ocean.set_par("NLES", 0.2)
    _fd_check(ocean, seed=2)


def test_fd_jacobian_with_landmask():
    """Random coastal land mask exercise of boundary.F90 logic."""
    from iemic_tpu.models.ocean import landmask as lmk
    ocean = make_ocean(n=6, m=6, l=4)
    # carve some land columns + a shelf
    landm = ocean.landm.copy()
    landm[1:, 1:3, 1:3] = 1          # land block (all depths)
    landm[1:3, 4:6, 4:6] = 1         # bottom topography
    grid = ocean.grid
    landm = lmk.finalize_mask(landm, grid, periodic=False)
    ocean.set_land_mask(landm, finalized=True)
    ocean.set_par("Combined Forcing", 0.5)
    ocean.set_par("Temperature Forcing", 10.0)
    ocean.set_par("NLES", 0.2)
    _fd_check(ocean, seed=3)


def test_fd_jacobian_nonrestoring_salinity():
    """sres = 0: integral condition row replaces an S equation."""
    ocean = make_ocean(sres=0)
    ocean.set_par("Combined Forcing", 0.4)
    ocean.set_par("Salinity Forcing", 1.0)
    _fd_check(ocean, seed=4)


def test_mass_matrix_contents():
    """B diagonal: -Ro for u,v; 0 for w,p; -1 for T,S on ocean cells
    (assemble.F90:18-54)."""
    ocean = make_ocean()
    ocean.compute_mass_matrix()
    B = np.asarray(ocean.diagB)
    Ro = ocean.get_par("Rossby-Number")
    # interior cell away from east/north walls
    assert np.isclose(B[0, 1, 1, 1], -Ro)
    assert np.isclose(B[1, 1, 1, 1], -Ro)
    assert B[2, 1, 1, 1] == 0.0
    assert B[3, 1, 1, 1] == 0.0
    assert B[4, 1, 1, 1] == -1.0
    assert B[5, 1, 1, 1] == -1.0


def test_newton_converges_to_trivial_solution():
    """From a small random state with zero forcing, Newton should
    converge to x = 0 (the unique steady state of the linear problem)."""
    ocean = make_ocean()
    rng = np.random.default_rng(5)
    x = jnp.asarray(1e-3 * rng.standard_normal(ocean.state.shape))
    ocean.set_state(x)
    for it in range(10):
        ocean.compute_rhs()
        nrm = float(jnp.linalg.norm(ocean.rhs))
        if nrm < 1e-10:
            break
        ocean.compute_jacobian()
        dx = ocean.solve(-ocean.rhs)
        ocean.set_state(ocean.state + dx)
    ocean.compute_rhs()
    assert float(jnp.linalg.norm(ocean.rhs)) < 1e-9
