"""Coupled-model tests.

Mirrors the reference's test_coupled.C strategy (src/tests/
test_coupled.C: analytic vs numerical Jacobian of the full coupled
system via testEntries, applyMatrix consistency, synchronization,
coupled solve) and test_oceanatmos.C (2-model coupling).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.models.atmosphere import Atmosphere
from iemic_tpu.models.seaice import SeaIce
from iemic_tpu.models.coupled import CoupledModel

N, M, L = 6, 6, 4
BOUNDS = {"Global Bound xmin": 286.0, "Global Bound xmax": 350.0,
          "Global Bound ymin": 10.0, "Global Bound ymax": 74.0}


def make_coupled(use_seaice=True, comb=0.3):
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": N, "Global Grid-Size m": M,
        "Global Grid-Size l": L, **BOUNDS,
        "Coupled Temperature": 1, "Coupled Salinity": 1,
        "Restoring Salinity Profile": 0,
        "Starting Parameters": {"Combined Forcing": comb,
                                "Salinity Forcing": 0.1,
                                "Solar Forcing": 0.5,
                                "Wind Forcing": 1.0,
                                "Temperature Forcing": 1.0},
    }})
    atmos = Atmosphere({"Global Grid-Size n": N, "Global Grid-Size m": M,
                        **BOUNDS, "Combined Forcing": comb})
    seaice = SeaIce({"Global Grid-Size n": N, "Global Grid-Size m": M,
                     **BOUNDS, "Combined Forcing": comb}) \
        if use_seaice else None
    # CPU-parity fixture solvers (the reference tests likewise pin
    # per-fixture solver configs); the production BGS+Mixed ocean path
    # is exercised by the 2dmoc/golden production tests
    ocean.solver_params.set("Preconditioning", "Columns")
    ocean.solver_params.set("Precision", "Double")
    ocean.solver_params.set("FGMRES tolerance", 1e-8)
    ocean._build_jitted()
    cpld = CoupledModel(ocean, atmos, seaice,
                        params={"Use sea ice": use_seaice},
                        solver_params={"FGMRES tolerance": 1e-10,
                                       "FGMRES iterations": 300})
    return cpld


def _project_ocean(xo, ocean):
    """Dirichlet velocity rows (see tests/test_ocean_core.py)."""
    m, n = ocean.grid.m, ocean.grid.n
    xo = xo.at[0:2, :, m - 1, :].set(0.0)
    if not ocean.grid.periodic:
        xo = xo.at[0:2, :, :, n - 1].set(0.0)
    return xo


def _random_state(cpld, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    parts = []
    for mdl, shape in zip(cpld.models, cpld._shapes):
        z = jnp.asarray(scale * rng.standard_normal(shape))
        if type(mdl).__name__ == "Ocean":
            z = _project_ocean(z, mdl)
        parts.append(z)
    return cpld.join(parts)


def _coupled_F(cpld, x):
    cpld.set_state(x)
    cpld.compute_rhs()
    return cpld.get_rhs()


@pytest.mark.parametrize("use_seaice", [False, True])
def test_fd_coupled_jacobian(use_seaice):
    """Full coupled Jacobian (incl. autodiff coupling blocks) vs FD of
    the synchronized coupled residual (testEntries pattern,
    TestDefinitions.H:72-100)."""
    cpld = make_coupled(use_seaice=use_seaice)
    x = _random_state(cpld, seed=1)
    cpld.set_state(x)
    cpld.compute_jacobian()

    rng = np.random.default_rng(2)
    eps = 1e-6
    for t in range(2):
        parts = []
        for mdl, shape in zip(cpld.models, cpld._shapes):
            z = jnp.asarray(rng.standard_normal(shape))
            if type(mdl).__name__ == "Ocean":
                z = _project_ocean(z, mdl)
            parts.append(z)
        v = cpld.join(parts)
        cpld.set_state(x)
        cpld.compute_jacobian()
        jv = cpld.apply_matrix(v)
        fp = _coupled_F(cpld, x + eps * v)
        fm = _coupled_F(cpld, x - eps * v)
        fd = (fp - fm) / (2 * eps)
        err = float(jnp.linalg.norm(jv - fd)
                    / (1 + jnp.linalg.norm(jv)))
        assert err < 5e-5, f"coupled FD mismatch {err}"


def test_coupling_blocks_nonzero():
    """Off-diagonal coupling must actually do something."""
    cpld = make_coupled(use_seaice=True)
    x = _random_state(cpld, seed=3)
    cpld.set_state(x)
    cpld.compute_jacobian()
    parts = cpld.split(x)
    # atmosphere temperature perturbation must reach the ocean rows
    va = jnp.zeros_like(parts[1]).at[:].set(1.0)
    c_oa = cpld.coupling_apply(0, 1, va)
    assert float(jnp.linalg.norm(c_oa)) > 1e-10
    # ocean SST perturbation must reach the atmosphere rows
    vo = jnp.zeros_like(parts[0]).at[4, L - 1].set(1.0)
    c_ao = cpld.coupling_apply(1, 0, vo)
    assert float(jnp.linalg.norm(c_ao)) > 1e-10


def test_coupled_solve():
    """Coupled FGMRES with block-GS preconditioning solves J x = b at
    the uncoupled-forcing base state (the physically relevant regime:
    the reference's coupled runs always start from spun-up states)."""
    cpld = make_coupled(use_seaice=True, comb=0.0)
    x = cpld.get_state() * 0.0
    cpld.set_state(x)
    cpld.compute_jacobian()
    w = _random_state(cpld, seed=6, scale=1.0)
    b = cpld.apply_matrix(w)    # consistent rhs
    cpld.fgmres_tol = 1e-7
    cpld.fgmres_iters = 350
    sol = cpld.solve(b)
    r = cpld.apply_matrix(sol) - b
    relres = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert relres < 1e-5, f"coupled solve relres {relres}"


def test_coupled_newton():
    """Newton equilibrates the coupled system at COMB = 0 (mainly the
    sea-ice background fluxes)."""
    cpld = make_coupled(use_seaice=True, comb=0.0)
    cpld.fgmres_tol = 1e-7
    cpld.fgmres_iters = 350
    x = cpld.get_state() * 0.0
    cpld.set_state(x)
    for it in range(15):
        cpld.compute_rhs()
        nrm = float(jnp.linalg.norm(cpld.get_rhs()))
        if nrm < 1e-8:
            break
        cpld.compute_jacobian()
        dx = cpld.solve(-cpld.get_rhs())
        cpld.set_state(cpld.get_state() + dx)
    cpld.compute_rhs()
    assert float(jnp.linalg.norm(cpld.get_rhs())) < 1e-6


@pytest.mark.slow
def test_coupled_continuation():
    """Two Combined-Forcing continuation steps of the full coupled
    system — the reference's coupled continuation test pattern
    (src/tests/intt_coupled.C:372-400 with
    test/coupled/continuation_params.xml: 'maximum number of steps' 2,
    state tangent scaling 1e-3, Newton tol 1e-5), run from the
    COMB = 0 equilibrium (the sea-ice background-flux balance that
    test_coupled_newton verifies).  Every layer is exercised: sync,
    coupled Jacobian, coupling-block jvps, block-GS preconditioner
    with each submodel's own preconditioner, bordered corrector,
    Seydel step control.

    Near COMB = 0 the coupled Jacobian carries a genuinely
    near-singular salinity-overturning mode (smallest sv ~1e-4..1e-7
    measured by dense SVD), so dstate/dpar is huge and the arclength
    steps are state-dominated — the reference's own test therefore
    only asserts that two steps complete (status 0), not a parameter
    displacement, and so does this one."""
    from iemic_tpu.continuation import Continuation
    cpld = make_coupled(use_seaice=True, comb=0.0)
    cpld.fgmres_tol = 1e-7
    cpld.fgmres_iters = 350
    x = cpld.get_state() * 0.0
    cpld.set_state(x)
    # spinup: plain Newton onto the COMB=0 equilibrium (the role of
    # the reference's spun-up fixture states)
    for it in range(15):
        cpld.compute_rhs()
        if float(jnp.linalg.norm(cpld.get_rhs())) < 1e-8:
            break
        cpld.compute_jacobian()
        cpld.set_state(cpld.get_state() + cpld.solve(-cpld.get_rhs()))
    cpld.compute_rhs()
    assert float(jnp.linalg.norm(cpld.get_rhs())) < 1e-6

    cont = Continuation(cpld, {
        "continuation parameter": "Combined Forcing",
        "initial step size": 1.0e-2,
        "minimum step size": 1.0e-8,
        "maximum step size": 1.0e-1,
        "destination 0": 1.0,
        "maximum number of steps": 2,
        "Newton tolerance": 1.0e-5,
        "destination tolerance": 1.0e-7,
        "maximum Newton iterations": 5,
        "state tangent scaling": 1.0e-3,
        "normalize strategy": "N",
        "predictor bound": 3000.0,
    })
    result = cont.run()
    assert result.status == 0
    assert result.steps == 2


def test_coupled_EP_and_seaice_correction():
    """Coupled conservation integrals (src/tests/test_integrals.C:131-168):
    at a coupled equilibrium (a) the E-P budget closes over the ocean
    area, and (b) the ocean's salinity integral correction equals the
    sea-ice auxiliary gamma."""
    cpld = make_coupled(use_seaice=True, comb=0.0)
    cpld.fgmres_tol = 1e-7
    cpld.fgmres_iters = 350
    cpld.set_state(cpld.get_state() * 0.0)
    for it in range(15):
        cpld.compute_rhs()
        if float(jnp.linalg.norm(cpld.get_rhs())) < 1e-10:
            break
        cpld.compute_jacobian()
        dx = cpld.solve(-cpld.get_rhs())
        cpld.set_state(cpld.get_state() + dx)
    cpld.compute_rhs()
    assert float(jnp.linalg.norm(cpld.get_rhs())) < 1e-7

    atmos, ocean, seaice = cpld.atmos, cpld.ocean, cpld.seaice
    # (a) integrate E - P over the ocean area with the atmosphere's
    # own precipitation integral coefficients (atmos->getPIntCoeff)
    E = np.asarray(atmos.get_evaporation())
    P = np.asarray(atmos.get_precipitation())
    dA = np.asarray(atmos.p_coeff)
    I = float(np.sum((E - P) * dA))
    scale = max(float(np.sum(np.abs(E) * dA)), 1e-30)
    assert abs(I) < 1e-7 * max(scale, 1.0), (I, scale)

    # (b) ocean salinity correction == sea-ice gamma
    scorr = ocean.get_s_corr()
    gamma = float(seaice.get_gamma())
    assert abs(scorr - gamma) < 1e-8 + 1e-6 * abs(gamma), \
        (scorr, gamma)
