"""Atmosphere model tests, mirroring the reference's test_atmos.C
strategy: small RHS at the trivial state with zero forcing, analytic
vs FD Jacobian on random states, mass matrix contents, Newton
convergence, evaporation/precipitation field behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.atmosphere import Atmosphere


def make_atmos(n=8, m=8, periodic=False, **extra):
    pars = {
        "Global Grid-Size n": n,
        "Global Grid-Size m": m,
        "Periodic": periodic,
    }
    pars.update(extra)
    return Atmosphere(pars)


def test_trivial_rhs_small():
    """Zero state, zero forcing: small RHS (test_atmos.C:57-68)."""
    atm = make_atmos()
    atm.set_par("Combined Forcing", 0.0)
    atm.compute_rhs()
    assert float(jnp.linalg.norm(atm.rhs)) < 1e-4


def _fd_check(atm, seed=0, eps=1e-7, tol=5e-5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(0.1 * rng.standard_normal(atm.dim))
    atm.set_state(x)
    atm.compute_jacobian()

    def F(xx):
        return atm._rhs_fn(xx, atm.par, atm.sst, atm.sit, atm.msi,
                           atm.Ooa, atm.Os)

    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(atm.dim))
        jv = atm.apply_matrix(v)
        fd = (F(x + eps * v) - F(x - eps * v)) / (2 * eps)
        err = float(jnp.linalg.norm(jv - fd)
                    / (1 + jnp.linalg.norm(jv)))
        assert err < tol, f"FD mismatch {err}"


def test_fd_jacobian_uncoupled():
    atm = make_atmos()
    atm.set_par("Combined Forcing", 0.5)
    _fd_check(atm)


def test_fd_jacobian_with_land_and_ice():
    rng = np.random.default_rng(1)
    mask = (rng.uniform(size=(8, 8)) < 0.3).astype(np.int32)
    atm = Atmosphere({"Global Grid-Size n": 8, "Global Grid-Size m": 8},
                     surfmask=mask)
    atm.set_par("Combined Forcing", 0.7)
    atm.set_ocean_temperature(jnp.asarray(rng.standard_normal((8, 8))))
    atm.set_seaice_temperature(jnp.asarray(rng.standard_normal((8, 8))))
    atm.set_seaice_mask(jnp.asarray(
        (rng.uniform(size=(8, 8)) < 0.2).astype(np.float64)))
    _fd_check(atm, seed=2)


def test_fd_jacobian_periodic():
    atm = make_atmos(periodic=True)
    atm.set_par("Combined Forcing", 0.4)
    _fd_check(atm, seed=3)


def test_mass_matrix():
    atm = make_atmos()
    atm.compute_mass_matrix()
    B = np.asarray(atm.diagB)
    # T rows: Ai, q rows: 1, albedo rows: 1 (AtmosLocal.C:758-780)
    assert np.isclose(B[0], atm.Ai)
    assert B[1] == 1.0
    assert B[2] == 1.0
    # auxiliary P row and integral-condition row: 0
    assert B[-1] == 0.0


def test_newton_converges():
    """Newton iteration on the standalone atmosphere converges from the
    idealized state (test_atmos.C Newton test)."""
    atm = make_atmos()
    atm.set_par("Combined Forcing", 0.2)
    atm.idealized(0.0)
    for it in range(20):
        atm.compute_rhs()
        nrm = float(jnp.linalg.norm(atm.rhs))
        if nrm < 1e-10:
            break
        atm.compute_jacobian()
        dx = atm.solve(-atm.rhs)
        atm.set_state(atm.state + dx)
    atm.compute_rhs()
    assert float(jnp.linalg.norm(atm.rhs)) < 1e-8


def test_evaporation_precipitation_balance():
    """At a converged state with the integral condition, the area
    integrals of E and P balance (reference test_integrals pattern)."""
    atm = make_atmos()
    atm.set_par("Combined Forcing", 0.3)
    atm.idealized(0.0)
    for _ in range(15):
        atm.compute_rhs()
        if float(jnp.linalg.norm(atm.rhs)) < 1e-11:
            break
        atm.compute_jacobian()
        atm.set_state(atm.state + atm.solve(-atm.rhs))
    E = atm.get_evaporation()
    P = atm.get_precipitation()
    pc = jnp.asarray(atm.p_coeff)
    intE = float(jnp.sum(pc * E))
    intP = float(jnp.sum(pc * P))
    assert abs(intE - intP) / (abs(intE) + 1e-12) < 1e-6
