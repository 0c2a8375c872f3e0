"""Sea-ice model tests (reference src/tests/test_seaice.C:14-281):
RHS consistency, analytic-vs-FD Jacobian, solve, Newton convergence.
"""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.models.seaice import SeaIce


def make_seaice(n=8, m=8, **extra):
    pars = {"Global Grid-Size n": n, "Global Grid-Size m": m}
    pars.update(extra)
    ice = SeaIce(pars)
    rng = np.random.default_rng(42)
    ice.set_ocean_fields(0.5 * rng.standard_normal((m, n)),
                         0.5 * rng.standard_normal((m, n)))
    ice.set_atmosphere_fields(0.5 * rng.standard_normal((m, n)),
                              0.5 * rng.standard_normal((m, n)),
                              0.1 * rng.standard_normal((m, n)),
                              1e-8 * rng.standard_normal((m, n)))
    return ice


def _fd_check(ice, seed=0, eps=1e-7, tol=1e-6):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(0.1 * rng.standard_normal(ice.dim))
    ice.set_state(x)
    ice.compute_jacobian()

    def F(xx):
        return ice._rhs_fn(xx, ice.par, *ice._ext())

    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(ice.dim))
        jv = ice.apply_matrix(v)
        fd = (F(x + eps * v) - F(x - eps * v)) / (2 * eps)
        err = float(jnp.linalg.norm(jv - fd)
                    / (1 + jnp.linalg.norm(jv)))
        assert err < tol, f"FD mismatch {err}"


def test_fd_jacobian():
    ice = make_seaice()
    ice.set_par("Combined Forcing", 0.5)
    ice.set_par("Latent Heat Forcing", 1.0)
    _fd_check(ice)


def test_solve_is_exact():
    """The direct solve must invert the Jacobian to machine precision
    (test_seaice.C solve test)."""
    ice = make_seaice()
    ice.set_par("Combined Forcing", 0.3)
    rng = np.random.default_rng(1)
    ice.set_state(jnp.asarray(0.1 * rng.standard_normal(ice.dim)))
    ice.compute_jacobian()
    b = jnp.asarray(rng.standard_normal(ice.dim))
    x = ice.solve(b)
    r = ice.apply_matrix(x) - b
    assert float(jnp.linalg.norm(r)) < 1e-10 * float(jnp.linalg.norm(b))


def test_newton_converges():
    """Newton from zero state (test_seaice.C Newton test).  The model
    is linear except the mask switch, so few iterations suffice."""
    ice = make_seaice()
    ice.set_par("Combined Forcing", 0.2)
    for it in range(30):
        ice.compute_rhs()
        if float(jnp.linalg.norm(ice.rhs)) < 1e-10:
            break
        ice.compute_jacobian()
        ice.set_state(ice.state - ice.solve(ice.rhs))
    ice.compute_rhs()
    assert float(jnp.linalg.norm(ice.rhs)) < 1e-8
    # mask values are between 0 and 1
    f, _ = ice.split(ice.state)
    M = np.asarray(f[2])
    assert (M > -1e-8).all() and (M < 1 + 1e-8).all()


def test_mass_matrix():
    ice = make_seaice()
    ice.compute_mass_matrix()
    B, BG = ice.split(ice.diagB)
    massH = ice.rhoi * ice.Lf * ice.udim / ice.zeta / ice.r0dim
    assert np.allclose(np.asarray(B[0]), massH)
    assert float(jnp.sum(jnp.abs(B[1:]))) == 0.0
    assert float(BG) == 0.0


def test_gamma_balances_flux_integral():
    """At a converged state, gamma equals the area-averaged sea-ice
    flux difference (the auxiliary integral equation,
    SeaIce.C:440-459)."""
    ice = make_seaice()
    ice.set_par("Combined Forcing", 0.4)
    for _ in range(30):
        ice.compute_rhs()
        if float(jnp.linalg.norm(ice.rhs)) < 1e-11:
            break
        ice.compute_jacobian()
        ice.set_state(ice.state - ice.solve(ice.rhs))
    G = float(ice.get_gamma())
    # recompute the integral by hand
    f, _ = ice.split(ice.state)
    ice.compute_rhs()
    rhs_G = float(ice.rhs[-1])
    assert abs(rhs_G) < 1e-9
