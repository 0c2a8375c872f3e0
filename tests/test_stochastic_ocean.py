"""Ocean stochastic forcing + rare-event methods on the real ocean.

Mirrors the reference's stochastic stack on the flagship model: the
stochastic forcing matrix (forcing.F90:220-268, THCM.C:836-935), the
StochasticThetaModel G dW noise, and an AMS run via run_ams's wiring
(src/main/run_ams.C:25-100) on a tiny 2DMOC configuration.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.transient import transient_factory
from iemic_tpu.transient.theta import StochasticThetaModel

from tests.test_continuation_2dmoc import make_2dmoc_ocean


def _noisy_ocean(n=3, m=4, l=4):
    ocean = make_2dmoc_ocean(n=n, m=m, l=l)
    ocean.set_par("Combined Forcing", 1.0)
    ocean.set_par("Salinity Forcing", 0.1)
    return ocean


def test_stochastic_forcing_structure():
    """B maps one noise value per latitude to surface S rows, weighted
    by the freshwater-flux forcing (forcing.F90:238-249)."""
    ocean = _noisy_ocean()
    apply = ocean.compute_stochastic_forcing()
    m = ocean.grid.m
    assert apply.n_noise == m

    pert = jnp.asarray(np.random.default_rng(0).standard_normal(m))
    G = np.asarray(apply(pert))
    # only surface S rows are forced
    assert np.abs(G).max() > 0.0
    mask = np.zeros_like(G, dtype=bool)
    mask[5, ocean.grid.l - 1] = True
    assert np.abs(G[~mask]).max() == 0.0
    # the integral-condition row is excluded (THCM.C:856-858)
    assert G[5, ocean.grid.l - 1, ocean.cfg.mic, ocean.cfg.nic] == 0.0
    # linearity in the noise
    G2 = np.asarray(apply(2.0 * pert))
    assert np.allclose(G2, 2.0 * G)


def test_stochastic_theta_step_on_ocean():
    """One stochastic implicit Euler step on the real ocean converges
    and feels the noise (StochasticThetaModel.H:52-84)."""
    ocean = _noisy_ocean()
    theta = StochasticThetaModel(ocean, {"sigma": 10.0, "seed": 1,
                                         "theta": 1.0})
    from iemic_tpu.transient.newton import Newton
    newton = Newton(theta, {"maximum Newton iterations": 20})
    x0 = jnp.zeros_like(ocean.state)
    theta.set_state(x0)
    theta.init_step(0.1)
    assert float(jnp.max(jnp.abs(theta.G))) > 0.0
    x1 = newton.run(x0)
    theta.set_state(x1)
    theta.compute_rhs()
    assert float(jnp.linalg.norm(theta.rhs)) < 1e-6


def test_ams_runs_on_ocean():
    """run_ams's wiring completes on a 2DMOC ocean: AMS between the
    trivial state and a forced perturbation, few experiments."""
    ocean = _noisy_ocean()
    # state A: converge the deterministic steady state at these pars
    from iemic_tpu.transient.newton import Newton as ModelNewton
    from iemic_tpu.transient.theta import ThetaModel
    ocean.compute_rhs()
    solA = jnp.zeros_like(ocean.state)
    # cheap quasi-steady state: a few Newton steps on F(x) = 0
    for _ in range(5):
        ocean.set_state(solA)
        ocean.compute_rhs()
        ocean.compute_jacobian()
        dx = ocean.solve(-ocean.rhs)
        solA = solA + dx
        if float(jnp.linalg.norm(ocean.rhs)) < 1e-10:
            break
    # state B: artificial displaced target (AMS only needs a score
    # geometry, not true bistability, to exercise the machinery)
    rng = np.random.default_rng(3)
    solB = solA + 0.5 * jnp.asarray(
        rng.standard_normal(solA.shape)) * (jnp.abs(solA) + 0.1)

    pars = {
        "method": "AMS",
        "sigma": 20.0,
        "theta": 1.0,
        "time step": 0.05,
        "maximum time": 2.0,
        "number of experiments": 3,
        "number of initial experiments": 3,
        "maximum iterations": 4,
        "A distance": 0.2,
        "B distance": 0.8,   # converged when score > 0.2
        "score function": "ocean",
        "maximum Newton iterations": 20,
        "random seed": 7,
        "write final state": False,
    }
    tr = transient_factory(ocean, pars, sol1=solA, sol2=solB)
    status = tr.run()
    assert status == 0
    assert np.isfinite(tr.get_mfpt())
    assert tr.time_steps > 0
