"""Transient / rare-event algorithm tests with a toy double-well model.

Mirrors the reference's test_ams.C (src/tests/test_ams.C:17-460): a
2-dof model dx/dt = x - x^3, dy/dt = -2y with identity stochastic
forcing; AMS/TAMS converge to known mean-first-passage times /
transition probabilities, and all restart paths work.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.transient import (ThetaModel, StochasticThetaModel,
                                 Newton, Transient, AdaptiveTransient,
                                 transient_factory)
from iemic_tpu.transient.factory import get_time_step


class _IdentityForcing:
    n_noise = 2

    def __call__(self, pert):
        return pert


class DoubleWellModel:
    """2-dof toy model (test_ams.C:17-125): F = (x - x^3, -2y),
    identity solve, unit mass diag."""

    def __init__(self):
        self.state = jnp.zeros(2)
        self.rhs = jnp.zeros(2)
        self.sol = jnp.zeros(2)
        self.diagB = jnp.ones(2)
        self.jac_diag = jnp.ones(2)

    def compute_rhs(self):
        x, y = self.state[0], self.state[1]
        self.rhs = jnp.stack([x - x ** 3, -2.0 * y])

    def compute_jacobian(self):
        x = self.state[0]
        self.jac_diag = jnp.stack([1.0 - 3.0 * x ** 2,
                                   jnp.asarray(-2.0)])

    def compute_mass_matrix(self):
        pass

    def add_mass_to_jacobian(self, scale):
        self.jac_diag = self.jac_diag + scale * self.diagB

    def apply_mass_matrix(self, v):
        return v

    def solve(self, b):
        self.sol = b / self.jac_diag
        return self.sol

    def get_state(self, mode='C'):
        return self.state

    def set_state(self, x):
        self.state = x

    def get_rhs(self, mode='C'):
        return self.rhs

    def get_solution(self, mode='C'):
        return self.sol

    def compute_stochastic_forcing(self):
        return _IdentityForcing()

    def pre_process(self):
        pass

    def post_process(self):
        pass

    def write_data(self, describe=False):
        return ""


SOL1 = jnp.asarray([-1.0, 0.0])
SOL2 = jnp.asarray([1.0, 0.0])
SOL3 = jnp.asarray([0.0, 0.0])


def default_params(**over):
    p = {
        "theta": 0.0,
        "sigma": 1.0,
        "seed": 5,
        "random seed": 2,
        "time step": 0.01,
        "maximum time": 2.0,
        "B distance": 0.05,
        "number of experiments": 20,
        "maximum iterations": 10,
    }
    p.update(over)
    return p


def make_double_well(params, fast=True):
    """Build the rare-event method on the double well.  With
    fast=True a plain-numpy Euler-Maruyama step replaces the
    jitted theta/Newton stack (the algorithm under test is
    Transient itself; the theta/Newton path is covered separately)."""
    if not fast:
        return transient_factory(DoubleWellModel(), params,
                                 sol1=SOL1, sol2=SOL2, sol3=SOL3)

    from iemic_tpu.transient.transient import Transient
    from iemic_tpu.transient.score import default_score_function

    sigma = params.get("sigma", 1.0)
    rng = np.random.default_rng(params.get("seed", 5))
    s1, s2, s3 = (np.asarray(SOL1), np.asarray(SOL2), np.asarray(SOL3))

    def step(x, dt):
        x = np.asarray(x)
        F = np.array([x[0] - x[0] ** 3, -2.0 * x[1]])
        return x + dt * F + sigma * np.sqrt(dt) * rng.standard_normal(2)

    score = default_score_function(s1, s2, s3)
    tr = Transient(time_step=step, dist_fun=score, x0=s1,
                   vector_length=2)
    tr.set_parameters(params)
    tr.set_random_engine(params.get("random seed", 2))
    return tr


def test_explicit_euler_step():
    """theta = 0 reduces to explicit Euler on du/dt = F(u)."""
    model = ThetaModel(DoubleWellModel(), {"theta": 0.0})
    step = get_time_step(model, {"theta": 0.0})
    x0 = jnp.asarray([0.5, 0.3])
    x1 = step(x0, 0.01)
    expected = x0 + 0.01 * jnp.stack(
        [x0[0] - x0[0] ** 3, -2.0 * x0[1]])
    assert np.allclose(np.asarray(x1), np.asarray(expected))


def test_implicit_theta_step_decays_to_well():
    """theta = 1 implicit Euler converges to the stable fixed point."""
    model = ThetaModel(DoubleWellModel(), {"theta": 1.0})
    step = get_time_step(model, {"theta": 1.0,
                                 "Newton tolerance": 1e-10})
    x = jnp.asarray([0.5, 0.4])
    for _ in range(200):
        x = step(x, 0.1)
    assert abs(float(x[0]) - 1.0) < 1e-6
    assert abs(float(x[1])) < 1e-6


def test_ams_mfpt():
    """AMS on the double well produces an MFPT in the reference's
    expected range (test_ams.C:258-266)."""
    ams = make_double_well(default_params(method="AMS",
                                          **{"maximum iterations": 10000}))
    ams.run()
    mfpt = ams.get_mfpt()
    assert 3 < mfpt < 40, f"MFPT {mfpt} out of expected range"


def test_tams_probability():
    tams = make_double_well(default_params(
        method="TAMS", **{"maximum iterations": 10000}))
    tams.run()
    p = tams.get_probability()
    assert 0.0 < p < 1.0


def test_gpa_runs():
    gpa = make_double_well(default_params(
        method="GPA",
        **{"number of experiments": 10, "GPA time step": 0.5,
           "maximum time": 1.0}))
    gpa.run()
    assert gpa.get_probability() >= 0.0


def test_factory_path_smoke():
    """Short run through the full StochasticThetaModel + Newton +
    Transient factory wiring (TransientFactory.H path)."""
    tr = make_double_well(default_params(
        method="Naive",
        **{"number of experiments": 2, "maximum time": 0.1}),
        fast=False)
    tr.run()
    assert tr.get_probability() >= 0.0


def test_ams_restart(tmp_path):
    """Restart paths (test_ams.C:180-264): run with maxit=10 writing a
    restart file, then continue from it to convergence."""
    wfile = str(tmp_path / "out_data.npz")
    params = default_params(method="AMS")
    params["write file"] = wfile
    params["write final state"] = True
    ams = make_double_well(params)
    ams.run()
    assert os.path.exists(wfile)
    its_first = ams.its

    params2 = default_params(method="AMS")
    params2["read file"] = wfile
    params2["maximum iterations"] = 10000
    ams2 = make_double_well(params2)
    ams2.run()
    # restart continued beyond the first run's iterations
    assert ams2.its >= its_first
    mfpt = ams2.get_mfpt()
    if mfpt > 0:
        assert 3 < mfpt < 40
    else:
        assert abs(ams2.get_probability() - 0.157) < 0.5


def test_adaptive_transient():
    """Deterministic adaptive theta stepping relaxes to the well."""
    model = ThetaModel(DoubleWellModel(), {"theta": 1.0})
    model.set_state(jnp.asarray([0.4, 0.2]))
    stepper = AdaptiveTransient(model, {
        "theta": 1.0,
        "adaptive time steps": True,
        "number of time steps": 50,
        "maximum time": 1e8,
        "time step (in y)": 0.2,
        "Newton tolerance": 1e-10,
        "HDF5 output frequency": 0,
    })
    status = stepper.run()
    assert status == 0
    x = model.get_state()
    # y decays as exp(-2t); after ~1.6 model time units with implicit
    # damping it is well below its initial value 0.2
    assert abs(float(x[1])) < 0.05
