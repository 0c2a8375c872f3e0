"""Theta-method time stepping as a Model transform.

Re-implements the reference's ThetaModel / StochasticThetaModel
decorators (src/transient/ThetaModel.H:9-165,
src/transient/StochasticThetaModel.H:11-84): wrap any Model's
RHS/Jacobian into the implicit theta-stepping residual

    M u_n + dt*theta*F(u_{n+1}) + dt*(1-theta)*F(u_n) - M u_{n+1} = 0

with Jacobian J - M/(theta dt) and scaled solve J2 x = b/(theta dt).

Composition (not inheritance): the wrapper holds the inner model and
forwards the Model contract, exactly like the reference's template
inheritance does behaviorally.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import logging as log


class ThetaModel:
    def __init__(self, model, params: dict | None = None):
        params = params or {}
        self.model = model
        self.theta = params.get("theta", 1.0)
        self.timestep = 1.0e-3
        self.old_state = model.get_state()
        self.old_rhs = None
        self.rhs = None
        self.sol = None

    # -- stepping ------------------------------------------------------
    def init_step(self, timestep: float) -> None:
        """Freeze u_n and F(u_n) for the coming implicit solve
        (ThetaModel.H:64-74)."""
        self.timestep = timestep
        self.old_state = self.model.get_state()
        self.model.pre_process()
        self.model.compute_rhs()
        self.old_rhs = self.model.get_rhs()

    # -- Model contract ------------------------------------------------
    def set_state(self, x) -> None:
        self.model.set_state(x)

    def get_state(self, mode: str = 'C'):
        return self.model.get_state(mode)

    def get_rhs(self, mode: str = 'C'):
        return self.rhs

    def get_solution(self, mode: str = 'C'):
        return self.sol

    def set_par(self, name, value):
        # toy/test models (the double-well of test_ams.C) need not
        # implement the parameter interface; the 'Time' broadcast for
        # seasonal forcing is then simply a no-op
        if hasattr(self.model, "set_par"):
            self.model.set_par(name, value)

    def get_par(self, name):
        return self.model.get_par(name)

    def compute_rhs(self) -> None:
        """Theta residual (ThetaModel.H:87-113)."""
        if not (0.0 <= self.theta <= 1.0):
            log.WARNING(f"ThetaModel: incorrect theta {self.theta}")
        self.model.compute_rhs()
        self.model.compute_mass_matrix()
        xdot = self.old_state - self.model.get_state()
        Bxdot = self.model.apply_mass_matrix(xdot)
        self.rhs = (self.timestep * self.theta * self.model.get_rhs()
                    + self.timestep * (1.0 - self.theta) * self.old_rhs
                    + Bxdot)

    def compute_jacobian(self) -> None:
        """J2 = J - M/(theta dt) via the model's mass-diagonal hook
        (ThetaModel.H:118-146)."""
        self.model.compute_jacobian()
        if self.theta == 0.0:
            return
        self.model.compute_mass_matrix()
        self.model.add_mass_to_jacobian(
            -1.0 / self.timestep / self.theta)

    def compute_mass_matrix(self) -> None:
        self.model.compute_mass_matrix()

    def apply_matrix(self, v):
        return self.model.apply_matrix(v)

    def apply_mass_matrix(self, v):
        return self.model.apply_mass_matrix(v)

    def solve(self, b):
        """J2 x = b/(theta dt) (ThetaModel.H:150-164)."""
        if self.theta == 0.0:
            self.model.compute_mass_matrix()
            M = self.model.diagB
            self.sol = -b / jnp.where(M != 0.0, M, 1.0)
            return self.sol
        self.sol = self.model.solve(b / self.timestep / self.theta)
        return self.sol

    def pre_process(self):
        self.model.pre_process()

    def post_process(self):
        self.model.post_process()

    def monitor(self):
        return self.model.monitor()

    def write_data(self, describe: bool = False):
        return self.model.write_data(describe)

    @property
    def solve_iters(self):
        return getattr(self.model, "solve_iters", 0)


class StochasticThetaModel(ThetaModel):
    """Adds G dW noise to the theta residual
    (StochasticThetaModel.H:11-84).  The inner model must provide
    ``compute_stochastic_forcing() -> callable(pert) -> field`` mapping
    a surface-noise vector to a state-shaped forcing (the analog of the
    Fortran ``stochastic_forcing`` matrix B, forcing.F90:220-265)."""

    def __init__(self, model, params: dict | None = None):
        super().__init__(model, params)
        params = params or {}
        self.sigma = params.get("sigma", 1.0)
        seed = params.get("seed", 0)
        self.rng = np.random.default_rng(seed)
        self.apply_noise = model.compute_stochastic_forcing()
        self.G = None

    def init_step(self, timestep: float) -> None:
        super().init_step(timestep)
        pert = self.rng.standard_normal(self.apply_noise.n_noise)
        self.G = (self.apply_noise(jnp.asarray(pert))
                  * np.sqrt(self.timestep) * self.sigma)

    def compute_rhs(self) -> None:
        super().compute_rhs()
        self.rhs = self.rhs + self.G
