"""Eigensolver tests (reference src/tests/test_jdqz.C: eigenvalues of
atmosphere / ocean against expectations).  Here cross-checked against
dense generalized eigensolves (scipy.linalg.eig).
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg

from iemic_tpu.solvers.eigen import JDQZ


class LinearToyModel:
    """dx/dt B = J x with known J, B (mirrors the fake-model test
    strategy of test_ams.C)."""

    def __init__(self, Jdiag, Bdiag):
        self.Jd = jnp.asarray(Jdiag)
        self.Bd = jnp.asarray(Bdiag)
        self.state = jnp.zeros_like(self.Jd)
        self.shift = 0.0

    def get_state(self, mode='C'):
        return self.state

    def compute_jacobian(self):
        self.shift = 0.0

    def compute_mass_matrix(self):
        pass

    def add_mass_to_jacobian(self, scale):
        self.shift += scale

    def apply_mass_matrix(self, v):
        return self.Bd * v

    def solve(self, b):
        return b / (self.Jd + self.shift * self.Bd)


def test_toy_generalized_eigenvalues():
    """Diagonal pencil with an infinite eigenvalue (B has a zero)."""
    J = np.array([-2.0, -1.0, -0.5, 3.0, 1.0])
    B = np.array([1.0, 1.0, 1.0, 1.0, 0.0])   # last eigenvalue infinite
    model = LinearToyModel(J, B)
    solver = JDQZ(model, {"Number of eigenvalues": 3,
                          "Shift (real part)": 0.0,
                          "Tolerance": 1e-10})
    solver.solve()
    lams = sorted(solver.eigenvalues.real, key=abs)
    assert abs(lams[0] - (-0.5)) < 1e-8
    assert abs(lams[1] - (-1.0)) < 1e-8


def test_atmosphere_eigenvalues_match_dense():
    """Leading (nearest-zero) generalized eigenvalues of the
    atmosphere pencil vs a dense solve."""
    from iemic_tpu.models.atmosphere import Atmosphere
    atm = Atmosphere({"Global Grid-Size n": 6, "Global Grid-Size m": 6})
    atm.set_par("Combined Forcing", 0.2)
    atm.idealized(0.0)
    # converge to steady state
    for _ in range(15):
        atm.compute_rhs()
        if float(jnp.linalg.norm(atm.rhs)) < 1e-11:
            break
        atm.compute_jacobian()
        atm.set_state(atm.state + atm.solve(-atm.rhs))

    # dense reference
    atm.compute_jacobian()
    atm.compute_mass_matrix()
    N = atm.dim
    eye = np.eye(N)
    A = np.column_stack([np.asarray(atm.apply_matrix(jnp.asarray(e)))
                         for e in eye])
    B = np.diag(np.asarray(atm.diagB))
    w = scipy.linalg.eig(A, B, right=False)
    finite = w[np.isfinite(w)]
    finite = finite[np.abs(finite) < 1e8]
    dense_sorted = finite[np.argsort(np.abs(finite))]

    solver = JDQZ(atm, {"Number of eigenvalues": 4,
                        "Tolerance": 1e-8})
    solver.solve()
    mine = solver.eigenvalues[np.argsort(np.abs(solver.eigenvalues))]
    for k in range(3):
        d = np.min(np.abs(dense_sorted - mine[k]))
        assert d < 1e-6 * max(1.0, abs(mine[k])), \
            f"eigenvalue {mine[k]} not found in dense set"


def test_ocean_eigenvalues_match_dense():
    """Generalized eigenvalues of the ocean pencil (J, B) on a tiny
    grid vs dense (the stability information used for bifurcation
    detection)."""
    from iemic_tpu.models.ocean import Ocean
    from iemic_tpu.ops.stencil import stencil_to_dense, to_flat
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 4, "Global Grid-Size m": 4,
        "Global Grid-Size l": 3,
        "Starting Parameters": {"Combined Forcing": 0.2,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0}}},
        solver_params={"FGMRES tolerance": 1e-12,
                       "FGMRES iterations": 300})
    ocean.compute_rhs()
    ocean.compute_jacobian()
    ocean.compute_mass_matrix()

    A = stencil_to_dense(np.asarray(ocean.jac), periodic=False)
    B = np.diag(np.asarray(to_flat(ocean.diagB)))
    w = scipy.linalg.eig(A, B, right=False)
    finite = w[np.isfinite(w)]
    finite = finite[np.abs(finite) < 1e8]
    dense_sorted = finite[np.argsort(np.abs(finite))]

    solver = JDQZ(ocean, {"Number of eigenvalues": 3,
                          "Tolerance": 1e-7})
    solver.solve()
    mine = solver.eigenvalues[np.argsort(np.abs(solver.eigenvalues))]
    for k in range(2):
        d = np.min(np.abs(dense_sorted - mine[k]))
        assert d < 1e-4 * max(1.0, abs(mine[k])), \
            f"ocean eigenvalue {mine[k]} mismatch (min dist {d})"
