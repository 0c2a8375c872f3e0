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


class DenseToyModel:
    """Dense real pencil with complex eigenvalue pairs."""

    def __init__(self, J, B):
        self.J = np.asarray(J, float)
        self.Bd = jnp.asarray(np.asarray(B, float))
        self.state = jnp.zeros(self.J.shape[0])
        self.shift = 0.0

    def get_state(self, mode='C'):
        return self.state

    def compute_jacobian(self):
        self.shift = 0.0

    def compute_mass_matrix(self):
        pass

    def add_mass_to_jacobian(self, scale):
        self.shift += scale

    def _mat(self):
        return self.J + self.shift * np.diag(np.asarray(self.Bd))

    def apply_matrix(self, v):
        return jnp.asarray(self._mat() @ np.asarray(v))

    def apply_mass_matrix(self, v):
        return self.Bd * v

    def solve(self, b):
        return jnp.asarray(np.linalg.solve(self._mat(), np.asarray(b)))


def _rotation_block(mu, om):
    return np.array([[mu, om], [-om, mu]])


def test_complex_shift_finds_oscillatory_pair():
    """A complex shift targets the oscillatory mode nearest to it —
    the JDQZ capability used for Hopf detection (JDQZInterface.H with
    ComplexVector pairs).  Pencil eigenvalues: -0.1 +/- 2i,
    -1 +/- 0.5i, -3, -4."""
    J = scipy.linalg.block_diag(_rotation_block(-0.1, 2.0),
                                _rotation_block(-1.0, 0.5),
                                np.diag([-3.0, -4.0]))
    B = np.ones(6)
    model = DenseToyModel(J, B)
    solver = JDQZ(model, {"Number of eigenvalues": 2,
                          "Shift (real part)": 0.0,
                          "Shift (imaginary part)": 2.0,
                          "Tolerance": 1e-9})
    solver.solve()
    lams = solver.eigenvalues
    best = lams[np.argmin(np.abs(lams - (-0.1 + 2j)))]
    assert abs(best - (-0.1 + 2j)) < 1e-7


def test_complex_shift_on_atmosphere():
    """Complex-shifted solve on a real model (preconditioned 2N real
    embedding): eigenvalues near the shift match the dense pencil."""
    from iemic_tpu.models.atmosphere import Atmosphere
    atm = Atmosphere({"Global Grid-Size n": 5, "Global Grid-Size m": 5})
    atm.set_par("Combined Forcing", 0.2)
    atm.idealized(0.0)
    for _ in range(12):
        atm.compute_rhs()
        if float(jnp.linalg.norm(atm.rhs)) < 1e-11:
            break
        atm.compute_jacobian()
        atm.set_state(atm.state + atm.solve(-atm.rhs))

    atm.compute_jacobian()
    atm.compute_mass_matrix()
    N = atm.dim
    eye = np.eye(N)
    A = np.column_stack([np.asarray(atm.apply_matrix(jnp.asarray(e)))
                         for e in eye])
    B = np.diag(np.asarray(atm.diagB))
    w = scipy.linalg.eig(A, B, right=False)
    w = w[np.isfinite(w)]

    # shift near the leading cluster: shift-invert accuracy scales
    # with |lambda - sigma|^2, so a far-off shift dilutes the Ritz
    # values even with tight inner solves
    nearest = w[np.argmin(np.abs(w))]
    # offset the real part: Re(sigma) exactly on a real eigenvalue makes
    # the preconditioner operator J - Re(sigma) B exactly singular
    sigma = complex(nearest.real + 0.37, 1.0)
    solver = JDQZ(atm, {"Number of eigenvalues": 3,
                        "Shift (real part)": sigma.real,
                        "Shift (imaginary part)": sigma.imag,
                        "Tolerance": 1e-9})
    solver.solve()
    assert solver.kmax_converged >= 1
    # every converged Ritz value must be a true pencil eigenvalue
    for lam in solver.eigenvalues[:solver.kmax_converged]:
        assert np.min(np.abs(w - lam)) < 1e-5 * max(1.0, abs(lam))
