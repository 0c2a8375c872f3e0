"""Lyapunov solver tests.

Mirrors the reference's use of the external RAILS solver inside
LyapunovModel (reference src/lyapunov/LyapunovModel.H:22-110): the
low-rank solve must satisfy the Lyapunov equation residual on a small
stable operator, and the model decorator must produce a positive
semi-definite covariance with finite trace.
"""

import numpy as np
import pytest

from iemic_tpu.lyapunov import rails


def _laplacian_1d(n):
    A = -2.0 * np.eye(n) + np.eye(n, k=1) + np.eye(n, k=-1)
    return A * (n + 1) ** 2 / 50.0


def test_rails_small_dense():
    n = 60
    A = _laplacian_1d(n)          # symmetric negative definite: stable
    rng = np.random.default_rng(3)
    B = rng.standard_normal((n, 2))

    res = rails(lambda W: A @ np.asarray(W), B, tol=1e-8, maxiter=60)
    assert res.converged

    X = res.V @ res.T @ res.V.T
    R = A @ X + X @ A.T + B @ B.T
    assert np.linalg.norm(R) <= 1e-6 * np.linalg.norm(B @ B.T)

    # exact solution check via Bartels-Stewart on the full system
    import scipy.linalg as sla
    Xex = sla.solve_lyapunov(A, -(B @ B.T))
    assert np.linalg.norm(X - Xex) <= 1e-5 * np.linalg.norm(Xex)


def test_rails_nonsymmetric():
    n = 40
    rng = np.random.default_rng(11)
    A = _laplacian_1d(n) + 0.3 * np.triu(rng.standard_normal((n, n)), 1)
    # ensure stability
    assert np.max(np.linalg.eigvals(A).real) < 0
    B = rng.standard_normal((n, 1))
    res = rails(lambda W: A @ np.asarray(W), B, tol=1e-7, maxiter=80)
    X = res.V @ res.T @ res.V.T
    R = A @ X + X @ A.T + B @ B.T
    assert np.linalg.norm(R) <= 1e-5 * np.linalg.norm(B @ B.T)
    # covariance must be PSD
    assert np.min(np.linalg.eigvalsh(X)) >= -1e-8


@pytest.mark.slow
def test_lyapunov_model_ocean_2dmoc():
    """Covariance solve on a tiny stable 2DMOC ocean state
    (reference intt_2dmoc.C exercises LyapunovModel the same way)."""
    from iemic_tpu.models.ocean import Ocean
    from iemic_tpu.lyapunov import LyapunovModel

    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 4,
        "Global Grid-Size m": 4,
        "Global Grid-Size l": 4,
        "Periodic": False,
        "Starting Parameters": {"Combined Forcing": 0.0},
    }})
    lyap = LyapunovModel(ocean, {"Tolerance": 1e-4,
                                 "Maximum Iterations": 40,
                                 "Noise Amplitude": 1e-2})
    out = lyap.solve_covariance()
    assert np.isfinite(out["trace"])
    # spectrum of the small factor must be real and non-negative
    assert np.all(out["spectrum"] >= -1e-8 * max(1.0,
                                                 abs(out["spectrum"][0])))
