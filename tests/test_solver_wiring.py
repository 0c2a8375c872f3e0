"""One code path from solver config to every preconditioner.

The reference reaches MRILU / SIMPLE-type saddlepoint schemes / block
preconditioners purely through nested parameter lists
(ocean_preconditioner_params.xml); this asserts the same here: each
"Preconditioning" method and "Saddlepoint scheme" is dispatched by the
SolverFactory and actually solves the ocean Jacobian.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from tests.test_ocean_core import make_ocean


def _solve_check(solver_params, rtol=1e-6):
    # dispatch test, not an operating-point test: pin a tight linear
    # tolerance (the production default is the reference's 1e-4)
    solver_params = {"FGMRES tolerance": 1e-8,
                     "FGMRES iterations": 300, **solver_params}
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 5, "Global Grid-Size m": 5,
        "Global Grid-Size l": 4,
        "Starting Parameters": {"Combined Forcing": 0.5,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0},
    }}, solver_params=solver_params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.05 * rng.standard_normal(ocean.state.shape))
    ocean.set_state(x)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    b = -ocean.rhs
    z = ocean.solve(b)
    r = ocean.apply_matrix(z) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < rtol, f"residual {rel} with {solver_params}"
    return ocean


def test_columns_double():
    _solve_check({"Preconditioning": "Columns", "Precision": "Double"})


def test_columns_mixed():
    _solve_check({"Preconditioning": "Columns", "Precision": "Mixed"})


def test_bgs_mixed():
    _solve_check({"Preconditioning": "BGS", "Precision": "Mixed"})


@pytest.mark.parametrize("scheme", ["SI", "SL", "SR"])
def test_bgs_saddlepoint_schemes(scheme):
    """'Saddlepoint scheme' dispatches TRIOS_Saddlepoint-style SIMPLE
    preconditioning inside the BGS Spp solve."""
    _solve_check({"Preconditioning": "BGS", "Precision": "Double",
                  "Preconditioner": {"Saddlepoint scheme": scheme,
                                     "Saddlepoint iterations": 40}})


def test_milu_host():
    """MILU (the MRILU analog) reachable from the solver config."""
    _solve_check({"Preconditioning": "MILU"})


def test_none_prec():
    _solve_check({"Preconditioning": "None", "Precision": "Double",
                  "FGMRES iterations": 2000}, rtol=1e-5)


def test_prec_factors_reused_across_solves():
    """The factorization is built once per Jacobian and shared by the
    two bordered solves of a Newton iteration (Ocean.C:1360-1375)."""
    ocean = _solve_check({"Preconditioning": "BGS",
                          "Precision": "Double"})
    fac1, _ = ocean._get_prec_factors()
    ocean.solve(-ocean.rhs)
    fac2, _ = ocean._get_prec_factors()
    assert fac1 is fac2
    ocean.compute_jacobian()
    fac3, _ = ocean._get_prec_factors()
    assert fac3 is not fac1


def test_amesos_host():
    """Amesos (sparse-direct, the Ifpack Amesos_Klu analog) reachable
    from the solver config; FGMRES converges in O(1) iterations."""
    ocean = _solve_check({"Preconditioning": "Amesos"})
    assert ocean.solve_iters <= 5
