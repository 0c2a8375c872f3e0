"""Tests for the depth-averaged saddle-point SIMPLE preconditioners
(the reference's TRIOS_Saddlepoint SppSimplePrec 'SI'/'SL'/'SR'
schemes, src/trios/TRIOS_Saddlepoint.H:28-95)."""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.solvers.saddlepoint import (build_simple, apply_simple,
                                           apply_saddle, apply_stencil_2d,
                                           _OFFS25)
from iemic_tpu.solvers.fgmres import fgmres_host


@pytest.fixture(scope="module")
def spp_setup():
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 8, "Global Grid-Size m": 8,
        "Global Grid-Size l": 4, "Periodic": False,
        "Starting Parameters": {"Combined Forcing": 0.0,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0},
    }})
    rng = np.random.default_rng(3)
    ocean.set_state(jnp.asarray(0.01 * rng.standard_normal(
        ocean.state.shape)))
    ocean.compute_jacobian()
    prec = bgs.build(ocean.jac, np.asarray(ocean.landm),
                     periodic=False)
    sp = build_simple(prec.Spp, prec.sv2d, periodic=False)
    return ocean, prec, sp


def test_chat_is_schur_complement(spp_setup):
    """Chat composition == -D diag(A)^-1 G applied to random vectors."""
    _, prec, sp = spp_setup
    m, n = prec.Spp.shape[-2:]
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((m, n)))
    # explicit: G p -> (2,m,n); Ainv; D
    x3 = jnp.concatenate([jnp.zeros((2, m, n)), p[None]])
    Gp = apply_saddle(prec.Spp, x3, False)[:2]
    AinvGp = jnp.einsum('rcji,cji->rji', sp.auv_inv, Gp)
    DAinvGp = apply_saddle(
        prec.Spp, jnp.concatenate([AinvGp, jnp.zeros((1, m, n))]),
        False)[2]
    chat_p = apply_stencil_2d(sp.chat, _OFFS25, p, False)
    assert np.allclose(np.asarray(chat_p), -np.asarray(DAinvGp),
                       atol=1e-10)


@pytest.mark.parametrize("scheme", ["SI", "SL", "SR"])
def test_simple_accelerates_fgmres(spp_setup, scheme):
    """FGMRES on the saddle system converges much faster with the
    SIMPLE preconditioner than without."""
    _, prec, sp = spp_setup
    m, n = prec.Spp.shape[-2:]
    rng = np.random.default_rng(1)
    # consistent rhs: b = Spp x_true with the pressure null modes
    # removed from x_true (the operator is singular on them)
    x_true = jnp.asarray(rng.standard_normal((3, m, n)))
    for q in range(2):
        sv = sp.nullmodes[q]
        x_true = x_true.at[2].add(-jnp.vdot(sv, x_true[2]) * sv)
    b = apply_saddle(prec.Spp, x_true, False)

    def mv(v):
        return apply_saddle(prec.Spp, v.reshape(3, m, n),
                            False).reshape(-1)

    def pc(v):
        return apply_simple(sp, v.reshape(3, m, n), periodic=False,
                            scheme=scheme).reshape(-1)

    _, plain = fgmres_host(mv, b.reshape(-1), tol=1e-8, maxiter=200)
    _, simple = fgmres_host(mv, b.reshape(-1), prec=pc, tol=1e-8,
                            maxiter=200)
    assert int(simple.iters) < int(plain.iters)
    assert float(simple.relres) < 1e-7
