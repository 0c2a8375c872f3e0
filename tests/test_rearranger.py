"""Rearranger (variable-blocked Jacobian view) + Teko-style block
preconditioner tests (reference src/ocean/Rearranger.H:23-60,
TekoPreconditioner.H:39-88)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.ops.stencil import apply_stencil
from iemic_tpu.solvers import rearranger
from iemic_tpu.solvers.fgmres import _fgmres_flat

from test_continuation_2dmoc import make_2dmoc_ocean


def _jacobian_ocean():
    ocean = make_2dmoc_ocean(n=3, m=6, l=6)
    ocean.set_par("Combined Forcing", 0.1)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    return ocean


def test_blocked_tiling_matches_full_matvec():
    """The 10 De Niet blocks (+ the dummy-row diagonals of w and p)
    reassemble the full operator exactly (the reference's finalMatrix_
    rebuild, Rearranger.H:57-58)."""
    ocean = _jacobian_ocean()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(ocean.state.shape))
    r = rearranger.Rearranger(ocean.jac, periodic=ocean.cfg.periodic)
    y_blocked = r.apply_blocked(x)
    y_full = apply_stencil(ocean.jac, x, periodic=ocean.cfg.periodic)
    assert float(jnp.max(jnp.abs(y_blocked - y_full))) < 1e-11 * float(
        jnp.max(jnp.abs(y_full)) + 1.0)


def test_nonzero_pattern_is_the_de_niet_structure():
    """Structurally-zero group blocks stay (near) zero; all 10 named
    physics blocks are present (numNonzBlocks_ = 10)."""
    ocean = _jacobian_ocean()
    r = rearranger.Rearranger(ocean.jac, periodic=ocean.cfg.periodic)
    pat = r.nonzero_pattern()
    # blocks outside the 10 + dummy diagonals must be structurally zero
    named = set(rearranger.BLOCK_KEYS.values()) | \
        set(rearranger.DUMMY_KEYS.values())
    for (rg, cg), mx in pat.items():
        if (rg, cg) not in named:
            assert mx == 0.0, f"unexpected nonzero block ({rg},{cg})"
    # and the essential physics blocks are nonzero
    for key in ("A_uv", "G_uv", "G_w", "B_ST", "D_uv", "D_w", "A_ST"):
        rg, cg = rearranger.BLOCK_KEYS[key]
        assert pat[(rg, cg)] > 0.0, f"block {key} unexpectedly zero"


def test_teko_preconditioner_accelerates_fgmres():
    """The Teko-style block-GS preconditioner converges the 2DMOC
    Newton system in far fewer FGMRES iterations than unpreconditioned."""
    ocean = _jacobian_ocean()
    An = ocean.jac
    sh = ocean.state.shape
    b = (-ocean.rhs).reshape(-1)
    nullq = ocean._get_deflator()

    def proj(v):
        return v - nullq @ (nullq.T @ v) if nullq is not None else v

    def mv(v):
        return proj(ocean._apply_impl(An, v.reshape(sh)).reshape(-1))

    fac = rearranger.build(An, periodic=True)

    def pc(v):
        return proj(rearranger.apply(fac, v.reshape(sh),
                                     periodic=True).reshape(-1))

    res = _fgmres_flat(mv, pc, proj(b), jnp.zeros_like(b),
                       jnp.asarray(1e-8), 300)
    res_none = _fgmres_flat(mv, lambda v: v, proj(b), jnp.zeros_like(b),
                            jnp.asarray(1e-8), 300)
    assert bool(res.converged)
    assert int(res.iters) < int(res_none.iters)


def test_teko_through_ocean_solve():
    """Preconditioning='Teko' is reachable from the solver config."""
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 4, "Global Grid-Size m": 4,
        "Global Grid-Size l": 3,
        "Starting Parameters": {"Combined Forcing": 0.1,
                                "Temperature Forcing": 10.0}}},
        solver_params={"Preconditioning": "Teko"})
    ocean.compute_rhs()
    ocean.compute_jacobian()
    x = ocean.solve(-ocean.rhs)
    assert ocean.solve_relres < 1e-6
