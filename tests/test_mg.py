"""Semicoarsened multigrid for stencil sub-blocks (the ML analog,
ocean_preconditioner_params.xml:66-120 Auv/ATS Precond Method=ML)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.solvers import mg
from iemic_tpu.ops.stencil import apply_stencil


def laplace_block(nv, l, m, n, *, hcoef=1.0, vcoef=1.0, shift=0.2):
    """Anisotropic 3D Laplacian stencil tensor (diffusion-dominated
    like Auv/ATS at global grids)."""
    An = np.zeros((27, nv, nv, l, m, n))
    for a in range(nv):
        An[4, a, a] = 2 * hcoef + 2 * hcoef + 2 * vcoef + shift
        An[1, a, a] = -hcoef       # j-1 (di=0, dj=-1, dk=0) -> p=1
        An[7, a, a] = -hcoef       # j+1
        An[3, a, a] = -hcoef       # i-1
        An[5, a, a] = -hcoef       # i+1
        An[13, a, a] = -vcoef      # k-1
        An[22, a, a] = -vcoef      # k+1
    return jnp.asarray(An)


def test_coarsen_preserves_row_sums():
    """Galerkin PWC coarsening preserves the action on constants:
    R A P 1 = R A 1 (column-sum consistency)."""
    rng = np.random.default_rng(0)
    An = jnp.asarray(0.1 * rng.standard_normal((27, 1, 1, 3, 6, 8)))
    Ac = mg.coarsen_stencil(An, periodic=False)
    ones_f = jnp.ones((1, 3, 6, 8))
    ones_c = jnp.ones((1, 3, 3, 4))
    yf = apply_stencil(An, ones_f, periodic=False)
    yc = apply_stencil(Ac, ones_c, periodic=False)
    # restrict fine action: sum over 2x2 aggregates
    yr = yf.reshape(1, 3, 3, 2, 4, 2).sum(axis=(3, 5))
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yr),
                               rtol=1e-12, atol=1e-12)


def test_coarsen_periodic_wrap():
    An = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((27, 1, 1, 2, 4, 8)) * 0.1)
    Ac = mg.coarsen_stencil(An, periodic=True)
    rng = np.random.default_rng(2)
    zc = jnp.asarray(rng.standard_normal((1, 2, 2, 4)))
    # P zc then A then R  ==  Ac zc
    zf = jnp.repeat(jnp.repeat(zc, 2, axis=2), 2, axis=3)
    yf = apply_stencil(An, zf, periodic=True)
    yr = yf.reshape(1, 2, 2, 2, 4, 2).sum(axis=(3, 5))
    yc = apply_stencil(Ac, zc, periodic=True)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yr),
                               rtol=1e-11, atol=1e-11)


def test_vcycle_solves_laplace():
    """V-cycles contract the error on a diffusion-dominated block far
    faster than line Jacobi alone."""
    An = laplace_block(1, 4, 16, 16)
    fac = mg.build(An, periodic=False)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((1, 4, 16, 16)))
    x = jnp.zeros_like(b)
    rn0 = float(jnp.linalg.norm(b))
    for _ in range(6):
        r = b - apply_stencil(An, x, periodic=False)
        x = x + mg.apply(fac, r, periodic=False)
    rn = float(jnp.linalg.norm(b - apply_stencil(An, x, periodic=False)))
    # piecewise-constant Galerkin MG contracts at ~0.4/cycle — fine
    # for a preconditioner (bilinear P would reach textbook ~0.1)
    assert rn < 2e-3 * rn0, f"MG contraction too weak: {rn/rn0:.2e}"


def test_mg_beats_columns_on_real_ats():
    """On the real ATS block of a masked ocean Jacobian, MG-
    preconditioned FGMRES needs far fewer iterations than the
    column-block preconditioner (the gap ML fills in the reference)."""
    from test_continuation_2dmoc import make_2dmoc_ocean
    from iemic_tpu.solvers.fgmres import _fgmres_flat
    from iemic_tpu.solvers.bgs import _TS, _apply_col_inv, \
        _column_block_inv

    ocean = make_2dmoc_ocean(n=4, m=16, l=8)
    ocean.set_par("Combined Forcing", 0.1)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    An = ocean.jac
    sub = An[:, _TS][:, :, _TS]
    l, m, n = 8, 16, 4
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal((2, l, m, n))).reshape(-1)

    def mv(v):
        return apply_stencil(sub, v.reshape(2, l, m, n),
                             periodic=True).reshape(-1)

    colinv = _column_block_inv(An, _TS)

    def pc_col(v):
        return _apply_col_inv(colinv, v.reshape(2, l, m, n)).reshape(-1)

    fac = mg.build(sub, periodic=True)

    def pc_mg(v):
        return mg.apply(fac, v.reshape(2, l, m, n),
                        periodic=True).reshape(-1)

    r_col = _fgmres_flat(mv, pc_col, b, jnp.zeros_like(b),
                         jnp.asarray(1e-8), 200)
    r_mg = _fgmres_flat(mv, pc_mg, b, jnp.zeros_like(b),
                        jnp.asarray(1e-8), 200)
    assert bool(r_mg.converged)
    assert int(r_mg.iters) <= int(r_col.iters), \
        (int(r_mg.iters), int(r_col.iters))
