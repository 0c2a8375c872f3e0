"""Grid diagnostics: overturning / barotropic streamfunctions.

Re-implements the reference's OceanGrid diagnostics
(src/ocean/OceanGrid.C:269-345 recomputePsiM,
src/ocean/thcm_utils.F90 compute_psim; :345-430 recomputePsiB).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...grid import Grid
from . import nonlin


def psi_m(x: jnp.ndarray, grid: Grid, landm: np.ndarray) -> jnp.ndarray:
    """Meridional overturning streamfunction PsiM(j, k), j = 0..m,
    k = 0..l (nondimensional), accumulated upward only through layers
    deeper than 500 m exactly as the reference does."""
    l, m, n = grid.l, grid.m, grid.n
    U, V, W, P, T, S = nonlin.usol(x, landm, grid.periodic, grid)
    # vs(j,k) = dx * sum_i v(i,j,k), j = 0..m, k = 1..l
    vs = grid.dx * jnp.sum(V[1:l + 1, :, 1:n + 1], axis=2)   # (l, m+1)
    cs = jnp.asarray(np.cos(grid.yv))[None, :]               # (1, m+1)
    contrib = -cs * vs * grid.dz * jnp.asarray(grid.dfzT)[:, None]
    deep = jnp.asarray((grid.z * grid.hdim < -500.0))[:, None]
    psim = jnp.cumsum(jnp.where(deep, contrib, 0.0), axis=0) * deep
    # prepend PsiM(:, k=0) = 0
    return jnp.concatenate([jnp.zeros((1, m + 1)), psim], axis=0)


def psi_b(x: jnp.ndarray, grid: Grid, landm: np.ndarray) -> jnp.ndarray:
    """Barotropic streamfunction PsiB(i, j): depth integral of u then
    cumulative meridional integral (OceanGrid.C:345-430)."""
    l, m, n = grid.l, grid.m, grid.n
    U, V, W, P, T, S = nonlin.usol(x, landm, grid.periodic, grid)
    # depth-average u at u-points: us(i,j) = sum_k u * dz*dfzT
    dzw = (grid.dz * jnp.asarray(grid.dfzT))[:, None, None]
    us = jnp.sum(U[1:l + 1] * dzw, axis=0)                   # (m+1, n+1)
    # psiB(i,j) = psiB(i,j-1) + 0.5*(us(i,j-1)+us(i,j))*dy
    avg = 0.5 * (us[:-1, :] + us[1:, :]) * grid.dy           # (m, n+1)
    psib = jnp.cumsum(avg, axis=0)
    return jnp.concatenate([jnp.zeros((1, n + 1)), psib], axis=0)


@jax.jit
def _minmax(p):
    return jnp.max(p), jnp.min(p)


def psi_min_max(x, grid: Grid, landm: np.ndarray) -> tuple[float, float]:
    pmax, pmin = _minmax(psi_m(x, grid, landm))
    return float(pmax), float(pmin)


def max_velocities(x, grid: Grid, landm: np.ndarray):
    """Maximum |u|, |v| diagnostics (OceanGrid.H:219 uMax/vMax)."""
    U, V, W, P, T, S = nonlin.usol(x, landm, grid.periodic, grid)
    return float(jnp.max(jnp.abs(U))), float(jnp.max(jnp.abs(V)))
