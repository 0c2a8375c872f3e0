"""THCM row/column scaling of the ocean Jacobian.

Re-implements the reference's m_scaling module (scaling.F90:28-280) and
its use in THCM::RecomputeScaling (THCM.C:1693-1750) + Ocean::
scaleProblem (Ocean.C:1164-1223):

  1. average the 6x6 center (diagonal) stencil block over all OCEAN
     cells (average_block, scaling.F90:28-64),
  2. invert it and derive per-variable row/column factors dr, dc with
     the oceanography-specific recipe of scal() (the 'THCM 6.0'
     variant, scaling.F90:190-280),
  3. map to grid vectors: factor on ocean cells, 1 on land
     (compute, scaling.F90:69-97), invert (the Trilinos vectors are
     the reciprocals, THCM.C:1727-1731), and give T and S identical
     factors per cell (THCM.C:1736-1746 — required by the block
     preconditioner's ATS treatment).

Only the LEFT (row) scaling is actually applied by the reference's
solve (Ocean.C:1206-1214; the column scaling is computed but commented
out), so the scaled system (R J) z = R b has the same solution and
scaling purely improves the preconditioner's conditioning and the
residual weighting.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...ops.stencil import OCEAN, UU, VV, WW, PP, TT, SS


def average_block(An: np.ndarray, landm: np.ndarray) -> np.ndarray:
    """Mean 6x6 center stencil block over OCEAN cells
    (average_block, scaling.F90:28-64)."""
    _, nun, _, l, m, n = An.shape
    ocean = (landm[1:l + 1, 1:m + 1, 1:n + 1] == OCEAN)
    nl = max(int(ocean.sum()), 1)
    ctr = np.asarray(An[4])                       # (6, 6, l, m, n)
    db = (ctr * ocean[None, None]).sum(axis=(2, 3, 4)) / nl
    return db


def scal(db: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-variable row/col factors from the averaged diagonal block
    (scal, scaling.F90:192-280 — the active 'THCM 6.0' variant).
    Returns (dr, dc), each (6,).  Fortran 1-based vars map to
    0-based (u,v,w,p,T,S)."""
    dr = np.ones(6)
    dc = np.ones(6)
    try:
        mat = np.linalg.inv(db)
    except np.linalg.LinAlgError:
        return dr, dc                              # singular: no scaling
    # u
    dr[UU] = 1.0
    dc[UU] = 1.0
    # v
    idc = np.sqrt(abs(mat[UU, UU] / mat[VV, VV]))
    dr[VV] = 1.0 / idc
    dc[VV] = dr[VV]
    # p (Fortran index 4)
    idr = np.sqrt(abs(mat[UU, UU] / mat[PP, PP]))
    dr[PP] = 1.0 / idr
    dc[PP] = dr[PP]
    # w (Fortran index 3): two possibilities
    if abs(mat[PP, WW]) > abs(mat[WW, WW]):
        idr_w = mat[UU, UU] / (idr * mat[PP, WW])
    else:
        idr_w = np.sqrt(abs(mat[UU, UU] / mat[WW, WW]))
    dr[WW] = 2.0 / idr_w
    dc[WW] = dr[WW]
    # T (Fortran 5)
    mat = mat.copy()
    if abs(mat[PP, TT] * mat[TT, PP]) < 0.01 * abs(mat[PP, PP]
                                                   * mat[TT, TT]):
        mat[PP, TT] = 1.0
        mat[TT, PP] = 1.0
    idc = np.sqrt(abs(mat[UU, UU] * mat[PP, TT]
                      / (mat[TT, PP] * mat[TT, TT])))
    idr_t = mat[UU, UU] / (idc * mat[TT, TT])
    dr[TT] = 1.0 / idr_t
    dc[TT] = 1.0 / idc
    # S (Fortran 6)
    if abs(mat[PP, SS] * mat[SS, PP]) < 0.01 * abs(mat[PP, PP]
                                                   * mat[SS, SS]):
        mat[PP, SS] = 1.0
        mat[SS, PP] = 1.0
    idc = np.sqrt(abs(mat[UU, UU] * mat[PP, SS]
                      / (mat[SS, PP] * mat[SS, SS])))
    idr_s = mat[UU, UU] / (idc * mat[SS, SS])
    dr[SS] = 1.0 / idr_s
    dc[SS] = 1.0 / idc
    # guard: non-finite factors (pathological blocks) -> no scaling
    if not (np.isfinite(dr).all() and np.isfinite(dc).all()):
        return np.ones(6), np.ones(6)
    return dr, dc


def row_col_scaling(An, landm: np.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Grid row/col scaling fields (6, l, m, n) — the Trilinos-side
    vectors R = 1/dr, C = 1/dc on ocean cells, 1 on land, with T and S
    averaged per cell (THCM::RecomputeScaling, THCM.C:1693-1750)."""
    An_np = np.asarray(An)
    _, nun, _, l, m, n = An_np.shape
    db = average_block(An_np, landm)
    dr, dc = scal(db)
    ocean = (landm[1:l + 1, 1:m + 1, 1:n + 1] == OCEAN)
    R = np.where(ocean[None], (1.0 / dr)[:, None, None, None], 1.0)
    C = np.where(ocean[None], (1.0 / dc)[:, None, None, None], 1.0)
    for X in (R, C):
        mean = 0.5 * (X[TT] + X[SS])
        X[TT] = mean
        X[SS] = mean
    return jnp.asarray(R), jnp.asarray(C)
