"""Assembly of the ocean dependency tensor, mass matrix and forcing.

JAX re-implementation of the reference's operator assembly:
  * ``lin``        — parameter-weighted combination of linear atoms into
                     the dependency tensor Al (usrc.F90:588-772)
  * ``nlin_rhs``/``nlin_jac`` — nonlinear additions (usrc.F90:775-995)
  * ``boundaries`` — land/wall/surface/bottom boundary handling on the
                     tensor (boundary.F90:2-393), vectorized over the
                     grid with the exact same sequential update order
  * ``fillcolB``   — diagonal mass matrix (assemble.F90:18-54)
  * ``forcing``    — wind/temperature/salinity/internal forcing vector
                     (forcing.F90:4-218) incl. the area-integral flux
                     corrections (THCM.C:2704-2737)
  * ``intcond_coeff`` — salinity integral-condition row coefficients
                     (thcm_utils.F90:285-312)

The parameter vector ``par`` (30 entries, see constants.py) is a traced
argument so that continuation in any parameter re-uses one compiled
computation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ...grid import Grid
from ...ops.stencil import UU, VV, WW, PP, TT, SS, OCEAN, LAND
from . import atoms as at
from . import nonlin
from . import constants as c


class CouplingCoefs(NamedTuple):
    """Coefficients fed in by the atmosphere / sea-ice models
    (reference usrc.F90:237-333 set_atmos_parameters /
    set_seaice_parameters and m_atm module state)."""
    Ooa: float = 0.0
    lvsc: float = 0.0
    eta: float = 0.0
    qdim: float = 0.01
    dqso: float = 0.0
    nus: float = 0.0
    zeta: float = 0.0   # sea-ice zeta
    a0: float = 0.0     # freezing-temperature S sensitivity
    Lf: float = 1.0     # latent heat of fusion (avoid div-by-0)
    eo0: float = 0.0
    albe0: float = 0.0
    albed: float = 0.0
    q0: float = 0.0
    qvar: float = 1.0


class LinearAtoms(NamedTuple):
    """Static precomputed linear atoms, shapes (27, l, m, n)."""
    uxx: np.ndarray
    uyy: np.ndarray
    uzz: np.ndarray
    ucsi: np.ndarray
    uxs: np.ndarray   # vderiv(6) in the u-equation cross term
    vxs: np.ndarray   # uderiv(6)
    fu: np.ndarray
    fv: np.ndarray
    px: np.ndarray
    py: np.ndarray
    pz: np.ndarray
    vxx: np.ndarray
    vyy: np.ndarray
    vzz: np.ndarray
    vcsi: np.ndarray
    pux: np.ndarray   # pderiv(1)
    pvy: np.ndarray   # pderiv(2)
    pwz: np.ndarray   # pderiv(3)
    tc: np.ndarray    # tderiv(1)
    sc: np.ndarray    # tderiv(2)
    txx: np.ndarray
    tyy: np.ndarray
    tzz: np.ndarray
    tbc: np.ndarray   # tderiv(6)
    tcb: np.ndarray   # tderiv(7)


def build_linear_atoms(grid: Grid, landm: np.ndarray, *,
                       ih: int = 0, coriolis_on: int = 1) -> LinearAtoms:
    """Precompute all state-independent atoms (called once per landmask)."""
    return LinearAtoms(
        uxx=at.uderiv(grid, 2, ih),
        uyy=at.uderiv(grid, 3, ih),
        uzz=at.uderiv(grid, 4, ih),
        ucsi=at.uderiv(grid, 5, ih),
        vxs=at.uderiv(grid, 6, ih),
        uxs=at.vderiv(grid, 6, ih),
        fu=at.coriolis(grid, 2, coriolis_on),
        fv=at.coriolis(grid, 1, coriolis_on),
        px=at.gradp(grid, 1),
        py=at.gradp(grid, 2),
        pz=at.gradp(grid, 3),
        vxx=at.vderiv(grid, 2, ih),
        vyy=at.vderiv(grid, 3, ih),
        vzz=at.vderiv(grid, 4, ih),
        vcsi=at.vderiv(grid, 5, ih),
        pux=at.pderiv(grid, 1),
        pvy=at.pderiv(grid, 2),
        pwz=at.pderiv(grid, 3),
        tc=at.tderiv(grid, 1, landm),
        sc=at.tderiv(grid, 2, landm),
        txx=at.tderiv(grid, 3, landm),
        tyy=at.tderiv(grid, 4, landm),
        tzz=at.tderiv(grid, 5, landm),
        tbc=at.tderiv(grid, 6, landm),
        tcb=at.tderiv(grid, 7, landm),
    )


def masksi_atom(grid: Grid, msi: jnp.ndarray) -> jnp.ndarray:
    """Sea-ice mask atom (spf.F90:347-359): diagonal at the surface."""
    atom = jnp.zeros((27, grid.l, grid.m, grid.n), msi.dtype)
    return atom.at[4, grid.l - 1].set(msi)


def lin(A: LinearAtoms, par: jnp.ndarray, grid: Grid, *,
        tres: int, sres: int, coupled_T: int, coupled_S: int,
        cpl: CouplingCoefs, msi: jnp.ndarray | None = None,
        QTnd: float = 0.0, QSnd: float = 0.0,
        dtype=jnp.float64) -> jnp.ndarray:
    """Combine linear atoms into Al (usrc.F90:588-772)."""
    EV = par[c.EK_V]
    EH = par[c.EK_H]
    ph = (1.0 - par[c.MIXP]) * par[c.PE_H]
    pv = par[c.PE_V]
    lam = par[c.LAMB]
    xes = par[c.NLES]
    bi = par[c.BIOT]
    Ra = par[c.RAYL]

    l, m, n = grid.l, grid.m, grid.n
    Al = jnp.zeros((27, 6, 6, l, m, n), dtype)

    # u-equation
    Al = Al.at[:, UU, UU].set(-EH * (A.uxx + A.uyy + A.ucsi) - EV * A.uzz)
    Al = Al.at[:, UU, VV].set(-A.fv - EH * A.vxs)
    Al = Al.at[:, UU, PP].set(jnp.asarray(A.px, dtype))
    # v-equation
    Al = Al.at[:, VV, UU].set(A.fu - EH * A.uxs)
    Al = Al.at[:, VV, VV].set(-EH * (A.vxx + A.vyy + A.vcsi) - EV * A.vzz)
    Al = Al.at[:, VV, PP].set(jnp.asarray(A.py, dtype))
    # w-equation (hydrostatic balance, linear EOS rho = lam*S - T)
    Al = Al.at[:, WW, PP].set(jnp.asarray(A.pz, dtype))
    Al = Al.at[:, WW, TT].set(-Ra * (1.0 + xes * c.ALPT1) * A.tbc / 2.0)
    Al = Al.at[:, WW, SS].set(lam * Ra * A.tbc / 2.0)
    # p-equation (continuity)
    Al = Al.at[:, PP, UU].set(jnp.asarray(A.pux, dtype))
    Al = Al.at[:, PP, VV].set(jnp.asarray(A.pvy, dtype))
    Al = Al.at[:, PP, WW].set(jnp.asarray(A.pwz, dtype))

    # T-equation
    if coupled_T == 1:
        mc = masksi_atom(grid, msi)
        dedt = cpl.lvsc * cpl.eta * cpl.qdim * (c.DELTAT / cpl.qdim) \
            * cpl.dqso
        Al = Al.at[:, TT, TT].set(
            -ph * (A.txx + A.tyy) - pv * A.tzz
            + cpl.Ooa * A.tc + dedt * A.sc
            + mc * (QTnd * cpl.zeta * A.tc - cpl.Ooa * A.tc
                    - dedt * A.sc))
        Al = Al.at[:, TT, SS].set(-QTnd * cpl.zeta * cpl.a0 * mc)
    else:
        Al = Al.at[:, TT, TT].set(
            -ph * (A.txx + A.tyy) - pv * A.tzz + tres * bi * A.tc)

    # S-equation
    if coupled_S == 1:
        mc = masksi_atom(grid, msi)
        dedt = cpl.nus * (c.DELTAT / cpl.qdim) * cpl.dqso
        pQSnd = par[c.COMB] * par[c.SALT] * QSnd
        Al = Al.at[:, SS, SS].set(
            -ph * (A.txx + A.tyy) - pv * A.tzz
            - mc * pQSnd * cpl.zeta * cpl.a0 / (c.RHODIM * cpl.Lf))
        QSoa = -dedt * A.sc
        QSos = pQSnd * cpl.zeta / (c.RHODIM * cpl.Lf)
        Al = Al.at[:, SS, TT].set(QSoa + mc * (QSos - QSoa))
    else:
        Al = Al.at[:, SS, SS].set(
            -ph * (A.txx + A.tyy) - pv * A.tzz + sres * bi * A.sc)

    return Al


def nlin(Al: jnp.ndarray, x: jnp.ndarray, par: jnp.ndarray, grid: Grid,
         landm: np.ndarray, periodic: bool, *, jac: bool) -> jnp.ndarray:
    """Add the nonlinear (advective + nonlinear-EOS) atoms to Al.

    jac=False reproduces ``nlin_rhs`` (usrc.F90:775-870): An(x)*x equals
    the full nonlinear term; jac=True reproduces ``nlin_jac``
    (usrc.F90:873-995): the linearization.
    """
    epsr = par[c.ROSB]
    Ra = par[c.RAYL]
    xes = par[c.NLES]
    l, m, n = grid.l, grid.m, grid.n

    U, V, W, P, T, S = nonlin.usol(x, landm, periodic, grid)
    surf = 1.0 - jnp.asarray(
        landm[l, 1:m + 1, 1:n + 1].astype(np.float64))

    An = Al

    if not jac:
        # u-equation
        uux = nonlin.unlin(grid, 1, U, V, W)
        uvy1 = nonlin.unlin(grid, 3, U, V, W)
        uwz = nonlin.unlin(grid, 5, U, V, W)
        uvy2 = nonlin.unlin(grid, 7, U, V, W)
        An = An.at[:, UU, UU].add(epsr * (uux + uvy1 + uwz + uvy2))
        # v-equation
        uvx = nonlin.vnlin(grid, 1, U, V, W)
        vvy = nonlin.vnlin(grid, 3, U, V, W)
        vwz = nonlin.vnlin(grid, 5, U, V, W)
        ut2 = nonlin.vnlin(grid, 7, U, V, W)
        An = An.at[:, VV, UU].add(epsr * ut2)
        An = An.at[:, VV, VV].add(epsr * (uvx + vvy + vwz))
        # w-equation (nonlinear EOS)
        t2r = nonlin.wnlin(grid, 2, T)
        t3r = nonlin.wnlin(grid, 4, T)
        An = An.at[:, WW, TT].add(-Ra * xes * c.ALPT2 * t2r
                                  + Ra * xes * c.ALPT3 * t3r)
        # T-equation
        utx = nonlin.tnlin(grid, 3, U, V, W, T, surf)
        vty = nonlin.tnlin(grid, 5, U, V, W, T, surf)
        wtz = nonlin.tnlin(grid, 7, U, V, W, T, surf)
        An = An.at[:, TT, TT].add(utx + vty + wtz)
        # S-equation
        usx = nonlin.tnlin(grid, 3, U, V, W, S, surf)
        vsy = nonlin.tnlin(grid, 5, U, V, W, S, surf)
        wsz = nonlin.tnlin(grid, 7, U, V, W, S, surf)
        An = An.at[:, SS, SS].add(usx + vsy + wsz)
    else:
        # u-equation
        Urux = nonlin.unlin(grid, 2, U, V, W)
        uvy1 = nonlin.unlin(grid, 3, U, V, W)
        Urvy1 = nonlin.unlin(grid, 4, U, V, W)
        uwz = nonlin.unlin(grid, 5, U, V, W)
        Urwz = nonlin.unlin(grid, 6, U, V, W)
        uvy2 = nonlin.unlin(grid, 7, U, V, W)
        Urvy2 = nonlin.unlin(grid, 8, U, V, W)
        An = An.at[:, UU, UU].add(epsr * (Urux + uvy1 + uwz + uvy2))
        An = An.at[:, UU, VV].add(epsr * (Urvy1 + Urvy2))
        An = An.at[:, UU, WW].add(epsr * Urwz)
        # v-equation
        uvx = nonlin.vnlin(grid, 1, U, V, W)
        uVrx = nonlin.vnlin(grid, 2, U, V, W)
        Vrvy = nonlin.vnlin(grid, 4, U, V, W)
        vwz = nonlin.vnlin(grid, 5, U, V, W)
        Vrwz = nonlin.vnlin(grid, 6, U, V, W)
        Urt2 = nonlin.vnlin(grid, 8, U, V, W)
        An = An.at[:, VV, UU].add(epsr * (Urt2 + uVrx))
        An = An.at[:, VV, VV].add(epsr * (uvx + Vrvy + vwz))
        An = An.at[:, VV, WW].add(epsr * Vrwz)
        # w-equation
        t2r = nonlin.wnlin(grid, 1, T)
        t3r = nonlin.wnlin(grid, 3, T)
        An = An.at[:, WW, TT].add(-Ra * xes * c.ALPT2 * t2r
                                  + Ra * xes * c.ALPT3 * t3r)
        # T-equation
        urTx = nonlin.tnlin(grid, 2, U, V, W, T, surf)
        Utrx = nonlin.tnlin(grid, 3, U, V, W, T, surf)
        vrTy = nonlin.tnlin(grid, 4, U, V, W, T, surf)
        Vtry = nonlin.tnlin(grid, 5, U, V, W, T, surf)
        wrTz = nonlin.tnlin(grid, 6, U, V, W, T, surf)
        Wtrz = nonlin.tnlin(grid, 7, U, V, W, T, surf)
        An = An.at[:, TT, UU].add(urTx)
        An = An.at[:, TT, VV].add(vrTy)
        An = An.at[:, TT, WW].add(wrTz)
        An = An.at[:, TT, TT].add(Utrx + Vtry + Wtrz)
        # S-equation
        urSx = nonlin.tnlin(grid, 2, U, V, W, S, surf)
        Usrx = nonlin.tnlin(grid, 3, U, V, W, S, surf)
        vrSy = nonlin.tnlin(grid, 4, U, V, W, S, surf)
        Vsry = nonlin.tnlin(grid, 5, U, V, W, S, surf)
        wrSz = nonlin.tnlin(grid, 6, U, V, W, S, surf)
        Wsrz = nonlin.tnlin(grid, 7, U, V, W, S, surf)
        An = An.at[:, SS, UU].add(urSx)
        An = An.at[:, SS, VV].add(vrSy)
        An = An.at[:, SS, WW].add(wrSz)
        An = An.at[:, SS, SS].add(Usrx + Vsry + Wsrz)

    return An


# ---------------------------------------------------------------------
# boundaries
# ---------------------------------------------------------------------

_ALL = (UU, VV, WW, PP, TT, SS)


def _nbmask(landm_ext: np.ndarray, di: int, dj: int, dk: int,
            l: int, m: int, n: int, value: int = LAND) -> np.ndarray:
    """(l,m,n) bool: neighbor (i+di, j+dj, k+dk) has landmask == value.

    landm_ext is the landmask padded to (l+2, m+3, n+3) so that the
    (i+2, j+2) 'extra neighbour' reads of boundary.F90:64-78 are in
    range (those reads are guarded by i<n / j<m masks anyway).
    """
    return (landm_ext[1 + dk:1 + dk + l,
                      1 + dj:1 + dj + m,
                      1 + di:1 + di + n] == value)


def boundaries(An: jnp.ndarray, landm: np.ndarray, grid: Grid
               ) -> jnp.ndarray:
    """Apply boundary conditions to the dependency tensor
    (boundary.F90:2-393), preserving the exact sequential update order.
    """
    l, m, n = grid.l, grid.m, grid.n

    lme = np.full((l + 2, m + 3, n + 3), LAND, dtype=landm.dtype)
    lme[:, :m + 2, :n + 2] = landm

    def nb(di, dj, dk):
        return _nbmask(lme, di, dj, dk, l, m, n)

    ocean = _nbmask(lme, 0, 0, 0, l, m, n, OCEAN)

    # neighbor LAND masks by stencil location (Fortran numbering)
    LM = {}
    from ...ops.stencil import offsets
    offs = offsets()
    for p in range(27):
        di, dj, dk = offs[p]
        LM[p + 1] = nb(di, dj, dk)

    # 'extra' neighbours (boundary.F90:64-78); guards i<n / j<m applied
    igrid = np.arange(n)[None, None, :]
    jgrid = np.arange(m)[None, :, None]
    i_lt_n = np.broadcast_to(igrid < n - 1, (l, m, n))
    j_lt_m = np.broadcast_to(jgrid < m - 1, (l, m, n))
    southee = nb(2, -1, 0) & i_lt_n
    easteast = nb(2, 0, 0) & i_lt_n
    northee = nb(2, 1, 0) & i_lt_n
    nnorthee = nb(2, 2, 0) & i_lt_n & j_lt_m
    nn_j2 = nb(0, 2, 0) & j_lt_m     # nnwest == nnorth == nneast

    def msk(mask):
        return jnp.asarray(mask & ocean)

    # column groups as contiguous slices (UU,VV = 0:2; TT,SS = 4:6) so
    # each boundary operation is a single sliced tensor update
    UV = slice(0, 2)
    TSc = slice(4, 6)
    _ALLSL = slice(None)

    def zero_cols(An, locs, cols, mask):
        """An(loc, :, cols) = 0 where mask."""
        mk = msk(mask)
        idx = np.asarray([loc - 1 for loc in locs])
        if len(idx) == 1:
            An = An.at[idx[0], :, cols].set(
                jnp.where(mk, 0.0, An[idx[0], :, cols]))
        else:
            An = An.at[idx, :, cols].set(
                jnp.where(mk, 0.0, An[idx, :, cols]))
        return An

    def fold(An, src, dst, cols, mask):
        """An(dst, :, cols) += An(src, :, cols) where mask."""
        mk = msk(mask)
        return An.at[dst - 1, :, cols].add(
            jnp.where(mk, An[src - 1, :, cols], 0.0))

    def dirichlet_row(An, var, mask):
        """Replace the <var>-equation by var = 0 (identity row) and
        remove the center column of var from all other equations."""
        mk = msk(mask)
        An = An.at[:, var, :].set(
            jnp.where(mk, 0.0, An[:, var, :]))
        An = An.at[4, :, var].set(jnp.where(mk, 0.0, An[4, :, var]))
        An = An.at[4, var, var].set(jnp.where(mk, 1.0, An[4, var, var]))
        return An

    # ---- bottom (loc 14) block (boundary.F90:84-110) ----------------
    b = LM[14]
    An = fold(An, 10, 1, UV, b & LM[11] & LM[10] & LM[13])
    An = zero_cols(An, (10,), UV, b)
    An = fold(An, 11, 2, UV, b & LM[11] & LM[18] & LM[15])
    An = zero_cols(An, (11,), UV, b)
    An = fold(An, 13, 4, UV, b & LM[17] & LM[16] & LM[13])
    An = zero_cols(An, (13,), UV, b)
    An = fold(An, 14, 5, UV, b & LM[17] & LM[18] & LM[15])
    An = fold(An, 14, 5, TSc, b)
    An = zero_cols(An, (14,), _ALLSL, b)

    # ---- standalone below-layer neighbours (boundary.F90:111-134) ---
    for loc in (10, 11, 12, 13, 15, 16, 17, 18):
        An = zero_cols(An, (loc,), _ALLSL, LM[loc])

    # ---- top (loc 23) block (boundary.F90:135-179) ------------------
    t = LM[23]
    An = fold(An, 19, 1, UV, t & LM[20] & LM[19] & LM[22])
    An = zero_cols(An, (19,), UV, t)
    An = fold(An, 20, 2, UV, t & LM[20] & LM[21] & LM[24])
    An = zero_cols(An, (20,), UV, t)
    An = fold(An, 22, 4, UV, t & LM[26] & LM[25] & LM[22])
    An = zero_cols(An, (22,), UV, t)
    An = fold(An, 23, 5, UV, t & LM[26] & LM[27] & LM[24])
    An = fold(An, 23, 5, TSc, t)
    An = zero_cols(An, (23,), _ALLSL, t)
    # replace w-equation by w = 0 with weak 1e-10 links kept for the
    # preconditioner (boundary.F90:169-177)
    tk = msk(t)
    An = An.at[:, WW, :].set(jnp.where(tk, 0.0, An[:, WW, :]))
    # per-location updates (dynamic-update-slice) instead of one
    # gather/scatter with an index array — the scatter form needs
    # O(|An|) scoped VMEM and fails to compile at production grids
    for _loc in (4, 5, 7, 8):
        An = An.at[_loc, :, WW].set(
            jnp.where(tk, 1.0e-10, An[_loc, :, WW]))
    An = An.at[4, WW, WW].set(jnp.where(tk, 1.0, An[4, WW, WW]))

    # ---- standalone above-layer neighbours (boundary.F90:180-205) ---
    for loc in (19, 20, 21, 22, 24, 25, 26, 27):
        An = zero_cols(An, (loc,), _ALLSL, LM[loc])

    # ---- lateral neighbours -----------------------------------------
    # southwest (1)
    An = zero_cols(An, (1,), UV, LM[1])
    # west (2)
    An = fold(An, 2, 5, TSc, LM[2])
    An = zero_cols(An, (2,), _ALLSL, LM[2])
    An = zero_cols(An, (1,), UV, LM[2])
    # northwest (3) / nnwest
    An = zero_cols(An, (2, 3), UV, LM[3])
    An = zero_cols(An, (3,), UV, (~LM[3]) & nn_j2)
    # south (4)
    An = fold(An, 4, 5, TSc, LM[4])
    An = zero_cols(An, (4,), _ALLSL, LM[4])
    An = zero_cols(An, (1,), UV, LM[4])
    # north (6)
    no = LM[6]
    An = zero_cols(An, (2,), UV, no)
    nk = msk(no)
    An = An.at[1, PP, UV].set(jnp.where(nk, 0.0, An[1, PP, UV]))
    An = An.at[4, PP, UV].set(jnp.where(nk, 0.0, An[4, PP, UV]))
    An = dirichlet_row(An, VV, no)
    An = dirichlet_row(An, UU, no)
    An = fold(An, 6, 5, TSc, no)
    An = zero_cols(An, (6,), _ALLSL, no)
    An = zero_cols(An, (3, 6), UV, (~no) & nn_j2)
    # southeast (7) / southee
    An = zero_cols(An, (4, 7), UV, LM[7])
    An = zero_cols(An, (7,), UV, (~LM[7]) & southee)
    # east (8)
    ea = LM[8]
    An = zero_cols(An, (4,), UV, ea)
    ek = msk(ea)
    An = An.at[3, PP, UV].set(jnp.where(ek, 0.0, An[3, PP, UV]))
    An = An.at[4, PP, UV].set(jnp.where(ek, 0.0, An[4, PP, UV]))
    An = dirichlet_row(An, UU, ea)
    An = dirichlet_row(An, VV, ea)
    An = fold(An, 8, 5, TSc, ea)
    An = zero_cols(An, (8,), _ALLSL, ea)
    An = zero_cols(An, (7,), UV, ea)
    An = zero_cols(An, (7, 8), UV, (~ea) & easteast)
    # northeast (9)
    ne = LM[9]
    An = dirichlet_row(An, UU, ne)
    An = dirichlet_row(An, VV, ne)
    An = zero_cols(An, (7,), UV, ne)
    An = zero_cols(An, (8, 9), UV, (~ne) & northee)
    An = zero_cols(An, (9,), UV, (~ne) & (~northee) & nnorthee)
    An = zero_cols(An, (6, 9), UV, (~ne) & nn_j2)

    # ---- center not OCEAN: identity rows (boundary.F90:381-387) -----
    land_c = jnp.asarray(~ocean)
    An = jnp.where(land_c, 0.0, An)
    for ii in _ALL:
        An = An.at[4, ii, ii].set(jnp.where(land_c, 1.0, An[4, ii, ii]))

    return An


def boundary_frc_zero(Frc: jnp.ndarray, landm: np.ndarray, grid: Grid
                      ) -> jnp.ndarray:
    """Zero forcing rows as boundaries() does in the reference
    (the Fortran mutates the shared Frc array; here it is a pure op):
    W rows where top==LAND (incl. the rigid-lid surface), U/V rows where
    north/east/neast is LAND, everything on non-ocean cells."""
    l, m, n = grid.l, grid.m, grid.n
    lme = np.full((l + 2, m + 3, n + 3), LAND, dtype=landm.dtype)
    lme[:, :m + 2, :n + 2] = landm

    ocean = _nbmask(lme, 0, 0, 0, l, m, n, OCEAN)
    top = _nbmask(lme, 0, 0, 1, l, m, n) & ocean
    north = _nbmask(lme, 0, 1, 0, l, m, n) & ocean
    east = _nbmask(lme, 1, 0, 0, l, m, n) & ocean
    neast = _nbmask(lme, 1, 1, 0, l, m, n) & ocean

    uvzero = jnp.asarray(north | east | neast)
    Frc = Frc.at[WW].set(jnp.where(jnp.asarray(top), 0.0, Frc[WW]))
    Frc = Frc.at[UU].set(jnp.where(uvzero, 0.0, Frc[UU]))
    Frc = Frc.at[VV].set(jnp.where(uvzero, 0.0, Frc[VV]))
    Frc = jnp.where(jnp.asarray(~ocean), 0.0, Frc)
    return Frc


# ---------------------------------------------------------------------
# mass matrix
# ---------------------------------------------------------------------

def fillcolB(par: jnp.ndarray, landm: np.ndarray, grid: Grid, *,
             sres: int, rowintcon_mask: np.ndarray | None = None,
             dtype=jnp.float64) -> jnp.ndarray:
    """Diagonal of the mass matrix B (assemble.F90:18-54), in field
    layout (6, l, m, n).  Entries are the Fortran values (-Ro for u,v,
    -1 for T,S); the sign flip to the actual mass matrix happens in the
    Ocean model (as in THCM.C evaluate/evaluateB)."""
    l, m, n = grid.l, grid.m, grid.n
    ocean = (landm[1:l + 1, 1:m + 1, 1:n + 1] == OCEAN)
    east_not_land = (landm[1:l + 1, 1:m + 1, 2:n + 2] != LAND)
    north_not_land = (landm[1:l + 1, 2:m + 2, 1:n + 1] != LAND)

    B = jnp.zeros((6, l, m, n), dtype)
    Ro = par[c.ROSB]
    B = B.at[UU].set(jnp.where(jnp.asarray(ocean & east_not_land),
                               -Ro, 0.0))
    B = B.at[VV].set(jnp.where(jnp.asarray(ocean & north_not_land),
                               -Ro, 0.0))
    B = B.at[TT].set(jnp.where(jnp.asarray(ocean), -1.0, 0.0))
    B = B.at[SS].set(jnp.where(jnp.asarray(ocean), -1.0, 0.0))

    if sres == 0 and rowintcon_mask is not None:
        B = jnp.where(jnp.asarray(rowintcon_mask), 0.0, B)
    return B


# ---------------------------------------------------------------------
# forcing
# ---------------------------------------------------------------------

def wfun(yy: np.ndarray) -> np.ndarray:
    """F. Bryan (1987) analytical zonal wind profile (forcing.F90:489)."""
    ay = np.abs(yy)
    return (0.2 - 0.8 * np.sin(6.0 * ay)
            - 0.5 * (1.0 - np.tanh(10.0 * ay))
            - 0.5 * (1.0 - np.tanh(10.0 * (np.pi / 2.0 - ay))))


def temfun(yy, ymin, ymax, cmpr, forcing_type: int):
    """Idealized temperature profile (forcing.F90:508-518)."""
    if forcing_type == 2:
        return jnp.cos(np.pi * (yy - ymin) / (ymax - ymin))
    return jnp.cos(np.pi * yy / ymax) + cmpr * jnp.sin(np.pi * yy / ymax)


def salfun(yy, ymin, ymax, fper, forcing_type: int):
    """Idealized salinity flux profile (forcing.F90:521-533)."""
    if forcing_type == 2:
        return jnp.cos(np.pi * (yy - ymin) / (ymax - ymin))
    if forcing_type == 1:
        return (jnp.cos(np.pi * yy / ymax)
                + fper * yy / ymax) / jnp.cos(yy)
    return jnp.cos(np.pi * yy / ymax) + fper * yy / ymax


def qint(field: jnp.ndarray, grid: Grid, landm: np.ndarray):
    """Area-weighted surface integral correction (THCM.C:2704-2737):
    cor = sum(f cos(y) (1-landm_surf)) / sum(cos(y) (1-landm_surf))."""
    l, m, n = grid.l, grid.m, grid.n
    w = np.cos(grid.y_ext[1:m + 1])[:, None] \
        * (1.0 - landm[l, 1:m + 1, 1:n + 1])
    w = jnp.asarray(np.broadcast_to(w, (m, n)))
    return jnp.sum(field * w) / jnp.sum(w)


class ForcingFields(NamedTuple):
    """External 2D/3D forcing fields (reference m_usr allocatables).
    Defaults are zeros; idealized profiles are generated in forcing()."""
    taux: jnp.ndarray | None = None
    tauy: jnp.ndarray | None = None
    tatm: jnp.ndarray | None = None
    emip: jnp.ndarray | None = None
    spert: jnp.ndarray | None = None
    adapted_emip: jnp.ndarray | None = None
    qatm: jnp.ndarray | None = None
    albe: jnp.ndarray | None = None
    patm: jnp.ndarray | None = None
    msi: jnp.ndarray | None = None
    gsi: jnp.ndarray | None = None
    qsa: jnp.ndarray | None = None
    internal_temp: jnp.ndarray | None = None
    internal_salt: jnp.ndarray | None = None
    suno: jnp.ndarray | None = None


def forcing(par: jnp.ndarray, grid: Grid, landm: np.ndarray, *,
            tres: int, sres: int, its: int, ite: int, iza: int,
            coupled_T: int, coupled_S: int, forcing_type: int,
            cpl: CouplingCoefs, fields: ForcingFields,
            QTnd: float = 0.0, QSnd: float = 0.0,
            ymin_glob: float | None = None, ymax_glob: float | None = None,
            dtype=jnp.float64) -> jnp.ndarray:
    """Assemble the forcing vector Frc (forcing.F90:4-218), shape
    (6, l, m, n)."""
    l, m, n = grid.l, grid.m, grid.n
    ymin = grid.ymin if ymin_glob is None else ymin_glob
    ymax = grid.ymax if ymax_glob is None else ymax_glob
    yj = jnp.asarray(grid.y_ext[1:m + 1])[:, None]      # (m, 1)
    surf_mask = jnp.asarray(
        1.0 - landm[l, 1:m + 1, 1:n + 1].astype(np.float64))

    Frc = jnp.zeros((6, l, m, n), dtype)

    # -- wind ---------------------------------------------------------
    sigma = par[c.COMB] * par[c.WIND] * par[c.AL_T]
    if iza == 2:
        taux = jnp.broadcast_to(
            jnp.asarray(wfun(grid.yv[1:m + 1]))[:, None], (m, n))
        tauy = jnp.zeros((m, n), dtype)
    else:
        taux = fields.taux
        tauy = fields.tauy
    # rows j = 1..m-1 only (forcing.F90:45-50)
    Frc = Frc.at[UU, l - 1, 0:m - 1, :].set(sigma * taux[0:m - 1])
    Frc = Frc.at[VV, l - 1, 0:m - 1, :].set(sigma * tauy[0:m - 1])

    # -- temperature --------------------------------------------------
    etabi = par[c.COMB] * par[c.TEMP] * (1 - tres + tres * par[c.BIOT])
    temcor = 0.0
    if ite == 1 and coupled_T == 0:
        tatm = jnp.broadcast_to(
            temfun(yj, ymin, ymax, par[c.CMPR], forcing_type), (m, n))
        if tres == 0:
            temcor = qint(tatm, grid, landm)
    else:
        tatm = fields.tatm if fields.tatm is not None \
            else jnp.zeros((m, n), dtype)

    if coupled_T == 1:
        suno = fields.suno
        albe = fields.albe if fields.albe is not None \
            else jnp.zeros((m, n), dtype)
        qatm = fields.qatm if fields.qatm is not None \
            else jnp.zeros((m, n), dtype)
        msi = fields.msi if fields.msi is not None \
            else jnp.zeros((m, n), dtype)
        QToa = (par[c.COMB] * par[c.SUNP] * suno
                * (1.0 - cpl.albe0 - cpl.albed * albe)
                + cpl.Ooa * tatm
                + cpl.lvsc * cpl.eta * cpl.qdim * qatm
                - cpl.lvsc * cpl.eo0)
        QTos = QTnd * cpl.zeta * (cpl.a0 * c.S0 - c.T0)
        Frc = Frc.at[TT, l - 1].set(
            (QToa + msi * (QTos - QToa)) * surf_mask)
    else:
        Frc = Frc.at[TT, l - 1].set(etabi * (tatm - temcor))

    # -- salinity -----------------------------------------------------
    if coupled_S == 1:
        gamma = par[c.COMB] * par[c.SALT]
    else:
        gamma = par[c.COMB] * par[c.SALT] * (1 - sres + sres * par[c.BIOT])

    salcor = 0.0
    if its == 1:
        emip = jnp.broadcast_to(
            salfun(yj, ymin, ymax, par[c.FPER], forcing_type),
            (m, n)) * surf_mask
        if sres == 0 and coupled_S == 0:
            salcor = qint(emip, grid, landm)
    else:
        emip = fields.emip if fields.emip is not None \
            else jnp.zeros((m, n), dtype)

    spert = fields.spert if fields.spert is not None \
        else jnp.zeros((m, n), dtype)
    adapted_emip = fields.adapted_emip if fields.adapted_emip is not None \
        else jnp.zeros((m, n), dtype)
    if sres == 0 and coupled_S == 0:
        adapted_salcor = qint(adapted_emip, grid, landm)
        spertcor = qint(spert, grid, landm)
    else:
        adapted_salcor = 0.0
        spertcor = 0.0

    if coupled_S == 1:
        pQSnd = par[c.COMB] * par[c.SALT] * QSnd
        qatm = fields.qatm if fields.qatm is not None \
            else jnp.zeros((m, n), dtype)
        patm = fields.patm if fields.patm is not None \
            else jnp.zeros((m, n), dtype)
        msi = fields.msi if fields.msi is not None \
            else jnp.zeros((m, n), dtype)
        qsa = fields.qsa if fields.qsa is not None \
            else jnp.zeros((m, n), dtype)
        gsi = fields.gsi if fields.gsi is not None \
            else jnp.zeros((m, n), dtype)
        QSoa = pQSnd * (cpl.eo0 - cpl.eta * cpl.qdim * qatm - patm)
        QSos = pQSnd * (cpl.zeta * (cpl.a0 * c.S0 - c.T0)
                        - cpl.qvar * qsa - cpl.q0) / (c.RHODIM * cpl.Lf)
        Frc = Frc.at[SS, l - 1].set(
            (QSoa + msi * (QSos - QSoa) - gsi) * surf_mask)
    else:
        Frc = Frc.at[SS, l - 1].set(
            gamma * (1.0 - par[c.HMTP]) * (emip - salcor)
            + gamma * par[c.HMTP] * (adapted_emip - adapted_salcor)
            + par[c.SPER] * (1 - sres + sres * par[c.BIOT])
            * (spert - spertcor))

    # -- internal (z-direction) forcing -------------------------------
    if fields.internal_temp is not None:
        it3 = fields.internal_temp   # (l, m, n)
        is3 = fields.internal_salt
        interior = jnp.asarray(
            1.0 - landm[1:l + 1, 1:m + 1, 1:n + 1].astype(np.float64))
        val = -par[c.COMB] * interior[:l - 1] * par[c.RAYL] * (
            par[c.LAMB] * (is3[0:l - 1] + is3[1:l]) / 2.0
            - (it3[0:l - 1] + it3[1:l]) / 2.0)
        Frc = Frc.at[WW, 0:l - 1].set(val)

    return Frc


def intcond_coeff(grid: Grid, landm: np.ndarray) -> np.ndarray:
    """Salinity integral-condition coefficients (thcm_utils.F90:285-312):
    cos(y(j)) * dfzT(k) on SS rows of ocean cells, field layout."""
    l, m, n = grid.l, grid.m, grid.n
    ocean = (landm[1:l + 1, 1:m + 1, 1:n + 1] == OCEAN)
    coeff = np.zeros((6, l, m, n))
    w = np.cos(grid.y_ext[1:m + 1])[None, :, None] \
        * grid.dfzT[:, None, None]
    coeff[SS] = np.where(ocean, np.broadcast_to(w, (l, m, n)), 0.0)
    return coeff
