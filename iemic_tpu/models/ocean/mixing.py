"""Vertical mixing, convective adjustment, neutral physics & GM stirring.

JAX re-implementation of the reference's ATvS-Mix module:

  * ``mix_divergence``   — divergence of the diffusive tracer flux
                           (vmix_fun, mix_imp.f:231-562): Griffies (1998)
                           triad neutral physics + Gent-McWilliams
                           stirring, energetically consistent vertical
                           mixing, and implicit vertical mixing
                           (convective adjustment via the P_VC
                           diffusivity on unstably stratified columns)
  * ``tprslp``/``tprstb``— slope and stability tapers
                           (mix_imp.f:675-727, 837-856)
  * ``mixing_stencil``   — the (27, 2, 2, l, m, n) Jacobian block of the
                           mixing operator w.r.t. (T, S).  The reference
                           approximates this with graph-coloring finite
                           differences (vmix_jac, mix_imp.f:729-815 +
                           MINPACK DSM/FDJS in mix_sup.F90); here the
                           same 27-color partition drives *exact*
                           forward-mode autodiff: one ``jax.linearize``
                           plus 54 tangent applications recovers every
                           stencil entry with no FD truncation error.

Parameters used (par.F90 indices):
  MIXP  isoneutral diffusivity as fraction of PE_H
  MKAP  GM diffusivity as fraction of PE_H
  SPL1  cut-off for the stability taper tprstb
  SPL2  critical slope for neutral physics / GM (tprslp)
  PE_H / PE_V  horizontal / vertical diffusivity
  P_VC  implicit vertical (convective-adjustment) diffusivity
  ENER, ALPC   energetically consistent mixing: eps=(1-ALPC)*ENER*PE_V
  LAMB  ratio of expansion coefficients, NLES nonlinear-EOS switch
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ...grid import Grid
from ...ops.stencil import TT, SS, OCEAN, PERIO, offsets
from . import constants as c

# The reference guards zero denominators with 1e-20 (mix_imp.f epsln).
# TPU f64 is emulated as an f32 pair whose exponent RANGE is f32's
# (~3.4e38): drdh/1e-20 ~ 1e21 squared overflows to inf and poisons
# the Jacobian with NaNs.  1e-15 keeps every intermediate (slp^2 up to
# ~1e34) in range while only changing behavior for |drdz| < 1e-15,
# where the taper output is indistinguishable from the limit anyway.
EPSLN = 1.0e-15


def _isoc(landm: np.ndarray) -> np.ndarray:
    """'is ocean?' indicator on the padded mask (mix_imp.f:817-835);
    PERIO cells count as ocean."""
    return ((landm == OCEAN) | (landm == PERIO)).astype(np.float64)


def pad_ts(x: jnp.ndarray, periodic: bool) -> jnp.ndarray:
    """Stack padded (T, S) ghost fields, shape (2, l+2, m+2, n+2).

    Ghost values are zero except the periodic x-wrap; every ghost
    gradient is killed by the isoc mask anyway (the reference's usol
    mirror values never survive the isoc product in dCdxt/dCdyt/dCdzt,
    mix_imp.f:564-641), so zero padding is equivalent.
    """
    TS = jnp.pad(x[TT:SS + 1], ((0, 0), (1, 1), (1, 1), (1, 1)))
    if periodic:
        TS = TS.at[:, :, :, 0].set(TS[:, :, :, -2])
        TS = TS.at[:, :, :, -1].set(TS[:, :, :, 1])
    return TS


def tprslp(drdh, drdz, delta, tap: int):
    """Slope + taper (mix_imp.f:675-727).  delta = (r0dim/hdim)*SPL2;
    taper width = 1*delta.  Written with double-where guards so that
    forward-mode derivatives stay finite."""
    # sign-preserving minimum magnitude (exact zero -> +EPSLN as in the
    # reference's `if (drdz.eq.0.0) drdz = epsln`), plus a slope clamp:
    # |slp| beyond ~delta is annihilated by every taper, and slp**2
    # must stay inside the emulated-f64 exponent range (see EPSLN note)
    drdz = jnp.where(jnp.abs(drdz) < EPSLN,
                     jnp.where(drdz < 0.0, -EPSLN, EPSLN), drdz)
    slp = jnp.clip(-drdh / drdz, -1.0e12, 1.0e12)
    absslp = jnp.abs(slp)
    if tap == 1:        # Gerdes et al. (1991)
        steep = absslp > delta
        safe = jnp.where(steep, absslp, 1.0)
        tpr = jnp.where(steep, (delta / safe) ** 2, 1.0)
    elif tap == 2:      # Danabasoglu & McWilliams (1995)
        tpr = 0.5 * (1.0 - jnp.tanh((absslp - delta) / delta))
    elif tap == 3:      # De Niet et al. (2007); sd = delta (width=1)
        dum = absslp / delta
        cubic = 1.0 - 3.0 * dum ** 2 + 2.0 * dum ** 3
        tpr = jnp.where((absslp < delta) & (drdz < 0.0), cubic, 0.0)
    else:
        tpr = jnp.ones_like(absslp)
    return slp, tpr


def tprstb(grad, spl, alphaT: float):
    """Stability taper (mix_imp.f:837-856): active (→1) when the
    argument density gradient is destabilizing."""
    return jnp.maximum(jnp.tanh((-grad * alphaT * spl) ** 3), 0.0)


def _precompute(grid: Grid, landm: np.ndarray) -> dict:
    """Static numpy geometry for mix_divergence."""
    l, m, n = grid.l, grid.m, grid.n
    iso = _isoc(landm)                       # (l+2, m+2, n+2)
    cosy = np.cos(grid.y_ext)                # (m+2,)  y(0:m+1)
    cosyv = np.cos(grid.yv)                  # (m+1,)  yv(0:m)
    return dict(
        iso=iso, cosy=cosy, cosyv=cosyv,
        dfzT=grid.dfzT, dfzW=grid.dfzW,
        dx=grid.dx, dy=grid.dy, dz=grid.dz,
        # rows masked strictly by ==OCEAN to match the land-row identity
        # treatment in assembly.boundaries (usrc.F90 rhs: B *= 1-landm)
        ocean3=(landm[1:l + 1, 1:m + 1, 1:n + 1] == OCEAN)
        .astype(np.float64),
        delta_scale=c.R0DIM / grid.hdim,
    )


def mix_divergence(TS: jnp.ndarray, par: jnp.ndarray, geo: dict, *,
                   tap: int, rho_mixing: bool) -> jnp.ndarray:
    """vmix_fun (mix_imp.f:231-562): (2, l+2, m+2, n+2) padded (T,S)
    -> (2, l, m, n) divergence of the diffusive flux (T row, S row).

    The result carries the Fortran's sign convention (mix as it appears
    in B = -Au - mix + Frc); in this framework's residual
    F = An x - Frc + mix (ocean.py), matching THCM's negation.
    """
    Tp, Sp = TS[0], TS[1]
    dtype = TS.dtype
    lp2, mp2, np2 = Tp.shape
    l, m, n = lp2 - 2, mp2 - 2, np2 - 2

    iso = jnp.asarray(geo["iso"], dtype)
    cosy = jnp.asarray(geo["cosy"], dtype)
    cosyv = jnp.asarray(geo["cosyv"], dtype)
    dfzT = jnp.asarray(geo["dfzT"], dtype)
    dfzW = jnp.asarray(geo["dfzW"], dtype)
    dx, dy, dz = geo["dx"], geo["dy"], geo["dz"]

    lam = par[c.LAMB]
    xes = par[c.NLES]
    piso = par[c.MIXP] * par[c.PE_H]
    pgm = par[c.MKAP] * par[c.PE_H]
    eps = (1.0 - par[c.ALPC]) * par[c.ENER] * par[c.PE_V]
    kvc = par[c.P_VC]
    sp1 = par[c.SPL1]
    delta = geo["delta_scale"] * par[c.SPL2]
    alphaT = geo["alphaT"]

    # -- tracer gradients on cell faces (dCdxt/dCdyt/dCdzt) -----------
    def dcdx(C):        # east face: (l+2, m+2, n+1), index i = 0..n
        return (iso[:, :, 1:] * iso[:, :, :-1] * (C[:, :, 1:] - C[:, :, :-1])
                / (dx * cosy[None, :, None]))

    def dcdy(C):        # north face: (l+2, m+1, n+2), index j = 0..m
        return iso[:, 1:, :] * iso[:, :-1, :] * (C[:, 1:, :] - C[:, :-1, :]) / dy

    def dcdz(C):        # top face: (l+1, m+2, n+2), index k = 0..l
        return (iso[1:, :, :] * iso[:-1, :, :] * (C[1:, :, :] - C[:-1, :, :])
                / (dz * dfzW[:, None, None]))

    dtdxe, dsdxe = dcdx(Tp), dcdx(Sp)
    dtdyn, dsdyn = dcdy(Tp), dcdy(Sp)
    dtdzt, dsdzt = dcdz(Tp), dcdz(Sp)

    # density derivative wrt T (drhodC, mix_imp.f:643-673); drho/dS = lam
    rho = lam * Sp - Tp - xes * (c.ALPT1 * Tp + c.ALPT2 * Tp ** 2
                                 - c.ALPT3 * Tp ** 3)
    drhodt = -1.0 - xes * (c.ALPT1 + 2.0 * c.ALPT2 * Tp
                           - 3.0 * c.ALPT3 * Tp ** 2)
    drhodzt = dcdz(rho)

    ksl = slice(1, l + 1)
    jsl = slice(1, m + 1)
    isl = slice(1, n + 1)

    # -- east-face fluxes Ftxe/Fsxe: (l, m, n+1), face i = 0..n -------
    Ftxe = jnp.zeros((l, m, n + 1), dtype)
    Fsxe = jnp.zeros((l, m, n + 1), dtype)
    for kr in (0, 1):
        for ip in (0, 1):
            rt = drhodt[ksl, jsl, ip:n + 1 + ip]
            gtz = dtdzt[kr:l + kr, jsl, ip:n + 1 + ip]
            gsz = dsdzt[kr:l + kr, jsl, ip:n + 1 + ip]
            gtx = dtdxe[ksl, jsl, :]
            gsx = dsdxe[ksl, jsl, :]
            drdh = rt * gtx + lam * gsx
            drdz = rt * gtz + lam * gsz
            slp, tpr = tprslp(drdh, drdz, delta, tap)
            w = dfzW[kr:l + kr, None, None]
            Ftxe = Ftxe + w * (tpr * piso * gtx + tpr * (piso - pgm) * slp * gtz)
            Fsxe = Fsxe + w * (tpr * piso * gsx + tpr * (piso - pgm) * slp * gsz)
    Ftxe = -Ftxe / (4.0 * dfzT[:, None, None])
    Fsxe = -Fsxe / (4.0 * dfzT[:, None, None])

    # -- north-face fluxes Ftyn/Fsyn: (l, m+1, n), face j = 0..m ------
    # (face j = 0 stays zero: the Fortran loop only writes j = 1..m)
    Ft = jnp.zeros((l, m, n), dtype)
    Fs = jnp.zeros((l, m, n), dtype)
    for kr in (0, 1):
        for jq in (0, 1):
            rt = drhodt[ksl, 1 + jq:m + 1 + jq, isl]
            gtz = dtdzt[kr:l + kr, 1 + jq:m + 1 + jq, isl]
            gsz = dsdzt[kr:l + kr, 1 + jq:m + 1 + jq, isl]
            gty = dtdyn[ksl, 1:m + 1, isl]
            gsy = dsdyn[ksl, 1:m + 1, isl]
            drdh = rt * gty + lam * gsy
            drdz = rt * gtz + lam * gsz
            slp, tpr = tprslp(drdh, drdz, delta, tap)
            w = dfzW[kr:l + kr, None, None] * cosy[None, 1 + jq:m + 1 + jq, None]
            Ft = Ft + w * (tpr * piso * gty + tpr * (piso - pgm) * slp * gtz)
            Fs = Fs + w * (tpr * piso * gsy + tpr * (piso - pgm) * slp * gsz)
    den = 4.0 * dfzT[:, None, None] * cosyv[None, 1:m + 1, None]
    Ftyn = jnp.concatenate([jnp.zeros((l, 1, n), dtype), -Ft / den], axis=1)
    Fsyn = jnp.concatenate([jnp.zeros((l, 1, n), dtype), -Fs / den], axis=1)

    # -- top-face fluxes Ftzt/Fszt: (l+1, m, n), face k = 0..l --------
    # (face k = 0 stays zero)
    Ft = jnp.zeros((l, m, n), dtype)
    Fs = jnp.zeros((l, m, n), dtype)
    gtzc = dtdzt[1:l + 1, jsl, isl]          # dtdzt(i, j, k), k = 1..l
    gszc = dsdzt[1:l + 1, jsl, isl]
    for kr in (0, 1):
        rt = drhodt[1 + kr:l + 1 + kr, jsl, isl]
        # zonal triads
        for ip in (0, 1):
            gtx = dtdxe[1 + kr:l + 1 + kr, jsl, ip:n + ip]
            gsx = dsdxe[1 + kr:l + 1 + kr, jsl, ip:n + ip]
            drdh = rt * gtx + lam * gsx
            drdz = rt * gtzc + lam * gszc
            slp, tpr = tprslp(drdh, drdz, delta, tap)
            Ft = Ft + tpr * piso * slp * slp * gtzc + tpr * (piso + pgm) * slp * gtx
            Fs = Fs + tpr * piso * slp * slp * gszc + tpr * (piso + pgm) * slp * gsx
        # meridional triads
        for jq in (0, 1):
            gty = dtdyn[1 + kr:l + 1 + kr, jq:m + jq, isl]
            gsy = dsdyn[1 + kr:l + 1 + kr, jq:m + jq, isl]
            drdh = rt * gty + lam * gsy
            drdz = rt * gtzc + lam * gszc
            slp, tpr = tprslp(drdh, drdz, delta, tap)
            Ft = Ft + tpr * piso * slp * slp * gtzc + tpr * (piso + pgm) * slp * gty
            Fs = Fs + tpr * piso * slp * slp * gszc + tpr * (piso + pgm) * slp * gsy
    Ftzt = -Ft / 4.0
    Fszt = -Fs / 4.0

    # energetically consistent vertical mixing (eps term); the
    # denominator keeps a sign-preserving minimum magnitude for the
    # emulated-f64 range (see EPSLN note)
    stb = tprstb(drhodzt[1:l + 1, jsl, isl], sp1, alphaT)
    draw = drhodzt[1:l + 1, jsl, isl] - EPSLN
    dsafe = jnp.where(jnp.abs(draw) < EPSLN,
                      jnp.where(draw < 0.0, -EPSLN, EPSLN), draw)
    Ftzt = Ftzt + stb * eps * gtzc / dsafe
    Fszt = Fszt + stb * eps * gszc / dsafe
    Ftzt = jnp.concatenate([jnp.zeros((1, m, n), dtype), Ftzt], axis=0)
    Fszt = jnp.concatenate([jnp.zeros((1, m, n), dtype), Fszt], axis=0)

    # implicit vertical mixing / convective adjustment (P_VC term):
    # face flux -tprstb(-drho/dz)*kvc*dC/dz, (l+1, m, n), face k = 0..l
    cadj = tprstb(-drhodzt[1:l + 1, jsl, isl], sp1, alphaT) * kvc
    Ftimp = jnp.concatenate([jnp.zeros((1, m, n), dtype), -cadj * gtzc], axis=0)
    Fsimp = jnp.concatenate([jnp.zeros((1, m, n), dtype), -cadj * gszc], axis=0)

    # -- flux divergences ---------------------------------------------
    cy = cosy[None, 1:m + 1, None]
    dzT = dz * dfzT[:, None, None]
    divT = ((Ftxe[:, :, 1:] - Ftxe[:, :, :-1]) / (dx * cy)
            + (Ftyn[:, 1:, :] * cosyv[None, 1:, None]
               - Ftyn[:, :-1, :] * cosyv[None, :-1, None]) / (dy * cy)
            + (Ftzt[1:] - Ftzt[:-1]) / dzT)
    divS = ((Fsxe[:, :, 1:] - Fsxe[:, :, :-1]) / (dx * cy)
            + (Fsyn[:, 1:, :] * cosyv[None, 1:, None]
               - Fsyn[:, :-1, :] * cosyv[None, :-1, None]) / (dy * cy)
            + (Fszt[1:] - Fszt[:-1]) / dzT)

    dFti = (Ftimp[1:] - Ftimp[:-1])
    dFsi = (Fsimp[1:] - Fsimp[:-1])
    if rho_mixing:
        # mix density instead of T and S when the EOS is linear
        # (mix_imp.f:512-524, 544-556); the nonlinear-EOS case falls
        # back to plain T/S mixing at trace time via the xes switch
        lin_eos = (xes == 0.0)
        impT = jnp.where(lin_eos, (dFti - dFsi * lam) / (2.0 * dzT),
                         dFti / dzT)
        impS = jnp.where(lin_eos, (dFsi - dFti / lam) / (2.0 * dzT),
                         dFsi / dzT)
    else:
        impT = dFti / dzT
        impS = dFsi / dzT

    ocean3 = jnp.asarray(geo["ocean3"], dtype)
    return jnp.stack([(divT + impT) * ocean3, (divS + impS) * ocean3])


class Mixing:
    """Precomputed mixing operator bound to one grid + landmask.

    ``rhs(x, par)``     -> (2, l, m, n) mixing term on the (T, S) rows
    ``stencil(x, par)`` -> (27, 2, 2, l, m, n) exact Jacobian block

    vmix semantics (vmix_init, mix_imp.f:58-109): vmix=0 disables,
    vmix=1 fixed partition (always active), vmix=2 adapts activity to
    whether the T/S fields are nonzero (vmix_control, mix_imp.f:131-166)
    — here a traced norm test instead of mutable module state.
    """

    def __init__(self, grid: Grid, landm: np.ndarray, *, vmix: int,
                 tap: int, rho_mixing: bool, alphaT: float,
                 periodic: bool):
        self.vmix = vmix
        self.tap = tap
        self.rho_mixing = rho_mixing
        self.periodic = periodic
        self.geo = _precompute(grid, landm)
        self.geo["alphaT"] = alphaT
        l, m, n = grid.l, grid.m, grid.n
        self.shape = (l, m, n)
        # 27-color index: for stencil slot p at row (k,j,i) the colored
        # seed hitting neighbor (k+dk, j+dj, i+di) has color
        # 9*((k+1+dk)%3) + 3*((j+1+dj)%3) + ((i+1+di)%3)  (padded idx)
        offs = offsets()
        kk = np.arange(l)[:, None, None]
        jj = np.arange(m)[None, :, None]
        ii = np.arange(n)[None, None, :]
        cidx = np.empty((27, l, m, n), np.int32)
        for p in range(27):
            di, dj, dk = offs[p]
            cidx[p] = (9 * ((kk + 1 + dk) % 3) + 3 * ((jj + 1 + dj) % 3)
                       + ((ii + 1 + di) % 3))
        self.color_index = jnp.asarray(cidx)

    def _active(self, x: jnp.ndarray) -> jnp.ndarray:
        """(2,) activity gates for the T and S rows."""
        if self.vmix <= 1:
            return jnp.ones((2,), x.dtype)
        nt = jnp.sqrt(jnp.sum(x[TT] ** 2))
        ns = jnp.sqrt(jnp.sum(x[SS] ** 2))
        return jnp.stack([jnp.where(nt > 1e-12, 1.0, 0.0),
                          jnp.where(ns > 1e-12, 1.0, 0.0)]).astype(x.dtype)

    def rhs(self, x: jnp.ndarray, par: jnp.ndarray) -> jnp.ndarray:
        """Mixing contribution to the residual F = An x - Frc + mix."""
        TS = pad_ts(x, self.periodic)
        mix = mix_divergence(TS, par, self.geo, tap=self.tap,
                             rho_mixing=self.rho_mixing)
        return mix * self._active(x)[:, None, None, None]

    def stencil(self, x: jnp.ndarray, par: jnp.ndarray) -> jnp.ndarray:
        """Exact (27, 2, 2, l, m, n) Jacobian block d mix / d (T, S).

        27-color forward-mode autodiff: each color seeds every third
        padded cell in each dimension, so each residual row sees exactly
        one seeded neighbor per color and the tangent output *is* that
        stencil entry (the autodiff analog of DSM/FDJS coloring,
        mix_sup.F90).
        """
        l, m, n = self.shape
        TS0 = pad_ts(x, self.periodic)

        def f(TS):
            return mix_divergence(TS, par, self.geo, tap=self.tap,
                                  rho_mixing=self.rho_mixing)

        _, f_lin = jax.linearize(f, TS0)

        kk = jnp.arange(l + 2)[:, None, None]
        jj = jnp.arange(m + 2)[None, :, None]
        ii = jnp.arange(n + 2)[None, None, :]

        def tangent(col):
            """col = 27*b + color  ->  (2, l, m, n) derivatives."""
            b = col // 27
            cc = col % 27
            mask = ((kk % 3 == cc // 9) & (jj % 3 == (cc // 3) % 3)
                    & (ii % 3 == cc % 3)).astype(TS0.dtype)
            seed = jnp.stack([jnp.where(b == 0, mask, 0.0),
                              jnp.where(b == 1, mask, 0.0)])
            return f_lin(seed)

        outs = jax.vmap(tangent)(jnp.arange(54))    # (54, 2, l, m, n)
        outs = outs.reshape(2, 27, 2, l, m, n)      # [b, color, a, ...]

        blk = jnp.empty((27, 2, 2, l, m, n), TS0.dtype)
        for a in range(2):
            for b in range(2):
                blk = blk.at[:, a, b].set(jnp.take_along_axis(
                    outs[b, :, a], self.color_index, axis=0))
        act = self._active(x)
        return blk * act[None, :, None, None, None, None]
