"""Energy-balance moisture atmosphere model (T_a, q, albedo + global P).

TPU-native re-implementation of the reference's atmosphere
(src/atmosphere/AtmosLocal.C/H + src/atmosphere/Atmosphere.C/H): a 2D
energy-balance / moisture / albedo model with three unknowns per cell
(T_a, q anomaly, albedo) and one auxiliary global precipitation
anomaly P, discretized on the same lat-lon grid as the ocean with a
5-point diffusion stencil, plus:

  * sensible/longwave/shortwave/latent heat fluxes (AtmosLocal.C:871+)
  * evaporation/precipitation (AtmosLocal.C:1042-1117)
  * snow/ice albedo parametrization with tanh switches
    (AtmosLocal.C:1120-1139 aF, AtmosLocal.H:436-474)
  * integral condition for q and the global precipitation row
    (Atmosphere.C:1010-1100)

There is no serial/parallel split: one jitted model covers the full
domain; sharding is the job of the XLA partitioner.  Where the
reference computes albedo-equation derivatives by finite differences
(AtmosLocal.H:460-470 "lazy: finite difference"), we use exact jax
autodiff.

State layout: flat (dim,) with dim = 3*n*m*l + aux in the reference's
row ordering row = nun*((k*m + j)*n + i) + XX, auxiliary P appended
(AtmosLocal.C:1496-1517 find_row).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...config import ParameterList
from ...utils import logging as log

NUN = 3
TT, QQ, AA = 0, 1, 2


def default_atmosphere_params() -> ParameterList:
    """Defaults from AtmosLocal::setParameters (AtmosLocal.C:105-170)
    and the parallel Atmosphere constructor (Atmosphere.C:20-46)."""
    p = ParameterList("Atmosphere")
    p.set("Global Grid-Size n", 16)
    p.set("Global Grid-Size m", 16)
    p.set("Global Grid-Size l", 1)
    p.set("Global Bound xmin", 286.0)
    p.set("Global Bound xmax", 350.0)
    p.set("Global Bound ymin", 10.0)
    p.set("Global Bound ymax", 74.0)
    p.set("Periodic", False)
    p.set("Auxiliary unknowns", 1)
    p.set("Use integral condition", True)
    p.set("Use idealized precipitation", False)
    p.set("atmospheric density", 1.25)
    p.set("oceanic density", 1024.0)
    p.set("atmospheric scale height", 8400.0)
    p.set("humidity scale height", 1800.0)
    p.set("vertical length scale", 4000.0)
    p.set("heat capacity", 1000.0)
    p.set("temperature eddy diffusivity", 3.1e+06)
    p.set("humidity eddy diffusivity", 1e+06)
    p.set("radiative flux param A", 212.0)
    p.set("radiative flux param B", 1.5)
    p.set("solar constant", 1360.0)
    p.set("atmospheric absorption coefficient", 0.43)
    p.set("Dalton number", 1.3e-03)
    p.set("exchange coefficient ch", 0.94 * 1.3e-03)
    p.set("mean atmospheric surface wind speed", 8.5)
    p.set("background temperature atmosphere", 15.0)
    p.set("background temperature ocean", 15.0)
    p.set("background temperature seaice", -5.0)
    p.set("temperature scale", 1.0)
    p.set("atmos reference humidity", 2e-3)
    p.set("atmos humidity scale", 1e-3)
    p.set("latent heat of vaporization", 2.5e06)
    p.set("horizontal velocity of the ocean", 0.1)
    p.set("radius of the earth", 6.37e+06)
    p.set("reference albedo", 0.3)
    p.set("albedo excursion", 0.5)
    p.set("restoring timescale tauf (in days)", 1.0)
    p.set("restoring timescale tauc (in days)", 1.0)
    p.set("melt temperature threshold (deg C)", 0.0)
    p.set("rain/snow temperature threshold (deg C)", 1.0)
    p.set("accumulation precipitation threshold (m/y)", 0.2)
    p.set("melt threshold width (deg C)", 5.0)
    p.set("rain/snow threshold width (deg C)", 1.0)
    p.set("accumulation threshold width (m/y)", 0.1)
    # continuation parameters (AtmosLocal.C:152-170)
    p.set("Combined Forcing", 0.0)
    p.set("Solar Forcing", 1.0)
    p.set("Longwave Forcing", 1.0)
    p.set("Humidity Forcing", 1.0)
    p.set("Latent Heat Forcing", 1.0)
    p.set("Albedo Forcing", 1.0)
    p.set("T Eddy Diffusivity", 1.0)
    # dependencies normally provided by the ocean (m_atm defaults
    # Ooa = Os = 1.0, reference atm.F90:26-29)
    p.set("Ooa", 1.0)
    p.set("Os", 1.0)
    return p


PAR_ORDER = ["Combined Forcing", "Solar Forcing", "Longwave Forcing",
             "Humidity Forcing", "Latent Heat Forcing", "Albedo Forcing",
             "T Eddy Diffusivity"]
(P_COMB, P_SUNP, P_LONF, P_HUMF, P_LATF, P_ALBF, P_TDIF) = range(7)


class AtmosJac(NamedTuple):
    """Assembled dependency structure: 9-point 2D stencil blocks,
    dense coupling to the auxiliary P, and the P-row coefficients."""
    stencil: jnp.ndarray   # (9, 3, 3, m, n)
    col_P: jnp.ndarray     # (3, m, n) dependency of each eq on P
    prow_q: jnp.ndarray    # (m, n) P-row coefficients on q
    prow_P: jnp.ndarray    # scalar P->P coefficient


# 2D stencil offsets matching the reference's 9-point numbering
# (loc 1..9; di = (loc-1)//3 - 1, dj = (loc-1)%3 - 1)
_OFFS2D = [((p // 3) - 1, (p % 3) - 1) for p in range(9)]


class Atmosphere:
    """Atmosphere model implementing the Model contract."""

    def __init__(self, params: ParameterList | dict | None = None,
                 surfmask: np.ndarray | None = None):
        if params is None:
            params = ParameterList("Atmosphere")
        if isinstance(params, dict):
            params = ParameterList("Atmosphere", params)
        params.validate_and_set_defaults(default_atmosphere_params())
        self.params = params
        g = params.get

        self.n = g("Global Grid-Size n")
        self.m = g("Global Grid-Size m")
        self.l = g("Global Grid-Size l")
        self.aux = g("Auxiliary unknowns")
        self.periodic = bool(g("Periodic"))
        self.use_intcond_q = bool(g("Use integral condition"))
        n, m, l = self.n, self.m, self.l
        self.dim = NUN * n * m * l + self.aux

        self.xmin = np.deg2rad(g("Global Bound xmin"))
        self.xmax = np.deg2rad(g("Global Bound xmax"))
        self.ymin = np.deg2rad(g("Global Bound ymin"))
        self.ymax = np.deg2rad(g("Global Bound ymax"))
        self.dx = (self.xmax - self.xmin) / n
        self.dy = (self.ymax - self.ymin) / m

        j = np.arange(m + 1, dtype=np.float64)
        self.yv = self.ymin + j * self.dy            # yv[0..m]
        self.yc = self.ymin + (j - 0.5) * self.dy    # yc[0..m]; yc[j] j>=1
        self.datc = 0.9 + 1.5 * np.exp(-12 * self.yc ** 2 / np.pi)
        self.datv = 0.9 + 1.5 * np.exp(-12 * self.yv ** 2 / np.pi)

        # physical parameters (setup(), AtmosLocal.C:172-260)
        self.rhoa = g("atmospheric density")
        self.rhoo = g("oceanic density")
        self.hdima = g("atmospheric scale height")
        self.hdimq = g("humidity scale height")
        self.cpa = g("heat capacity")
        self.D0 = g("temperature eddy diffusivity")
        self.kappa = g("humidity eddy diffusivity")
        self.arad = g("radiative flux param A")
        self.brad = g("radiative flux param B")
        self.sun0 = g("solar constant")
        self.c0 = g("atmospheric absorption coefficient")
        self.ce = g("Dalton number")
        self.ch = g("exchange coefficient ch")
        self.uw = g("mean atmospheric surface wind speed")
        self.t0a = g("background temperature atmosphere")
        self.t0o = g("background temperature ocean")
        self.t0i = g("background temperature seaice")
        self.tdim = g("temperature scale")
        self.q0 = g("atmos reference humidity")
        self.qdim = g("atmos humidity scale")
        self.lv = g("latent heat of vaporization")
        self.udim = g("horizontal velocity of the ocean")
        self.r0dim = g("radius of the earth")
        self.a0 = g("reference albedo")
        self.da = g("albedo excursion")
        self.tauf = g("restoring timescale tauf (in days)") \
            * 3600.0 * 24.0 * self.udim / self.r0dim
        self.tauc = g("restoring timescale tauc (in days)") \
            * 3600.0 * 24.0 * self.udim / self.r0dim
        self.Tm = g("melt temperature threshold (deg C)") - self.t0o
        self.Tr = g("rain/snow temperature threshold (deg C)") - self.t0o
        self.Pa = g("accumulation precipitation threshold (m/y)")
        self.epm = g("melt threshold width (deg C)")
        self.epr = g("rain/snow threshold width (deg C)")
        self.epa = g("accumulation threshold width (m/y)")

        self.muoa = self.rhoa * self.ch * self.cpa * self.uw
        self.amua = (self.arad + self.brad * self.t0a) / self.muoa
        self.bmua = self.brad / self.muoa
        self.Ai = self.rhoa * self.hdima * self.cpa * self.udim \
            / (self.r0dim * self.muoa)
        self.Ad = self.rhoa * self.hdima * self.cpa * self.D0 \
            / (self.muoa * self.r0dim ** 2)
        self.As = self.sun0 * (1 - self.c0) / (4 * self.muoa)
        self.eta = (self.rhoa / self.rhoo) * self.ce * self.uw
        self.Phv = self.kappa / (self.udim * self.r0dim)

        # saturation humidity (Bolton 1980, AtmosLocal.C:199-242)
        c1, c2, c3, c4, c5 = 3.8e-3, 21.87, 265.5, 17.67, 243.5
        self.qso = c1 * np.exp(c4 * self.t0o / (self.t0o + c5))
        self.qsi = c1 * np.exp(c2 * self.t0i / (self.t0i + c3))
        self.Eo0 = self.eta * (self.qso - self.q0)
        self.Ei0 = self.eta * (self.qsi - self.q0)
        self.Cs = (self.Ei0 - self.Eo0) / self.eta / self.qdim
        self.Po0 = self.Eo0
        self.dqso = 5e-4    # reference hack (AtmosLocal.C:233)
        self.dqsi = (c1 * c2 * c3) / (self.t0i + c3) ** 2 \
            * np.exp(c2 * self.t0i / (self.t0i + c3))
        self.lvscale = self.rhoo * self.lv / self.muoa

        # ocean-provided coefficients (reference getdeps / atm.F90);
        # dynamic: updated by synchronize() in coupled runs
        self.Ooa = float(g("Ooa"))
        self.Os = float(g("Os"))

        # continuation parameter vector
        self.par = jnp.asarray([g(name) for name in PAR_ORDER])

        self._update_sun()

        # surface mask (m, n) int: 1 = land
        if surfmask is None:
            surfmask = np.zeros((m, n), dtype=np.int32)
        self.surfmask = surfmask.astype(np.int32)
        ocean_srf = (self.surfmask == 0)

        # integral coefficients (AtmosLocal.C:560-583): cos(yc) dx dy
        w = np.cos(self.yc[1:m + 1])[:, None] * self.dx * self.dy
        self.ic_coeff = np.broadcast_to(w, (m, n)).copy()     # all cells
        self.p_coeff = np.where(ocean_srf, self.ic_coeff, 0.0)
        self.total_area = float(self.p_coeff.sum())

        # precipitation distribution (AtmosLocal.C:495-516 fillPdist),
        # adjusted so its area integral is 1 (computePrecipitation)
        y2d = np.broadcast_to(self.yc[1:m + 1][:, None], (m, n))
        pdist = 2 * np.exp(-(6 * y2d) ** 2) + np.sin(2.0 * y2d) ** 2
        pdist = np.where(ocean_srf, pdist, 0.0)
        int_pdist = float((self.p_coeff * pdist).sum()) / self.total_area
        self.pdist = np.where(np.abs(pdist) > 0.0,
                              pdist + 1.0 - int_pdist, 0.0)

        # external fields
        self.sst = jnp.zeros((m, n))
        self.sit = jnp.zeros((m, n))
        self.msi = jnp.zeros((m, n))

        # state / results
        self.state = jnp.zeros(self.dim)
        self.rhs = jnp.zeros(self.dim)
        self.sol = jnp.zeros(self.dim)
        self.jac: AtmosJac | None = None
        self.diagB = None

        self._build_jitted()
        log.INFO(f"Atmosphere: initialized {n}x{m} grid, dim={self.dim}")

    # ------------------------------------------------------------------
    def _update_sun(self):
        leg = 1.0 - 0.482 * (3 * np.sin(self.yc) ** 2 - 1.0) / 2.0
        self.leg = leg                # latitudinal profile, index j (0..m)
        self.suna = self.As * leg
        self.suno = self.Os * leg

    # -- state helpers -------------------------------------------------
    def split(self, x):
        """flat -> ((3, m, n) fields, P scalar)."""
        n, m, l = self.n, self.m, self.l
        fields = x[:NUN * n * m * l].reshape(m, n, NUN).transpose(2, 0, 1)
        P = x[-1] if self.aux == 1 else jnp.asarray(0.0)
        return fields, P

    def join(self, fields, P):
        flat = fields.transpose(1, 2, 0).reshape(-1)
        if self.aux == 1:
            flat = jnp.concatenate([flat, P.reshape(1)])
        return flat

    # ------------------------------------------------------------------
    def _build_jitted(self):
        n, m = self.n, self.m
        ocean_srf = jnp.asarray((self.surfmask == 0).astype(np.float64))
        land_srf = 1.0 - ocean_srf
        yc = self.yc
        leg_j = jnp.asarray(self.leg[1:m + 1])[:, None]
        suna_j = self.As * leg_j
        pdist = jnp.asarray(self.pdist)
        ic_coeff = jnp.asarray(self.ic_coeff)
        p_coeff = jnp.asarray(self.p_coeff)
        total_area = self.total_area

        # -- static diffusion atoms (discretize, AtmosLocal.C:1141+) --
        def d2_atoms(dat_on: bool):
            """(9, m, n) atoms for xx+yy diffusion with optional
            latitudinal diffusivity profile dat."""
            atom = np.zeros((9, m, n))
            cosdx2i = 1.0 / (np.cos(yc[1:m + 1]) * self.dx) ** 2
            datc = self.datc[1:m + 1] if dat_on else np.ones(m)
            v2 = (datc * cosdx2i)[:, None] * np.ones((m, n))
            atom[1] += v2      # loc 2 (west)
            atom[7] += v2      # loc 8 (east)
            atom[4] += -2 * v2
            dy2i = 1.0 / self.dy ** 2
            datv = self.datv if dat_on else np.ones(m + 1)
            v4 = (dy2i * datv[0:m] * np.cos(self.yv[0:m])
                  / np.cos(yc[1:m + 1]))[:, None] * np.ones((m, n))
            v6 = (dy2i * datv[1:m + 1] * np.cos(self.yv[1:m + 1])
                  / np.cos(yc[1:m + 1]))[:, None] * np.ones((m, n))
            atom[3] += v4      # loc 4 (south)
            atom[5] += v6      # loc 6 (north)
            atom[4] += -(v4 + v6)
            return atom

        txx_tyy = jnp.asarray(d2_atoms(True))
        qxx_qyy = jnp.asarray(d2_atoms(False))

        def boundaries(st):
            """Fold west/east (non-periodic) and north/south stencil
            legs into the center for the diagonal (XX,XX) entries
            (AtmosLocal.C:1436-1478)."""
            for a in range(NUN):
                if not self.periodic:
                    st = st.at[4, a, a, :, 0].add(st[1, a, a, :, 0])
                    st = st.at[1, a, a, :, 0].set(0.0)
                    st = st.at[4, a, a, :, n - 1].add(st[7, a, a, :, n - 1])
                    st = st.at[7, a, a, :, n - 1].set(0.0)
                st = st.at[4, a, a, m - 1, :].add(st[5, a, a, m - 1, :])
                st = st.at[5, a, a, m - 1, :].set(0.0)
                st = st.at[4, a, a, 0, :].add(st[3, a, a, 0, :])
                st = st.at[3, a, a, 0, :].set(0.0)
            return st

        # -- albedo parametrization (aF, AtmosLocal.C:1120-1139) ------
        def H(x, eps):
            return 0.5 * (1.0 + jnp.tanh(x / eps))

        def Tl(A, Ta, comb, sunp, Ooa, Os):
            return Ta + comb * sunp * (Os * leg_j) \
                * ((1 - self.a0) - self.da * A) / Ooa

        def aF(A, Ta, P, comb, sunp, Ooa, Os):
            dimP = 3600.0 * 24.0 * 365.0 * pdist \
                * (self.Po0 + self.eta * self.qdim * P)
            tl = Tl(A, Ta, comb, sunp, Ooa, Os)
            return (H(self.Tm - tl, self.epm)
                    * H(self.Tr - tl, self.epr)
                    * H(dimP - self.Pa, self.epa))

        def jac_fn(x, par, sst, sit, msi, Ooa, Os):
            """Dependency assembly (computeJacobian,
            AtmosLocal.C:585-780) with exact autodiff in place of the
            reference's FD for the albedo derivatives."""
            comb, sunp, lonf, humf = (par[P_COMB], par[P_SUNP],
                                      par[P_LONF], par[P_HUMF])
            latf, albf, tdif = par[P_LATF], par[P_ALBF], par[P_TDIF]
            nuq = comb * humf * (self.eta / self.hdimq) \
                * (self.rhoo / self.rhoa) * (self.r0dim / self.udim)

            fields, P = self.split(x)
            Ta, q, A = fields[TT], fields[QQ], fields[AA]

            st = jnp.zeros((9, NUN, NUN, m, n))
            # TT,TT: tdif*Ad*(txx+tyy) - tc - bmua*tc2
            tc = ocean_srf    # center atom masked by land
            st = st.at[:, TT, TT].set(tdif * self.Ad * txx_tyy)
            st = st.at[4, TT, TT].add(-tc - self.bmua)
            # TT,AA diag
            dTadA = -comb * sunp * suna_j * self.da
            dTldA = -comb * sunp * (Os * leg_j) * self.da / Ooa
            st = st.at[4, TT, AA].set(land_srf * (dTldA + dTadA)
                                      + ocean_srf * dTadA)
            # QQ,QQ: Phv*(qxx+qyy) - nuq*qc
            st = st.at[:, QQ, QQ].set(self.Phv * qxx_qyy)
            st = st.at[4, QQ, QQ].add(-nuq * ocean_srf)

            # albedo equation derivatives (exact autodiff; the
            # reference uses forward differences, AtmosLocal.H:460-470)
            daFdA = jax.grad(
                lambda A_: jnp.sum(aF(A_, Ta, P, comb, sunp, Ooa, Os)))(A)
            daFdT = jax.grad(
                lambda T_: jnp.sum(aF(A, T_, P, comb, sunp, Ooa, Os)))(Ta)
            daFdP = jax.jacfwd(
                lambda P_: aF(A, Ta, P_, comb, sunp, Ooa, Os))(P)
            dAdA = land_srf * (comb * albf * daFdA - 1.0) / self.tauf \
                + ocean_srf * (-1.0 / self.tauc)
            dAdT = land_srf * comb * albf * daFdT / self.tauf
            st = st.at[4, AA, AA].set(dAdA)
            st = st.at[4, AA, TT].set(dAdT)

            # dependencies on the auxiliary P
            col_P = jnp.zeros((NUN, m, n))
            if self.aux == 1:
                col_P = col_P.at[TT].set(
                    comb * latf * self.lvscale * self.eta
                    * self.qdim * pdist)
                col_P = col_P.at[QQ].set(-nuq * pdist)
                dAdP = land_srf * comb * albf * daFdP / self.tauf
                col_P = col_P.at[AA].set(dAdP)

            st = boundaries(st)

            prow_q = -p_coeff / total_area
            return AtmosJac(stencil=st, col_P=col_P, prow_q=prow_q,
                            prow_P=jnp.asarray(-1.0))

        def matvec(J: AtmosJac, v):
            fields, P = self.split(v)
            # pad with zeros (or periodic wrap) in x; walls in y
            fp = jnp.pad(fields, ((0, 0), (1, 1), (1, 1)))
            if self.periodic:
                fp = fp.at[:, :, 0].set(fp[:, :, n])
                fp = fp.at[:, :, -1].set(fp[:, :, 1])
            windows = jnp.stack([
                fp[:, 1 + dj:1 + dj + m, 1 + di:1 + di + n]
                for (di, dj) in _OFFS2D])    # (9, 3, m, n)
            y = jnp.einsum('pABji,pBji->Aji', J.stencil, windows)
            if self.aux == 1:
                y = y + J.col_P * P
            # integral condition replaces the last q row
            if self.use_intcond_q:
                icq = jnp.sum(ic_coeff * fields[QQ])
                y = y.at[QQ, m - 1, n - 1].set(icq)
            if self.aux == 1:
                yP = jnp.sum(J.prow_q * fields[QQ]) + J.prow_P * P
            else:
                yP = jnp.asarray(0.0)
            return self.join(y, yP)

        def forcing_fn(x, par, sst, sit, msi, Ooa, Os):
            """(AtmosLocal.C:871-985 forcing)"""
            comb, sunp, lonf = par[P_COMB], par[P_SUNP], par[P_LONF]
            latf, albf = par[P_LATF], par[P_ALBF]
            nuq = comb * par[P_HUMF] * (self.eta / self.hdimq) \
                * (self.rhoo / self.rhoa) * (self.r0dim / self.udim)
            fields, P = self.split(x)
            Ta, q, A = fields[TT], fields[QQ], fields[AA]

            QSW = suna_j * (1 - self.a0)
            # temperature forcing
            f_land = comb * sunp * (Os * leg_j) * (1 - self.a0) / Ooa \
                + comb * (sunp * QSW - lonf * self.amua)
            Ts = sst + msi * (sit - sst + self.t0i - self.t0o)
            f_ocean = Ts + comb * (sunp * QSW - lonf * self.amua) \
                + comb * latf * self.lvscale * pdist * self.Po0
            fT = land_srf * f_land + ocean_srf * f_ocean

            # humidity forcing
            Eo = (self.tdim / self.qdim) * self.dqso * sst
            Ei = (self.tdim / self.qdim) * self.dqsi * sit
            fq = ocean_srf * nuq * (Eo + msi * (Ei - Eo + self.Cs))

            # albedo forcing (full nonlinear equation)
            af = aF(A, Ta, P, comb, sunp, Ooa, Os)
            fA = land_srf * (comb * albf * af - A) / self.tauf \
                + ocean_srf * (comb * albf * msi - A) / self.tauc

            frc = jnp.stack([fT, fq, fA])
            if self.use_intcond_q:
                frc = frc.at[QQ, m - 1, n - 1].set(0.0)
            return frc

        def rhs_fn(x, par, sst, sit, msi, Ooa, Os):
            """(AtmosLocal.C:782-860 computeRHS +
            Atmosphere.C:266-391 incl. aux row)"""
            J = jac_fn(x, par, sst, sit, msi, Ooa, Os)
            frc = forcing_fn(x, par, sst, sit, msi, Ooa, Os)
            y = matvec(J, x)
            yf, yP = self.split(y)
            fields, P = self.split(x)
            F = jnp.zeros((NUN, m, n))
            F = F.at[TT].set(yf[TT] + frc[TT])
            F = F.at[QQ].set(yf[QQ] + frc[QQ])
            # albedo rows: forcing only (nonlinear, AtmosLocal.C:824)
            F = F.at[AA].set(frc[AA])
            if self.use_intcond_q:
                F = F.at[QQ, m - 1, n - 1].set(yf[QQ, m - 1, n - 1])

            if self.aux == 1:
                # P-row: -P - qInt + sstInt + MCsInt (Atmosphere.C:338+)
                qInt = jnp.sum(ic_coeff * fields[QQ]) / total_area
                tmp = self.dqsi * sit - self.dqso * sst
                sigma = self.dqso * sst + msi * tmp
                sstInt = jnp.sum(p_coeff * sigma) / total_area \
                    * (self.tdim / self.qdim)
                MCsInt = jnp.sum(p_coeff * msi) * self.Cs / total_area
                FP = -P - qInt + sstInt + MCsInt
            else:
                FP = jnp.asarray(0.0)
            return self.join(F, FP)

        def evap_fn(x, sst, sit, msi):
            """Dimensional evaporation field
            (AtmosLocal.C:1042-1078)."""
            fields, _ = self.split(x)
            q = fields[QQ]
            Eo = (self.tdim / self.qdim) * self.dqso * sst
            Ei = (self.tdim / self.qdim) * self.dqsi * sit
            E = Eo - q + msi * (Ei - Eo + self.Cs)
            return ocean_srf * (self.Eo0 + self.eta * self.qdim * E)

        def precip_fn(x):
            """Dimensional precipitation field: P state anomaly
            distributed with pdist (Atmosphere.C:1174-1210)."""
            _, P = self.split(x)
            return pdist * (self.Po0 + self.eta * self.qdim * P)

        def mass_fn():
            B = jnp.zeros((NUN, m, n))
            B = B.at[TT].set(self.Ai)
            B = B.at[QQ].set(1.0)
            B = B.at[AA].set(1.0)
            if self.use_intcond_q:
                B = B.at[QQ, m - 1, n - 1].set(0.0)
            return self.join(B, jnp.asarray(0.0))

        def dense_fn(J: AtmosJac):
            eye = jnp.eye(self.dim)
            return jax.vmap(lambda v: matvec(J, v))(eye).T

        def solve_fn(J: AtmosJac, b):
            Adense = dense_fn(J)
            return jnp.linalg.solve(Adense, b)

        self._jac_fn = jax.jit(jac_fn)
        self._rhs_fn = jax.jit(rhs_fn)
        self._matvec = jax.jit(matvec)
        self._forcing_fn = jax.jit(forcing_fn)
        self._evap_fn = jax.jit(evap_fn)
        self._precip_fn = jax.jit(precip_fn)
        self._mass_fn = jax.jit(mass_fn)
        self._solve_fn = jax.jit(solve_fn)

    # ------------------------------------------------------------------
    # Model contract
    # ------------------------------------------------------------------
    def compute_rhs(self):
        self.rhs = self._rhs_fn(self.state, self.par, self.sst,
                                self.sit, self.msi, self.Ooa, self.Os)

    def compute_jacobian(self):
        self.jac = self._jac_fn(self.state, self.par, self.sst,
                                self.sit, self.msi, self.Ooa, self.Os)

    def compute_mass_matrix(self):
        self.diagB = self._mass_fn()

    def add_mass_to_jacobian(self, scale: float) -> None:
        Bf, BP = self.split(self.diagB)
        st = self.jac.stencil
        for a in range(NUN):
            st = st.at[4, a, a].add(scale * Bf[a])
        self.jac = self.jac._replace(
            stencil=st, prow_P=self.jac.prow_P + scale * BP)

    def apply_matrix(self, v):
        if self.jac is None:
            self.compute_jacobian()
        return self._matvec(self.jac, v)

    def apply_mass_matrix(self, v):
        if self.diagB is None:
            self.compute_mass_matrix()
        return self.diagB * v

    def solve(self, b):
        if self.jac is None:
            self.compute_jacobian()
        self.sol = self._solve_fn(self.jac, b)
        self.solve_iters = 1
        return self.sol

    # -- external coupling fields (Atmosphere.C synchronize) ----------
    def set_ocean_temperature(self, sst):
        self.sst = jnp.asarray(sst)

    def set_seaice_temperature(self, sit):
        self.sit = jnp.asarray(sit)

    def set_seaice_mask(self, msi):
        self.msi = jnp.asarray(msi)

    def set_ocean_deps(self, Ooa: float, Os: float):
        """Coefficients computed by the ocean's atmos_coef
        (reference getdeps, usrc.F90:201-219)."""
        self.Ooa = float(Ooa)
        self.Os = float(Os)
        self._update_sun()

    def get_evaporation(self):
        return self._evap_fn(self.state, self.sst, self.sit, self.msi)

    def get_precipitation(self):
        return self._precip_fn(self.state)

    def get_comm_pars(self) -> dict:
        """Parameters shared with the ocean/sea ice
        (AtmosLocal.C:537-558 getCommPars)."""
        comb = float(self.par[P_COMB])
        humf = float(self.par[P_HUMF])
        nuq = comb * humf * (self.eta / self.hdimq) \
            * (self.rhoo / self.rhoa) * (self.r0dim / self.udim)
        return dict(tdim=self.tdim, qdim=self.qdim, nuq=nuq,
                    eta=self.eta, dqso=self.dqso, dqsi=self.dqsi,
                    dqdt=nuq * self.tdim / self.qdim * self.dqso,
                    Eo0=self.Eo0, Ei0=self.Ei0, Cs=self.Cs,
                    t0o=self.t0o, t0i=self.t0i, a0=self.a0,
                    da=self.da, tauf=self.tauf, tauc=self.tauc,
                    comb=comb, albf=float(self.par[P_ALBF]))

    # -- idealized initialization (AtmosLocal.C:422-457) --------------
    def idealized(self, precip: float = 0.0):
        m, n = self.m, self.n
        val = np.cos(np.pi * (self.yc[1:m + 1] - self.ymin)
                     / (self.ymax - self.ymin))[:, None] \
            * np.ones((m, n))
        fields = np.zeros((NUN, m, n))
        fields[TT] = val
        fields[QQ] = val * self.tdim * self.dqso / self.qdim
        fields[AA] = self.a0
        self.sst = jnp.asarray(val)
        self.state = self.join(jnp.asarray(fields),
                               jnp.asarray(float(precip)))

    # -- state access --------------------------------------------------
    def get_state(self, mode='C'):
        return self.state

    def set_state(self, x):
        self.state = x

    def get_rhs(self, mode='C'):
        return self.rhs

    def get_solution(self, mode='C'):
        return self.sol

    def set_par(self, name, value):
        if name in PAR_ORDER:
            self.par = self.par.at[PAR_ORDER.index(name)].set(value)
        else:
            log.WARNING(f"Atmosphere: unknown parameter '{name}'")

    def get_par(self, name):
        if name in PAR_ORDER:
            return float(self.par[PAR_ORDER.index(name)])
        log.WARNING(f"Atmosphere: unknown parameter '{name}'")
        return 0.0

    def pre_process(self):
        pass

    def post_process(self):
        pass

    def monitor(self):
        return False

    def write_data(self, describe=False):
        if describe:
            return f"{'max(T)':>12}{'max(q)':>12}{'P':>12}"
        fields, P = self.split(self.state)
        return (f"{float(jnp.max(fields[TT])):>12.4e}"
                f"{float(jnp.max(fields[QQ])):>12.4e}"
                f"{float(P):>12.4e}")
