"""Coupled ocean-atmosphere-seaice model.

TPU-native re-implementation of the reference's CoupledModel
(src/coupledmodel/CoupledModel.C/H + CouplingBlock.H): composes the
submodels behind one Model-like interface on a combined state vector,
with

  * pairwise synchronize() pushing interface fields between models
    (Ocean.C:1443-1494, Atmosphere.C:771-793, SeaIce.C:1125-1175)
  * solving schemes 'D'ecoupled / 'Q'uasi / 'C'oupled and
    preconditioning schemes 'D'iagonal and 'B'ackward / 'F'orward
    block Gauss-Seidel (CoupledModel.C:489-610)
  * coupled FGMRES on the combined vector (CoupledModel.C:274-435)

Where the reference builds off-diagonal CouplingBlock CRS matrices from
Fortran derivative probes (Ocean.C:1538-1746 getBlock), the coupling
Jacobian actions here are computed *exactly* by forward-mode autodiff
through the synchronization maps: C_ij v_j = d/de F_i(x_i,
fields_j(x_j + e v_j)) via jax.jvp inside the jitted coupled matvec.

The combined state is one flat vector (ocean | atmosphere | seaice) so
the continuation / Newton / theta-stepper drivers work unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...config import ParameterList
from ...utils import logging as log
from ...solvers.fgmres import _fgmres_flat
from ..ocean import constants as oc
from ..ocean.assembly import CouplingCoefs


def default_coupled_params() -> ParameterList:
    p = ParameterList("CoupledModel")
    p.set("Solving scheme", "C")
    p.set("Preconditioning", "F")
    p.set("Use ocean", True)
    p.set("Use atmosphere", True)
    p.set("Use sea ice", False)
    return p


class CoupledModel:
    def __init__(self, ocean, atmos=None, seaice=None,
                 params: ParameterList | dict | None = None,
                 solver_params: dict | None = None):
        if params is None:
            params = ParameterList("CoupledModel")
        if isinstance(params, dict):
            params = ParameterList("CoupledModel", params)
        params.validate_and_set_defaults(default_coupled_params())
        self.params = params

        self.solving_scheme = params.get("Solving scheme")
        self.prec_scheme = params.get("Preconditioning")
        self.use_ocean = bool(params.get("Use ocean"))
        self.use_atmos = bool(params.get("Use atmosphere")) \
            and atmos is not None
        self.use_seaice = bool(params.get("Use sea ice")) \
            and seaice is not None

        self.ocean = ocean if self.use_ocean else None
        self.atmos = atmos if self.use_atmos else None
        self.seaice = seaice if self.use_seaice else None
        self.models = [m for m in (self.ocean, self.atmos, self.seaice)
                       if m is not None]
        if not self.models:
            raise ValueError("At least one model should be active")

        sp = solver_params or {}
        self.fgmres_tol = sp.get("FGMRES tolerance", 1e-2)
        self.fgmres_iters = sp.get("FGMRES iterations", 200)

        # combined flat layout
        self._shapes = [np.shape(m.get_state()) for m in self.models]
        self._sizes = [int(np.prod(s)) for s in self._shapes]
        self._offsets = np.concatenate([[0], np.cumsum(self._sizes)])
        self.dim = int(self._offsets[-1])

        self.sol = jnp.zeros(self.dim)
        self.sync_ctr = 0
        self.synchronize()
        log.INFO(f"CoupledModel: dim={self.dim}, scheme="
                 f"{self.solving_scheme}/{self.prec_scheme}")

    # -- combined vector helpers --------------------------------------
    def split(self, x):
        return tuple(
            x[self._offsets[i]:self._offsets[i + 1]].reshape(s)
            for i, s in enumerate(self._shapes))

    def join(self, parts):
        return jnp.concatenate([p.reshape(-1) for p in parts])

    # ------------------------------------------------------------------
    # synchronization (CoupledModel.C:218-235 + per-model synchronize)
    # ------------------------------------------------------------------
    def _ocean_deps(self) -> dict:
        """Coefficients the ocean exports (reference getdeps,
        usrc.F90:201-219, atmos_coef usrc.F90:1183-1223)."""
        o = self.ocean
        muoa = 1.25 * (0.94 * 1.3e-3) * 1000.0 * 8.5   # atm.F90 constants
        Ooa = muoa * o.QTnd
        Os = 1360.0 * 0.43 / 4.0 * o.QTnd
        par = o.par
        pQSnd = float(par[oc.COMB] * par[oc.SALT] * o.QSnd)
        return dict(Ooa=Ooa, Os=Os, pQSnd=pQSnd)

    def synchronize(self):
        self.sync_ctr += 1
        o, a, s = self.ocean, self.atmos, self.seaice

        deps = self._ocean_deps() if o is not None else \
            dict(Ooa=1.0, Os=1.0, pQSnd=1.0)

        if o is not None and a is not None:
            # Ocean <- Atmosphere (Ocean.C:1443-1473): interface fields
            # + CommPars -> set_atmos_parameters (usrc.F90:237-293)
            cp = a.get_comm_pars()
            fa, P = a.split(a.get_state())
            m, n = a.m, a.n
            nus = float(o.par[oc.COMB] * o.par[oc.SALT]) * cp["eta"] \
                * cp["qdim"] * o.QSnd
            lvsc = float(o.par[oc.COMB] * o.par[oc.TEMP]) \
                * oc.RHODIM * oc.LV * o.QTnd
            o.cpl = o.cpl._replace(
                Ooa=deps["Ooa"], eta=cp["eta"], qdim=cp["qdim"],
                dqso=cp["dqso"], eo0=cp["Eo0"], albe0=cp["a0"],
                albed=cp["da"], nus=nus, lvsc=lvsc)
            suno = deps["Os"] * np.asarray(
                1.0 - 0.482 * (3 * np.sin(o.grid.y) ** 2 - 1.0) / 2.0)
            o.fields = o.fields._replace(
                tatm=fa[0], qatm=fa[1], albe=fa[2],
                patm=jnp.full((m, n), P),
                suno=jnp.broadcast_to(jnp.asarray(suno)[:, None], (m, n)))
            # Atmosphere <- Ocean (Atmosphere.C:771-781)
            a.set_ocean_temperature(self._ocean_sst())
            a.set_ocean_deps(deps["Ooa"], deps["Os"])

        if o is not None and s is not None:
            # Ocean <- SeaIce (Ocean.C:1475-1494 + usrc.F90:296-333)
            fi, G = s.split(s.get_state())
            o.cpl = o.cpl._replace(zeta=s.zeta, a0=s.a0, Lf=s.Lf,
                                   qvar=s.Qvar, q0=s.Q0)
            o.fields = o.fields._replace(
                qsa=fi[1], msi=fi[2],
                gsi=jnp.full((s.m, s.n), G))
            # SeaIce <- Ocean (SeaIce.C:1125-1143)
            s.set_ocean_fields(self._ocean_sst(), self._ocean_sss())
            s.pQSnd = deps["pQSnd"]

        if a is not None and s is not None:
            # Atmosphere <- SeaIce (Atmosphere.C:784-793)
            fi, G = s.split(s.get_state())
            a.set_seaice_mask(fi[2])
            a.set_seaice_temperature(fi[3])
            # SeaIce <- Atmosphere (SeaIce.C:1146-1175)
            fa, P = a.split(a.get_state())
            s.set_atmosphere_fields(fa[0], fa[1], fa[2],
                                    jnp.full((a.m, a.n), P))
            s.albe0 = a.a0
            s.albed = a.da

    def _ocean_sst(self):
        x = self.ocean.get_state()
        return x[4, self.ocean.grid.l - 1]      # surface T anomaly

    def _ocean_sss(self):
        x = self.ocean.get_state()
        return x[5, self.ocean.grid.l - 1]

    # ------------------------------------------------------------------
    # pure cross-coupling maps (for autodiff coupling blocks)
    # ------------------------------------------------------------------
    def _ocean_rhs_from_fields(self, xo, fields, aux):
        """F_ocean with the nonlinear tensor cached (it depends only on
        the ocean state, not on coupling fields), so coupling-block
        jvps skip the expensive advective-atom assembly."""
        o = self.ocean
        nl, atoms, opar, _, ocpl, oic = aux
        An = o._an_rhs_impl(atoms, nl, opar, fields, ocpl)
        return o._rhs_from_parts_fn(An, xo, opar, fields, ocpl, oic)

    def _ocean_aux(self):
        o = self.ocean
        if getattr(self, "_nl_cache", None) is None:
            self._nl_cache = o._nl_fn(o.get_state(), o.par)
        return (self._nl_cache, o.atoms, o.par, o.fields, o.cpl,
                o.int_correction)

    def _ocean_rhs_of_atmos(self, xo, xa, aux):
        """F_ocean as a function of the atmosphere state."""
        a = self.atmos
        fa, P = a.split(xa)
        fields = aux[3]._replace(
            tatm=fa[0], qatm=fa[1], albe=fa[2],
            patm=jnp.full((a.m, a.n), P))
        return self._ocean_rhs_from_fields(xo, fields, aux)

    def _ocean_rhs_of_seaice(self, xo, xi, aux):
        s = self.seaice
        fi, G = s.split(xi)
        fields = aux[3]._replace(qsa=fi[1], msi=fi[2],
                                 gsi=jnp.full((s.m, s.n), G))
        return self._ocean_rhs_from_fields(xo, fields, aux)

    def _atmos_rhs_of_ocean(self, xa, xo, aux):
        a, o = self.atmos, self.ocean
        par, sit, msi, Ooa, Os = aux
        sst = xo[4, o.grid.l - 1]
        return a._rhs_fn(xa, par, sst, sit, msi, Ooa, Os)

    def _atmos_aux_of_ocean(self):
        a = self.atmos
        return (a.par, a.sit, a.msi, a.Ooa, a.Os)

    def _atmos_rhs_of_seaice(self, xa, xi, aux):
        a, s = self.atmos, self.seaice
        par, sst, Ooa, Os = aux
        fi, G = s.split(xi)
        return a._rhs_fn(xa, par, sst, fi[3], fi[2], Ooa, Os)

    def _atmos_aux_of_seaice(self):
        a = self.atmos
        return (a.par, a.sst, a.Ooa, a.Os)

    def _seaice_rhs_of_ocean(self, xi, xo, aux):
        s, o = self.seaice, self.ocean
        par, tatm, qatm, patm, albe, pQSnd = aux
        sst = xo[4, o.grid.l - 1]
        sss = xo[5, o.grid.l - 1]
        return s._rhs_fn(xi, par, sst, sss, tatm, qatm, patm,
                         albe, pQSnd)

    def _seaice_aux_of_ocean(self):
        s = self.seaice
        return (s.par, s.tatm, s.qatm, s.patm, s.albe, s.pQSnd)

    def _seaice_rhs_of_atmos(self, xi, xa, aux):
        s, a = self.seaice, self.atmos
        par, sst, sss, pQSnd = aux
        fa, P = a.split(xa)
        return s._rhs_fn(xi, par, sst, sss, fa[0], fa[1],
                         jnp.full((a.m, a.n), P), fa[2], pQSnd)

    def _seaice_aux_of_atmos(self):
        s = self.seaice
        return (s.par, s.sst, s.sss, s.pQSnd)

    def _cross_map(self, i, j):
        """(pure map (x_i, x_j, aux) -> F_i, aux getter) for model
        pair (i, j), or None.  The aux pytree carries every
        linearization-point quantity the map reads besides the two
        states, so the jitted tangent (coupling_apply) compiles ONCE
        per pair and is refreshed per Jacobian by passing new aux."""
        key = (type(self.models[i]).__name__,
               type(self.models[j]).__name__)
        table = {
            ("Ocean", "Atmosphere"):
                (self._ocean_rhs_of_atmos, self._ocean_aux),
            ("Ocean", "SeaIce"):
                (self._ocean_rhs_of_seaice, self._ocean_aux),
            ("Atmosphere", "Ocean"):
                (self._atmos_rhs_of_ocean, self._atmos_aux_of_ocean),
            ("Atmosphere", "SeaIce"):
                (self._atmos_rhs_of_seaice, self._atmos_aux_of_seaice),
            ("SeaIce", "Ocean"):
                (self._seaice_rhs_of_ocean, self._seaice_aux_of_ocean),
            ("SeaIce", "Atmosphere"):
                (self._seaice_rhs_of_atmos, self._seaice_aux_of_atmos),
        }
        return table.get(key)

    def coupling_apply(self, i, j, v_j):
        """C_ij v_j by forward-mode autodiff at the current states.

        The tangent of the cross-coupling map replaces the reference's
        FD-probed CouplingBlock CRS matrices (CoupledModel.C:236-259).
        The jitted jvp takes the linearization point (states + aux
        pytree) as ARGUMENTS, so it is traced/compiled once per pair
        for the whole run; earlier revisions re-jitted a fresh
        closure after every Jacobian refresh, which re-traced the full
        ocean RHS per Newton iteration (~15 s each on the coupled
        e2e) and dominated the coupled continuation cost."""
        entry = self._cross_map(i, j)
        if entry is None:
            return None
        fn, get_aux = entry
        jit_cache = getattr(self, "_coupling_jit", None)
        if jit_cache is None:
            jit_cache = self._coupling_jit = {}
        jfn = jit_cache.get((i, j))
        if jfn is None:
            def jfn_impl(xi, xj, aux, v, _fn=fn):
                return jax.jvp(lambda z: _fn(xi, z, aux), (xj,), (v,))[1]
            jfn = jit_cache[(i, j)] = jax.jit(jfn_impl)
        return jfn(self.models[i].get_state(),
                   self.models[j].get_state(), get_aux(), v_j)

    # ------------------------------------------------------------------
    # Model contract
    # ------------------------------------------------------------------
    def compute_rhs(self):
        if self.solving_scheme != "D":
            self.synchronize()
        for m in self.models:
            m.compute_rhs()

    def compute_jacobian(self):
        if self.solving_scheme != "D":
            self.synchronize()
        for m in self.models:
            m.compute_jacobian()
        # refresh the cached ocean nonlinear tensor for coupling jvps
        if self.ocean is not None:
            self._nl_cache = self.ocean._nl_fn(self.ocean.get_state(),
                                               self.ocean.par)

    def compute_mass_matrix(self):
        for m in self.models:
            m.compute_mass_matrix()

    def apply_matrix(self, v):
        """[J1 C12; C21 J2] v (CoupledModel.C:436-472)."""
        parts = self.split(v)
        out = [m.apply_matrix(p) for m, p in zip(self.models, parts)]
        if self.solving_scheme == "C":
            for i in range(len(self.models)):
                for j in range(len(self.models)):
                    if i != j:
                        c = self.coupling_apply(i, j, parts[j])
                        if c is not None:
                            out[i] = out[i] + c
        return self.join(out)

    def apply_mass_matrix(self, v):
        parts = self.split(v)
        return self.join([m.apply_mass_matrix(p)
                          for m, p in zip(self.models, parts)])

    def add_mass_to_jacobian(self, scale):
        for m in self.models:
            m.add_mass_to_jacobian(scale)

    def apply_precon(self, x):
        """Block preconditioner sweep (CoupledModel.C:489-610)."""
        parts = self.split(x)
        nm = len(self.models)
        z = [jnp.zeros_like(p) for p in parts]
        if self.prec_scheme == "D" or self.solving_scheme != "C":
            for k in range(nm):
                z[k] = self._model_precon(k, parts[k])
        elif self.prec_scheme in ("B", "C"):
            iters = 2 if self.prec_scheme == "C" else 1
            for it in range(iters):
                for k in range(nm - 1, -1, -1):
                    b = parts[k]
                    for i in range(nm):
                        if i < k and it > 0:
                            sign = 1.0
                        elif i > k:
                            sign = -1.0
                        else:
                            continue
                        c = self.coupling_apply(k, i, z[i])
                        if c is not None:
                            b = b + sign * c
                    if (self.prec_scheme == "C" and it == iters - 1
                            and k == 0):
                        break
                    z[k] = self._model_precon(k, b)
        elif self.prec_scheme in ("F", "G"):
            iters = 2 if self.prec_scheme == "G" else 1
            for it in range(iters):
                for k in range(nm):
                    b = parts[k]
                    for i in range(nm):
                        if i < k:
                            sign = -1.0
                        elif i > k and it > 0:
                            sign = 1.0
                        else:
                            continue
                        c = self.coupling_apply(k, i, z[i])
                        if c is not None:
                            b = b + sign * c
                    z[k] = self._model_precon(k, b)
        else:
            log.WARNING(f"Invalid prec scheme {self.prec_scheme}")
        return self.join(z)

    def _model_precon(self, k, b):
        """Apply model k's OWN configured preconditioner, like the
        reference's block-GS sweep which hands the ocean block to its
        BlockPreconditioner and atmos/seaice to their Ifpack solves
        (CoupledModel.C:489-610).  The ocean's factors come from its
        SolverFactory dispatch (Columns/BGS/...) and are cached per
        Jacobian by Ocean._get_prec_factors."""
        m = self.models[k]
        if type(m).__name__ == "Ocean":
            factors, _ = m._get_prec_factors()
            if m._rowscale is not None:
                b = b * m._rowscale      # the factors see (R J)
            z = m._prec_apply(factors, b)
            q = m._get_deflator()
            if q is not None:
                zf = z.reshape(-1)
                zf = zf - q @ (q.T @ zf)
                z = zf.reshape(z.shape)
            return z
        return m.solve(b)

    def _project_ocean_null(self, v):
        """Project the ocean's pressure null modes (constant +
        checkerboard, THCM::getNullSpace) out of the ocean block of a
        flat coupled vector.  The reference's coupled matrix is
        nonsingular because THCM pins pressure points with Dirichlet
        rows (THCM.C:2201); here the ocean uses deflation instead
        (Ocean.solve), and the coupled Krylov solve must deflate the
        same modes or the correction picks up unbounded null
        components (observed ||dx|| ~ 1e7 in the coupled corrector)."""
        if self.ocean is None:
            return v
        q = self.ocean._get_deflator()
        if q is None:
            return v
        no = self._offsets[1]
        vo = v[:no]
        vo = vo - q @ (q.T @ vo)
        return jnp.concatenate([vo, v[no:]])

    def solve(self, b):
        """Coupled FGMRES (CoupledModel.C:354-433), host-driven like
        the reference's Belos-on-BelosOp setup."""
        from ...solvers.fgmres import fgmres_host
        with log.timer("CoupledModel: solve"):
            flat_b = b if b.ndim == 1 else b.reshape(-1)
            proj = self._project_ocean_null
            _, res = fgmres_host(
                lambda v: proj(self.apply_matrix(v)), proj(flat_b),
                prec=lambda v: proj(self.apply_precon(v)),
                tol=self.fgmres_tol,
                maxiter=self.fgmres_iters)
        self.sol = self._project_ocean_null(res.x)
        self.solve_iters = int(res.iters)
        log.track_iterations("CoupledModel: FGMRES iterations...",
                             self.solve_iters)
        log.INFO(f"CoupledModel: FGMRES {self.solve_iters} iters, "
                 f"relres={float(res.relres):.2e}")
        return self.sol

    # -- state access --------------------------------------------------
    def get_state(self, mode='C'):
        return self.join([m.get_state() for m in self.models])

    def set_state(self, x):
        self._nl_cache = None
        for m, p in zip(self.models, self.split(x)):
            m.set_state(p)

    def get_rhs(self, mode='C'):
        return self.join([m.get_rhs() for m in self.models])

    def get_solution(self, mode='C'):
        return self.sol

    def set_par(self, name, value):
        """Forward to submodels that know the parameter
        (CoupledModel::setPar semantics)."""
        from ..ocean import constants as c
        from ..atmosphere.atmosphere import PAR_ORDER as APARS
        from ..seaice.seaice import PAR_ORDER as SPARS
        for m in self.models:
            tn = type(m).__name__
            if tn == "Ocean" and name in c.PAR_NAMES:
                m.set_par(name, value)
            elif tn == "Atmosphere" and name in APARS:
                m.set_par(name, value)
            elif tn == "SeaIce" and name in SPARS:
                m.set_par(name, value)

    def get_par(self, name):
        from ..ocean import constants as c
        for m in self.models:
            tn = type(m).__name__
            if tn == "Ocean" and name in c.PAR_NAMES:
                return m.get_par(name)
        for m in self.models:
            tn = type(m).__name__
            if tn == "Atmosphere":
                from ..atmosphere.atmosphere import PAR_ORDER as APARS
                if name in APARS:
                    return m.get_par(name)
            if tn == "SeaIce":
                from ..seaice.seaice import PAR_ORDER as SPARS
                if name in SPARS:
                    return m.get_par(name)
        return 0.0

    def pre_process(self):
        for m in self.models:
            m.pre_process()

    def post_process(self):
        for m in self.models:
            m.post_process()

    def monitor(self):
        return any(m.monitor() for m in self.models)

    def init_step(self, timestep):
        """Theta-stepper support on the coupled system."""
        self._theta_old_state = self.get_state()

    def write_data(self, describe=False):
        return "".join(m.write_data(describe) for m in self.models)
