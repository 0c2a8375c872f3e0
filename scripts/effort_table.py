"""Effort experiment: outer FGMRES iterations at 1e-8 on the masked
global 96x38x12 THCM Jacobian, per preconditioner variant (CPU f64).

Usage: python _effort.py [variant ...]
Variants: columns bgs1 bgs2 bgs3 bgs1sym si sl sr teko rhomu
          bgs1_tuned (deeper inner solves)
"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
# the axon site customization pins jax_platforms="axon,cpu" through
# jax.config; the env var alone is ignored
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.solvers.fgmres import _fgmres_flat

n, m, l = (int(os.environ.get("EN", 96)), int(os.environ.get("EM", 38)),
           int(os.environ.get("EL", 12)))
MAXIT = int(os.environ.get("EMAXIT", 400))

ocean = Ocean({"THCM": {
    "Global Grid-Size n": n, "Global Grid-Size m": m,
    "Global Grid-Size l": l,
    "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
    "Global Bound ymin": -85.5, "Global Bound ymax": 85.5,
    "Periodic": True, "Read Land Mask": True,
    "Land Mask": "mask_global_96x38x12",
    "Starting Parameters": {"Combined Forcing": 0.1,
                            "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": "Columns", "Precision": "Double"},
    data_dir="data")

ocean.compute_rhs()
ocean.compute_jacobian()

# THCM row scaling like the solve path
from iemic_tpu.models.ocean import scaling as _scal
R, _ = _scal.row_col_scaling(ocean.jac, np.asarray(ocean.landm))
An = ocean.jac * R[None, :, None]
rint = R[ocean.rowintcon]
b = -(ocean.rhs * R)
sh = ocean.state.shape
nullq = ocean._get_deflator()
cfg = ocean.cfg
int_coeff = ocean.int_coeff
ir = ocean.rowintcon

from iemic_tpu.ops.stencil import apply_stencil

def proj(v):
    return v - nullq @ (nullq.T @ v) if nullq is not None else v

def mv(v):
    y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
    if cfg.sres == 0:
        intval = jnp.vdot(int_coeff, v.reshape(sh))
        y = y.at[ir].set(rint * cfg.int_sign * intval)
    return proj(y.reshape(-1))

flat_b = proj(b.reshape(-1))

variants = sys.argv[1:] or ["columns", "bgs1"]

for name in variants:
    t0 = time.time()
    kw = dict(periodic=cfg.periodic)
    if name == "columns":
        from iemic_tpu.solvers.preconditioner import (
            build_column_blocks, apply_column_prec)
        fac = build_column_blocks(An)
        def pc(v, fac=fac):
            return proj(apply_column_prec(fac, v.reshape(sh)).reshape(-1))
    elif name == "teko":
        from iemic_tpu.solvers import rearranger
        fac = rearranger.build(An, periodic=cfg.periodic)
        def pc(v, fac=fac):
            return proj(rearranger.apply(fac, v.reshape(sh),
                                         periodic=cfg.periodic).reshape(-1))
    else:
        rhomu = "rhomu" in name
        scheme = name.upper() if name in ("si", "sl", "sr") else "KRYLOV"
        perm = int(name[3]) if name.startswith("bgs") and name[3:4].isdigit() else 1
        sym = name.endswith("sym")
        tsmg = "tsmg" in name
        mgprec = "mg" in name and not tsmg
        int_row = ((int_coeff, ocean.rowintcon,
                    float(rint) * cfg.int_sign)
                   if cfg.sres == 0 else None)
        fac = bgs.build(An, ocean.landm, periodic=cfg.periodic,
                        spp_scheme=scheme, rhomu=rhomu,
                        uv_precond="MG" if mgprec else "Columns",
                        ts_precond="MG" if (mgprec or tsmg)
                        else "Columns",
                        int_row=int_row)
        akw = {}
        if name == "bgs1_tuned":
            akw = dict(nit_spp=200, nit_uv=30, nit_ts=30,
                       tol_spp=1e-6, tol_uv=1e-3, tol_ts=1e-3)
        if tsmg:
            # production candidate: apply-once MG on the tracer block
            # (the polar-row stagnation lives in T), columns elsewhere
            akw = dict(nit_ts=0)
        if mgprec:
            # reference production mode: apply MG once per block
            akw = dict(nit_uv=0, nit_ts=0)
            if name.endswith("mgk"):
                akw = dict(nit_uv=6, nit_ts=6, tol_uv=1e-3,
                           tol_ts=1e-3)
        def pc(v, fac=fac, scheme=scheme, perm=perm, sym=sym, akw=akw):
            z = bgs.apply(fac, v.reshape(sh), periodic=cfg.periodic,
                          spp_scheme=scheme, permutation=perm,
                          symmetric=sym, **akw).reshape(-1)
            return proj(z)
    build_t = time.time() - t0
    # effort at the reference's production tolerances AND deep:
    # every shipped reference config solves at 1e-2..1e-4
    # (run/*/solver_params.xml "FGMRES tolerance"), never tighter
    for tol in (float(os.environ.get("ETOL1", 1e-4)),
                float(os.environ.get("ETOL2", 1e-8))):
        t0 = time.time()
        res = _fgmres_flat(mv, pc, flat_b, jnp.zeros_like(flat_b),
                           jnp.asarray(tol), MAXIT)
        it, rr = int(res.iters), float(res.relres)
        print(f"{name:12s} tol={tol:.0e} iters={it:4d} "
              f"relres={rr:.2e} build={build_t:6.1f}s "
              f"solve={time.time()-t0:7.1f}s", flush=True)
