"""Full-BGS-sweep error contraction on specific global modes:
which mode does BGS+tsMG leave unhealed?"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.ops.stencil import apply_stencil

n, m, l = 96, 38, 12
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
ocean.compute_jacobian()
from iemic_tpu.models.ocean import scaling as _scal
R, _ = _scal.row_col_scaling(ocean.jac, np.asarray(ocean.landm))
An = ocean.jac * R[None, :, None]
rint = R[ocean.rowintcon]
sh = ocean.state.shape
cfg = ocean.cfg
nullq = ocean._get_deflator()
int_coeff = ocean.int_coeff
ir = ocean.rowintcon
lm = np.asarray(ocean.landm)
wet = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0)

def proj(v):
    return v - nullq @ (nullq.T @ v) if nullq is not None else v

def mv(v):
    y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
    if cfg.sres == 0:
        y = y.at[ir].set(rint * cfg.int_sign
                         * jnp.vdot(int_coeff, v.reshape(sh)))
    return proj(y.reshape(-1))

int_row = (int_coeff, ocean.rowintcon, float(rint) * cfg.int_sign)
fac = bgs.build(An, ocean.landm, periodic=True, int_row=int_row,
                ts_precond="MG")

def pc(v):
    return proj(bgs.apply(fac, v.reshape(sh), periodic=True,
                          nit_ts=0).reshape(-1))

names = "u v w p T S".split()
modes = {}
for a, nm in [(4, "T"), (5, "S"), (0, "u"), (1, "v")]:
    e = np.zeros((6, l, m, n))
    e[a, :, 0, :] = np.cos(2 * np.pi * np.arange(n) / n)
    e[a] *= wet
    modes[f"{nm}-ring-j0"] = e
e = np.zeros((6, l, m, n))
e[3] = wet * np.cos(2 * np.pi * np.arange(n) / n)[None, None, :]
modes["p-zonal-wave1"] = e
e = np.zeros((6, l, m, n))
e[3] = wet * np.sin(np.pi * np.arange(m) / m)[None, :, None] \
    * np.cos(4 * np.pi * np.arange(n) / n)[None, None, :]
modes["p-smooth"] = e
rng = np.random.default_rng(0)
e = np.where(wet[None], rng.standard_normal((6, l, m, n)), 0.0)
modes["random"] = e

for nm, e in modes.items():
    e = jnp.asarray(e)
    en = float(jnp.linalg.norm(e))
    if en == 0:
        continue
    efl = proj(e.reshape(-1))
    Ae = mv(efl)
    z = pc(Ae)
    enew = efl - z
    # contraction + which variable holds the leftover
    ev = np.asarray(enew.reshape(sh))
    dom = int(np.argmax([np.linalg.norm(ev[a]) for a in range(6)]))
    print(f"{nm:14s} |e-P^-1Ae|/|e| = "
          f"{float(jnp.linalg.norm(enew))/en:8.3f}  "
          f"leftover-dom={names[dom]}", flush=True)
