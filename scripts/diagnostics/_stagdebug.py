"""What does the stagnated residual on the masked global grid look
like?  Run FGMRES, analyze the final residual by variable / location."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.solvers.fgmres import _fgmres_flat
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

ocean.compute_rhs()
ocean.compute_jacobian()
from iemic_tpu.models.ocean import scaling as _scal
R, _ = _scal.row_col_scaling(ocean.jac, np.asarray(ocean.landm))
An = ocean.jac * R[None, :, None]
rint = R[ocean.rowintcon]
sh = ocean.state.shape
cfg = ocean.cfg
nullq = ocean._get_deflator()
print("deflator modes:", 0 if nullq is None else nullq.shape[1], flush=True)
int_coeff = ocean.int_coeff
ir = ocean.rowintcon

def proj(v):
    return v - nullq @ (nullq.T @ v) if nullq is not None else v

def mv(v):
    y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
    if cfg.sres == 0:
        y = y.at[ir].set(rint * cfg.int_sign
                         * jnp.vdot(int_coeff, v.reshape(sh)))
    return proj(y.reshape(-1))

b = proj((-(ocean.rhs * R)).reshape(-1))

from iemic_tpu.solvers.preconditioner import (build_column_blocks,
                                              apply_column_prec)
fac = build_column_blocks(An)

def pc(v):
    return proj(apply_column_prec(fac, v.reshape(sh)).reshape(-1))

res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b), jnp.asarray(1e-8), 150)
x = res.x
r = (b - mv(x)).reshape(sh)
print(f"after 150 iters relres={float(res.relres):.2e}", flush=True)
names = "u v w p T S".split()
bb = b.reshape(sh)
for a in range(6):
    print(f"  {names[a]}: |r|={float(jnp.linalg.norm(r[a])):.3e}  "
          f"|b|={float(jnp.linalg.norm(bb[a])):.3e}")
# where is the residual concentrated?
ra = np.abs(np.asarray(r))
flat = ra.reshape(6, -1)
tot = ra.sum()
idx = np.unravel_index(np.argsort(ra, axis=None)[::-1][:20], ra.shape)
lm = np.asarray(ocean.landm)
print("top-20 residual cells (var,k,j,i) | landm neighborhood:")
for q in range(20):
    a, k, j, i = (int(idx[0][q]), int(idx[1][q]), int(idx[2][q]),
                  int(idx[3][q]))
    print(f"  {names[a]} k={k} j={j} i={i} r={ra[a,k,j,i]:.2e} "
          f"land={lm[k+1, j+1, i+1]}", flush=True)
# fraction of residual norm in the top 100 cells
top = np.sort(ra, axis=None)[::-1]
print("r^2 frac in top100:",
      float((top[:100] ** 2).sum() / (top ** 2).sum()))
