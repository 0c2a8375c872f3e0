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
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1}}},
    solver_params={"Preconditioning": "Columns", "Precision": "Double"},
    data_dir="data")
ocean.compute_rhs(); ocean.compute_jacobian()
from iemic_tpu.models.ocean import scaling as _scal
R, _ = _scal.row_col_scaling(ocean.jac, np.asarray(ocean.landm))
An = ocean.jac * R[None, :, None]
rint = R[ocean.rowintcon]
sh = ocean.state.shape; cfg = ocean.cfg
nullq = ocean._get_deflator()
int_coeff = ocean.int_coeff; ir = ocean.rowintcon
def proj(v):
    return v - nullq @ (nullq.T @ v) if nullq is not None else v
def mv(v):
    y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
    if cfg.sres == 0:
        y = y.at[ir].set(rint * cfg.int_sign
                         * jnp.vdot(int_coeff, v.reshape(sh)))
    return proj(y.reshape(-1))
b = proj((-(ocean.rhs * R)).reshape(-1))
int_row = (int_coeff, ocean.rowintcon, float(rint) * cfg.int_sign)
scheme = os.environ.get("SPP", "SI")
nspp = int(os.environ.get("NSPP", 60))
t0 = time.time()
fac = bgs.build(An, ocean.landm, periodic=True, int_row=int_row,
                ts_precond="MG", spp_scheme=scheme)
jax.block_until_ready(fac.uv_binv)
print("build %.0fs" % (time.time() - t0), flush=True)
def pc(v):
    return proj(bgs.apply(fac, v.reshape(sh), periodic=True,
                          spp_scheme=scheme, nit_ts=0,
                          nit_spp=nspp).reshape(-1))
# restarted FGMRES(60) so progress prints incrementally
x = jnp.zeros_like(b)
bn = float(jnp.linalg.norm(b))
tot = 0
for cycle in range(5):
    r = b - mv(x)
    rn = float(jnp.linalg.norm(r))
    print("cycle %d: tot_iters=%d relres=%.3e (%.0fs)"
          % (cycle, tot, rn / bn, time.time() - t0), flush=True)
    if rn / bn < 1e-8:
        break
    res = _fgmres_flat(mv, pc, r, jnp.zeros_like(r),
                       jnp.asarray(1e-8 * bn / rn), 60)
    x = x + res.x
    tot += int(res.iters)
r = b - mv(x)
print("FINAL tot_iters=%d relres=%.3e (%.0fs)"
      % (tot, float(jnp.linalg.norm(r)) / bn, time.time() - t0),
      flush=True)

# stagnation structure dump
names = "u v w p T S".split()
rv = np.asarray((b - mv(x)).reshape(sh))
lm = np.asarray(ocean.landm)
wet = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0)
for a in range(6):
    jp = np.linalg.norm(rv[a], axis=(0, 2))
    kp = np.linalg.norm(rv[a], axis=(1, 2))
    print(f"{names[a]}: |r|={np.linalg.norm(rv[a]):.2e} "
          f"jmax={int(np.argmax(jp))}({jp.max():.1e}) "
          f"kmax={int(np.argmax(kp))}({kp.max():.1e})", flush=True)
ra = np.abs(rv)
idx = np.unravel_index(np.argsort(ra, axis=None)[::-1][:12], ra.shape)
for q in range(12):
    a, k, j, i = (int(idx[0][q]), int(idx[1][q]), int(idx[2][q]),
                  int(idx[3][q]))
    print(f"  top {names[a]} k={k} j={j} i={i} r={ra[a,k,j,i]:.2e} "
          f"land={lm[k+1,j+1,i+1]}")
