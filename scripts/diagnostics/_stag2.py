"""Structure of the stagnated global residual: checkerboard parity
and bathymetry correlation of the p rows; T polar rows; and candidate
near-null validation at looser gates."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
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
r = np.asarray((b - mv(res.x)).reshape(sh))
lm = np.asarray(ocean.landm)
wet = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0)
depth = wet.sum(axis=0)          # cells per column

rp = r[3]                        # p rows
print("p-residual |r|=%.2e" % np.linalg.norm(rp), flush=True)
ij = (np.arange(m)[:, None] + np.arange(n)[None, :]) % 2
sgn = np.where(ij == 0, 1.0, -1.0)
# checkerboard correlation per k level
for k in range(l):
    x = rp[k][wet[k]]
    s = sgn[wet[k]]
    if x.size:
        c = np.abs((x * s).sum()) / max(np.linalg.norm(x) *
                                        np.linalg.norm(s), 1e-30)
        print(f"  k={k:2d} |r_p|={np.linalg.norm(rp[k]):.2e} "
              f"cb-corr={c:.2f} ncell={x.size}")
# is the p residual at bathymetry steps? bottom cells vs full columns
kbot = np.argmax(wet, axis=0)    # index of shallowest wet cell per col
mask_shallow = depth < l         # columns not reaching full depth
pnorm_sh = np.linalg.norm(rp[:, mask_shallow])
pnorm_dp = np.linalg.norm(rp[:, ~mask_shallow & (depth > 0)])
print("p-res in partial-depth columns: %.2e vs full-depth: %.2e"
      % (pnorm_sh, pnorm_dp))

# checkerboard-in-z? correlation of r_p with (-1)^k
sk = (-1.0) ** np.arange(l)
ck = np.abs((rp * sk[:, None, None]).sum()) / max(
    np.linalg.norm(rp) * np.sqrt(wet.sum()), 1e-30)
print("z-alternating correlation:", ck)

# how much of r is in T at polar rows?
rT = r[4]
print("T-res j=0 row: %.2e of total T %.2e"
      % (np.linalg.norm(rT[:, 0, :]), np.linalg.norm(rT)))
print("T-res j=m-1:  %.2e" % np.linalg.norm(rT[:, m - 1, :]))

# validate looser null candidates: per-level checkerboard modes
# (constant-in-z is deflated; try modes restricted to partial columns)
scale = float(np.abs(np.asarray(An)).max())
cands = {}
v = np.zeros((6, l, m, n)); v[3] = np.where(wet, sgn[None], 0.0)
cands["cb-3d"] = v
v = np.zeros((6, l, m, n)); v[3] = np.where(wet, 1.0, 0.0)
cands["const-3d"] = v
# checkerboard only over partial-depth columns
v = np.zeros((6, l, m, n))
v[3] = np.where(wet & mask_shallow[None], sgn[None], 0.0)
cands["cb-partial"] = v
for name, v in cands.items():
    vn = v / max(np.linalg.norm(v), 1e-30)
    Av = np.asarray(mv(jnp.asarray(vn).reshape(-1)))
    print(f"cand {name}: |Av|/scale = {np.linalg.norm(Av)/scale:.2e}")
