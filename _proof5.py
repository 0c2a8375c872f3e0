import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers.fgmres import _fgmres_flat
n, m, l = (int(os.environ.get("N", 48)), int(os.environ.get("M", 32)), int(os.environ.get("L", 8)))
prec = os.environ.get("PREC", "Columns")
mask = os.environ.get("MASK", "")
thcm = {
    "Global Grid-Size n": n, "Global Grid-Size m": m, "Global Grid-Size l": l,
    "Periodic": True,
    "Starting Parameters": {"Combined Forcing": 0.1, "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1}}
if mask:
    thcm.update({"Read Land Mask": True, "Land Mask": mask,
                 "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
                 "Global Bound ymin": -85.5, "Global Bound ymax": 85.5})
ocean = Ocean({"THCM": thcm}, solver_params={"Preconditioning": prec, "Precision": "Mixed"},
              data_dir="data")
ocean.compute_rhs(); ocean.compute_jacobian()
factors, factors32 = ocean._get_prec_factors()
shape = ocean.state.shape
nullq = ocean._get_deflator()
nullq32 = None if nullq is None else nullq.astype(jnp.float32)
jac_s = ocean._jac_s
AnK32 = ocean._jacK32
b = (-ocean.rhs * (ocean._rowscale if ocean._rowscale is not None else 1.0)).reshape(-1)
def proj(v, Q): return v if Q is None else v - Q @ (Q.T @ v)
b = proj(b, nullq)
rint = ocean._rint

from iemic_tpu.ops.stencil_pallas import apply_stencil_prepared
use_pallas = ocean._use_pallas
@jax.jit
def mv64(v):
    y = ocean._apply_fn(jac_s, v.reshape(shape))
    if ocean.cfg.sres == 0: y = y.at[ocean.rowintcon].multiply(rint)
    return proj(y.reshape(-1), nullq)

from iemic_tpu.solvers import bgs
from iemic_tpu.solvers.preconditioner import apply_column_prec

def mk_inner():
    def mvh(v):
        v32 = v.astype(jnp.float32).reshape(shape)
        if use_pallas:
            y = apply_stencil_prepared(AnK32, v32, periodic=ocean.cfg.periodic)
        else:
            y = ocean._apply_fn(jac_s.astype(jnp.float32), v32)
        if ocean.cfg.sres == 0:
            iv = jnp.vdot(ocean.int_coeff.astype(jnp.float32), v32)
            y = y.at[ocean.rowintcon].set(rint.astype(jnp.float32) * ocean.cfg.int_sign * iv)
        return proj(y.reshape(-1), nullq32).astype(jnp.float64)
    def pch(v):
        v32 = v.astype(jnp.float32).reshape(shape)
        if prec == "BGS":
            z = bgs.apply(factors32, v32, periodic=ocean.cfg.periodic).reshape(-1)
        else:
            z = apply_column_prec(factors32, v32).reshape(-1)
        return proj(z, nullq32).astype(jnp.float64)
    def inner(r):
        return _fgmres_flat(mvh, pch, r, jnp.zeros_like(r), jnp.asarray(1e-6), 300, stall_limit=60)
    return jax.jit(inner)

inner = mk_inner()
x = jnp.zeros_like(b)
r = b - mv64(x)
bn = float(jnp.linalg.norm(b)); t0 = time.perf_counter(); tot = 0
for sweep in range(12):
    rn = float(jnp.linalg.norm(r))
    if rn < 1e-8 * bn: break
    sol = inner(r / rn)
    x = x + sol.x * rn
    r = b - mv64(x)
    tot += int(sol.iters)
    print(f"sweep {sweep}: inner {int(sol.iters)} -> outer rel {float(jnp.linalg.norm(r))/bn:.2e}")
print(f"{n}x{m}x{l} {prec} host-IR: total MV {tot}, final rel {float(jnp.linalg.norm(r))/bn:.2e}, {time.perf_counter()-t0:.1f}s")
