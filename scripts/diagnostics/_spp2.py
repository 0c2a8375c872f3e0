"""Is the global Spp operator itself broken, or is the rhs full of
left-null components?  Solve with a CONSISTENT rhs b = Spp x_true."""
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
from iemic_tpu.solvers.bgs import _apply_2d
from iemic_tpu.solvers.fgmres import _fgmres_flat

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
prec = bgs.build(An, ocean.landm, periodic=True)
Spp = np.asarray(prec.Spp)
print("Spp |max|=%.2e finite=%s" % (np.abs(Spp).max(),
                                    np.isfinite(Spp).all()))
# row magnitudes of the assembled 2D operator per variable
names2 = "u v p".split()
for a in range(3):
    rows = np.abs(Spp[:, a]).sum(axis=(0, 1))   # (m, n)
    print(f"  {names2[a]}-rows: min={rows.min():.2e} "
          f"max={rows.max():.2e} nzero={(rows < 1e-12).sum()}")

rng = np.random.default_rng(0)
lm = np.asarray(ocean.landm)
wet2 = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0).max(axis=0)
x_true = jnp.asarray(np.where(wet2[None],
                              rng.standard_normal((3, m, n)), 0.0))
# remove right-null comps from x_true (const/cb pressure)
for q in range(2):
    sv = prec.sv2d[q]
    x_true = x_true.at[2].add(-jnp.vdot(sv, x_true[2]) * sv)

def spp_mv(v):
    return _apply_2d(prec.Spp, v.reshape(3, m, n), True).reshape(-1)

b = spp_mv(x_true.reshape(-1))
print("consistent |b| =", float(jnp.linalg.norm(b)))

def spp_pc(v):
    z = jnp.einsum('bij,bj->bi', prec.Spp_binv,
                   v.reshape(3, m, n).transpose(1, 2, 0)
                   .reshape(m * n, 3))
    z = z.reshape(m, n, 3).transpose(2, 0, 1)
    for q in range(2):
        sv = prec.sv2d[q]
        z = z.at[2].add(-jnp.vdot(sv, z[2]) * sv)
    return z.reshape(-1)

res = _fgmres_flat(spp_mv, spp_pc, b, jnp.zeros_like(b),
                   jnp.asarray(1e-8), 400)
print(f"consistent-rhs: iters={int(res.iters)} "
      f"relres={float(res.relres):.2e}")
err = res.x - x_true.reshape(-1)
print("sol err:", float(jnp.linalg.norm(err))
      / float(jnp.linalg.norm(x_true)))

# inconsistent random rhs: what does the stagnated residual look like?
brand = jnp.asarray(np.where(wet2[None],
                             rng.standard_normal((3, m, n)),
                             0.0)).reshape(-1)
res2 = _fgmres_flat(spp_mv, spp_pc, brand, jnp.zeros_like(brand),
                    jnp.asarray(1e-8), 200)
r2 = np.asarray((brand - spp_mv(res2.x)).reshape(3, m, n))
print(f"random-rhs: iters={int(res2.iters)} "
      f"relres={float(res2.relres):.2e}")
for a in range(3):
    print(f"  stag {names2[a]}: {np.linalg.norm(r2[a]):.2e}")
# j-profile of the dominant variable
dom = int(np.argmax([np.linalg.norm(r2[a]) for a in range(3)]))
jp = np.linalg.norm(r2[dom], axis=1)
print("  j-profile:", np.array2string(jp, precision=1))
