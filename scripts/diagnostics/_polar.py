"""Small-reproducer for the polar-row stagnation: unmasked aquaplanet
to +-85.5 deg; dense SVD of the scaled system to identify near-null
modes."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers.fgmres import _fgmres_flat
from iemic_tpu.ops.stencil import apply_stencil, stencil_to_dense

n, m, l = 24, 12, 4
ocean = Ocean({"THCM": {
    "Global Grid-Size n": n, "Global Grid-Size m": m,
    "Global Grid-Size l": l,
    "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
    "Global Bound ymin": -85.5, "Global Bound ymax": 85.5,
    "Periodic": True,
    "Starting Parameters": {"Combined Forcing": 0.1,
                            "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": "Columns", "Precision": "Double"})

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

res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b), jnp.asarray(1e-8), 250)
print(f"cols: iters={int(res.iters)} relres={float(res.relres):.2e}",
      flush=True)
r = np.asarray((b - mv(res.x)).reshape(sh))
names = "u v w p T S".split()
for a in range(6):
    print(f"  {names[a]}: |r|={np.linalg.norm(r[a]):.2e}")
print("  T j=0 frac:",
      np.linalg.norm(r[4][:, 0]) / max(np.linalg.norm(r[4]), 1e-30))

if int(res.iters) >= 249 or float(res.relres) > 1e-6:
    # reproduced: dense analysis
    A = stencil_to_dense(np.asarray(An), periodic=True)
    # apply the intcond row replacement + deflation like mv
    N = A.shape[0]
    ic = np.asarray(int_coeff)
    from iemic_tpu.ops.stencil import to_flat
    icf = np.asarray(to_flat(jnp.asarray(ic)))
    rowf = 6 * ((ir[1] * m + ir[2]) * n + ir[3]) + 5
    A[rowf, :] = float(rint) * cfg.int_sign * icf
    u, s, vt = np.linalg.svd(A)
    print("smallest 8 svals:", s[-8:] / s[0])
    # structure of the 3 smallest right singular vectors
    for q in range(1, 4):
        v = vt[-q].reshape(l, m, n, 6).transpose(3, 0, 1, 2)
        en = [np.linalg.norm(v[a]) for a in range(6)]
        dom = int(np.argmax(en))
        jdist = np.linalg.norm(v[dom], axis=(0, 2))  # per j
        print(f"sv{q} s={s[-q]/s[0]:.2e} dominant={names[dom]} "
              f"j-profile={np.array2string(jdist, precision=2)}")
