"""Standalone ATS-block solve on the GLOBAL masked grid: columns vs MG,
and the contraction of one V-cycle on a polar-ring error mode."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers import mg
from iemic_tpu.solvers.fgmres import _fgmres_flat
from iemic_tpu.solvers.bgs import (_TS, _apply_col_inv,
                                   _column_block_inv)
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
sub = An[:, _TS][:, :, _TS]
cfg = ocean.cfg
rng = np.random.default_rng(4)
lm = np.asarray(ocean.landm)
wet = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0)
b4 = jnp.asarray(np.where(wet[None], rng.standard_normal((2, l, m, n)),
                          0.0))
b = b4.reshape(-1)

def mv(v):
    return apply_stencil(sub, v.reshape(2, l, m, n),
                         periodic=True).reshape(-1)

colinv = _column_block_inv(An, _TS)

def pc_col(v):
    return _apply_col_inv(colinv, v.reshape(2, l, m, n)).reshape(-1)

fac = mg.build(sub, periodic=True)

def pc_mg(v):
    return mg.apply(fac, v.reshape(2, l, m, n),
                    periodic=True).reshape(-1)

for name, pc in [("col", pc_col), ("mg", pc_mg)]:
    r = _fgmres_flat(mv, pc, b, jnp.zeros_like(b), jnp.asarray(1e-8),
                     250)
    print(f"ATS-global {name}: iters={int(r.iters)} "
          f"relres={float(r.relres):.2e}", flush=True)

# contraction of one V-cycle on a polar-ring error: e = T wave on j=0
for wav in (1, 3, 8):
    e = np.zeros((2, l, m, n))
    e[0, :, 0, :] = np.cos(2 * np.pi * wav * np.arange(n) / n)
    e[0] *= wet
    e = jnp.asarray(e)
    en = float(jnp.linalg.norm(e))
    # error-propagation: e_new = e - P^{-1} A e
    Ae = apply_stencil(sub, e, periodic=True)
    for name, pc in [("col", pc_col), ("mg", pc_mg)]:
        z = pc(Ae.reshape(-1)).reshape(2, l, m, n)
        rr = float(jnp.linalg.norm(e - z)) / en
        print(f"  ring wav={wav} {name}: |e - P^-1 A e|/|e| = {rr:.3f}")
