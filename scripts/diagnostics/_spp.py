"""Standalone depth-averaged saddle solve on the global grid:
Jacobi vs SI/SL/SR preconditioning of the inner Krylov."""
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
int_coeff = ocean.int_coeff
rint = R[ocean.rowintcon]
int_row = (int_coeff, ocean.rowintcon,
           float(rint) * ocean.cfg.int_sign)

for scheme in ("KRYLOV", "SI", "SL", "SR"):
    prec = bgs.build(An, ocean.landm, periodic=True, int_row=int_row,
                     spp_scheme=scheme)
    rng = np.random.default_rng(0)
    # mask rbar to wet columns
    lm = np.asarray(ocean.landm)
    wet2 = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0).max(axis=0)
    rbar = jnp.asarray(np.where(wet2[None],
                                rng.standard_normal((3, m, n)), 0.0))

    def spp_mv(v):
        return _apply_2d(prec.Spp, v.reshape(3, m, n),
                         True).reshape(-1)

    if scheme == "KRYLOV":
        def spp_pc(v):
            z = jnp.einsum('bij,bj->bi', prec.Spp_binv,
                           v.reshape(3, m, n).transpose(1, 2, 0)
                           .reshape(m * n, 3))
            z = z.reshape(m, n, 3).transpose(2, 0, 1)
            for q in range(2):
                sv = prec.sv2d[q]
                z = z.at[2].add(-jnp.vdot(sv, z[2]) * sv)
            return z.reshape(-1)
    else:
        from iemic_tpu.solvers.saddlepoint import apply_simple

        def spp_pc(v, scheme=scheme, prec=prec):
            z = apply_simple(prec.spp_simple, v.reshape(3, m, n),
                             periodic=True, scheme=scheme)
            for q in range(2):
                sv = prec.sv2d[q]
                z = z.at[2].add(-jnp.vdot(sv, z[2]) * sv)
            return z.reshape(-1)

    # deflate rhs of the barotropic null modes too
    b = rbar.reshape(-1)
    for maxiter in (100, 400):
        res = _fgmres_flat(spp_mv, spp_pc, b, jnp.zeros_like(b),
                           jnp.asarray(1e-6), maxiter)
        print(f"{scheme:7s} maxiter={maxiter:4d} iters={int(res.iters):4d} "
              f"relres={float(res.relres):.2e}", flush=True)
