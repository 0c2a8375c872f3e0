"""Quick BGS-quality scaling probe on 2DMOC grids (no mask, no
coriolis): how does outer effort grow with grid size per variant?"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_continuation_2dmoc import make_2dmoc_ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.solvers.fgmres import _fgmres_flat

grids = [(3, 8, 8), (3, 16, 16), (3, 32, 16), (4, 32, 16)]
if len(sys.argv) > 1 and sys.argv[1] == "big":
    grids = [(4, 32, 16), (6, 64, 16)]

for (n, m, l) in grids:
    ocean = make_2dmoc_ocean(n=n, m=m, l=l)
    ocean.set_par("Combined Forcing", 0.2)
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
    from iemic_tpu.ops.stencil import apply_stencil

    def proj(v):
        return v - nullq @ (nullq.T @ v) if nullq is not None else v

    def mv(v):
        y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
        if cfg.sres == 0:
            y = y.at[ir].set(rint * cfg.int_sign
                             * jnp.vdot(int_coeff, v.reshape(sh)))
        return proj(y.reshape(-1))

    b = proj((-(ocean.rhs * R)).reshape(-1))
    row = f"{n}x{m}x{l}: "
    for name in ("columns", "bgs1", "bgs1_mg"):
        if name == "columns":
            from iemic_tpu.solvers.preconditioner import (
                build_column_blocks, apply_column_prec)
            fac = build_column_blocks(An)
            def pc(v, fac=fac):
                return proj(apply_column_prec(
                    fac, v.reshape(sh)).reshape(-1))
        else:
            mgp = name.endswith("mg")
            int_row = ((int_coeff, ocean.rowintcon,
                        float(rint) * cfg.int_sign)
                       if cfg.sres == 0 else None)
            fac = bgs.build(An, ocean.landm, periodic=cfg.periodic,
                            uv_precond="MG" if mgp else "Columns",
                            ts_precond="MG" if mgp else "Columns",
                            int_row=int_row)
            akw = dict(nit_uv=0, nit_ts=0) if mgp else {}
            def pc(v, fac=fac, akw=akw):
                return proj(bgs.apply(fac, v.reshape(sh),
                                      periodic=cfg.periodic,
                                      **akw).reshape(-1))
        t0 = time.time()
        res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b),
                           jnp.asarray(1e-8), 300)
        row += (f"{name}={int(res.iters)}"
                f"({float(res.relres):.0e},{time.time()-t0:.0f}s)  ")
    print(row, flush=True)
