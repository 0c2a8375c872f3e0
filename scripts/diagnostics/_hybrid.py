"""BGS sweep + full-column post-correction hybrid probe."""
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
from iemic_tpu.solvers.preconditioner import (build_column_blocks,
                                              apply_column_prec)
from iemic_tpu.ops.stencil import apply_stencil

for (n, m, l) in [(3, 8, 8), (3, 16, 16), (3, 32, 16)]:
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

    def proj(v):
        return v - nullq @ (nullq.T @ v) if nullq is not None else v

    def mv(v):
        y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
        if cfg.sres == 0:
            y = y.at[ir].set(rint * cfg.int_sign
                             * jnp.vdot(int_coeff, v.reshape(sh)))
        return proj(y.reshape(-1))

    b = proj((-(ocean.rhs * R)).reshape(-1))
    int_row = ((int_coeff, ocean.rowintcon, float(rint) * cfg.int_sign)
               if cfg.sres == 0 else None)
    fac = bgs.build(An, ocean.landm, periodic=cfg.periodic,
                    int_row=int_row)
    colinv = build_column_blocks(An)

    def pc_bgs(v):
        return proj(bgs.apply(fac, v.reshape(sh),
                              periodic=cfg.periodic).reshape(-1))

    def pc_col(v):
        return proj(apply_column_prec(colinv,
                                      v.reshape(sh)).reshape(-1))

    def pc_hyb(v):
        z = pc_bgs(v)
        r2 = v - mv(z)
        return z + pc_col(r2)

    def pc_hyb2(v):
        # columns first, then BGS on the remaining (barotropic) error
        z = pc_col(v)
        r2 = v - mv(z)
        return z + pc_bgs(r2)

    def pc_colbgs_col(v):
        z = pc_col(v)
        z = z + pc_bgs(v - mv(z))
        return z + pc_col(v - mv(z))

    row = f"{n}x{m}x{l}: "
    for name, pc in [("col", pc_col), ("bgs", pc_bgs),
                     ("bgs+col", pc_hyb), ("col+bgs", pc_hyb2),
                     ("col+bgs+col", pc_colbgs_col)]:
        res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b),
                           jnp.asarray(1e-8), 300)
        row += f"{name}={int(res.iters)}({float(res.relres):.0e})  "
    print(row, flush=True)
