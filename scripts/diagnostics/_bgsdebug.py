"""Which block does the BGS sweep leave bad? For z = P^{-1} r, look
at the residual r - J z per variable row group."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_continuation_2dmoc import make_2dmoc_ocean
from iemic_tpu.solvers import bgs
from iemic_tpu.ops.stencil import apply_stencil

n, m, l = 3, 8, 8
ocean = make_2dmoc_ocean(n=n, m=m, l=l)
ocean.set_par("Combined Forcing", 0.2)
ocean.compute_rhs()
ocean.compute_jacobian()
from iemic_tpu.models.ocean import scaling as _scal
R, _ = _scal.row_col_scaling(ocean.jac, np.asarray(ocean.landm))
An = ocean.jac * R[None, :, None]
sh = ocean.state.shape
cfg = ocean.cfg
nullq = ocean._get_deflator()
int_coeff = ocean.int_coeff
ir = ocean.rowintcon
rint = R[ocean.rowintcon]

def proj(v):
    return v - nullq @ (nullq.T @ v) if nullq is not None else v

def mv(v):
    y = apply_stencil(An, v.reshape(sh), periodic=cfg.periodic)
    if cfg.sres == 0:
        y = y.at[ir].set(rint * cfg.int_sign
                         * jnp.vdot(int_coeff, v.reshape(sh)))
    return proj(y.reshape(-1))

rng = np.random.default_rng(0)
names = "u v w p T S".split()

for variant, kw in [
        ("bgs1", {}),
        ("bgs1_deep", dict(nit_spp=300, nit_uv=60, nit_ts=60,
                           tol_spp=1e-10, tol_uv=1e-8, tol_ts=1e-8)),
        ("bgs2_deep", dict(nit_spp=300, nit_uv=60, nit_ts=60,
                           tol_spp=1e-10, tol_uv=1e-8, tol_ts=1e-8,
                           permutation=2)),
        ("bgs3_deep", dict(nit_spp=300, nit_uv=60, nit_ts=60,
                           tol_spp=1e-10, tol_uv=1e-8, tol_ts=1e-8,
                           permutation=3)),
]:
    int_row = ((int_coeff, ocean.rowintcon,
                float(rint) * cfg.int_sign)
               if cfg.sres == 0 else None)
    fac = bgs.build(An, ocean.landm, periodic=cfg.periodic,
                    int_row=int_row)
    r = proj(jnp.asarray(rng.standard_normal(sh)).reshape(-1))
    z = bgs.apply(fac, r.reshape(sh), periodic=cfg.periodic,
                  **kw).reshape(-1)
    res = (r - mv(proj(z))).reshape(sh)
    rr = r.reshape(sh)
    out = [f"{names[a]}:{float(jnp.linalg.norm(res[a]))/max(float(jnp.linalg.norm(rr[a])),1e-30):.2e}"
           for a in range(6)]
    print(variant, " ".join(out),
          "total %.2e" % (float(jnp.linalg.norm(res))
                          / float(jnp.linalg.norm(rr))), flush=True)

# outer iteration counts with the intcond-row fix
from iemic_tpu.solvers.fgmres import _fgmres_flat
b = proj((-(ocean.rhs * R)).reshape(-1))
for perm in (1, 2, 3):
    def pc(v, perm=perm):
        return proj(bgs.apply(fac, v.reshape(sh), periodic=cfg.periodic,
                              permutation=perm).reshape(-1))
    res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b),
                       jnp.asarray(1e-8), 300)
    print(f"outer perm={perm}: iters={int(res.iters)} "
          f"relres={float(res.relres):.1e}", flush=True)

for (perm, sym) in [(1, True)]:
    def pc(v, perm=perm, sym=sym):
        return proj(bgs.apply(fac, v.reshape(sh), periodic=cfg.periodic,
                              permutation=perm,
                              symmetric=sym).reshape(-1))
    res = _fgmres_flat(mv, pc, b, jnp.zeros_like(b),
                       jnp.asarray(1e-8), 300)
    print(f"outer perm={perm} sym={sym}: iters={int(res.iters)} "
          f"relres={float(res.relres):.1e}", flush=True)
    z = bgs.apply(fac, b.reshape(sh), periodic=cfg.periodic,
                  permutation=perm, symmetric=sym,
                  nit_spp=300, nit_uv=60, nit_ts=60,
                  tol_spp=1e-10, tol_uv=1e-8, tol_ts=1e-8).reshape(-1)
    resv = (b - mv(proj(z))).reshape(sh)
    bb = b.reshape(sh)
    out = [f"{names[a]}:{float(jnp.linalg.norm(resv[a]))/max(float(jnp.linalg.norm(bb[a])),1e-30):.2e}"
           for a in range(6)]
    print("sym_deep", " ".join(out), flush=True)
