"""Instrument the M1 sweep stage norms on the global grid: which
stage amplifies?"""
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
from iemic_tpu.solvers.bgs import (_UV, _TS, _apply_tridiag_inv,
                                   _block_apply, _apply_col_inv)
from iemic_tpu.ops.stencil import apply_stencil, UU, VV, WW, PP, TT, SS

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
rint = R[ocean.rowintcon]
cfg = ocean.cfg
int_coeff = ocean.int_coeff
int_row = (int_coeff, ocean.rowintcon, float(rint) * cfg.int_sign)
prec = bgs.build(An, ocean.landm, periodic=True, int_row=int_row,
                 ts_precond="MG")

rng = np.random.default_rng(0)
lm = np.asarray(ocean.landm)
wet = (lm[1:l + 1, 1:m + 1, 1:n + 1] == 0)
r = jnp.asarray(np.where(wet[None],
                         rng.standard_normal((6, l, m, n)), 0.0))
buv = r[jnp.array([UU, VV])]
bw = r[WW][None]
bp = r[PP][None]
bts = r[jnp.array([TT, SS])]
P_, W_ = jnp.array([PP]), jnp.array([WW])

def nrm(x):
    return float(jnp.linalg.norm(x))

print("inputs |buv|=%.1f |bw|=%.1f |bp|=%.1f |bts|=%.1f"
      % (nrm(buv), nrm(bw), nrm(bp), nrm(bts)), flush=True)

ytilp = _apply_tridiag_inv(prec.ap_binv, prec.ap_dummy, bw)
print("ytilp  |.|=%.2e" % nrm(ytilp))
ruv = buv - _block_apply(An, _UV, P_, ytilp, True)
print("ruv    |.|=%.2e" % nrm(ruv))

from iemic_tpu.solvers.fgmres import _fgmres_flat
from iemic_tpu.solvers.bgs import _apply_2d

def spp_mv(v):
    return _apply_2d(prec.Spp, v.reshape(3, m, n), True).reshape(-1)

def spp_pc(v):
    z = jnp.einsum('bij,bj->bi', prec.Spp_binv,
                   v.reshape(3, m, n).transpose(1, 2, 0)
                   .reshape(m * n, 3))
    z = z.reshape(m, n, 3).transpose(2, 0, 1)
    for q in range(2):
        sv = prec.sv2d[q]
        z = z.at[2].add(-jnp.vdot(sv, z[2]) * sv)
    return z.reshape(-1)

rbar = jnp.concatenate([jnp.mean(ruv, axis=1), jnp.mean(bp, axis=1)])
spp_res = _fgmres_flat(spp_mv, spp_pc, rbar.reshape(-1),
                       jnp.zeros_like(rbar.reshape(-1)),
                       jnp.asarray(1e-4), 100)
zbar = spp_res.x.reshape(3, m, n)
print("spp    iters=%d relres=%.1e |zbar|=%.2e |zbar_p|=%.2e"
      % (int(spp_res.iters), float(spp_res.relres), nrm(zbar),
         nrm(zbar[2])))

yp = ytilp + zbar[2][None, None, :, :]
for q in range(2):
    sv = prec.svp[q]
    yp = yp - jnp.vdot(sv, yp[0])[None] * sv[None]
print("yp     |.|=%.2e" % nrm(yp))
ruv2 = buv - _block_apply(An, _UV, P_, yp, True)
print("ruv2   |.|=%.2e" % nrm(ruv2))

def uv_mv(v):
    return _block_apply(An, _UV, _UV, v.reshape(2, l, m, n),
                        True).reshape(-1)

def uv_pc(v):
    return _apply_col_inv(prec.uv_binv,
                          v.reshape(2, l, m, n)).reshape(-1)

uv_res = _fgmres_flat(uv_mv, uv_pc, ruv2.reshape(-1),
                      jnp.zeros_like(ruv2.reshape(-1)),
                      jnp.asarray(1e-2), 12)
yuv = uv_res.x.reshape(2, l, m, n)
print("auv    iters=%d relres=%.1e |yuv|=%.2e"
      % (int(uv_res.iters), float(uv_res.relres), nrm(yuv)))

rw = bp - _block_apply(An, P_, _UV, yuv, True)
print("rw     |.|=%.2e" % nrm(rw))
yw = _apply_tridiag_inv(prec.aw_binv, prec.aw_dummy, rw)
print("yw     |.|=%.2e" % nrm(yw))
rts = (bts - _block_apply(An, _TS, _UV, yuv, True)
       - _block_apply(An, _TS, W_, yw, True))
print("rts    |.|=%.2e" % nrm(rts))
# w-row residual of the final assembled z: compute An[w,:] z - bw
z = bgs.apply(prec, r, periodic=True, nit_ts=0)
print("z      |.|=%.2e  by var: %s"
      % (nrm(z), [f"{nrm(z[a]):.1e}" for a in range(6)]))
Az = apply_stencil(An, z, periodic=True)
print("res    by var: %s"
      % ([f"{nrm((r - Az)[a]):.1e}" for a in range(6)]))
