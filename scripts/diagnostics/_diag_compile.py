"""Which piece of the production graph costs the compile time?"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from iemic_tpu.models.ocean import Ocean

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
}}, solver_params={"Preconditioning": "BGS", "Precision": "Mixed",
                   "FGMRES tolerance": 1e-8, "FGMRES iterations": 200},
    data_dir="data")
print("ctor done", flush=True)

from iemic_tpu.models.ocean import assembly
cfg, grid, landm, atoms = ocean.cfg, ocean.grid, ocean.landm, ocean.atoms
mixing = ocean.mixing
x, par = ocean.state, ocean.par
fields, cpl = ocean.fields, ocean.cpl


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{name:32s} trace+lower {t1-t0:7.1f}s   compile {t2-t1:7.1f}s",
          flush=True)
    return compiled


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "jacparts"):
    def f_lin(atoms_, par):
        msi = jnp.zeros((cfg.m, cfg.n))
        return assembly.lin(atoms_, par, grid, tres=cfg.tres,
                            sres=cfg.sres, coupled_T=cfg.coupled_T,
                            coupled_S=cfg.coupled_S, cpl=cpl, msi=msi,
                            QTnd=ocean.QTnd, QSnd=ocean.QSnd)
    timed_compile("lin", f_lin, atoms, par)

    def f_nlin(x, par):
        zero = jnp.zeros((27, 6, 6, cfg.l, cfg.m, cfg.n))
        return assembly.nlin(zero, x, par, grid, landm, cfg.periodic,
                             jac=True)
    timed_compile("nlin jac", f_nlin, x, par)

    if mixing is not None:
        timed_compile("mixing.stencil", mixing.stencil, x, par)

    def f_bnd(An):
        return assembly.boundaries(An, landm, grid)
    timed_compile("boundaries",
                  f_bnd, jnp.zeros((27, 6, 6, cfg.l, cfg.m, cfg.n)))

if which in ("all", "jac"):
    timed_compile("full _jac", lambda a, x, p: ocean._jac_fn(x, p,
                  fields, cpl) if False else None, None, None, None) \
        if False else None
    def f_jac(atoms_, x, par):
        return ocean._jac_fn.__wrapped__(atoms_, x, par, fields, cpl) \
            if hasattr(ocean._jac_fn, "__wrapped__") else None
    # _jac_fn is a lambda closing over _jac_jit; lower via the jit fn
    t0 = time.perf_counter()
    ocean.compute_jacobian()
    ocean.jac.block_until_ready()
    print(f"full jac compile+run {time.perf_counter()-t0:7.1f}s",
          flush=True)

if which in ("all", "prec"):
    from iemic_tpu.solvers import bgs
    t0 = time.perf_counter()
    if ocean.jac is None:
        ocean.compute_jacobian()
    ocean._prec_for = None
    ocean._get_prec_factors()
    print(f"prec build compile+run {time.perf_counter()-t0:7.1f}s",
          flush=True)

if which in ("all", "inner"):
    # the mixed-precision inner Krylov solve (the piece that never
    # finished compiling in diag1)
    r = jnp.zeros((6 * cfg.l * cfg.m * cfg.n,), jnp.float64)
    nullq = ocean._get_deflator()
    t0 = time.perf_counter()
    lowered = ocean._inner_fn.lower(ocean._jacK32,
                                    ocean._prec_factors32, r, nullq,
                                    ocean._rint, jnp.asarray(1e-6))
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"inner solve: trace+lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)
