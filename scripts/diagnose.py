"""Performance / convergence diagnostics for the production solve path.

One documented tool replacing the round-3/4 one-off probes.  Subcommands:

  newton   — stage-by-stage cost of one production Newton step on the
             masked global 96x38x12 grid (ctor, rhs, jac, deflator,
             preconditioner build, three solves), separating compile
             from warm run.  The TPU analog of reading the reference's
             `profile_output` (GlobalDefinitions.C:220-280) for one step.
  compile  — trace+lower vs compile time of each piece of the Jacobian
             and preconditioner graphs (which jit costs the startup).
  effort2d — outer-FGMRES effort (the cdata "MV" column,
             Ocean.C:1107-1117) vs grid size on unmasked 2DMOC grids.

Usage:  python scripts/diagnose.py {newton|compile|effort2d} [options]
Env:    BENCH_PREC / BENCH_PRECISION / BENCH_TOL / BENCH_KERNEL as in
        bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def _global_ocean(prec_overrides: dict | None = None):
    from iemic_tpu.models.ocean import Ocean
    n, m, l = 96, 38, 12
    sp = {
        "Preconditioning": os.environ.get("BENCH_PREC", "BGS"),
        "Precision": os.environ.get("BENCH_PRECISION", "Mixed"),
        "FGMRES tolerance": float(os.environ.get("BENCH_TOL", 1e-3)),
        "FGMRES iterations": int(os.environ.get("BENCH_MAXITER", 200)),
        "Matvec kernel": os.environ.get("BENCH_KERNEL", "auto")}
    if prec_overrides:
        sp["Preconditioner"] = dict(prec_overrides)
    return Ocean({"THCM": {
        "Global Grid-Size n": n, "Global Grid-Size m": m,
        "Global Grid-Size l": l,
        "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
        "Global Bound ymin": -85.5, "Global Bound ymax": 85.5,
        "Periodic": True,
        "Read Land Mask": True,
        "Land Mask": "mask_global_96x38x12",
        "Starting Parameters": {"Combined Forcing": 0.1,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0,
                                "Salinity Forcing": 0.1},
    }}, solver_params=sp,
        data_dir=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data"))


def _stage(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name:36s} {dt:8.2f}s", flush=True)
    return out, dt


def cmd_newton():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    ocean, _ = _stage("ctor", _global_ocean)
    _stage("rhs  (compile+run)",
           lambda: ocean.compute_rhs() or ocean.rhs.block_until_ready())
    b = -ocean.rhs
    _stage("jac  (compile+run)", lambda: ocean.compute_jacobian()
           or ocean.jac.block_until_ready())
    _stage("jac  (warm)", lambda: ocean.compute_jacobian()
           or ocean.jac.block_until_ready())
    _stage("deflator", ocean._get_deflator)

    def _rebuild():
        ocean._prec_for = None
        f, _ = ocean._get_prec_factors()
        jax.block_until_ready(f)
    _stage("prec build (compile+run)", _rebuild)
    _stage("prec build (warm)", _rebuild)
    for tag, scale in [("solve1 (compile+run)", 1.0),
                       ("solve2 (warm)", 0.5), ("solve3 (warm)", 0.7)]:
        _, dt = _stage(tag, lambda s=scale: jax.block_until_ready(
            ocean.solve(s * b)))
        print(f"    iters={ocean.solve_iters} "
              f"relres={ocean.solve_relres:.2e}", flush=True)


def cmd_compile():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from iemic_tpu.models.ocean import assembly
    ocean, _ = _stage("ctor", _global_ocean)
    cfg, grid, landm = ocean.cfg, ocean.grid, ocean.landm
    x, par, cpl = ocean.state, ocean.par, ocean.cpl

    def timed_compile(name, fn, *args):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        print(f"{name:28s} trace+lower {t1 - t0:7.1f}s   "
              f"compile {t2 - t1:7.1f}s", flush=True)

    def f_lin(atoms_, par):
        msi = jnp.zeros((cfg.m, cfg.n))
        return assembly.lin(atoms_, par, grid, tres=cfg.tres,
                            sres=cfg.sres, coupled_T=cfg.coupled_T,
                            coupled_S=cfg.coupled_S, cpl=cpl, msi=msi,
                            QTnd=ocean.QTnd, QSnd=ocean.QSnd)
    timed_compile("lin", f_lin, ocean.atoms, par)

    def f_nlin(x, par):
        zero = jnp.zeros((27, 6, 6, cfg.l, cfg.m, cfg.n))
        return assembly.nlin(zero, x, par, grid, landm, cfg.periodic,
                             jac=True)
    timed_compile("nlin jac", f_nlin, x, par)
    if ocean.mixing is not None:
        timed_compile("mixing.stencil", ocean.mixing.stencil, x, par)
    _stage("full jac (compile+run)", lambda: ocean.compute_jacobian()
           or ocean.jac.block_until_ready())
    _stage("prec build (compile+run)", lambda: (
        setattr(ocean, "_prec_for", None),
        jax.block_until_ready(ocean._get_prec_factors()[0])))


def cmd_effort2d():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from iemic_tpu.models.ocean import Ocean
    for nm in (16, 32, 48, 64):
        ocean = Ocean({"THCM": {
            "Global Grid-Size n": 4, "Global Grid-Size m": nm,
            "Global Grid-Size l": 16, "Periodic": True,
            "Coriolis Force": 0,
            "Starting Parameters": {"Combined Forcing": 0.2,
                                    "Temperature Forcing": 10.0,
                                    "Salinity Forcing": 0.1}}},
            solver_params={"Preconditioning": "BGS",
                           "FGMRES tolerance": 1e-4,
                           "FGMRES iterations": 300})
        ocean.compute_rhs()
        ocean.compute_jacobian()
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(ocean.state.shape))
        t0 = time.perf_counter()
        ocean.solve(b)
        print(json.dumps({"m": nm, "mv": int(ocean.solve_iters),
                          "relres": float(ocean.solve_relres),
                          "wall_s": time.perf_counter() - t0}),
              flush=True)


def cmd_sweep():
    """MV-effort sweep over preconditioner variants on the masked
    global grid (the De Niet & Wubs design point,
    TRIOS_BlockPreconditioner.H:40-43): one production solve at tol
    1e-3 per variant, reporting the cdata MV column.  Results feed
    docs/EFFORT.md."""
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    variants = {
        "base(SI,spp30@1e-6,uv12@1e-2,ATS-MG-once)": {},
        "spp60@1e-8": {"Saddlepoint iterations": 60,
                       "Saddlepoint tolerance": 1e-8},
        "ats4": {"ATS iterations": 4},
        "uv24@1e-3": {"Auv iterations": 24, "Auv tolerance": 1e-3},
        "symGS": {"Scheme": "symmetric Gauss-Seidel"},
        "rhomu": {"ATS rho/mu Transform": True},
        "pwc-prolong": {"MG prolongation weight": 0.0},
    }
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    for name, over in variants.items():
        if only and not any(o in name for o in only):
            continue
        t0 = time.perf_counter()
        ocean = _global_ocean(prec_overrides=over)
        ocean.compute_rhs()
        b = -ocean.rhs
        ocean.compute_jacobian()
        ocean._prec_for = None
        ocean._get_prec_factors()
        jax.block_until_ready(ocean.solve(b))          # compile + warm
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(ocean.solve(0.7 * b))
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": name,
                          "mv": int(ocean.solve_iters),
                          "relres": float(ocean.solve_relres),
                          "solve_s": round(dt, 2),
                          "setup_s": round(t_compile, 1)}), flush=True)
        del ocean


def cmd_milu():
    """MILU (native MRILU analog) vs the TPU-native preconditioners on
    the reference test fixtures — the measured justification VERDICT
    r4 #9 asks for: does MG/columns-based BGS match DD-MILU effort?
    Runs on CPU (MILU factors/solves host-side via ctypes)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import numpy as np
    import jax.numpy as jnp
    from iemic_tpu.models.ocean import Ocean

    for tol in (1e-4, 1e-8):
        for method in ("BGS", "MILU", "Columns"):
            ocean = Ocean({"THCM": {
                "Global Grid-Size n": 16, "Global Grid-Size m": 16,
                "Global Grid-Size l": 16, "Periodic": False,
                "Starting Parameters": {
                    "Combined Forcing": 0.1,
                    "Temperature Forcing": 10.0,
                    "Wind Forcing": 1.0, "Salinity Forcing": 0.1}}},
                solver_params={"Preconditioning": method,
                               "Precision": "Double",
                               "FGMRES tolerance": tol,
                               "FGMRES iterations": 400})
            ocean.compute_rhs()
            b = -ocean.rhs
            ocean.compute_jacobian()
            t0 = time.perf_counter()
            ocean._prec_for = None
            ocean._get_prec_factors()
            t_factor = time.perf_counter() - t0
            jax.block_until_ready(ocean.solve(b))    # compile + warm
            t0 = time.perf_counter()
            jax.block_until_ready(ocean.solve(0.7 * b))
            t_solve = time.perf_counter() - t0
            print(json.dumps({
                "fixture": "ocean 16x16x16 (reference test scale)",
                "method": method, "tol": tol,
                "mv": int(ocean.solve_iters),
                "relres": float(ocean.solve_relres),
                "factor_s": round(t_factor, 2),
                "solve_s": round(t_solve, 2)}), flush=True)
            del ocean


def main():
    cmds = {"newton": cmd_newton, "compile": cmd_compile,
            "effort2d": cmd_effort2d, "sweep": cmd_sweep,
            "milu": cmd_milu}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(__doc__)
        return 1
    cmds[sys.argv[1]]()
    return 0


if __name__ == "__main__":
    sys.exit(main())
