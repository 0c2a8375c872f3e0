"""Diagnose the production Newton-step cost (BGS + Mixed, masked
96x38x12): separate compile from run for each stage."""
import os, sys, time, json
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

t_imp0 = time.perf_counter()
from iemic_tpu.models.ocean import Ocean
print(f"import: {time.perf_counter()-t_imp0:.1f}s", flush=True)

n, m, l = 96, 38, 12
prec = os.environ.get("BENCH_PREC", "BGS")
precision = os.environ.get("BENCH_PRECISION", "Mixed")
maxiter = int(os.environ.get("BENCH_MAXITER", 200))

t0 = time.perf_counter()
ocean = Ocean({"THCM": {
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
}}, solver_params={"Preconditioning": prec,
                   "Precision": precision,
                   "FGMRES tolerance": float(os.environ.get("BENCH_TOL", 1e-4)),
                   "FGMRES iterations": maxiter,
                   "Matvec kernel": os.environ.get("BENCH_KERNEL", "auto")},
    data_dir="data")
print(f"ctor: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
ocean.compute_rhs()
ocean.rhs.block_until_ready()
print(f"rhs (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

b = -ocean.rhs

t0 = time.perf_counter()
ocean.compute_jacobian()
ocean.jac.block_until_ready()
print(f"jac (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
ocean.compute_jacobian()
ocean.jac.block_until_ready()
print(f"jac (warm): {time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
ocean._get_deflator()
print(f"deflator: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
ocean._prec_for = None
f, f32 = ocean._get_prec_factors()
jax.block_until_ready(f)
print(f"prec build (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
ocean._prec_for = None
f, f32 = ocean._get_prec_factors()
jax.block_until_ready(f)
print(f"prec build (warm): {time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
x = ocean.solve(b)
print(f"solve1 (compile+run): {time.perf_counter()-t0:.1f}s "
      f"iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}",
      flush=True)

t0 = time.perf_counter()
x = ocean.solve(0.5 * b)
print(f"solve2 (warm): {time.perf_counter()-t0:.2f}s "
      f"iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}",
      flush=True)

t0 = time.perf_counter()
x = ocean.solve(0.7 * b)
print(f"solve3 (warm): {time.perf_counter()-t0:.2f}s "
      f"iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}",
      flush=True)
