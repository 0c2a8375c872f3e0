import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from iemic_tpu.models.ocean import Ocean
n, m, l = (int(os.environ.get("N", 16)), int(os.environ.get("M", 16)), int(os.environ.get("L", 4)))
prec = os.environ.get("PREC", "Columns")
precision = os.environ.get("PRECISION", "Mixed")
it = int(os.environ.get("ITERS", 300))
ocean = Ocean({"THCM": {
    "Global Grid-Size n": n, "Global Grid-Size m": m, "Global Grid-Size l": l,
    "Periodic": True,
    "Starting Parameters": {"Combined Forcing": 0.1, "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": prec, "Precision": precision,
                   "FGMRES tolerance": 1e-8, "FGMRES iterations": it})
ocean.compute_rhs(); ocean.compute_jacobian()
b = -ocean.rhs
t0 = time.perf_counter(); z = ocean.solve(b); t1 = time.perf_counter()-t0
print(f"{n}x{m}x{l} {prec}/{precision} it={it}: {t1:.1f}s iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}")
t0 = time.perf_counter(); z = ocean.solve(0.5*b); z.block_until_ready(); t2 = time.perf_counter()-t0
print(f"warm: {t2:.2f}s iters={ocean.solve_iters}")
