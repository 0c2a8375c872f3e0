import os; os.environ.setdefault("JAX_PLATFORMS", "cpu")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from iemic_tpu.models.ocean import Ocean
prec = os.environ.get("PREC", "BGS")
precision = os.environ.get("PRECISION", "Double")
scaling = os.environ.get("SCAL", "THCM")
ocean = Ocean({"THCM": {
    "Global Grid-Size n": 32, "Global Grid-Size m": 16, "Global Grid-Size l": 8,
    "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
    "Global Bound ymin": -80.0, "Global Bound ymax": 80.0,
    "Periodic": True, "Scaling": scaling,
    "Read Land Mask": True, "Land Mask": "mask_global_32x16x8",
    "Starting Parameters": {"Combined Forcing": 0.1, "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": prec, "Precision": precision,
                   "FGMRES tolerance": 1e-8, "FGMRES iterations": 400},
   data_dir="data")
ocean.compute_rhs(); ocean.compute_jacobian()
b = -ocean.rhs
t0 = time.perf_counter(); z = ocean.solve(b); t1 = time.perf_counter()-t0
print(f"32x16x8 masked {prec}/{precision}/scal={scaling}: {t1:.1f}s iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}")
r = ocean.apply_matrix(z) - b
print("true relres:", float(jnp.linalg.norm(r)/jnp.linalg.norm(b)))
