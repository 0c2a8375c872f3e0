import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from iemic_tpu.models.ocean import Ocean
kern = os.environ.get("KERN", "xla")
prec = os.environ.get("PREC", "BGS")
ocean = Ocean({"THCM": {
    "Global Grid-Size n": 96, "Global Grid-Size m": 38, "Global Grid-Size l": 12,
    "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
    "Global Bound ymin": -85.5, "Global Bound ymax": 85.5,
    "Periodic": True,
    "Read Land Mask": True, "Land Mask": "mask_global_96x38x12",
    "Starting Parameters": {"Combined Forcing": 0.1, "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": prec, "Precision": "Mixed",
                   "FGMRES tolerance": 1e-8, "FGMRES iterations": 300,
                   "Matvec kernel": kern}, data_dir="data")
ocean.compute_rhs(); ocean.compute_jacobian()
b = -ocean.rhs
t0 = time.perf_counter(); z = ocean.solve(b); t1 = time.perf_counter()-t0
print(f"KERN={kern} PREC={prec}: solve {t1:.1f}s iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}")
r = ocean.apply_matrix(z) - b
print("true relres:", float(jnp.linalg.norm(r)/jnp.linalg.norm(b)))
t0 = time.perf_counter(); z2 = ocean.solve(0.5*b); z2.block_until_ready(); t2 = time.perf_counter()-t0
print(f"warm solve: {t2:.2f}s iters={ocean.solve_iters}")
