"""At-scale proof: Mixed+BGS converges to 1e-8 on a masked grid (TPU).
Measures jac-build / prec-build / solve wall-clock + MV effort."""
import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from iemic_tpu.models.ocean import Ocean
from iemic_tpu.utils import logging as log
log.set_verbose(True)

n, m, l = 96, 38, 12
prec = os.environ.get("PREC", "BGS")
precision = os.environ.get("PRECISION", "Mixed")
ocean = Ocean({"THCM": {
    "Global Grid-Size n": n, "Global Grid-Size m": m, "Global Grid-Size l": l,
    "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
    "Global Bound ymin": -85.5, "Global Bound ymax": 85.5,
    "Periodic": True,
    "Read Land Mask": True, "Land Mask": "mask_global_96x38x12",
    "Starting Parameters": {"Combined Forcing": 0.1,
                            "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": prec, "Precision": precision,
                   "FGMRES tolerance": 1e-8, "FGMRES iterations": 400},
   data_dir="data")
rng = np.random.default_rng(0)
x = jnp.zeros(ocean.state.shape)
ocean.set_state(x)

t0 = time.perf_counter(); ocean.compute_rhs(); ocean.rhs.block_until_ready()
print(f"rhs build: {time.perf_counter()-t0:.2f}s (incl compile)")
t0 = time.perf_counter(); ocean.compute_jacobian(); ocean.jac.block_until_ready()
print(f"jac build: {time.perf_counter()-t0:.2f}s (incl compile)")
t0 = time.perf_counter(); ocean.compute_jacobian(); ocean.jac.block_until_ready()
tjac = time.perf_counter()-t0
print(f"jac build (warm): {tjac:.3f}s")
t0 = time.perf_counter(); ocean._get_prec_factors()
tprec = time.perf_counter()-t0
print(f"prec build: {tprec:.2f}s (incl compile)")

b = -ocean.rhs
t0 = time.perf_counter(); z = ocean.solve(b); tsol1 = time.perf_counter()-t0
print(f"solve 1 (incl compile): {tsol1:.2f}s iters={ocean.solve_iters} relres={ocean.solve_relres:.2e}")
r = ocean.apply_matrix(z) - b
print("true relres:", float(jnp.linalg.norm(r)/jnp.linalg.norm(b)))
# warm newton-step measurement: jac + prec + 2 solves (bordered system)
ocean.set_state(z*0.01)  # move state so jac changes
t0 = time.perf_counter()
ocean.compute_jacobian()
ocean._prec_for = None
ocean._get_prec_factors()
ocean.compute_rhs()
z1 = ocean.solve(-ocean.rhs); it1 = ocean.solve_iters
z2 = ocean.solve(b); it2 = ocean.solve_iters
z2.block_until_ready()
tnewton = time.perf_counter()-t0
print(f"newton step (warm): {tnewton:.2f}s MV={it1}+{it2}")
