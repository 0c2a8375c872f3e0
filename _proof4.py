import os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from iemic_tpu.models.ocean import Ocean
from iemic_tpu.solvers.fgmres import _fgmres_flat, _fgmres_ir_flat
n, m, l = 48, 32, 8
ocean = Ocean({"THCM": {
    "Global Grid-Size n": n, "Global Grid-Size m": m, "Global Grid-Size l": l,
    "Periodic": True,
    "Starting Parameters": {"Combined Forcing": 0.1, "Temperature Forcing": 10.0,
                            "Wind Forcing": 1.0, "Salinity Forcing": 0.1},
}}, solver_params={"Preconditioning": "Columns", "Precision": "Mixed"})
ocean.compute_rhs(); ocean.compute_jacobian()
b = (-ocean.rhs).reshape(-1)
shape = ocean.state.shape
factors, factors32 = ocean._get_prec_factors()
jac_s = ocean._jac_s

def test(name, fn):
    try:
        out = fn(); jax.block_until_ready(out)
        print(name, "OK", float(jnp.linalg.norm(out)) if hasattr(out, 'shape') else out)
    except Exception as e:
        print(name, "FAIL", str(e)[:100])

test("mv64", lambda: ocean._apply_fn(jac_s, b.reshape(shape)))
test("mv32 xla", lambda: ocean._apply_fn(jac_s.astype(jnp.float32), b.reshape(shape).astype(jnp.float32)))
from iemic_tpu.solvers.preconditioner import apply_column_prec
test("pc64", lambda: apply_column_prec(factors, b.reshape(shape)))
test("pc32", lambda: apply_column_prec(factors32, b.reshape(shape).astype(jnp.float32)))
mv = lambda v: ocean._apply_fn(jac_s, v.reshape(shape)).reshape(-1)
pc = lambda v: apply_column_prec(factors, v.reshape(shape)).reshape(-1)
test("fgmres64 k=50", lambda: _fgmres_flat(mv, pc, b, jnp.zeros_like(b), jnp.asarray(1e-8), 50).x)
test("fgmres64 k=150", lambda: _fgmres_flat(mv, pc, b, jnp.zeros_like(b), jnp.asarray(1e-8), 150).x)
b32 = b.astype(jnp.float32)
mv32 = lambda v: ocean._apply_fn(jac_s.astype(jnp.float32), v.reshape(shape)).reshape(-1)
pc32 = lambda v: apply_column_prec(factors32, v.reshape(shape)).reshape(-1)
test("fgmres32 k=150", lambda: _fgmres_flat(mv32, pc32, b32, jnp.zeros_like(b32), jnp.asarray(1e-6, jnp.float32), 150).x)
mvh = lambda v: mv32(v.astype(jnp.float32)).astype(jnp.float64)
pch = lambda v: pc32(v.astype(jnp.float32)).astype(jnp.float64)
test("fgmres64-on-32ops k=150", lambda: _fgmres_flat(mvh, pch, b, jnp.zeros_like(b), jnp.asarray(1e-6), 150).x)
test("ir k=150", lambda: _fgmres_ir_flat(mv, mv32, pc32, b, jnp.zeros_like(b), jnp.asarray(1e-8), 150).x)
