"""Benchmark: stencil Jacobian matvec throughput (grid-points/s/chip).

The reference publishes no numbers (BASELINE.md); the self-measured
headline metric is the hot kernel of every Newton-Krylov iteration —
the 27-point x 6-variable stencil Jacobian matvec — in grid-points per
second per chip, plus wall-clock per full Newton step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from iemic_tpu.models.ocean import Ocean

    # problem size ~ the reference's preconditioner design point
    # (TRIOS_BlockPreconditioner.H:40-43: order 1e6 dof)
    n, m, l = int(os.environ.get("BENCH_N", 96)), \
        int(os.environ.get("BENCH_M", 96)), \
        int(os.environ.get("BENCH_L", 16))

    ocean = Ocean({"THCM": {
        "Global Grid-Size n": n,
        "Global Grid-Size m": m,
        "Global Grid-Size l": l,
        "Periodic": True,
        "Starting Parameters": {"Combined Forcing": 0.5,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0},
    }})

    rng = np.random.default_rng(0)
    x = jnp.asarray(0.01 * rng.standard_normal(ocean.state.shape))
    ocean.set_state(x)
    ocean.compute_jacobian()
    An = ocean.jac
    v = jnp.asarray(rng.standard_normal(ocean.state.shape))

    apply_fn = jax.jit(lambda An, v: ocean._apply_impl(An, v))

    def timeit(f, u0, iters=20):
        # Two axon-tunnel pitfalls: identical repeated calls are
        # result-cached, and block_until_ready can return before the
        # remote queue drains.  So (a) chain the output back into the
        # input and (b) synchronize by fetching a scalar reduction.
        u = f(u0)
        float(jnp.sum(u))
        t0 = time.perf_counter()
        for _ in range(iters):
            u = f(u)
        float(jnp.sum(u))
        return (time.perf_counter() - t0) / iters

    dt64 = timeit(lambda u: apply_fn(An, u), v)

    # the production hot path: f32 stencil matvec (the Pallas kernel;
    # all-f64 is software-emulated ~50-100x slower on TPU and only
    # used in the refinement/final-residual steps)
    from iemic_tpu.ops.stencil_pallas import apply_stencil_pallas
    An32 = An.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    periodic = ocean.cfg.periodic
    try:
        dt32 = timeit(
            lambda u: apply_stencil_pallas(An32, u, periodic=periodic),
            v32)
    except Exception:
        # CPU fallback (no Mosaic): XLA f32 path
        f32 = jax.jit(lambda A, u: ocean._apply_impl(A, u))
        dt32 = timeit(lambda u: f32(An32, u), v32)

    points = n * m * l
    gps = points / dt32

    result = {
        "metric": "stencil_jacobian_matvec_gridpoints_per_s_per_chip",
        "value": gps,
        "unit": "gridpoints/s",
        "vs_baseline": None,   # reference publishes no numbers
        "detail": {
            "grid": [n, m, l],
            "dof": points * 6,
            "matvec_f32_ms": dt32 * 1e3,
            "matvec_f64_ms": dt64 * 1e3,
            "f64_gridpoints_per_s": points / dt64,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
