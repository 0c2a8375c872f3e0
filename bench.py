"""Benchmark: stencil matvec throughput + Newton-continuation step.

BASELINE.md items: (1) Jacobian/stencil matvec grid-points/s/chip vs
roofline, (2) wall-clock per Newton-continuation step with its MV
effort, on a land-masked configuration.

Measurement methodology: ops are timed INSIDE one jitted lax.fori_loop
with a final scalar fetch.  Chained per-dispatch timing (round 1's
harness) undercounts on the remote-TPU tunnel — dispatches overlap and
block_until_ready can return before execution; numbers here are the
cost the solver actually pays inside its jitted Krylov loop.  The
chip's sustained HBM bandwidth is calibrated with a pure scale-copy in
the same harness and reported alongside (roofline context: this bench
chip sustains ~270 GB/s r+w, far below the v5e paper number).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def fori_time(fn, args, x0, K=10, trials=3):
    """Time fn(args, x) chained K times inside one jit + data fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(a, u):
        def body(i, u):
            return fn(a, u) * np.float32(0.01)
        return jnp.sum(jax.lax.fori_loop(0, K, body, u))

    float(loop(args, x0))          # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(args, x0))
        best = min(best, time.perf_counter() - t0)
    return best / K


def bench_matvec(results):
    import jax
    import jax.numpy as jnp
    from iemic_tpu.ops.stencil import pad_state, offsets, apply_stencil
    from iemic_tpu.ops import stencil_pallas as sp

    n, m, l = (int(os.environ.get("BENCH_N", 96)),
               int(os.environ.get("BENCH_M", 96)),
               int(os.environ.get("BENCH_L", 16)))
    rng = np.random.default_rng(0)
    An = jnp.asarray(0.1 * rng.standard_normal((27, 6, 6, l, m, n)),
                     jnp.float32)
    x = jnp.asarray(rng.standard_normal((6, l, m, n)), jnp.float32)
    points = n * m * l

    # HBM roofline calibration: pure scale-copy over An-sized data
    big = An.reshape(-1)
    dt = fori_time(lambda a, u: u * np.float32(1.0000001), 0.0, big)
    copy_gbps = 2 * big.size * 4 / dt / 1e9

    try:
        AnK = sp.prepare(An)
        f32 = fori_time(lambda A, u: sp.apply_stencil_prepared(
            A, u, periodic=True), AnK, x)
        AnKh = sp.prepare(An, jnp.bfloat16)
        bf16 = fori_time(lambda A, u: sp.apply_stencil_prepared(
            A, u, periodic=True), AnKh, x)
        kernel = "pallas"
    except Exception:
        f32 = fori_time(lambda A, u: apply_stencil(
            A, u, periodic=True), An, x)
        bf16 = float("nan")
        kernel = "xla"

    gps = points / f32
    # roofline: one full pass over An f32 at the calibrated copy rate
    an_bytes = An.size * 4
    floor = an_bytes / (copy_gbps * 1e9 / 2)   # read-only generous est.
    results["matvec"] = {
        "grid": [n, m, l],
        "dof": points * 6,
        "kernel": kernel,
        "matvec_f32_ms": f32 * 1e3,
        "matvec_bf16An_ms": bf16 * 1e3,
        "hbm_copy_GBps_rw": copy_gbps,
        "roofline_fraction_f32": floor / f32,
        "gridpoints_per_s_f32": gps,
        "gridpoints_per_s_bf16An": points / bf16 if bf16 == bf16 else None,
    }
    return gps


def bench_newton(results):
    """Wall-clock per Newton-continuation step (jac build + prec build
    + 2 bordered FGMRES solves) on a land-masked global config.

    Two configurations are measured at the design point:
      * Amesos (sparse-direct preconditioner, the reference's
        Amesos_Klu Ifpack option) — converges to 1e-8; the honest
        converged-step number.
      * Mixed+BGS (the all-device block-GS path) — fast per iteration
        but, like the reference's BGS without its MRILU/ML subsolvers,
        it does not reach 1e-8 on this masked problem; reported with
        its achieved residual.
    """
    import jax.numpy as jnp
    from iemic_tpu.models.ocean import Ocean

    n, m, l = 96, 38, 12
    kern = os.environ.get("BENCH_KERNEL", "auto")

    def make(prec, precision, iters):
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
        }}, solver_params={"Preconditioning": prec,
                           "Precision": precision,
                           "FGMRES tolerance": 1e-8,
                           "FGMRES iterations": iters,
                           "Matvec kernel": kern},
            data_dir=os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "data"))

    def measure(ocean):
        ocean.compute_rhs()
        b = -ocean.rhs

        def newton_step():
            ocean.compute_jacobian()
            ocean._prec_for = None       # force refactor: fresh J
            ocean._get_prec_factors()
            z1 = ocean.solve(b)
            it1 = ocean.solve_iters
            z2 = ocean.solve(0.5 * b)
            it2 = ocean.solve_iters
            z2.block_until_ready()
            return it1 + it2

        mv = newton_step()               # compile + warm
        t0 = time.perf_counter()
        mv = newton_step()
        dt = time.perf_counter() - t0
        return dt, mv, ocean.solve_relres

    out = {"grid": [n, m, l], "dof": 6 * n * m * l, "masked": True}
    try:
        dt, mv, rr = measure(make("Amesos", "Double", 100))
        out.update({"newton_step_ms": dt * 1e3, "mv_effort": mv,
                    "solve_relres": rr,
                    "preconditioner": "Amesos", "precision": "Double"})
    except Exception as e:
        out["amesos_error"] = str(e)[:200]
    try:
        dt, mv, rr = measure(make("BGS", "Mixed", 200))
        out["bgs_mixed"] = {"newton_step_ms": dt * 1e3,
                            "mv_effort": mv, "solve_relres": rr}
    except Exception as e:
        out["bgs_error"] = str(e)[:200]
    results["newton_step"] = out


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    results = {}
    gps = bench_matvec(results)
    try:
        bench_newton(results)
    except Exception as e:                # keep the bench alive
        results["newton_step"] = {"error": str(e)[:300]}

    results["device"] = str(jax.devices()[0])
    out = {
        "metric": "stencil_jacobian_matvec_gridpoints_per_s_per_chip",
        "value": gps,
        "unit": "gridpoints/s",
        "vs_baseline": None,   # reference publishes no numbers
        "detail": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
