"""Benchmark: stencil matvec throughput + Newton-continuation step.

BASELINE.md items: (1) Jacobian/stencil matvec grid-points/s/chip vs
roofline, (2) wall-clock per Newton-continuation step with its MV
effort, on a land-masked configuration.

Robustness: each part runs in its OWN subprocess with a hard timeout
(round 2's bench was killed by the driver while scipy splu ground
through a 573 s sparse-direct factorization); a part that hangs or
crashes is recorded as such and the final JSON line always prints.

Measurement methodology: ops are timed INSIDE one jitted lax.fori_loop
with a final scalar fetch.  Chained per-dispatch timing (round 1's
harness) undercounts on the remote-TPU tunnel — dispatches overlap and
block_until_ready can return before execution; numbers here are the
cost the solver actually pays inside its jitted Krylov loop.  The
chip's sustained HBM bandwidth is calibrated with a pure scale-copy in
the same harness and reported alongside.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

MATVEC_TIMEOUT = int(os.environ.get("BENCH_MATVEC_TIMEOUT", 300))
# one-time XLA compilation dominates (no persistent cache on the
# remote backend); the warm step itself is seconds
NEWTON_TIMEOUT = int(os.environ.get("BENCH_NEWTON_TIMEOUT", 900))


def fori_time(fn, args, x0, K=100, trials=3):
    """Time fn(args, x) chained inside one jit + data fetch.

    Two loop lengths (K0=5 and K0+K) are timed and differenced, which
    cancels the fixed per-dispatch cost — on the axon remote-TPU
    tunnel that overhead is ~20 ms per call and round 1/2 numbers that
    ignored it under-reported kernel throughput by ~3x (device trace:
    0.89 ms/matvec vs 3.4 ms wall)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def loop(a, u, k):
        def body(i, u):
            return fn(a, u) * np.float32(0.01)
        return jnp.sum(jax.lax.fori_loop(0, k, body, u))

    K0 = 5
    float(loop(args, x0, K0))          # compile + warm
    float(loop(args, x0, K0 + K))
    diffs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(args, x0, K0))
        t1 = time.perf_counter()
        float(loop(args, x0, K0 + K))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    # median of the differenced estimates, clamped to a positive floor:
    # a noisy trial can make a single difference non-positive, and
    # min-of-differences biases the headline optimistically
    diffs = sorted(d for d in diffs if d > 0) or [1e-9]
    return max(diffs[len(diffs) // 2] / K, 1e-9)


def part_matvec():
    import jax
    import jax.numpy as jnp
    from iemic_tpu.ops.stencil import apply_stencil
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
    an_bytes = An.size * 4
    # floor: time to stream An once at the aggregate copy rate
    floor = an_bytes / (copy_gbps * 1e9)
    return {
        "grid": [n, m, l],
        "dof": points * 6,
        "kernel": kernel,
        "matvec_f32_ms": f32 * 1e3,
        "matvec_bf16An_ms": bf16 * 1e3,
        "hbm_copy_GBps_rw": copy_gbps,
        "roofline_fraction_f32": floor / f32,
        "gridpoints_per_s_f32": gps,
        "gridpoints_per_s_bf16An": points / bf16 if bf16 == bf16 else None,
        "device": str(jax.devices()[0]),
    }


def part_newton():
    """Wall-clock per Newton-continuation step (jac build + prec build
    + 2 bordered FGMRES solves) on the land-masked global 96x38x12
    configuration, on the mixed-precision BGS path (the production
    configuration and now the DEFAULT; cf. Ocean.C:1060-1151 effort
    metric).

    Tolerance: 1e-3 — the reference's standard linear tolerance
    (run/2dmoc, run/coupled, run/aquaplanet solver_params.xml all use
    1e-3; run/ocean 1e-4, run/tuning 1e-2).  The reference operates as
    an inexact Newton method and NEVER solves to 1e-8.  A deep 1e-8
    attempt is reported separately as `deep_solve`; the current
    preconditioned stack floors near 6e-4 on this masked global
    Jacobian (see docs/EFFORT.md), which the reference's own operating
    points never probe.

    Compile time is reported separately from the warm step: the axon
    remote-TPU backend has no persistent executable cache, so every
    process launch pays XLA compilation once (measured: the fused
    jac graph alone cost 329 s before the mixing autodiff was split
    into its own jit; see models/ocean/ocean.py _jac).
    """
    from iemic_tpu.models.ocean import Ocean

    n, m, l = 96, 38, 12
    prec = os.environ.get("BENCH_PREC", "BGS")
    precision = os.environ.get("BENCH_PRECISION", "Mixed")
    tol = float(os.environ.get("BENCH_TOL", 1e-3))

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
                       "FGMRES tolerance": tol,
                       "FGMRES iterations": 200,
                       "Matvec kernel":
                           os.environ.get("BENCH_KERNEL", "auto")},
        data_dir=os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "data"))

    ocean.compute_rhs()
    b = -ocean.rhs

    def newton_step(scale=1.0):
        ocean.compute_jacobian()
        ocean._prec_for = None       # force refactor: fresh J
        ocean._get_prec_factors()
        z1 = ocean.solve(scale * b)
        it1, rr1 = ocean.solve_iters, ocean.solve_relres
        z2 = ocean.solve(0.5 * scale * b)
        it2, rr2 = ocean.solve_iters, ocean.solve_relres
        z2.block_until_ready()
        return it1 + it2, max(rr1, rr2)

    t0 = time.perf_counter()
    newton_step()                    # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    mv, rr = newton_step(0.7)
    dt = time.perf_counter() - t0
    out = {"grid": [n, m, l], "dof": 6 * n * m * l, "masked": True,
           "preconditioner": prec, "precision": precision,
           "tolerance": tol, "compile_s": compile_s,
           "newton_step_ms": dt * 1e3, "mv_effort": mv,
           "solve_relres": rr}
    # EMIT the headline record NOW: the deep solve below is optional
    # extra credit, and rounds 2-4 lost three consecutive bench
    # captures because its wall-clock-unbounded 1e-8 tail overran the
    # part budget and destroyed the already-measured numbers.  The
    # parent keeps the LAST parseable JSON line, so a timeout kill
    # from here on still records the warm-step measurement.
    print(json.dumps(out), flush=True)
    # deep solve at 1e-8 (warm operator/preconditioner), bounded by a
    # hard SIGALRM so it can never take the part down with it
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("deep solve budget")
    deep_budget = int(os.environ.get("BENCH_DEEP_TIMEOUT", 180))
    ocean.solver_params.set("FGMRES tolerance", 1e-8)
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(deep_budget)
    t0 = time.perf_counter()
    try:
        ocean.solve(b)
        out["deep_solve"] = {"tolerance": 1e-8,
                             "ms": (time.perf_counter() - t0) * 1e3,
                             "mv_effort": ocean.solve_iters,
                             "relres": ocean.solve_relres}
    except TimeoutError:
        out["deep_solve"] = {"tolerance": 1e-8,
                             "error": "budget %ds reached" % deep_budget}
    finally:
        signal.alarm(0)
    return out


def run_part(name, timeout):
    """Run `python bench.py --part <name>` in a subprocess; parse the
    last JSON line of stdout.  Never raises."""
    t0 = time.time()
    try:
        cp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--part", name],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in reversed(cp.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
        return {"error": ("no JSON from part; rc=%d tail=%r"
                          % (cp.returncode,
                             (cp.stdout + cp.stderr)[-300:]))}
    except subprocess.TimeoutExpired as e:
        # the part may have emitted partial JSON records before the
        # kill (part_newton prints the warm-step record early for
        # exactly this case) — salvage the last one
        partial = e.stdout or b""
        if isinstance(partial, bytes):
            partial = partial.decode(errors="replace")
        for line in reversed(partial.strip().splitlines()):
            try:
                rec = json.loads(line)
                rec.setdefault(
                    "note", "part %r hit its %ds budget after this "
                    "record was emitted" % (name, timeout))
                return rec
            except json.JSONDecodeError:
                continue
        return {"error": "part %r timed out after %ds" % (name, timeout)}
    except Exception as e:  # pragma: no cover
        return {"error": str(e)[:300]}
    finally:
        pass


def main():
    if "--part" in sys.argv:
        # child mode: run one part, print its JSON
        name = sys.argv[sys.argv.index("--part") + 1]
        import jax
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        out = {"matvec": part_matvec, "newton": part_newton}[name]()
        print(json.dumps(out))
        return 0

    results = {}
    results["matvec"] = run_part("matvec", MATVEC_TIMEOUT)
    results["newton_step"] = run_part("newton", NEWTON_TIMEOUT)

    gps = results["matvec"].get("gridpoints_per_s_f32")
    out = {
        "metric": "stencil_jacobian_matvec_gridpoints_per_s_per_chip",
        "value": gps,
        "unit": "gridpoints/s",
        "vs_baseline": None,   # reference publishes no numbers
        "detail": results,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
