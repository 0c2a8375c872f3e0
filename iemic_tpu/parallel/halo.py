"""Explicit halo exchange and the shard_map stencil matvec.

The reference surrounds every RHS/Jacobian evaluation with
Standard->Assembly / Assembly->Solve ghost imports (2-deep overlap,
reference src/trios/TRIOS_Domain.H:273-290, used at src/ocean/THCM.C:972,999).
Here the matrix-free stencil matvec needs a 1-deep halo, exchanged
explicitly with ``lax.ppermute`` inside ``shard_map``:

  * y ('y' mesh axis over latitude): walls — shards at the global edge
    receive zeros (ppermute leaves non-receivers zero, matching the
    reference's zero Dirichlet padding).
  * x ('x' axis over longitude): optional periodic wraparound — the
    last shard neighbors the first (reference TRIOS_Domain.H:337-340).
  * corner (diagonal) ghosts come for free from the two-stage exchange:
    y first, then x over the already-y-padded columns.
  * z is never partitioned; k ghosts are zero-padded locally
    (reference TRIOS_Domain.H:63-84).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map

from ..ops.stencil import offsets

_OFFS = offsets()


def halo_pad_shard(xl: jnp.ndarray, *, py: int, px: int,
                   periodic_x: bool) -> jnp.ndarray:
    """Pad a local (nun, l, ml, nl) block to (nun, l+2, ml+2, nl+2)
    with neighbor halos.  Must run inside shard_map over ('y','x')."""
    # ---- y (j / latitude) ghosts: global walls get zeros -------------
    if py > 1:
        lo = lax.ppermute(xl[:, :, -1:, :], "y",
                          [(r, r + 1) for r in range(py - 1)])
        hi = lax.ppermute(xl[:, :, :1, :], "y",
                          [(r, r - 1) for r in range(1, py)])
    else:
        lo = jnp.zeros_like(xl[:, :, :1, :])
        hi = lo
    xj = jnp.concatenate([lo, xl, hi], axis=2)

    # ---- x (i / longitude) ghosts, including corners ------------------
    if px > 1:
        if periodic_x:
            fwd = [(r, (r + 1) % px) for r in range(px)]
            bwd = [(r, (r - 1) % px) for r in range(px)]
        else:
            fwd = [(r, r + 1) for r in range(px - 1)]
            bwd = [(r, r - 1) for r in range(1, px)]
        lo = lax.ppermute(xj[:, :, :, -1:], "x", fwd)
        hi = lax.ppermute(xj[:, :, :, :1], "x", bwd)
    elif periodic_x:
        lo = xj[:, :, :, -1:]
        hi = xj[:, :, :, :1]
    else:
        lo = jnp.zeros_like(xj[:, :, :, :1])
        hi = lo
    xij = jnp.concatenate([lo, xj, hi], axis=3)

    # ---- z ghosts: surface/bottom, always zero -------------------------
    return jnp.pad(xij, ((0, 0), (1, 1), (0, 0), (0, 0)))


def make_sharded_stencil_apply(domain):
    """Jitted (An, x) -> An*x over the domain's mesh via shard_map.

    The SPMD analog of the reference's Epetra CSR SpMV with ghost
    import (matetc.F90:147-166 + TRIOS importers): each shard exchanges
    1-deep halos over ICI and contracts its 27 local windows.
    """
    py, px, periodic = domain.py, domain.px, domain.periodic

    def local_apply(An_l, x_l):
        nun, l, ml, nl = x_l.shape
        xp = halo_pad_shard(x_l, py=py, px=px, periodic_x=periodic)
        windows = jnp.stack([
            xp[:, 1 + dk:1 + dk + l, 1 + dj:1 + dj + ml,
               1 + di:1 + di + nl]
            for (di, dj, dk) in _OFFS
        ])
        return jnp.einsum("pABkji,pBkji->Akji", An_l, windows)

    f = shard_map(local_apply, mesh=domain.mesh,
                  in_specs=(domain.stencil_spec, domain.state_spec),
                  out_specs=domain.state_spec)
    return jax.jit(f)


def make_sharded_ops(ocean, domain):
    """Sharded hot-path operators for an Ocean model.

    Returns a dict with:
      * ``matvec(An, v)`` — Jacobian action (shard_map halo stencil +
        the salinity-integral-condition row, THCM.C:2121-2196); the
        integral dot is a global reduction (psum analog, §2.9 item 4).
      * ``rhs(x, par, int_correction)`` / ``jac(x, par)`` — the full
        evaluations jitted under GSPMD with input sharding constraints
        (XLA inserts the ghost collectives automatically, the analog of
        the 2-deep Assembly overlap used during assembly).
    """
    cfg = ocean.cfg
    ir = ocean.rowintcon
    int_coeff = domain.shard_state(ocean.int_coeff)
    apply_st = make_sharded_stencil_apply(domain)

    def matvec(An, v):
        y = apply_st(An, v)
        if cfg.sres == 0:
            y = y.at[ir].set(cfg.int_sign * jnp.vdot(int_coeff, v))
        return y

    fields, cpl = ocean.fields, ocean.cpl

    @jax.jit
    def rhs(x, par, int_correction=0.0):
        x = domain.constrain_state(x)
        return ocean._rhs_fn(x, par, fields, cpl, int_correction)

    @jax.jit
    def jac(x, par):
        x = domain.constrain_state(x)
        return ocean._jac_fn(x, par, fields, cpl)

    return {"matvec": jax.jit(matvec), "rhs": rhs, "jac": jac,
            "solve": make_sharded_solve(ocean, domain, matvec)}


def make_sharded_solve(ocean, domain, matvec=None, *,
                       precision: str = "Double",
                       apply_opts: dict | None = None,
                       inner_tol: float = 1e-4,
                       stall_limit: int = 8):
    """Sharded BGS-preconditioned FGMRES solve (the full solve path of
    §3.1 under SPMD): the Krylov matvec runs the explicit shard_map
    halo exchange, the block-GS preconditioner factors/applies under
    GSPMD (its batched column inverses partition over the (y, x) mesh;
    the depth-averaged 2D saddle solve's reductions become mesh
    collectives), and the pressure null modes are deflated globally.

    Returns ``solve(An, b, tol, maxiter) -> (x, iters, relres)`` — the
    multi-device equivalent of Ocean.solve, used for the np in
    {1,2,4,8} equivalence regression
    (reference src/tests/CMakeLists.txt:77-87).

    precision="Double" is the all-f64 path; "Mixed" runs the Krylov
    matvec + block-GS preconditioner in f32 with f64 Arnoldi and f64
    iterative-refinement sweeps — the sharded twin of Ocean.solve's
    production Mixed path (everything stays inside one jitted SPMD
    computation; the refinement loop is a lax.while_loop).
    """
    from ..solvers import bgs
    from ..solvers.fgmres import _fgmres_flat

    # per-block inner-iteration knobs for the BGS sweep (the
    # ocean_preconditioner_params.xml per-block solver configs);
    # the multichip dryrun passes a lighter budget because nested
    # 2D-saddle iterations cost ~100x more per step on an emulated
    # virtual-device mesh than on real chips
    apply_kw = dict(apply_opts or {})

    cfg = ocean.cfg
    landm = __import__("numpy").asarray(ocean.landm)
    if matvec is None:
        ops_mv = make_sharded_stencil_apply(domain)
        int_coeff = domain.shard_state(ocean.int_coeff)
        ir = ocean.rowintcon

        def matvec(An, v):
            y = ops_mv(An, v)
            if cfg.sres == 0:
                y = y.at[ir].set((cfg.int_sign
                                  * jnp.vdot(int_coeff.astype(v.dtype),
                                             v)).astype(y.dtype))
            return y

    nullq = ocean._get_deflator() if ocean.jac is not None else None
    int_row = ((ocean.int_coeff, ocean.rowintcon, float(cfg.int_sign))
               if cfg.sres == 0 else None)

    def _build(An):
        """Factor at HOST level: bgs.build is itself jitted
        (_build_core), so its compiled GSPMD graph is shared across
        every caller with the same shapes/shardings — the Double and
        Mixed stages of the multichip dryrun each paid a duplicate
        multi-minute compile when the build was inlined in their own
        outer jits (round 4/5a)."""
        An = jax.device_put(An, domain.stencil_sharding)
        factors = bgs.build(An, landm, periodic=cfg.periodic,
                            ts_precond="MG", int_row=int_row)
        return An, factors

    @partial(jax.jit, static_argnames=("maxiter",))
    def _solve_jit(An, factors, b, tol, maxiter):
        shape = b.shape

        def proj(v):
            if nullq is None:
                return v
            return v - nullq @ (nullq.T @ v)

        def mv(v):
            return proj(matvec(An, v.reshape(shape)).reshape(-1))

        def pc(v):
            z = bgs.apply(factors, v.reshape(shape),
                          periodic=cfg.periodic, **apply_kw).reshape(-1)
            return proj(z)

        flat_b = proj(b.reshape(-1))
        res = _fgmres_flat(mv, pc, flat_b, jnp.zeros_like(flat_b),
                           tol, maxiter)
        return proj(res.x).reshape(shape), res.iters, res.relres

    def _solve(An, b, tol, maxiter):
        An, factors = _build(An)
        return _solve_jit(An, factors, b, tol, maxiter)

    if precision != "Mixed":
        return _solve

    # ---- Mixed: HOST-driven f64 iterative refinement ------------------
    # The sharded twin of Ocean._solve_mixed_host + _gmres_ir_host:
    # each sweep runs one jitted f32-operator GSPMD Krylov solve and an
    # exact f64 residual refresh; a sweep that fails to halve the true
    # residual ends refinement (the f32 noise floor), and any remaining
    # distance to the target is closed by GMRES-IR — an outer f64
    # FGMRES preconditioned by SHORT f32 inner solves, monotone by
    # construction.  Round 4's all-in-jit lax.while_loop version had no
    # such fallback and stopped 3.5 orders short of tight tolerances
    # (the Ocean.C:1060-1151 explicit-residual check semantics demand
    # the true relres actually meet tol).
    shape6 = (6, cfg.l, cfg.m, cfg.n)
    _MAX_SWEEPS = 12        # refinement sweep cap (single source of
    #                         truth; the loop below is host-side `for`)

    nullq32 = nullq.astype(jnp.float32) if nullq is not None else None

    def _proj64(v):
        if nullq is None:
            return v
        return v - nullq @ (nullq.T @ v)

    def _proj32(v):
        if nullq32 is None:
            return v
        return v - nullq32 @ (nullq32.T @ v)

    @jax.jit
    def _cast32(An, factors):
        factors32 = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "astype") and jnp.issubdtype(
                a.dtype, jnp.floating) else a, factors)
        return factors32, An.astype(jnp.float32)

    # Mixed solves the ROW-SCALED system (R J) z = R b like the host
    # production path (Ocean.solve / scaling.py THCM row scaling,
    # Ocean.C:1206-1214): without it the f32 representation of the
    # raw Jacobian — whose rows span many orders across variables —
    # loses the weak rows entirely, flooring the mixed path orders of
    # magnitude early (the round-4 dryrun missed 1e-6 at 3.7e-3 for
    # exactly this reason).
    smv_m = make_sharded_stencil_apply(domain)
    int_coeff_m = (domain.shard_state(ocean.int_coeff)
                   if cfg.sres == 0 else None)
    ir_m = ocean.rowintcon

    def matvec_m(A, v, rint_v):
        y = smv_m(A, v)
        if cfg.sres == 0:
            y = y.at[ir_m].set(
                (rint_v.astype(v.dtype) * cfg.int_sign
                 * jnp.vdot(int_coeff_m.astype(v.dtype), v))
                .astype(y.dtype))
        return y

    def _prep(An):
        An = jax.device_put(An, domain.stencil_sharding)
        if cfg.scaling == "THCM":
            from ..models.ocean import scaling as _scal
            R, _ = _scal.row_col_scaling(An, landm)
            R = domain.shard_state(R.astype(An.dtype))
            rint = R[ir_m]
            An = An * R[None, :, None]
        else:
            R = None
            rint = jnp.asarray(1.0, An.dtype)
        ir_row = ((ocean.int_coeff, ocean.rowintcon,
                   rint * cfg.int_sign) if cfg.sres == 0 else None)
        factors = bgs.build(An, landm, periodic=cfg.periodic,
                            ts_precond="MG", int_row=ir_row)
        factors32, An32 = _cast32(An, factors)
        return An, factors32, An32, R, rint

    @partial(jax.jit, static_argnames=("maxiter",))
    def _inner(An32, factors32, r, tol, rint, maxiter):
        """One f32-operator GSPMD Krylov solve with f64 Arnoldi."""
        def mv_h(v):
            v32 = v.astype(jnp.float32).reshape(shape6)
            y = matvec_m(An32, v32, rint).reshape(-1)
            return _proj32(y).astype(r.dtype)

        def pc_h(v):
            v32 = v.astype(jnp.float32).reshape(shape6)
            z = bgs.apply(factors32, v32,
                          periodic=cfg.periodic, **apply_kw).reshape(-1)
            return _proj32(z).astype(r.dtype)

        # stall_limit=8: the f32 inner solve hits its inexact-matvec
        # noise floor after O(1) iterations when the BGS apply is
        # near-exact (measured: stalled at 3.9e-3 for 60 nested-Krylov
        # iterations, ~330 s on an 8-virtual-device mesh) — bail out
        # quickly and let the f64 refinement sweeps / GMRES-IR tail do
        # the contraction instead
        res = _fgmres_flat(mv_h, pc_h, r, jnp.zeros_like(r),
                           tol.astype(r.dtype), maxiter,
                           stall_limit=stall_limit)
        return _proj64(res.x), res.iters, res.relres

    @jax.jit
    def _mv64(An, v, rint):
        return _proj64(matvec_m(An, v.reshape(shape6),
                                rint).reshape(-1))

    import os as _os
    import time as _t
    _dbg = bool(_os.environ.get("IEMIC_DEBUG_MIXED"))

    def solve_mixed(An, b, tol, maxiter):
        _t0 = _t.perf_counter()
        An, factors32, An32, R, rint = _prep(An)
        if _dbg:
            jax.block_until_ready(factors32)
            print(f"  [mixed] prep {_t.perf_counter() - _t0:.1f}s",
                  flush=True)
        if R is not None:
            b = b * R
        flat_b = _proj64(b.reshape(-1))
        bn = float(jnp.linalg.norm(flat_b))
        target = float(tol) * (bn if bn > 0 else 1.0)
        x = jnp.zeros_like(flat_b)
        r = flat_b
        rn = bn
        total = 0
        for _sweep in range(_MAX_SWEEPS):
            if rn <= target:
                break
            # per-sweep tolerance `inner_tol`: with a strong BGS apply
            # the f32 solve reaches its inexact-matvec floor (~4e-3
            # measured on the dryrun fixture) in 1-2 iterations and
            # then creeps — asking for much more burns maxiter at the
            # SAME final contraction (measured: 30 iterations for
            # 4.2e-3 vs 1 iteration for ~4e-3).  The refinement
            # refresh and the GMRES-IR tail below carry the residual
            # past the floor.  On real chips f32 iterations are cheap
            # and deeper sweeps pay off (fewer emulated-f64 refreshes);
            # on emulated virtual-device meshes the dryrun passes a
            # loose 1e-2.
            _t0 = _t.perf_counter()
            dz, its, _ = _inner(An32, factors32, r / rn,
                                jnp.asarray(inner_tol), rint, maxiter)
            if _dbg:
                jax.block_until_ready(dz)
                print(f"  [mixed] sweep {_sweep}: its={int(its)} "
                      f"{_t.perf_counter() - _t0:.1f}s rn={rn:.2e}",
                      flush=True)
            total += int(its)
            x_new = x + dz * rn
            r_new = flat_b - _mv64(An, x_new, rint)
            rn_new = float(jnp.linalg.norm(r_new))
            if rn_new >= 0.5 * rn:
                if rn_new < rn:
                    x, r, rn = x_new, r_new, rn_new
                break
            x, r, rn = x_new, r_new, rn_new
        if rn > target:
            # GMRES-IR tail: outer f64 FGMRES on the correction system
            # preconditioned by a short (1e-2) f32 inner solve
            from ..solvers.fgmres import fgmres_host
            import numpy as _np
            inner_count = [0]

            def mv(v):
                return _mv64(An, jnp.asarray(v), rint)

            def pc(v):
                v = jnp.asarray(v)
                vn = float(jnp.linalg.norm(v))
                if vn == 0.0:
                    return v
                # same static maxiter as the refinement sweeps so the
                # tail REUSES the sweeps' compiled graph (a different
                # static here costs a fresh multi-minute GSPMD compile
                # on the emulated mesh); the caller bounds the waste of
                # a stalled call by passing a small maxiter
                dz, its, _ = _inner(An32, factors32, v / vn,
                                    jnp.asarray(1e-2), rint, maxiter)
                inner_count[0] += int(its)
                return dz * vn

            if _dbg:
                print(f"  [mixed] GMRES-IR tail from rn={rn:.2e} "
                      f"target={target:.2e}", flush=True)
            dx, res = fgmres_host(mv, _np.asarray(r), prec=pc,
                                  tol=target / rn, maxiter=60)
            x_new = x + dx
            r_new = flat_b - _mv64(An, x_new, rint)
            rn_new = float(jnp.linalg.norm(r_new))
            if rn_new < rn:      # monotone: never return a worse iterate
                x, rn = x_new, rn_new
            total += inner_count[0]
        return (x.reshape(b.shape), jnp.asarray(total),
                jnp.asarray(rn / max(bn, 1e-300)))

    return solve_mixed
