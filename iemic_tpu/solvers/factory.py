"""Solver / preconditioner factory.

TPU-native analog of the reference's TRIOS::SolverFactory
(reference src/trios/TRIOS_SolverFactory.C:65-250,
TRIOS_SolverFactory.H:22-60), which builds the subsystem
preconditioners (Ifpack AdditiveSchwarz{ILU, ILUT, Amesos, MRILU},
ML multigrid) and AztecOO Krylov solvers from nested parameter lists
(parameterfiles/ocean_preconditioner_params.xml).

Here the factory dispatches on a "Method" name to the TPU-native
preconditioner implementations, returning (build, apply) closures with
a uniform contract:

    build(An)        -> factors (a pytree)
    apply(factors, r) -> z ~= J^{-1} r       (jit-compatible)

Methods:
  * "None"       — identity (AztecOO unpreconditioned analog)
  * "Columns"    — batched vertical column-block inverses
                   (:mod:`.preconditioner`; the role Ifpack ILU plays
                   for the reference: the cheap robust default)
  * "BGS"        — the physics-based block-GS sweep (:mod:`.bgs`; the
                   BlockPreconditioner analog, De Niet & Wubs 2006)
  * "MILU"       — native C++ multilevel ILU on the assembled CSR
                   matrix (:mod:`iemic_tpu.native.milu`; the MRILU
                   analog, host-side factorization — reference
                   mrilu/ + src/mrilucpp/)

plus :func:`make_krylov` (AztecOO construction analog) and
:func:`spectrum_analysis` (the reference's SolverFactory spectrum
probe of P^{-1} A, TRIOS_SolverFactory.H:22-60).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..config import ParameterList
from ..utils import logging as log


def default_prec_params() -> ParameterList:
    p = ParameterList("Preconditioner")
    p.set("Method", "Columns")
    # BGS inner-iteration budget (the reference's per-block solver
    # parameter sublists, ocean_preconditioner_params.xml:427-560).
    # 60@1e-8: the round-5 sweep on the masked global grid measured
    # MV effort 69 per solve at tol 1e-3 vs 172 with 30@1e-6 — the
    # deeper saddle solve more than pays for itself (and halves the
    # solve wall time); see docs/EFFORT.md round-5 table.
    p.set("Saddlepoint iterations", 60)
    # "SI"/"SL"/"SR": the 3D saddle of SolveLower1 with the
    # SIMPLE-type preconditioner (production); "KRYLOV" keeps the
    # legacy depth-averaged 2D saddle for parity experiments
    p.set("Saddlepoint scheme", "SI")
    p.set("Auv iterations", 12)
    p.set("ATS iterations", 0)   # 0 = apply ATS Precond once
    # per-block inner tolerances (reference: each block's solver
    # config, ocean_preconditioner_params.xml:427-560)
    # below the production outer tolerance (1e-4): an
    # inner-Krylov preconditioner floors the outer residual at
    # the inner accuracy (the reference runs inner 1e-4 under
    # outer 1e-3, same margin)
    p.set("Saddlepoint tolerance", 1e-8)
    p.set("Auv tolerance", 1e-2)
    p.set("ATS tolerance", 1e-2)
    # rho-mu orthogonal transform of the TS block for convective
    # adjustment ("ATS: rho/mu Transform",
    # TRIOS_BlockPreconditioner.C:1023-1024, setup_rhomu :1376)
    p.set("ATS rho/mu Transform", False)
    p.set("rho/mu lambda", 7.6e-4 / 1.8e-4)
    # per-block preconditioners: "Columns" (vertical line blocks) or
    # "MG" (semicoarsened multigrid, the reference's ML Method,
    # ocean_preconditioner_params.xml:66-120, :578-584).  Setting the
    # block's iterations to 0 applies the preconditioner once — the
    # reference's "Auv Solver Method = None" production mode.
    p.set("Auv Precond", "Columns")
    p.set("ATS Precond", "MG")
    p.set("Saddlepoint Precond", "Jacobi")   # or "MG"
    # MG prolongation weight (0 = piecewise-constant, 0.25 = bilinear;
    # see mg.build: nonzero makes the V-cycle nonsymmetric, FGMRES-only)
    p.set("MG prolongation weight", 0.25)
    # block-GS sweep ordering M1/M2/M3 and GS vs symmetric GS
    # (TRIOS_BlockPreconditioner.H:93-99 "Permutation",
    #  :1287-1330 "Scheme")
    p.set("Permutation", 1)
    p.set("Scheme", "Gauss-Seidel")   # or "symmetric Gauss-Seidel"
    p.set("Teko sweeps", 1)
    # MILU (MRILU-analog) knobs
    p.set("MILU drop tolerance", 1e-3)
    p.set("MILU max levels", 12)
    p.set("MILU fill factor", 10.0)
    # nested per-block sublists (the reference's 4-level
    # ocean_preconditioner_params.xml:427-560 layout: Block
    # Preconditioner -> {Auv,Saddlepoint,ATS} Solver/Precond ->
    # method sublist).  Entries present here override the flat knobs
    # above; see _apply_nested_block_lists.
    for blk in ("Saddlepoint", "Auv", "ATS"):
        s = p.sublist(blk + " Solver")
        s.set("Iterations", -1)          # -1 = keep flat-knob value
        s.set("Tolerance", -1.0)
        s.set("Scheme", "")
        s.set("Precond Method", "")      # the "<Block> Precond" layer
        s.set("MG prolongation weight", -1.0)
    return p


def _apply_nested_block_lists(params: ParameterList) -> None:
    """Fold the nested per-block sublists into the flat knobs (the
    reference reads 'Saddlepoint Solver'/'ATS Precond'-style nested
    lists, ocean_preconditioner_params.xml:427-560)."""
    for blk, it_key, tol_key, prec_key in [
            ("Saddlepoint", "Saddlepoint iterations",
             "Saddlepoint tolerance", "Saddlepoint Precond"),
            ("Auv", "Auv iterations", "Auv tolerance", "Auv Precond"),
            ("ATS", "ATS iterations", "ATS tolerance", "ATS Precond")]:
        if params.is_sublist(blk + " Solver"):
            sl = params.sublist(blk + " Solver")
            if sl.get("Iterations", -1) >= 0:
                params.set(it_key, int(sl.get("Iterations")))
            if sl.get("Tolerance", -1.0) > 0:
                params.set(tol_key, float(sl.get("Tolerance")))
            if blk == "Saddlepoint" and sl.get("Scheme", ""):
                params.set("Saddlepoint scheme", sl.get("Scheme"))
            if sl.get("Precond Method", ""):
                params.set(prec_key, sl.get("Precond Method"))
            if sl.get("MG prolongation weight", -1.0) >= 0:
                params.set("MG prolongation weight",
                           float(sl.get("MG prolongation weight")))


def make_preconditioner(params: ParameterList | dict | None, *,
                        landm: np.ndarray, periodic: bool,
                        grid_shape: tuple[int, int, int],
                        int_row_provider: Callable | None = None
                        ) -> tuple[Callable, Callable]:
    """Return (build, apply) closures for the configured method.

    int_row_provider: optional () -> (coeff, (var,k,j,i), scale) for
    the salinity integral-condition row, evaluated at build time (the
    row scale changes with each Jacobian's row scaling).  Consumed by
    the BGS method; see bgs.build."""
    if params is None:
        params = ParameterList("Preconditioner")
    if isinstance(params, dict):
        params = ParameterList("Preconditioner", params)
    params.validate_and_set_defaults(default_prec_params())
    _apply_nested_block_lists(params)
    method = params.get("Method")
    l, m, n = grid_shape

    if method == "None":
        return (lambda An: None), (lambda fac, r: r)

    if method == "Columns":
        from .preconditioner import build_column_blocks, apply_column_prec

        def build(An):
            return build_column_blocks(An)

        def apply(fac, r):
            return apply_column_prec(fac, r)

        return build, apply

    if method == "BGS":
        from . import bgs
        nit_spp = params.get("Saddlepoint iterations")
        nit_uv = params.get("Auv iterations")
        nit_ts = params.get("ATS iterations")
        tol_spp = float(params.get("Saddlepoint tolerance"))
        tol_uv = float(params.get("Auv tolerance"))
        tol_ts = float(params.get("ATS tolerance"))
        scheme = params.get("Saddlepoint scheme")
        perm = int(params.get("Permutation"))
        sym = params.get("Scheme") == "symmetric Gauss-Seidel"
        rhomu = bool(params.get("ATS rho/mu Transform"))
        rm_lam = float(params.get("rho/mu lambda"))
        uv_prec = params.get("Auv Precond")
        ts_prec = params.get("ATS Precond")
        spp_prec = params.get("Saddlepoint Precond")
        pw = float(params.get("MG prolongation weight"))

        def build(An):
            int_row = (int_row_provider()
                       if int_row_provider is not None else None)
            return bgs.build(An, landm, periodic=periodic,
                             spp_scheme=scheme, rhomu=rhomu,
                             rhomu_lambda=rm_lam,
                             uv_precond=uv_prec, ts_precond=ts_prec,
                             spp_precond=spp_prec, int_row=int_row,
                             prolong_w=pw)

        def apply(fac, r):
            return bgs.apply(fac, r, periodic=periodic,
                             nit_spp=nit_spp, nit_uv=nit_uv,
                             nit_ts=nit_ts, spp_scheme=scheme,
                             permutation=perm, symmetric=sym,
                             tol_spp=tol_spp, tol_uv=tol_uv,
                             tol_ts=tol_ts)

        return build, apply

    if method == "Teko":
        # the experimental Teko/Rearranger path (reference
        # src/ocean/TekoPreconditioner.H:39-88, Rearranger.H:23-60):
        # block-GS over the rearranged ([u,v,w,p] | [T,S]) groups with
        # batched column inverse factories per group
        from . import rearranger
        sweeps = params.get("Teko sweeps")

        def build(An):
            return rearranger.build(An, periodic=periodic)

        def apply(fac, r):
            return rearranger.apply(fac, r, periodic=periodic,
                                    sweeps=sweeps)

        return build, apply

    if method == "Amesos":
        # sparse-direct factorization of the assembled CSR matrix —
        # the reference's Ifpack Amesos/Amesos_Klu option
        # (TRIOS_SolverFactory.C:65-250, and e.g.
        # test/ocean/ocean_preconditioner_params.xml 'amesos: solver
        # type = Amesos_Klu').  Host-side like MILU; as a right
        # preconditioner it makes FGMRES converge in O(1) iterations.
        from ..ops.stencil import stencil_to_csr, to_flat, from_flat
        import jax
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        def build(An):
            data, indices, indptr = stencil_to_csr(
                np.asarray(An), periodic=periodic)
            N = len(indptr) - 1
            A = sp.csr_matrix((data, indices, indptr), shape=(N, N))
            # tiny Tikhonov shift: the ocean Jacobian is exactly
            # singular along the pressure checkerboard modes, and an LU
            # of the exact matrix returns O(1/eps_mach) garbage there;
            # a relative 1e-10 diagonal shift caps the null-space gain
            # at ~1e10 while leaving the preconditioner quality intact
            # (the outer FGMRES deflates those modes anyway)
            shift = 1e-10 * float(np.abs(data).max())
            A = A + shift * sp.identity(N, format="csr")
            return spla.splu(A.tocsc())

        def apply(fac, r):
            def host_solve(rf):
                return fac.solve(np.asarray(rf, np.float64)) \
                    .astype(rf.dtype)

            flat = to_flat(r)
            z = jax.pure_callback(
                host_solve,
                jax.ShapeDtypeStruct(flat.shape, flat.dtype), flat)
            return from_flat(z, l, m, n)

        return build, apply

    if method == "MILU":
        # host-side factorization/apply (ctypes into native/libmilu.so,
        # like the reference's Fortran MRILU behind Ifpack_MRILU):
        # build() must run eagerly, and apply() crosses to the host via
        # jax.pure_callback so it stays usable inside a jitted Krylov
        # loop (at the cost of a device<->host round trip per apply).
        from ..native import milu
        droptol = params.get("MILU drop tolerance")
        maxlev = params.get("MILU max levels")
        fill = params.get("MILU fill factor")
        from ..ops.stencil import stencil_to_csr, to_flat, from_flat
        import jax

        def build(An):
            data, indices, indptr = stencil_to_csr(
                np.asarray(An), periodic=periodic)
            return milu.factor(data, indices, indptr,
                               droptol=droptol, max_levels=maxlev,
                               fill_factor=fill)

        def apply(fac, r):
            def host_solve(rf):
                return milu.solve(fac, np.asarray(rf, np.float64)) \
                    .astype(rf.dtype)

            flat = to_flat(r)
            z = jax.pure_callback(
                host_solve,
                jax.ShapeDtypeStruct(flat.shape, flat.dtype), flat)
            return from_flat(z, l, m, n)

        return build, apply

    raise ValueError(f"SolverFactory: unknown method '{method}'")


def make_krylov(solver_params: ParameterList | dict | None = None):
    """Krylov solver construction (the AztecOO/Belos construction
    analog, TRIOS_SolverFactory.C:65-250): returns a host-driven
    ``solve(matvec, b, prec)`` closure configured from the list."""
    from .fgmres import fgmres_host
    from .idr import idr_host

    sp = solver_params or {}
    if isinstance(sp, ParameterList):
        sp = sp.to_dict()
    method = sp.get("Method", "FGMRES")
    tol = sp.get("Tolerance", 1e-8)
    maxiter = sp.get("Max iterations", 200)
    s = sp.get("IDR s", 4)

    if method == "FGMRES":
        def solve(matvec, b, prec=None):
            return fgmres_host(matvec, b, prec=prec, tol=tol,
                               maxiter=maxiter)
        return solve
    if method == "IDR":
        def solve(matvec, b, prec=None):
            return idr_host(matvec, b, prec=prec, tol=tol,
                            maxiter=maxiter, s=s)
        return solve
    raise ValueError(f"SolverFactory: unknown Krylov method '{method}'")


def spectrum_analysis(matvec: Callable, prec: Callable, N: int, *,
                      nsample: int = 40, seed: int = 0) -> np.ndarray:
    """Estimate the spectrum of P^{-1} A by Arnoldi Ritz values — the
    TPU analog of the reference's SolverFactory spectrum probe
    (TRIOS_SolverFactory.H:22-60), used to judge preconditioner
    quality (MV effort) offline."""
    rng = np.random.default_rng(seed)
    k = min(nsample, N - 1)
    V = np.zeros((N, k + 1))
    H = np.zeros((k + 1, k))
    v0 = rng.standard_normal(N)
    V[:, 0] = v0 / np.linalg.norm(v0)
    ncols = 0
    for j in range(k):
        w = np.asarray(prec(jnp.asarray(
            np.asarray(matvec(jnp.asarray(V[:, j]))).reshape(-1)
        ))).reshape(-1)
        for i in range(j + 1):
            H[i, j] = V[:, i] @ w
            w = w - H[i, j] * V[:, i]
        H[j + 1, j] = np.linalg.norm(w)
        ncols = j + 1
        if H[j + 1, j] < 1e-12:
            break
        V[:, j + 1] = w / H[j + 1, j]
    ritz = np.linalg.eigvals(H[:ncols, :ncols])
    log.INFO(f"spectrum_analysis: {ncols} Ritz values, "
             f"|lambda| in [{np.abs(ritz).min():.2e}, "
             f"{np.abs(ritz).max():.2e}]")
    return ritz
