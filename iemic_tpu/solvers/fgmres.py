"""Flexible GMRES, jit-compatible, over arbitrary pytrees.

TPU-native replacement for the reference's Belos flexible-GMRES solve
(reference src/ocean/Ocean.C:961-1022 ``initializeBelos``/``solve``):
right-preconditioned FGMRES with modified Gram-Schmidt Arnoldi and
Givens rotations, implemented with ``lax.while_loop`` so the whole
Newton-Krylov stack stays inside one XLA computation.

The Krylov basis lives in a preallocated (maxiter+1, N) array; each
iteration is one matvec + one preconditioner application + reductions,
exactly the structure XLA pipelines well on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


class FGMRESResult(NamedTuple):
    x: jax.Array          # flat solution
    iters: jax.Array      # iterations performed
    relres: jax.Array     # final implicit relative residual
    converged: jax.Array


def _identity(v):
    return v


@partial(jax.jit, static_argnames=("matvec", "prec", "maxiter",
                                   "stall_limit"))
def _fgmres_flat(matvec: Callable, prec: Callable,
                 b: jax.Array, x0: jax.Array,
                 tol: jax.Array, maxiter: int,
                 stall_limit: int = 0) -> FGMRESResult:
    """stall_limit > 0 additionally stops when the (monotone) implicit
    residual has improved by less than 0.1% per iteration for that many
    consecutive iterations — essential when the target tolerance sits
    below the working-precision noise floor (the mixed-precision inner
    solves): running a stagnated Arnoldi to maxiter poisons the basis
    and the back-substituted solution blows up along the near-null
    directions."""
    N = b.shape[0]
    dtype = b.dtype

    r0 = b - matvec(x0)
    beta = jnp.linalg.norm(r0)
    bnorm = jnp.linalg.norm(b)
    target = tol * jnp.where(bnorm > 0.0, bnorm, 1.0)

    V = jnp.zeros((maxiter + 1, N), dtype)
    Z = jnp.zeros((maxiter, N), dtype)
    H = jnp.zeros((maxiter + 1, maxiter), dtype)
    cs = jnp.zeros(maxiter, dtype)
    sn = jnp.zeros(maxiter, dtype)
    g = jnp.zeros(maxiter + 1, dtype)

    V = V.at[0].set(jnp.where(beta > 0.0, r0 / beta, r0))
    g = g.at[0].set(beta)

    def cond(state):
        j, V, Z, H, cs, sn, g, res, stall = state
        go = (j < maxiter) & (res > target)
        if stall_limit > 0:
            go = go & (stall < stall_limit)
        return go

    def body(state):
        j, V, Z, H, cs, sn, g, res, stall = state
        z = prec(V[j])
        w = matvec(z)
        Z = Z.at[j].set(z)

        # CGS2 orthogonalization: two classical Gram-Schmidt passes as
        # dense matmuls against the stored basis.  Rows of V beyond j
        # are still zero, so V @ w yields exactly the coefficients for
        # i <= j and zeros elsewhere — no masking, and the whole
        # orthogonalization is 4 large matmuls (MXU work) instead of
        # maxiter sequential dot+axpy kernels (the O(maxiter)-per-
        # iteration loop was the round-3 Newton-bench timeout driver).
        # CGS2 matches MGS stability for GMRES (Giraud et al. 2005).
        h1 = V @ w
        w = w - V.T @ h1
        h2 = V @ w
        w = w - V.T @ h2
        hj1 = jnp.linalg.norm(w)
        H = H.at[:, j].set(h1 + h2)
        H = H.at[j + 1, j].set(hj1)
        V = V.at[j + 1].set(jnp.where(hj1 > 0.0, w / hj1, w))

        # apply previous Givens rotations to column j (dynamic bound:
        # only the first j rotations exist)
        def rot(i, Hcol):
            hi = cs[i] * Hcol[i] + sn[i] * Hcol[i + 1]
            hi1 = -sn[i] * Hcol[i] + cs[i] * Hcol[i + 1]
            Hcol = Hcol.at[i].set(hi)
            Hcol = Hcol.at[i + 1].set(hi1)
            return Hcol

        Hcol = lax.fori_loop(0, j, rot, H[:, j])

        # new rotation annihilating H[j+1, j]
        denom = jnp.sqrt(Hcol[j] ** 2 + Hcol[j + 1] ** 2)
        c = jnp.where(denom > 0.0, Hcol[j] / denom, 1.0)
        s = jnp.where(denom > 0.0, Hcol[j + 1] / denom, 0.0)
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(s)
        Hcol = Hcol.at[j].set(c * Hcol[j] + s * Hcol[j + 1])
        Hcol = Hcol.at[j + 1].set(0.0)
        H = H.at[:, j].set(Hcol)

        gj1 = -s * g[j]
        g = g.at[j + 1].set(gj1)
        g = g.at[j].set(c * g[j])

        res_new = jnp.abs(gj1)
        stall = jnp.where(res_new > res * dtype.type(0.999),
                          stall + 1, 0)
        return j + 1, V, Z, H, cs, sn, g, res_new, stall

    j, V, Z, H, cs, sn, g, res, _ = lax.while_loop(
        cond, body, (0, V, Z, H, cs, sn, g, beta, 0))

    # back substitution on the (masked) upper-triangular system
    def backsub(i_rev, y):
        i = maxiter - 1 - i_rev
        active = i < j
        rhs = g[i] - jnp.dot(H[i], y)
        hii = H[i, i]
        yi = jnp.where(active, rhs / jnp.where(hii != 0.0, hii, 1.0), 0.0)
        return y.at[i].set(yi)

    y = lax.fori_loop(0, maxiter, backsub, jnp.zeros(maxiter, dtype))
    x = x0 + Z.T @ y

    return FGMRESResult(x=x, iters=j, relres=res / jnp.maximum(bnorm, 1e-300),
                        converged=res <= target)


@partial(jax.jit, static_argnames=("matvec64", "matvec32", "prec32",
                                   "maxiter", "max_refine"))
def _fgmres_ir_flat(matvec64: Callable, matvec32: Callable,
                    prec32: Callable, b: jax.Array, x0: jax.Array,
                    tol: jax.Array, maxiter: int,
                    max_refine: int = 12) -> FGMRESResult:
    """Mixed-precision FGMRES with f64 iterative refinement.

    TPU f64 is software-emulated (~50-100x slower than f32 on the VPU),
    so the expensive operations — the 972-plane stencil matvec and the
    column-block preconditioner apply — run in f32 while the Arnoldi
    process itself (basis, orthogonalization, Givens) stays f64.  The
    THCM Jacobian preconditioned by column blocks has cond ~1e10+, so a
    fully-f32 Krylov loop stagnates immediately; the f64 Arnoldi on the
    f32-rounded operator behaves like inexact GMRES and converges at
    the f64 rate down to the operator-perturbation floor (~1e-6).  An
    outer refinement loop then restores full f64 accuracy:

        r = b - A x            (f64, one exact matvec per refinement)
        solve A32 dz ~= r      (f64 Arnoldi, f32 matvec+prec)
        x += dz

    Each sweep contracts the f64 error by the f32 solve's relative
    accuracy (the operator-perturbation floor; from ~1e-6 with a mild
    preconditioner down to ~3e-2 for the strongly amplifying block-GS
    sweep), so max_refine bounds the budget and the target test stops
    early — reaching the accuracy of the reference's all-f64 Belos
    FGMRES (Ocean.C:961-1022) at a fraction of the cost.  This
    replaces nothing in the reference; it is TPU-native redesign
    (SURVEY §7 hard part 4: f64 throughput).

    matvec64/b/x0 are f64; matvec32/prec32 operate on f32 vectors.
    Returned iters counts *inner* Krylov iterations (the MV effort
    metric of cdata.txt).
    """
    bnorm = jnp.linalg.norm(b)
    target = tol * jnp.where(bnorm > 0.0, bnorm, 1.0)
    # just above the f32 operator-perturbation floor; each refinement
    # contracts the f64 error by this factor, so 1e-12 takes 2 sweeps
    inner_tol = jnp.asarray(1e-6, b.dtype)

    def mv_h(v):
        return matvec32(v.astype(jnp.float32)).astype(b.dtype)

    def pc_h(v):
        return prec32(v.astype(jnp.float32)).astype(b.dtype)

    def cond(state):
        x, r, res, outer, inner = state
        return (outer < max_refine) & (res > target)

    def body(state):
        x, r, res, outer, inner = state
        rn = jnp.linalg.norm(r)
        scale = jnp.where(rn > 0.0, rn, 1.0)
        # stall_limit: the f32 noise floor of a badly conditioned
        # preconditioned operator can sit above inner_tol; stop at
        # stagnation instead of poisoning the basis until maxiter
        sol = _fgmres_flat(mv_h, pc_h, r / scale,
                           jnp.zeros_like(r), inner_tol, maxiter,
                           stall_limit=60)
        x = x + sol.x * scale
        r = b - matvec64(x)
        return x, r, jnp.linalg.norm(r), outer + 1, inner + sol.iters

    r0 = b - matvec64(x0)
    x, r, res, outer, inner = lax.while_loop(
        cond, body, (x0, r0, jnp.linalg.norm(r0), 0, 0))
    return FGMRESResult(x=x, iters=inner,
                        relres=res / jnp.maximum(bnorm, 1e-300),
                        converged=res <= target)


def fgmres_host(matvec: Callable, b, *, prec: Callable | None = None,
                tol: float = 1e-8, maxiter: int = 100):
    """Host-driven FGMRES for operators that are not jit-pure (e.g. the
    coupled model, whose matvec/preconditioner orchestrate several
    models like the reference's Belos-on-BelosOp setup,
    CoupledModel.C:274-352).  Each matvec/prec call may internally run
    jitted code."""
    import numpy as np

    b = np.asarray(b).reshape(-1)
    N = b.shape[0]
    bnorm = np.linalg.norm(b)
    target = tol * (bnorm if bnorm > 0 else 1.0)

    if prec is None:
        prec = lambda v: v  # noqa: E731

    x = np.zeros(N)
    r0 = b
    beta = np.linalg.norm(r0)
    if beta <= target:
        return jnp.asarray(x), FGMRESResult(
            x=jnp.asarray(x), iters=jnp.asarray(0),
            relres=jnp.asarray(0.0), converged=jnp.asarray(True))

    V = np.zeros((maxiter + 1, N))
    Z = np.zeros((maxiter, N))
    H = np.zeros((maxiter + 1, maxiter))
    cs = np.zeros(maxiter)
    sn = np.zeros(maxiter)
    g = np.zeros(maxiter + 1)
    V[0] = r0 / beta
    g[0] = beta
    res = beta
    j = 0
    while j < maxiter and res > target:
        z = np.asarray(prec(jnp.asarray(V[j]))).reshape(-1)
        w = np.asarray(matvec(jnp.asarray(z))).reshape(-1)
        Z[j] = z
        for i in range(j + 1):
            H[i, j] = V[i] @ w
            w = w - H[i, j] * V[i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] > 0:
            V[j + 1] = w / H[j + 1, j]
        for i in range(j):
            hi = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
            H[i + 1, j] = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
            H[i, j] = hi
        denom = np.hypot(H[j, j], H[j + 1, j])
        c, s = (1.0, 0.0) if denom == 0 else (H[j, j] / denom,
                                              H[j + 1, j] / denom)
        cs[j], sn[j] = c, s
        H[j, j] = c * H[j, j] + s * H[j + 1, j]
        H[j + 1, j] = 0.0
        g[j + 1] = -s * g[j]
        g[j] = c * g[j]
        res = abs(g[j + 1])
        j += 1

    y = np.linalg.solve(H[:j, :j], g[:j]) if j else np.zeros(0)
    x = Z[:j].T @ y
    return jnp.asarray(x), FGMRESResult(
        x=jnp.asarray(x), iters=jnp.asarray(j),
        relres=jnp.asarray(res / max(bnorm, 1e-300)),
        converged=jnp.asarray(res <= target))


def fgmres(matvec: Callable, b, x0=None, *, prec: Callable | None = None,
           tol: float = 1e-8, maxiter: int = 100):
    """Solve A x = b with right-preconditioned FGMRES.

    matvec/prec act on pytrees shaped like b; internally everything is
    flattened once.  Returns (x_pytree, FGMRESResult).
    """
    b_flat, unravel = ravel_pytree(b)
    if x0 is None:
        x0_flat = jnp.zeros_like(b_flat)
    else:
        x0_flat, _ = ravel_pytree(x0)

    def mv_flat(v):
        out, _ = ravel_pytree(matvec(unravel(v)))
        return out

    if prec is None:
        pc_flat = _identity
    else:
        def pc_flat(v):
            out, _ = ravel_pytree(prec(unravel(v)))
            return out

    res = _fgmres_flat(mv_flat, pc_flat, b_flat, x0_flat,
                       jnp.asarray(tol, b_flat.dtype), maxiter)
    return unravel(res.x), res
