"""IDR(s) Krylov solver — alternative to (F)GMRES.

TPU-native counterpart of the reference's templated IDR(s) solver with
residual smoothing (reference src/idrsolver/IDRSolverDecl.H:19-70).
Algorithm: IDR(s) with bi-orthogonalization (van Gijzen & Sonneveld,
ACM TOMS 2011), right-preconditioned, optional minimal-residual
smoothing.

Like the reference's IDRSolver this is the *general-purpose* fallback
solver usable on any operator (including non-jit-pure ones such as the
coupled model, whose matvec orchestrates several submodels); it is
host-driven with all vector work in jax arrays, so each matvec /
preconditioner application runs compiled on device while the tiny s x s
bookkeeping stays on host — the same split the reference makes between
Epetra kernels and solver bookkeeping.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp


class IDRResult(NamedTuple):
    x: object
    iters: int
    relres: float
    converged: bool


def idr_host(matvec: Callable, b, *, s: int = 4,
             prec: Callable | None = None, tol: float = 1e-8,
             maxiter: int = 200, smoothing: bool = True,
             kappa: float = 0.7, seed: int = 0) -> IDRResult:
    """Solve A x = b with IDR(s).  ``matvec``/``prec`` map device
    arrays to device arrays; the Sonneveld-space bookkeeping is host
    numpy (size-s dense)."""
    if prec is None:
        prec = lambda v: v  # noqa: E731

    b_np = np.asarray(b, dtype=np.float64).reshape(-1)
    n = b_np.shape[0]
    s = min(s, n)

    def amul(v):
        return np.asarray(matvec(jnp.asarray(v)), dtype=np.float64)

    def pmul(v):
        return np.asarray(prec(jnp.asarray(v)), dtype=np.float64)

    bnorm = np.linalg.norm(b_np)
    target = tol * (bnorm if bnorm > 0 else 1.0)

    x = np.zeros(n)
    r = b_np.copy()
    rnorm = np.linalg.norm(r)
    if rnorm <= target:
        return IDRResult(jnp.asarray(x), 0, 0.0, True)

    rng = np.random.default_rng(seed)
    P, _ = np.linalg.qr(rng.standard_normal((n, s)))

    G = np.zeros((n, s))
    U = np.zeros((n, s))
    M = np.eye(s)
    om = 1.0
    nmv = 0

    # minimal-residual smoothing state (reference: 'Smoothing' option)
    xs, rs = x.copy(), r.copy()

    while nmv < maxiter and rnorm > target:
        f = P.T @ r
        for k in range(s):
            c = np.linalg.solve(M[k:, k:], f[k:])
            v = r - G[:, k:] @ c
            v = pmul(v)
            U[:, k] = U[:, k:] @ c + om * v
            G[:, k] = amul(U[:, k])
            nmv += 1
            for i in range(k):
                alpha = (P[:, i] @ G[:, k]) / M[i, i]
                G[:, k] -= alpha * G[:, i]
                U[:, k] -= alpha * U[:, i]
            M[k:, k] = P[:, k:].T @ G[:, k]
            if M[k, k] == 0.0:
                return IDRResult(jnp.asarray(xs if smoothing else x),
                                 nmv, rnorm / max(bnorm, 1e-300), False)
            beta = f[k] / M[k, k]
            r = r - beta * G[:, k]
            x = x + beta * U[:, k]
            rnorm = np.linalg.norm(r)
            if smoothing:
                d = rs - r
                gamma = (rs @ d) / (d @ d) if d @ d > 0 else 0.0
                rs = rs - gamma * d
                xs = xs + gamma * (x - xs)
            if rnorm <= target or nmv >= maxiter:
                break
            if k + 1 < s:
                f[k + 1:] = f[k + 1:] - beta * M[k + 1:, k]
        if rnorm <= target or nmv >= maxiter:
            break
        # dimension-reduction step: enter next Sonneveld space
        v = pmul(r)
        t = amul(v)
        nmv += 1
        tt = t @ t
        if tt == 0.0:
            break
        om = (t @ r) / tt
        # kappa angle maintenance (van Gijzen & Sonneveld eq. 4.2)
        rho = abs(t @ r) / (np.sqrt(tt) * max(np.linalg.norm(r), 1e-300))
        if rho < kappa:
            om *= kappa / rho
        x = x + om * v
        r = r - om * t
        rnorm = np.linalg.norm(r)
        if smoothing:
            d = rs - r
            gamma = (rs @ d) / (d @ d) if d @ d > 0 else 0.0
            rs = rs - gamma * d
            xs = xs + gamma * (x - xs)

    if smoothing:
        x, rnorm = xs, np.linalg.norm(rs)
    return IDRResult(jnp.asarray(x), nmv, float(rnorm / max(bnorm, 1e-300)),
                     bool(rnorm <= target))
