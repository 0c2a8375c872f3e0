"""RAILS: Residual Approximation-based Iterative Lyapunov Solver.

Low-rank solver for the (projected) continuous Lyapunov equation

    A X + X A^T + B B^T = 0

re-implemented TPU-native instead of binding the reference's external
RAILS C++ library (reference .travis.yml:89-106, the solver invoked by
src/lyapunov/LyapunovModel.H:60-90).  The algorithm (Baars, Viebahn,
Mulder, Kuehn, Wubs, Dijkstra — "Application of adaptive multilevel
methods...") iterates:

  1. keep an orthonormal search space V (n, k), k small;
  2. solve the k x k projected equation (V^T A V) T + T (V^T A V)^T
     = -(V^T B)(V^T B)^T  directly on the host (tiny dense solve);
  3. form the residual R = A V T V^T + V T V^T A^T + B B^T implicitly
     and expand V with its dominant eigenvectors, obtained by a few
     Lanczos iterations on the *matrix-free* residual matvec;
  4. restart (truncate V via the dominant eigenspace of T) when k
     exceeds a cap.

Everything large-n is expressed as batched matvecs A @ V — dense
stencil applications on TPU; only k x k eigen/Lyapunov solves run on
host (scipy), mirroring how the reference delegates tiny dense work to
LAPACK.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla


class RailsResult(NamedTuple):
    V: np.ndarray        # (n, k) orthonormal basis
    T: np.ndarray        # (k, k) small solution;  X = V T V^T
    resnorm: float       # final residual estimate (dominant |eig| of R)
    iterations: int
    converged: bool


def _orth_against(W, V, reorth: int = 2, rtol: float = 1e-10):
    """Orthonormalize columns of W against V (and internally).

    SVD-based: QR of a rank-deficient block yields arbitrary trailing
    Q columns (not orthogonal to V); the SVD drops the null directions
    instead of inventing them."""
    for _ in range(reorth):
        if V is not None and V.shape[1] > 0:
            W = W - V @ (V.T @ W)
        if W.size == 0:
            return W
        U, s, _ = np.linalg.svd(W, full_matrices=False)
        keep = s > rtol * max(float(s.max(initial=0.0)), 1e-300)
        W = U[:, keep]
    return W


def _residual_lanczos(avmul: Callable, V, T, B, k_expand: int,
                      lanczos_iters: int, rng: np.random.Generator):
    """Dominant eigenpairs of the symmetric residual
    R = (AV) T V^T + V T (AV)^T + B B^T via Lanczos on its matvec."""
    n = V.shape[0]
    AV = avmul(V)                      # (n, k)
    TVt = T @ V.T
    TAVt = T @ AV.T

    def rmul(w):
        return (AV @ (TVt @ w) + V @ (TAVt @ w) + B @ (B.T @ w))

    m = min(lanczos_iters, n - 1)
    Q = np.zeros((n, m + 1))
    alpha = np.zeros(m)
    beta = np.zeros(m + 1)
    q = rng.standard_normal(n)
    q /= np.linalg.norm(q)
    Q[:, 0] = q
    for j in range(m):
        w = rmul(Q[:, j])
        w -= beta[j] * (Q[:, j - 1] if j > 0 else 0.0)
        alpha[j] = Q[:, j] @ w
        w -= alpha[j] * Q[:, j]
        # full reorthogonalization: m is tiny
        w -= Q[:, :j + 1] @ (Q[:, :j + 1].T @ w)
        beta[j + 1] = np.linalg.norm(w)
        if beta[j + 1] < 1e-14:
            m = j + 1
            break
        Q[:, j + 1] = w / beta[j + 1]
    Tm = np.diag(alpha[:m]) + np.diag(beta[1:m], 1) + np.diag(beta[1:m], -1)
    evals, evecs = np.linalg.eigh(Tm)
    order = np.argsort(-np.abs(evals))
    resnorm = float(np.abs(evals[order[0]])) if m > 0 else 0.0
    sel = order[:k_expand]
    W = Q[:, :m] @ evecs[:, sel]
    return W, resnorm


def rails(amul: Callable, B, *,
          tol: float = 1e-6,
          maxiter: int = 100,
          expand: int = 3,
          restart_size: int = 60,
          reduced_size: int = 30,
          lanczos_iters: int = 20,
          seed: int = 42) -> RailsResult:
    """Solve A X + X A^T + B B^T = 0 for low-rank X = V T V^T.

    Parameters
    ----------
    amul : callable mapping an (n, k) block of vectors to A @ block.
        May be jitted jax or plain numpy; output is coerced to numpy.
    B : (n, nb) noise/input factor.
    tol : convergence on the dominant residual eigenvalue relative to
        the dominant eigenvalue of B B^T.
    """
    B = np.asarray(B, dtype=np.float64)
    if B.ndim == 1:
        B = B[:, None]
    n = B.shape[0]
    rng = np.random.default_rng(seed)

    def avmul(W):
        return np.asarray(amul(jnp.asarray(W)), dtype=np.float64)

    # reference scale: ||BB^T|| ~ dominant singular value of B squared
    bscale = float(np.linalg.norm(B, 2) ** 2)
    bscale = bscale if bscale > 0 else 1.0

    V = _orth_against(B.copy(), None)
    if V.shape[1] == 0:
        V = _orth_against(rng.standard_normal((n, 1)), None)
    T = np.zeros((V.shape[1], V.shape[1]))
    resnorm = np.inf
    converged = False
    it = 0
    Vused = V
    for it in range(1, maxiter + 1):
        AV = avmul(V)
        Ak = V.T @ AV                  # (k, k) projected operator
        Bk = V.T @ B
        T = sla.solve_lyapunov(Ak, -(Bk @ Bk.T))
        Vused = V                      # basis consistent with T
        W, resnorm = _residual_lanczos(avmul, V, T, B, expand,
                                       lanczos_iters, rng)
        if resnorm <= tol * bscale:
            converged = True
            break
        # restart: truncate to dominant eigenspace of T
        if V.shape[1] + W.shape[1] > restart_size:
            evals, evecs = np.linalg.eigh(T)
            order = np.argsort(-np.abs(evals))[:reduced_size]
            V = V @ evecs[:, order]
            V = _orth_against(V, None)
        W = _orth_against(W, V)
        if W.shape[1] == 0:
            W = _orth_against(rng.standard_normal((n, 1)), V)
            if W.shape[1] == 0:
                break
        V = np.hstack([V, W])
    return RailsResult(V=Vused, T=T, resnorm=resnorm, iterations=it,
                       converged=converged)
