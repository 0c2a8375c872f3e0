"""TPU-safe batched small dense inverse / solve.

The bench TPU's compiler crashes lowering ``jnp.linalg.inv``/``solve``
in float64 (the LU custom call has no f64 path under emulation), and
those are exactly the ops the preconditioner factorizations need —
batched inverses of the (m*n, d, d) vertical column blocks with
d = nun*l up to a few dozen.

This module implements Gauss-Jordan elimination with partial pivoting
out of plain jnp primitives (where / argmax / outer products) — a
Python-unrolled loop over the d pivot steps, each an O(batch * d^2)
rank-1 update that maps straight onto the VPU.  Used for every batched
factorization in the solvers (one call per Jacobian build, so the
extra flops over a tuned LAPACK are irrelevant).

Semantics match ``jnp.linalg.inv`` for nonsingular inputs; singular
inputs produce inf/nan like LAPACK would (callers gauge dummy rows to
identity beforehand, as the reference does for its dummy W/P rows,
TRIOS_BlockPreconditioner.C:478-487).
"""

from __future__ import annotations

import jax.numpy as jnp


def inv(A: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of (..., d, d) via Gauss-Jordan with partial
    pivoting.  d must be a static (trace-time) constant.

    Small d uses the Python-unrolled pivot loop (fastest at runtime);
    d > 32 switches to the fori_loop variant whose compiled graph is
    one loop body (the unrolled form at d ~ 100 costs minutes of XLA
    optimization per process on the remote-TPU backend)."""
    if A.shape[-1] > 32:
        return inv_batched_loop(A)
    d = A.shape[-1]
    batch = A.shape[:-2]
    A = A.reshape((-1, d, d))
    B = A.shape[0]
    M = jnp.concatenate([A, jnp.broadcast_to(
        jnp.eye(d, dtype=A.dtype), (B, d, d))], axis=-1)  # (B, d, 2d)

    rows = jnp.arange(d)
    for k in range(d):
        # partial pivot: strongest entry in column k at rows >= k
        col = jnp.abs(M[:, :, k])
        col = jnp.where(rows[None, :] >= k, col, -1.0)
        piv = jnp.argmax(col, axis=1)                     # (B,)
        pivrow = jnp.take_along_axis(
            M, piv[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        krow = M[:, k]
        # swap rows k <-> piv
        is_piv = rows[None, :] == piv[:, None]            # (B, d)
        is_k = rows[None, :] == k
        M = jnp.where(is_k[..., None], pivrow[:, None, :],
                      jnp.where(is_piv[..., None], krow[:, None, :], M))
        # eliminate column k from every other row, normalize row k
        pivval = M[:, k, k][:, None]                      # (B, 1)
        prow = M[:, k] / pivval                           # (B, 2d)
        fac = M[:, :, k]                                  # (B, d)
        M = M - fac[..., None] * prow[:, None, :]
        M = M.at[:, k].set(prow)

    return M[:, :, d:].reshape(*batch, d, d)


def solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched solve of (..., d, d) x (..., d) or (..., d, k)."""
    X = inv(A)
    if b.ndim == A.ndim - 1:
        return jnp.einsum('...ij,...j->...i', X, b)
    return X @ b


def inv_large(A: jnp.ndarray) -> jnp.ndarray:
    """Single (d, d) inverse via Gauss-Jordan with partial pivoting,
    with the pivot loop as a ``lax.fori_loop`` (the Python-unrolled
    :func:`inv` is for d up to a few dozen; unrolling d ~ 10^3 pivot
    steps — the multigrid coarsest-level factor — would explode the
    HLO).  One O(d^3) factorization per preconditioner build."""
    import jax
    from jax import lax

    d = A.shape[-1]
    M = jnp.concatenate([A, jnp.eye(d, dtype=A.dtype)], axis=-1)
    rows = jnp.arange(d)

    def step(k, M):
        col = jnp.abs(M[:, k])
        col = jnp.where(rows >= k, col, -1.0)
        piv = jnp.argmax(col)
        pivrow = M[piv]
        krow = M[k]
        M = M.at[k].set(pivrow)
        M = M.at[piv].set(krow)
        prow = M[k] / M[k, k]
        fac = M[:, k].at[k].set(0.0)
        M = M - fac[:, None] * prow[None, :]
        M = M.at[k].set(prow)
        return M

    M = lax.fori_loop(0, d, step, M)
    return M[:, d:]


def inv_batched_loop(A: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., d, d) inverse with the pivot loop as
    ``lax.fori_loop`` — same semantics as :func:`inv` but the compiled
    graph is one small loop body instead of d unrolled pivot steps
    (the unrolled form at d ~ 100 costs minutes of XLA optimization on
    the remote-TPU backend, paid per process launch)."""
    import jax
    from jax import lax

    d = A.shape[-1]
    batch = A.shape[:-2]
    A = A.reshape((-1, d, d))
    B = A.shape[0]
    M = jnp.concatenate([A, jnp.broadcast_to(
        jnp.eye(d, dtype=A.dtype), (B, d, d))], axis=-1)
    rows = jnp.arange(d)

    def step(k, M):
        col = jnp.abs(M[:, :, k])
        col = jnp.where(rows[None, :] >= k, col, -1.0)
        piv = jnp.argmax(col, axis=1)
        pivrow = jnp.take_along_axis(
            M, piv[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        krow = jnp.take_along_axis(
            M, jnp.full((B, 1, 1), 0, jnp.int32) + k, axis=1)[:, 0]
        is_piv = rows[None, :] == piv[:, None]
        is_k = rows[None, :] == k
        M = jnp.where(is_k[..., None], pivrow[:, None, :],
                      jnp.where(is_piv[..., None], krow[:, None, :], M))
        pivval = jnp.take_along_axis(
            M, jnp.full((B, 1, 1), 0, jnp.int32) + k, axis=1)[:, 0, k]
        prow = jnp.take_along_axis(
            M, jnp.full((B, 1, 1), 0, jnp.int32) + k,
            axis=1)[:, 0] / pivval[:, None]
        fac = jnp.where(is_k, 0.0, M[:, :, k])
        M = M - fac[..., None] * prow[:, None, :]
        M = jnp.where(is_k[..., None], prow[:, None, :], M)
        return M

    M = lax.fori_loop(0, d, step, M)
    return M[:, :, d:].reshape(*batch, d, d)
