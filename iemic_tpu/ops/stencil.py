"""Matrix-free 27-point x 6-variable stencil operator.

The reference represents every linear(ized) operator as a dependency
array ``Al(np, A, B, i, j, k)`` on a 27-point neighborhood
(reference src/ocean/usrc.F90:588-604 and the stencil numbering of
src/ocean/par.F90:22-28) which is then assembled into a CSR matrix
(reference src/ocean/assemble.F90:57-139 fillcolA + shift).

On TPU we keep the coefficient tensor itself as the Jacobian and apply
it matrix-free: no CSR assembly, no indices, just a fused shifted-window
contraction that XLA maps onto the VPU and that the SPMD partitioner can
shard over a 2D ('y','x') device mesh with automatic halo exchange.

Conventions (0-based everywhere):
  * state  x   : (nun, l, m, n)        = x[B, k, j, i]
  * stencil An : (np, nun, nun, l, m, n) = An[p, A, B, k, j, i], meaning
      d/dt A|(i,j,k) = sum_p,B  An[p,A,B,k,j,i] * B|(i+di_p, j+dj_p, k+dk_p)
  * stencil location p = (Fortran loc) - 1, with offsets
      q = p % 9 ; di = q // 3 - 1 ; dj = q % 3 - 1
      dk = 0 for p < 9 ("center"), -1 for 9 <= p < 18 ("below"),
      +1 for p >= 18 ("above")
    matching the reference's ``shift`` (assemble.F90:142-179).

The flat-vector order used for I/O and cross-checks is the reference's
row numbering row = nun*((k*m + j)*n + i) + X (matetc.F90:123-144).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

NP = 27
NUN = 6

# unknown enumeration (reference par.F90:69-75, 0-based here)
UU, VV, WW, PP, TT, SS = 0, 1, 2, 3, 4, 5

# grid point types (reference par.F90:77-81)
OCEAN, LAND, WATER, PERIO = 0, 1, 2, 3


def offsets() -> np.ndarray:
    """(27, 3) array of (di, dj, dk) stencil offsets."""
    offs = np.zeros((NP, 3), dtype=np.int64)
    for p in range(NP):
        q = p % 9
        offs[p] = (q // 3 - 1, q % 3 - 1, (0, -1, 1)[p // 9])
    return offs


_OFFS = offsets()


def pad_state(x: jnp.ndarray, periodic: bool) -> jnp.ndarray:
    """Zero-pad (nun,l,m,n) -> (nun,l+2,m+2,n+2); wrap x-dim if periodic.

    The wrap mirrors the reference's ``shift`` i-index wraparound
    (assemble.F90:171-177); j and k never wrap (walls / surface+bottom).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    if periodic:
        xp = xp.at[:, :, :, 0].set(xp[:, :, :, -2])
        xp = xp.at[:, :, :, -1].set(xp[:, :, :, 1])
    return xp


def apply_stencil(An: jnp.ndarray, x: jnp.ndarray, *,
                  periodic: bool) -> jnp.ndarray:
    """y[A] = sum_{p,B} An[p,A,B] * shift_p(x[B]).

    Matrix-free equivalent of the reference's CSR SpMV
    (matetc.F90:147-166 matAvec) on the assembled stencil tensor.
    """
    nun, l, m, n = x.shape
    xp = pad_state(x, periodic)
    # Gather the 27 shifted windows: (np, nun, l, m, n)
    windows = jnp.stack([
        xp[:, 1 + dk:1 + dk + l, 1 + dj:1 + dj + m, 1 + di:1 + di + n]
        for (di, dj, dk) in _OFFS
    ])
    return jnp.einsum('pABkji,pBkji->Akji', An, windows)


def stencil_to_dense(An: np.ndarray, *, periodic: bool) -> np.ndarray:
    """Assemble the stencil tensor into a dense (ndim, ndim) matrix in the
    reference's flat row ordering.  For small-grid verification tests only
    (the analog of the reference's NumericalJacobian checks)."""
    An = np.asarray(An)
    _, nun, _, l, m, n = An.shape
    ndim = nun * l * m * n
    A = np.zeros((ndim, ndim))

    def row(i, j, k, X):
        return nun * ((k * m + j) * n + i) + X

    for p in range(NP):
        di, dj, dk = _OFFS[p]
        for k in range(l):
            k2 = k + dk
            if not 0 <= k2 < l:
                continue
            for j in range(m):
                j2 = j + dj
                if not 0 <= j2 < m:
                    continue
                for i in range(n):
                    i2 = i + di
                    if periodic:
                        i2 = i2 % n
                    elif not 0 <= i2 < n:
                        continue
                    for a in range(nun):
                        for b in range(nun):
                            c = An[p, a, b, k, j, i]
                            if c != 0.0:
                                A[row(i, j, k, a), row(i2, j2, k2, b)] += c
    return A


def stencil_to_csr(An: np.ndarray, *, periodic: bool
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assemble the stencil tensor into CSR arrays (data, indices,
    indptr) in the reference's flat row ordering — the vectorized
    analog of the reference's fillcolA assembly
    (assemble.F90:57-142), used by the native MILU preconditioner
    and for sparse cross-checks.  Zero entries are kept out.
    """
    An = np.asarray(An)
    _, nun, _, l, m, n = An.shape
    ndim = nun * l * m * n

    kk, jj, ii = np.meshgrid(np.arange(l), np.arange(m), np.arange(n),
                             indexing="ij")
    rows_base = ((kk * m + jj) * n + ii) * nun       # (l, m, n)

    row_list, col_list, val_list = [], [], []
    for p in range(NP):
        di, dj, dk = _OFFS[p]
        k2, j2, i2 = kk + dk, jj + dj, ii + di
        if periodic:
            i2 = i2 % n
            valid = ((0 <= k2) & (k2 < l) & (0 <= j2) & (j2 < m))
        else:
            valid = ((0 <= k2) & (k2 < l) & (0 <= j2) & (j2 < m)
                     & (0 <= i2) & (i2 < n))
        cols_base = ((np.clip(k2, 0, l - 1) * m + np.clip(j2, 0, m - 1))
                     * n + np.clip(i2, 0, n - 1)) * nun
        for a in range(nun):
            for b in range(nun):
                c = An[p, a, b]
                nz = valid & (c != 0.0)
                if not nz.any():
                    continue
                row_list.append(rows_base[nz] + a)
                col_list.append(cols_base[nz] + b)
                val_list.append(c[nz])
    rows = np.concatenate(row_list)
    cols = np.concatenate(col_list)
    vals = np.concatenate(val_list)
    # sort by (row, col) and sum duplicates
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    # duplicates can only come from periodic wrap on tiny grids
    key = rows.astype(np.int64) * ndim + cols
    uniq, inv = np.unique(key, return_inverse=True)
    data = np.zeros(len(uniq))
    np.add.at(data, inv, vals)
    indices = (uniq % ndim).astype(np.int32)
    urows = (uniq // ndim).astype(np.int64)
    indptr = np.zeros(ndim + 1, dtype=np.int64)
    np.add.at(indptr, urows + 1, 1)
    np.cumsum(indptr, out=indptr)
    return data, indices, indptr


def from_flat(x_flat: jnp.ndarray, l: int, m: int, n: int) -> jnp.ndarray:
    """Reference flat vector (row = nun*((k*m+j)*n+i)+X) -> (nun,l,m,n)."""
    return x_flat.reshape(l, m, n, NUN).transpose(3, 0, 1, 2)


def to_flat(x: jnp.ndarray) -> jnp.ndarray:
    """(nun,l,m,n) -> reference flat ordering."""
    return x.transpose(1, 2, 3, 0).reshape(-1)
