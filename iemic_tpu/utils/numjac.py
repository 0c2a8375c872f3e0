"""NumericalJacobian — dense FD Jacobian for serial verification.

TPU-native analog of the reference's NumericalJacobian.H:7-60 and the
``testEntries`` comparator (src/tests/TestDefinitions.H:72-100): build
the full Jacobian column-by-column by central finite differences of
the model RHS (or any residual function) and compare against the
analytic Jacobian application.  Only for tiny test grids.

Unlike the reference (one serial FD column at a time), columns are
evaluated as one vmapped batch of perturbed RHS calls — the natural
expression on an accelerator.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class NumericalJacobian:
    """Dense FD Jacobian with CCS accessors (reference
    NumericalJacobian.H's beg/jco/co arrays)."""

    def __init__(self, fn, x, *, eps: float = 1e-6, chunk: int = 256):
        """fn: residual function mapping a flat (N,) array to (N,).
        x: linearization point (flat)."""
        x = jnp.asarray(x)
        N = x.shape[0]

        def col(v):
            return (fn(x + eps * v) - fn(x - eps * v)) / (2.0 * eps)

        bcol = jax.jit(jax.vmap(col))
        cols = []
        eye = np.eye(N)
        for j0 in range(0, N, chunk):
            cols.append(np.asarray(bcol(jnp.asarray(eye[j0:j0 + chunk]))))
        self.mat = np.concatenate(cols, axis=0).T          # (N, N)
        self.shape = self.mat.shape

    # -- CCS view (reference's compressed-column arrays) --------------
    def ccs(self, drop_tol: float = 0.0):
        """Return (beg, jco, co): column pointers, row indices, values."""
        N = self.shape[1]
        beg, jco, co = [0], [], []
        for j in range(N):
            nz = np.nonzero(np.abs(self.mat[:, j]) > drop_tol)[0]
            jco.extend(nz.tolist())
            co.extend(self.mat[nz, j].tolist())
            beg.append(len(jco))
        return np.asarray(beg), np.asarray(jco), np.asarray(co)

    def test_entries(self, apply_matrix, *, tol: float = 1e-4,
                     norm_scale: bool = True) -> float:
        """Compare analytic J e_j against FD columns (the testEntries
        pattern).  Returns the max relative column error; raises
        AssertionError above tol."""
        N = self.shape[1]
        worst = 0.0
        scale = max(np.abs(self.mat).max(), 1e-300) if norm_scale else 1.0
        for j in range(N):
            ej = jnp.zeros(N).at[j].set(1.0)
            aj = np.asarray(apply_matrix(ej)).ravel()
            err = np.abs(aj - self.mat[:, j]).max() / scale
            worst = max(worst, float(err))
        assert worst < tol, f"Jacobian entry mismatch: {worst} >= {tol}"
        return worst
