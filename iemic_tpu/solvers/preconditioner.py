"""Preconditioners for the stencil Jacobian.

TPU-native preconditioning stage 1: the *vertical column-block* solver.
Each water column (i, j) couples its 6*l unknowns through the stencil's
center-column locations (5, 14, 23 — the z-line of the 27-point
stencil); those dense (6l x 6l) blocks are inverted in a single batched
operation (maps straight onto the MXU) and applied as a block-Jacobi
preconditioner.  This captures the stiff vertical physics —
hydrostatic balance, continuity, vertical diffusion, convective
adjustment — which is the same principle as the reference's tailored
preconditioner (De Niet & Wubs JCP 2006,
reference src/trios/TRIOS_BlockPreconditioner.H:36-100): the reference
eliminates w and p by vertical sweeps and treats the rest; here the
entire vertical coupling is solved exactly per column.

The pressure null modes (constant and checkerboard, reference
THCM::getNullSpace, THCM.C:2846-2888) are handled by deflation: the
preconditioner output is projected onto their orthogonal complement.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stencil import PP, OCEAN


def build_column_blocks(An: jnp.ndarray, *, eps: float = 1e-8
                        ) -> jnp.ndarray:
    """Batched inverses of the vertical column blocks.

    An: (27, 6, 6, l, m, n) -> (m*n, 6l, 6l) inverse blocks.

    Every water column's block is exactly singular: pressure enters the
    column only through p_z (hydrostatic) so the column-constant
    pressure mode is in its null space — the per-column shadow of the
    global constant/checkerboard modes (reference THCM::getNullSpace,
    THCM.C:2846-2888).  A tiny eps*I regularization would put ~1/eps
    entries into the inverse, which is fatal for the f32 copy used in
    the mixed-precision Krylov loop; instead the constant-p mode gets a
    rank-one shift of the block's own scale, keeping the factors
    O(1/physics) and the preconditioner exact on the complement.
    """
    _, nun, _, l, m, n = An.shape
    d = nun * l
    # center column locations: 5 (diag), 14 (k-1), 23 (k+1)
    diag = An[4].transpose(2, 3, 4, 0, 1)    # (l, m, n, 6, 6)
    down = An[13].transpose(2, 3, 4, 0, 1)
    up = An[22].transpose(2, 3, 4, 0, 1)

    B = jnp.zeros((m, n, l, nun, l, nun))
    kk = jnp.arange(l)
    # advanced-index dims (k, k) move to the front: result (l, m, n,
    # nun, nun), matching the (l, m, n, 6, 6) layout of the atoms
    B = B.at[:, :, kk, :, kk, :].set(diag)
    B = B.at[:, :, kk[1:], :, kk[:-1], :].set(down[1:])
    B = B.at[:, :, kk[:-1], :, kk[1:], :].set(up[:-1])
    B = B.reshape(m * n, d, d)
    # rank-one shift of the column-constant pressure null mode
    e = jnp.zeros(d).at[PP::nun].set(1.0 / jnp.sqrt(jnp.float64(l)))
    scale = jnp.max(jnp.abs(B), axis=(1, 2), keepdims=True)
    B = B + jnp.maximum(scale, 1.0) * e[:, None] * e[None, :]
    B = B + eps * jnp.eye(d)
    from ..ops.batched_linalg import inv as _binv
    return _binv(B)


def apply_column_prec(Binv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Apply the column-block preconditioner: r (6, l, m, n) -> z."""
    nun, l, m, n = r.shape
    # to (m*n, l*nun) in (k, var) ordering
    rc = r.transpose(2, 3, 1, 0).reshape(m * n, l * nun)
    zc = jnp.einsum('bij,bj->bi', Binv, rc)
    return zc.reshape(m, n, l, nun).transpose(3, 2, 0, 1)


def pressure_null_vectors(landm: np.ndarray, l: int, m: int, n: int,
                          *, periodic: bool = False
                          ) -> list[np.ndarray]:
    """Candidate pressure null modes, in field layout (6, l, m, n),
    normalized.  Validity against the actual operator is checked by
    the caller.

    The reference's getNullSpace (THCM.C:2846-2888) builds the global
    constant + checkerboard pair; on realistic masks the wet domain
    can split into several CONNECTED COMPONENTS (isolated seas in the
    global bathymetry), each carrying its own constant/checkerboard
    pressure mode — leaving those undeflated stagnates every Krylov
    solve near 1e-1 regardless of preconditioner.  Components are
    found host-side with a 6-connected 3D label (+ periodic x seam
    merge) and each contributes both candidates."""
    ocean = (landm[1:l + 1, 1:m + 1, 1:n + 1] == OCEAN)
    from scipy import ndimage
    lab, nlab = ndimage.label(ocean)
    if periodic and n > 1 and nlab > 1:
        # union components joined across the x wraparound seam
        parent = list(range(nlab + 1))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        seam = ocean[:, :, 0] & ocean[:, :, -1]
        for a, b in zip(lab[:, :, 0][seam], lab[:, :, -1][seam]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
        lab = np.vectorize(lambda v: find(int(v)) if v else 0)(lab)

    ij = (np.arange(m)[:, None] + np.arange(n)[None, :]) % 2
    cbpat = np.where(ij == 0, 1.0, -1.0)
    out = []
    for c in np.unique(lab):
        if c == 0:
            continue
        comp = lab == c
        const = np.zeros((6, l, m, n))
        const[PP] = np.where(comp, 1.0, 0.0)
        out.append(const / max(np.linalg.norm(const), 1e-300))
        cb = np.zeros((6, l, m, n))
        cb[PP] = np.where(comp, cbpat, 0.0)
        out.append(cb / max(np.linalg.norm(cb), 1e-300))
    return out


def make_deflator(null_vecs: jnp.ndarray):
    """Return a projector onto the orthogonal complement of the
    (orthonormalized) null vectors; null_vecs: (k, ...) stacked."""
    k = null_vecs.shape[0]
    flat = null_vecs.reshape(k, -1)
    q, _ = jnp.linalg.qr(flat.T)   # (N, k)

    def project(v):
        vf = v.reshape(-1)
        vf = vf - q @ (q.T @ vf)
        return vf.reshape(v.shape)

    return project
