"""Semicoarsened geometric multigrid for stencil sub-blocks.

TPU-native replacement for the ML smoothed-aggregation multigrid the
reference applies to the Auv and ATS subsystems of its block
preconditioner (reference
parameterfiles/ocean_preconditioner_params.xml:66-120 "Auv Precond"
Method=ML, :578-584 "ATS Precond" Method=ML; constructed in
src/trios/TRIOS_SolverFactory.C:65-250).  Without horizontal coarse
corrections those blocks are diffusion-dominated at global grid sizes
and vertical column-block preconditioning alone leaves the outer
Krylov effort far above the De Niet-Wubs design point.

Design (all jit-compatible, static shapes):

  * hierarchy by 2x2 aggregation in the horizontal (m, n) only —
    z is never coarsened, matching the reference's domain philosophy
    (TRIOS_Domain.H:63-84: z never split) and keeping the vertical
    physics exact on every level;
  * smoother: damped vertical line (column-block) Jacobi — the
    batched (nv*l x nv*l) column inverses are exact vertical solves,
    the classic pairing with horizontal semicoarsening;
  * Galerkin coarse operators via piecewise-constant restriction /
    prolongation: the coarse stencil stays a 27-point tensor, computed
    by a 27x4-term index-mapped accumulation (einsum/reshape only);
  * coarsest level: dense factored solve over all remaining columns
    (a few thousand unknowns), Tikhonov-shifted against exactly
    singular blocks.

Odd horizontal dimensions are zero-padded to even; padded rows are
structurally zero and the smoother gauges them to identity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stencil import offsets

_OFFS = offsets()


def _pad_hv(An, mpad, npad):
    """Zero-pad the stencil tensor in (m, n) by (mpad, npad) at the
    high end."""
    if mpad == 0 and npad == 0:
        return An
    return jnp.pad(An, ((0, 0), (0, 0), (0, 0), (0, 0),
                        (0, mpad), (0, npad)))


def coarsen_stencil(An: jnp.ndarray, *, periodic: bool) -> jnp.ndarray:
    """Galerkin coarse stencil R A P with piecewise-constant R/P over
    2x2 horizontal aggregates.  An: (27, nv, nv, l, m, n) with m, n
    even.  Returns (27, nv, nv, l, m//2, n//2).

    For fine offset (di, dj, dk) from a fine cell with parity (b, a)
    inside its aggregate, the contribution lands on the coarse
    neighbor (DI, DJ, dk) with DJ = (a + dj) >> 1, DI = (b + di) >> 1
    (floor division keeps everything inside the 27-point coarse
    neighborhood).  x-periodic wraparound is inherited from the
    modular indexing of the coarse matvec; at walls contributions
    falling outside are dropped exactly like the fine zero padding.
    """
    _, nva, nvb, l, m, n = An.shape
    assert m % 2 == 0 and n % 2 == 0
    mc, nc = m // 2, n // 2
    # reshape to expose aggregate parities: (27, A, B, l, mc, a, nc, b)
    Ar = An.reshape(27, nva, nvb, l, mc, 2, nc, 2)
    out = jnp.zeros((27, nva, nvb, l, mc, nc), An.dtype)

    def p_index(di, dj, dk):
        # inverse of offsets(): di = q//3 - 1, dj = q%3 - 1
        q = 3 * (di + 1) + (dj + 1)
        return q + 9 * (0 if dk == 0 else (1 if dk == -1 else 2))

    for p in range(27):
        di, dj, dk = (int(v) for v in _OFFS[p])
        for a in range(2):          # j parity
            DJ = (a + dj) >> 1
            for b in range(2):      # i parity
                DI = (b + di) >> 1
                pc = p_index(DI, DJ, dk)
                out = out.at[pc].add(Ar[p, :, :, :, :, a, :, b])
    return out


def _column_inv(An, *, eps=1e-12):
    """Batched inverses of the vertical column blocks of a stencil
    tensor (the line smoother).  Returns (binv (m*n, d, d),
    dummy (m*n, d))."""
    _, nv, _, l, m, n = An.shape
    d = nv * l
    diag = An[4].transpose(2, 3, 4, 0, 1)
    down = An[13].transpose(2, 3, 4, 0, 1)
    up = An[22].transpose(2, 3, 4, 0, 1)
    B = jnp.zeros((m, n, l, nv, l, nv), An.dtype)
    kk = jnp.arange(l)
    B = B.at[:, :, kk, :, kk, :].set(diag)
    B = B.at[:, :, kk[1:], :, kk[:-1], :].set(down[1:])
    B = B.at[:, :, kk[:-1], :, kk[1:], :].set(up[:-1])
    B = B.reshape(m * n, d, d)
    rowmax = jnp.max(jnp.abs(B), axis=2)
    dummy = rowmax < eps
    B = B + jnp.einsum('bi,ij->bij', dummy.astype(B.dtype),
                       jnp.eye(d, dtype=B.dtype))
    from ..ops.batched_linalg import inv as _binv
    return _binv(B), dummy


def _xline_inv(An, *, periodic, eps=1e-12):
    """Batched inverses of the per-variable x-line (cyclic)
    tridiagonal blocks: stencil locations p=1/4/7 are (i-1, i, i+1)
    at dj=dk=0.  Uses the FULL diagonal (line Jacobi).  Returns
    (xinv (nv*l*m, n, n), dummy (nv*l*m, n))."""
    _, nv, _, l, m, n = An.shape
    idx = jnp.arange(nv)
    lo = An[1][idx, idx]                 # (nv, l, m, n)
    dg = An[4][idx, idx]
    hi = An[7][idx, idx]
    B = jnp.zeros((nv, l, m, n, n), An.dtype)
    ii = jnp.arange(n)
    B = B.at[..., ii, ii].set(dg)
    B = B.at[..., ii[1:], ii[:-1]].set(lo[..., 1:])
    B = B.at[..., ii[:-1], ii[1:]].set(hi[..., :-1])
    if periodic:
        B = B.at[..., 0, n - 1].set(lo[..., 0])
        B = B.at[..., n - 1, 0].set(hi[..., n - 1])
    B = B.reshape(nv * l * m, n, n)
    rowmax = jnp.max(jnp.abs(B), axis=2)
    dummy = rowmax < eps
    B = B + jnp.einsum('bi,ij->bij', dummy.astype(B.dtype),
                       jnp.eye(n, dtype=B.dtype))
    from ..ops.batched_linalg import inv as _binv
    return _binv(B), dummy


def _stencil_to_dense_jnp(An, periodic):
    """Assemble a small stencil tensor into a dense matrix, fully
    traceable (used for the coarsest-level factor only)."""
    _, nv, _, l, m, n = An.shape
    N = nv * l * m * n

    # unit basis matvec, batched: build columns by applying the
    # operator to the identity — N is a few thousand at the coarsest
    # level, and this costs one batched matvec of width N, paid once
    # per preconditioner build.
    from ..ops.stencil import apply_stencil
    eye = jnp.eye(N, dtype=An.dtype).reshape(N, nv, l, m, n)
    cols = jax.vmap(lambda v: apply_stencil(An, v, periodic=periodic)
                    .reshape(-1))(eye)
    return cols.T        # (N, N): A @ e_j in column j


class MGLevel(NamedTuple):
    An: jnp.ndarray
    binv: jnp.ndarray
    dummy: jnp.ndarray
    # x-line (periodic-tridiagonal) inverses for the alternating-line
    # smoother: near the poles the spherical metric makes zonal
    # coupling ~1/cos^2(phi) stronger than everything else (163x at
    # 85.5 deg on the global mask), a long-range 1D ring coupling that
    # neither vertical-line smoothing nor isotropic coarsening can
    # damp — the classic cure is alternating-direction line relaxation
    xinv: jnp.ndarray | None = None      # (nv*l*m, n, n)
    xdummy: jnp.ndarray | None = None    # (nv*l*m, n)


class MGPrec(NamedTuple):
    levels: tuple           # tuple of MGLevel, fine -> coarse
    coarse_inv: jnp.ndarray  # dense inverse at the coarsest level
    damping: jnp.ndarray    # smoother damping factor (scalar)
    # prolongation neighbor weight: 0.0 = piecewise-constant
    # injection, 0.25 = cell-centered bilinear interpolation (the
    # correction transfer only — the Galerkin coarse operators stay
    # PWC so the 27-point tensor structure is preserved).  Python
    # float default (not jnp.asarray: a device array here would
    # trigger backend init at import time)
    pw: jnp.ndarray | float = 0.0


def _prolong2(zc, m, n, w, periodic):
    """Interpolate a coarse correction (..., mc, nc) to (..., m, n).

    Cell-centered factor-2 prolongation with neighbor weight ``w``:
    fine cell 2I+b reads (1-w) * zc[I] + w * zc[I -/+ 1] (parity
    b=0/1).  w=0 is exact PWC injection (the historical behavior);
    w=1/4 is bilinear interpolation between cell centers — the
    piecewise-constant correction kinks were the weakest link of the
    PWC-Galerkin cycle (docs/EFFORT.md round-4 levers).  Meridional
    edges clamp (Neumann), zonal edges wrap when periodic."""
    mc, nc = zc.shape[-2], zc.shape[-1]
    # meridional (m) axis: clamp at the walls
    zmm = jnp.concatenate([zc[..., :1, :], zc[..., :-1, :]], axis=-2)
    zmp = jnp.concatenate([zc[..., 1:, :], zc[..., -1:, :]], axis=-2)
    f0 = (1.0 - w) * zc + w * zmm
    f1 = (1.0 - w) * zc + w * zmp
    z = jnp.stack([f0, f1], axis=-2)           # (..., mc, 2, nc)
    z = z.reshape(z.shape[:-3] + (2 * mc, nc))
    # zonal (n) axis: wrap when periodic, clamp otherwise
    if periodic:
        znm = jnp.roll(z, 1, axis=-1)
        znp_ = jnp.roll(z, -1, axis=-1)
    else:
        znm = jnp.concatenate([z[..., :1], z[..., :-1]], axis=-1)
        znp_ = jnp.concatenate([z[..., 1:], z[..., -1:]], axis=-1)
    g0 = (1.0 - w) * z + w * znm
    g1 = (1.0 - w) * z + w * znp_
    z = jnp.stack([g0, g1], axis=-1)           # (..., 2mc, nc, 2)
    z = z.reshape(z.shape[:-3] + (2 * mc, 2 * nc))
    return z[..., :m, :n]


def build(An: jnp.ndarray, *, periodic: bool, min_cols: int = 64,
          max_levels: int = 10, damping: float = 0.9,
          xline: bool = True, prolong_w: float = 0.25) -> MGPrec:
    """Build the multigrid hierarchy for one stencil sub-block.

    With ``prolong_w > 0`` (bilinear-ish interpolation) the cycle is
    NONSYMMETRIC: restriction stays sum-aggregation, so it is not the
    transpose of the prolongation.  That is fine as a preconditioner
    for FGMRES/IDR (all users in this package) but unsafe for a
    symmetric Krylov method (CG/MINRES) — set ``prolong_w=0`` (PWC,
    the transpose pair) if ever used there.  The knob is plumbed
    per-block through :func:`bgs.build` / :func:`saddlepoint
    .build_simple` so it can be tuned per sub-block.
    """
    levels = []
    cur = An
    nlev = 0
    while True:
        binv, dummy = _column_inv(cur)
        if xline:
            xinv, xdummy = _xline_inv(cur, periodic=periodic)
        else:
            xinv = xdummy = None
        levels.append(MGLevel(An=cur, binv=binv, dummy=dummy,
                              xinv=xinv, xdummy=xdummy))
        _, nv, _, l, m, n = cur.shape
        nlev += 1
        if m * n <= min_cols or nlev >= max_levels or m < 4 or n < 4:
            break
        # padding is re-derived from the (static) level shapes in the
        # V-cycle: always pad odd dims to even before aggregating
        cur = coarsen_stencil(_pad_hv(cur, m % 2, n % 2),
                              periodic=periodic)

    # dense factor of the coarsest level
    _, nv, _, l, m, n = cur.shape
    A = _stencil_to_dense_jnp(cur, periodic)
    N = A.shape[0]
    scale = jnp.max(jnp.abs(A))
    # gauge empty rows; shift against exact singularity (barotropic
    # pressure-like modes of the aggregated operator)
    rowmax = jnp.max(jnp.abs(A), axis=1)
    empty = (rowmax < 1e-12 * jnp.maximum(scale, 1e-30)).astype(A.dtype)
    A = A + jnp.diag(empty) + 1e-12 * scale * jnp.eye(N, dtype=A.dtype)
    # TPU f64 has no LU custom call (see ops/batched_linalg) —
    # loop-based Gauss-Jordan (inv_large) keeps the HLO small
    from ..ops.batched_linalg import inv_large
    coarse_inv = inv_large(A)
    return MGPrec(levels=tuple(levels), coarse_inv=coarse_inv,
                  damping=jnp.asarray(damping, An.dtype),
                  pw=jnp.asarray(prolong_w, An.dtype))


def _smooth(lev: MGLevel, z, r, *, periodic, damping, nsweep=1):
    """Damped alternating-line Jacobi sweeps: a vertical (column)
    solve followed by a zonal (x-line) solve when built."""
    from ..ops.stencil import apply_stencil
    nv, l, m, n = r.shape
    for _ in range(nsweep):
        res = r - apply_stencil(lev.An, z, periodic=periodic)
        rc = res.transpose(2, 3, 1, 0).reshape(m * n, l * nv)
        rc = jnp.where(lev.dummy, 0.0, rc)
        dz = jnp.einsum('bij,bj->bi', lev.binv, rc)
        z = z + damping * dz.reshape(m, n, l, nv).transpose(3, 2, 0, 1)
        if lev.xinv is not None:
            res = r - apply_stencil(lev.An, z, periodic=periodic)
            rx = res.reshape(nv * l * m, n)
            rx = jnp.where(lev.xdummy, 0.0, rx)
            dzx = jnp.einsum('bij,bj->bi', lev.xinv, rx)
            z = z + damping * dzx.reshape(nv, l, m, n)
    return z


def _vcycle(prec: MGPrec, k: int, r, *, periodic):
    from ..ops.stencil import apply_stencil
    lev = prec.levels[k]
    nv, l, m, n = r.shape
    if len(prec.levels) == 1:
        # degenerate hierarchy (tiny grids): the dense factor IS the
        # finest level — apply it exactly (natural (nv,l,m,n) order,
        # matching _stencil_to_dense_jnp's basis ordering)
        return (prec.coarse_inv @ r.reshape(-1)).reshape(r.shape)
    z = jnp.zeros_like(r)
    z = _smooth(lev, z, r, periodic=periodic, damping=prec.damping)
    if k == len(prec.levels) - 1:
        return z

    res = r - apply_stencil(lev.An, z, periodic=periodic)
    mpad, npad = m % 2, n % 2
    if mpad or npad:
        res = jnp.pad(res, ((0, 0), (0, 0), (0, mpad), (0, npad)))
    mc, nc = (m + mpad) // 2, (n + npad) // 2
    rc = res.reshape(nv, l, mc, 2, nc, 2).sum(axis=(3, 5))

    if k + 1 == len(prec.levels) - 1:
        # natural (nv, l, mc, nc) ordering — must match the basis
        # ordering of _stencil_to_dense_jnp
        zc = (prec.coarse_inv @ rc.reshape(-1)).reshape(rc.shape)
        # one smoothing pass on the dense solution to wash out the
        # gauge of the shift
        zc = _smooth(prec.levels[k + 1], zc, rc, periodic=periodic,
                     damping=prec.damping)
    else:
        zc = _vcycle(prec, k + 1, rc, periodic=periodic)

    zf = _prolong2(zc, m, n, prec.pw, periodic)
    z = z + zf
    z = _smooth(lev, z, r, periodic=periodic, damping=prec.damping)
    return z


@partial(jax.jit, static_argnames=("periodic", "cycles"))
def apply(prec: MGPrec, r: jnp.ndarray, *, periodic: bool,
          cycles: int = 1) -> jnp.ndarray:
    """z ~= A^{-1} r by V-cycles.  r: (nv, l, m, n)."""
    from ..ops.stencil import apply_stencil
    z = _vcycle(prec, 0, r, periodic=periodic)
    for _ in range(cycles - 1):
        res = r - apply_stencil(prec.levels[0].An, z, periodic=periodic)
        z = z + _vcycle(prec, 0, res, periodic=periodic)
    return z


# ---------------------------------------------------------------------
# Scalar 2D multigrid over a 25-point (5x5) stencil — used for the
# Chat pressure Schur complement of the SIMPLE saddle preconditioner
# (saddlepoint.py): the reference solves Chat with AztecOO + Ifpack
# ILU (TRIOS_Saddlepoint.H:259-276); on the global grid point-Jacobi
# stagnates on the polar-anisotropic elliptic problem, MG does not.
# ---------------------------------------------------------------------

_OFFS25 = np.array([(di, dj) for dj in range(-2, 3)
                    for di in range(-2, 3)], dtype=np.int64)
_O25_INDEX = {(int(di), int(dj)): q
              for q, (di, dj) in enumerate(_OFFS25)}


def _shift2d(f, di: int, dj: int, periodic: bool):
    """f shifted so index (j, i) reads f[j+dj, i+di] (same convention
    as saddlepoint._shift2d)."""
    m, n = f.shape
    fp = jnp.pad(f, ((2, 2), (2, 2)))
    if periodic:
        fp = fp.at[:, :2].set(fp[:, -4:-2])
        fp = fp.at[:, -2:].set(fp[:, 2:4])
    return fp[2 + dj:2 + dj + m, 2 + di:2 + di + n]


def apply25(C, x, periodic: bool):
    acc = 0.0
    for q, (di, dj) in enumerate(_OFFS25):
        acc = acc + C[q] * _shift2d(x, int(di), int(dj), periodic)
    return acc


def coarsen25(C, *, periodic: bool):
    """Galerkin PWC coarsening of a (25, m, n) scalar stencil (m, n
    even).  Fine offset (di, dj) from parity (b, a) lands on coarse
    ((b+di)>>1, (a+dj)>>1), always within the 5x5 neighborhood."""
    _, m, n = C.shape
    mc, nc = m // 2, n // 2
    Cr = C.reshape(25, mc, 2, nc, 2)
    out = jnp.zeros((25, mc, nc), C.dtype)
    for q, (di, dj) in enumerate(_OFFS25):
        di, dj = int(di), int(dj)
        for a in range(2):
            DJ = (a + dj) >> 1
            for b in range(2):
                DI = (b + di) >> 1
                qc = _O25_INDEX[(DI, DJ)]
                out = out.at[qc].add(Cr[q, :, a, :, b])
    return out


def _xline25(C, *, periodic: bool, eps=1e-12):
    """Batched inverses of the pentadiagonal (periodic) x-line blocks
    (offsets with dj == 0), per row j."""
    _, m, n = C.shape
    B = jnp.zeros((m, n, n), C.dtype)
    ii = np.arange(n)                      # concrete (host) indices
    for di in range(-2, 3):
        band = C[_O25_INDEX[(di, 0)]]          # (m, n)
        col = (ii + di) % n if periodic else ii + di
        ok = ((col >= 0) & (col < n)) if not periodic \
            else np.ones_like(col, bool)
        B = B.at[:, ii[ok], col[ok]].add(band[:, ii[ok]])
    rowmax = jnp.max(jnp.abs(B), axis=2)
    dummy = rowmax < eps
    B = B + jnp.einsum('bi,ij->bij', dummy.astype(B.dtype),
                       jnp.eye(n, dtype=B.dtype))
    from ..ops.batched_linalg import inv as _binv
    return _binv(B), dummy


class MG2DLevel(NamedTuple):
    C: jnp.ndarray
    dinv: jnp.ndarray       # pointwise inverse diagonal
    dmask: jnp.ndarray      # 1.0 on live rows
    xinv: jnp.ndarray
    xdummy: jnp.ndarray


class MG2DPrec(NamedTuple):
    levels: tuple
    coarse_inv: jnp.ndarray
    damping: jnp.ndarray
    pw: jnp.ndarray | float = 0.0   # see MGPrec.pw


def build2d(C: jnp.ndarray, *, periodic: bool, min_cols: int = 64,
            max_levels: int = 10, damping: float = 0.8,
            prolong_w: float = 0.25) -> MG2DPrec:
    levels = []
    cur = C
    nlev = 0
    while True:
        _, m, n = cur.shape
        d = cur[_O25_INDEX[(0, 0)]]
        scale = jnp.maximum(jnp.max(jnp.abs(cur), axis=0), 1e-30)
        live = jnp.abs(d) > 1e-12 * scale
        dinv = jnp.where(live, 1.0 / jnp.where(live, d, 1.0), 0.0)
        xinv, xdummy = _xline25(cur, periodic=periodic)
        levels.append(MG2DLevel(C=cur, dinv=dinv,
                                dmask=live.astype(C.dtype),
                                xinv=xinv, xdummy=xdummy))
        nlev += 1
        if m * n <= min_cols or nlev >= max_levels or m < 4 or n < 4:
            break
        mpad, npad = m % 2, n % 2
        if mpad or npad:
            cur = jnp.pad(cur, ((0, 0), (0, mpad), (0, npad)))
        cur = coarsen25(cur, periodic=periodic)

    _, m, n = cur.shape
    N = m * n
    eye = jnp.eye(N, dtype=C.dtype).reshape(N, m, n)
    cols = jax.vmap(lambda v: apply25(cur, v, periodic).reshape(-1))(eye)
    A = cols.T
    scale = jnp.max(jnp.abs(A))
    rowmax = jnp.max(jnp.abs(A), axis=1)
    empty = (rowmax < 1e-12 * jnp.maximum(scale, 1e-30)).astype(A.dtype)
    A = A + jnp.diag(empty) + 1e-12 * scale * jnp.eye(N, dtype=A.dtype)
    from ..ops.batched_linalg import inv_large
    return MG2DPrec(levels=tuple(levels), coarse_inv=inv_large(A),
                    damping=jnp.asarray(damping, C.dtype),
                    pw=jnp.asarray(prolong_w, C.dtype))


def _smooth2d(lev: MG2DLevel, z, r, *, periodic, damping):
    res = r - apply25(lev.C, z, periodic)
    z = z + damping * lev.dmask * lev.dinv * res
    res = r - apply25(lev.C, z, periodic)
    rx = jnp.where(lev.xdummy, 0.0, res)
    z = z + damping * jnp.einsum('bij,bj->bi', lev.xinv, rx)
    return z


def _vcycle2d(prec: MG2DPrec, k: int, r, *, periodic):
    lev = prec.levels[k]
    m, n = r.shape
    z = jnp.zeros_like(r)
    z = _smooth2d(lev, z, r, periodic=periodic, damping=prec.damping)
    if k == len(prec.levels) - 1:
        return z
    res = r - apply25(lev.C, z, periodic)
    mpad, npad = m % 2, n % 2
    if mpad or npad:
        res = jnp.pad(res, ((0, mpad), (0, npad)))
    mc, nc = (m + mpad) // 2, (n + npad) // 2
    rc = res.reshape(mc, 2, nc, 2).sum(axis=(1, 3))
    if k + 1 == len(prec.levels) - 1:
        zc = (prec.coarse_inv @ rc.reshape(-1)).reshape(mc, nc)
        zc = _smooth2d(prec.levels[k + 1], zc, rc, periodic=periodic,
                       damping=prec.damping)
    else:
        zc = _vcycle2d(prec, k + 1, rc, periodic=periodic)
    zf = _prolong2(zc, m, n, prec.pw, periodic)
    z = z + zf
    return _smooth2d(lev, z, r, periodic=periodic, damping=prec.damping)


@partial(jax.jit, static_argnames=("periodic",))
def apply2d(prec: MG2DPrec, r: jnp.ndarray, *, periodic: bool
            ) -> jnp.ndarray:
    """z ~= C^{-1} r by one V-cycle.  r: (m, n)."""
    return _vcycle2d(prec, 0, r, periodic=periodic)
