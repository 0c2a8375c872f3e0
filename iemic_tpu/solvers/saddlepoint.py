"""Depth-averaged saddle-point operator and SIMPLE-type preconditioners.

TPU-native re-design of the reference's SaddlepointMatrix + SppSimplePrec
(reference src/trios/TRIOS_Saddlepoint.H:28-95 — the Epetra_Operator
[A11 A12; A21 0] over the depth-averaged (u, v, p) system — and its
SIMPLE / SIMPLER / SIMPLE(L) preconditioners "SI" / "SR" / "SL" with
block-diagonal approximate inverses and the Chat pressure-Schur solve
with dummy-row fixes, TRIOS_Saddlepoint.H:259-276; parameter names from
parameterfiles/ocean_preconditioner_params.xml:427-560).

Where the reference assembles sparse CRS blocks and solves Chat with
AztecOO+Ifpack, everything here stays a 2D stencil tensor:

  * the saddle operator is the (9, 3, 3, m, n) depth-averaged stencil
    ``Spp`` produced by :func:`iemic_tpu.solvers.bgs.build`;
  * the approximate momentum inverse is the pointwise 2x2 block inverse
    of the (u, v) diagonal (the reference's "block diagonal"
    approximate-inverse option);
  * the pressure Schur complement Chat = -D diag(A)^{-1} G is composed
    *symbolically* at build time: two 9-point stencils contract to one
    25-point (5x5) stencil, 81 shifted plane products — the TPU analog
    of the reference's sparse matrix-matrix product forming Chat;
  * Chat solves run a short point-Jacobi-preconditioned FGMRES
    (matrix-free, fuses to VPU work) instead of AztecOO/Ifpack, with
    the constant / checkerboard barotropic null modes deflated (the
    dummy-row fixes).

Schemes (reference TRIOS_Saddlepoint.H:28-95):
  'SI' (SIMPLE):  u* = Â⁻¹ r_u;  solve Chat dp = D u* − r_p;
                  u = u* − Â⁻¹ G dp;  p = dp
  'SL' (SIMPLE(L)): as SI but skips the final momentum correction
  'SR' (SIMPLER): a preliminary pressure prediction from the momentum
                  residual precedes the SIMPLE sweep.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stencil import offsets

_OFFS9 = offsets()[:9]                       # (di, dj, 0) center plane

# 5x5 neighborhood offsets for the composed Schur stencil
_OFFS25 = np.array([(di, dj) for dj in range(-2, 3)
                    for di in range(-2, 3)], dtype=np.int64)
_O25_INDEX = {(int(di), int(dj)): q for q, (di, dj) in enumerate(_OFFS25)}


def _shift2d(f: jnp.ndarray, di: int, dj: int, periodic: bool
             ) -> jnp.ndarray:
    """Plane f evaluated at (j+dj, i+di) with zero walls in y and
    optional wraparound in x (reference TRIOS_Domain.H:337-340)."""
    m, n = f.shape[-2:]
    pad = 2
    fp = jnp.pad(f, ((pad, pad), (pad, pad)))
    if periodic:
        fp = fp.at[:, :pad].set(fp[:, n:n + pad])
        fp = fp.at[:, -pad:].set(fp[:, pad:2 * pad])
    return fp[pad + dj:pad + dj + m, pad + di:pad + di + n]


def apply_stencil_2d(S: jnp.ndarray, offs: np.ndarray, x: jnp.ndarray,
                     periodic: bool) -> jnp.ndarray:
    """y(j,i) = sum_q S[q,j,i] * x(j+dj_q, i+di_q) for scalar planes."""
    acc = 0.0
    for q, (di, dj) in enumerate(offs):
        acc = acc + S[q] * _shift2d(x, int(di), int(dj), periodic)
    return acc


class SppSimple(NamedTuple):
    """Factored SIMPLE preconditioner state (a pytree)."""
    Spp: jnp.ndarray        # (9, 3, 3, m, n) the saddle operator
    auv_inv: jnp.ndarray    # (2, 2, m, n) pointwise momentum inverse
    chat: jnp.ndarray       # (25, m, n) composed pressure Schur stencil
    chat_dinv: jnp.ndarray  # (m, n) inverse diagonal of chat
    nullmodes: jnp.ndarray  # (2, m, n) barotropic pressure null modes
    # scalar 2D multigrid on Chat (mg.build2d): the reference solves
    # Chat with AztecOO+Ifpack (TRIOS_Saddlepoint.H:259-276);
    # point-Jacobi stagnates on the global grid's polar-anisotropic
    # elliptic problem, the MG V-cycle does not
    chat_mg: object = None


def build_simple(Spp: jnp.ndarray, sv2d: jnp.ndarray, *,
                 periodic: bool,
                 prolong_w: float = 0.25) -> SppSimple:
    """Factor the SIMPLE pieces from the depth-averaged saddle stencil.

    Spp: (9, 3, 3, m, n) with variable order (u, v, p); sv2d: (2, m, n)
    barotropic null modes (constant + checkerboard over wet columns,
    the reference's dummy-row / singular-vector handling,
    TRIOS_Saddlepoint.H:259-276).
    """
    _, _, _, m, n = Spp.shape

    # pointwise 2x2 momentum diagonal and its inverse (the "block
    # diagonal" approximate inverse option of SppSimplePrec)
    A = Spp[4, :2, :2]                          # (2, 2, m, n)
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    scale = jnp.max(jnp.abs(A), axis=(0, 1))
    ok = jnp.abs(det) > 1e-12 * jnp.maximum(scale, 1e-30) ** 2
    det = jnp.where(ok, det, 1.0)
    auv_inv = jnp.stack([
        jnp.stack([A[1, 1] / det, -A[0, 1] / det]),
        jnp.stack([-A[1, 0] / det, A[0, 0] / det])])
    auv_inv = jnp.where(ok[None, None], auv_inv, 0.0)
    # land columns (all-zero momentum diag) get identity so the sweep
    # passes residuals through untouched
    auv_inv = auv_inv + jnp.where(ok, 0.0, 1.0)[None, None] \
        * jnp.eye(2)[:, :, None, None]

    # ---- Chat = -D Âinv G, composed symbolically --------------------
    # D: p-row, uv-cols (9, 2, m, n); G: uv-rows, p-col (9, 2, m, n)
    D = Spp[:, 2, :2]
    G = Spp[:, :2, 2]
    chat = jnp.zeros((25, m, n), Spp.dtype)
    for a, (dia, dja, _) in enumerate(_OFFS9):
        dia, dja = int(dia), int(dja)
        # Âinv and G sampled at the intermediate (uv) point
        ainv_s = jnp.stack([
            _shift2d(auv_inv[r, c], dia, dja, periodic)
            for r in range(2) for c in range(2)]).reshape(2, 2, m, n)
        for b, (dib, djb, _) in enumerate(_OFFS9):
            dib, djb = int(dib), int(djb)
            G_s = jnp.stack([_shift2d(G[b, r], dia, dja, periodic)
                             for r in range(2)])
            # coefficient for p at offset (dia+dib, dja+djb)
            coef = -jnp.einsum('rji,rcji,cji->ji', D[a], ainv_s, G_s)
            q = _O25_INDEX[(dia + dib, dja + djb)]
            chat = chat.at[q].add(coef)

    dC = chat[_O25_INDEX[(0, 0)]]
    okc = jnp.abs(dC) > 1e-14 * jnp.maximum(jnp.max(jnp.abs(chat),
                                                    axis=0), 1e-30)
    chat_dinv = jnp.where(okc, 1.0 / jnp.where(okc, dC, 1.0), 1.0)

    from . import mg as _mg
    chat_mg = _mg.build2d(chat, periodic=periodic,
                          prolong_w=prolong_w)

    return SppSimple(Spp=Spp, auv_inv=auv_inv, chat=chat,
                     chat_dinv=chat_dinv, nullmodes=sv2d,
                     chat_mg=chat_mg)


def _deflate(x: jnp.ndarray, modes: jnp.ndarray) -> jnp.ndarray:
    for q in range(modes.shape[0]):
        sv = modes[q]
        x = x - jnp.vdot(sv, x) * sv
    return x


def _chat_solve(sp: SppSimple, b: jnp.ndarray, periodic: bool,
                iters: int) -> jnp.ndarray:
    """Inner FGMRES on Chat x = b, point-Jacobi preconditioned, with
    null-mode deflation (the reference solves Chat with AztecOO +
    Ifpack and fixes the dummy/singular rows,
    TRIOS_Saddlepoint.H:259-276).  Chat is nonsymmetric (Coriolis in
    the momentum diagonal), so a short Krylov run replaces Chebyshev."""
    from .fgmres import _fgmres_flat
    shape = b.shape
    b = _deflate(b, sp.nullmodes)

    def mv(v):
        return apply_stencil_2d(sp.chat, _OFFS25, v.reshape(shape),
                                periodic).reshape(-1)

    if sp.chat_mg is not None:
        from . import mg as _mg

        def pc(v):
            z = _mg.apply2d(sp.chat_mg, v.reshape(shape),
                            periodic=periodic)
            return _deflate(z, sp.nullmodes).reshape(-1)
    else:
        def pc(v):
            z = sp.chat_dinv * _deflate(v.reshape(shape), sp.nullmodes)
            return z.reshape(-1)

    res = _fgmres_flat(mv, pc, b.reshape(-1), jnp.zeros_like(b).reshape(-1),
                       jnp.asarray(1e-6, b.dtype), iters)
    return _deflate(res.x.reshape(shape), sp.nullmodes)


def apply_saddle(Spp: jnp.ndarray, x: jnp.ndarray, periodic: bool
                 ) -> jnp.ndarray:
    """The saddle operator action [A G; D 0] x on (3, m, n) vectors —
    the SaddlepointMatrix::Apply analog (TRIOS_Saddlepoint.H:28-95)."""
    from .bgs import _apply_2d
    return _apply_2d(Spp, x, periodic)


@partial(jax.jit, static_argnames=("periodic", "scheme", "chat_iters"))
def apply_simple(sp: SppSimple, r: jnp.ndarray, *, periodic: bool,
                 scheme: str = "SI", chat_iters: int = 12
                 ) -> jnp.ndarray:
    """One SIMPLE / SIMPLE(L) / SIMPLER sweep z ~= Spp^{-1} r.

    r: (3, m, n) = (r_u, r_v, r_p).  Scheme semantics follow
    SppSimplePrec::ApplyInverse (TRIOS_Saddlepoint.H:28-95).
    """
    ruv, rp = r[:2], r[2]

    def ainv(v):
        return jnp.einsum('rcji,cji->rji', sp.auv_inv, v)

    def Dmul(v):
        acc = 0.0
        for a, (di, dj, _) in enumerate(_OFFS9):
            for c in range(2):
                acc = acc + sp.Spp[a, 2, c] * _shift2d(
                    v[c], int(di), int(dj), periodic)
        return acc

    def Gmul(p):
        rows = []
        for c in range(2):
            acc = 0.0
            for a, (di, dj, _) in enumerate(_OFFS9):
                acc = acc + sp.Spp[a, c, 2] * _shift2d(
                    p, int(di), int(dj), periodic)
            rows.append(acc)
        return jnp.stack(rows)

    if scheme == "SR":
        # SIMPLER: pressure prediction from the momentum residual
        p0 = _chat_solve(sp, Dmul(ainv(ruv)) - rp, periodic, chat_iters)
        ruv = ruv - Gmul(p0)
    else:
        p0 = jnp.zeros_like(rp)

    ustar = ainv(ruv)
    dp = _chat_solve(sp, Dmul(ustar) - rp, periodic, chat_iters)
    if scheme == "SL":
        u = ustar
    else:
        u = ustar - ainv(Gmul(dp))
    return jnp.concatenate([u, (p0 + dp)[None]])
