"""Variable-blocked (rearranged) view of the stencil Jacobian and a
Teko-style block preconditioner built on it.

TPU-native analog of the reference's experimental Teko path:

* ``Rearranger`` (reference src/ocean/Rearranger.H:23-60,
  Rearranger.C) reorders the THCM matrix into the 10 nonzero variable
  blocks of the [A. de Niet et al. 2007] notation — A_uv, E_uv, G_uv,
  G_w, B_ST, D_uv, D_w, B_uv, B_w, A_ST — using a
  Teko::BlockedEpetraOperator.  Here no reordering is needed at all:
  the stencil coefficient tensor An(27, A, B, l, m, n) *is* the blocked
  operator, and a "block" is the sub-tensor An[:, rows][:, :, cols]
  applied matrix-free.  The class exposes the same 10 named blocks and
  verifies that they tile the full operator.

* ``TekoPreconditioner`` (reference src/ocean/TekoPreconditioner.H:
  39-88) wraps a Teko inverse factory into an Ifpack_Preconditioner.
  The TPU redesign: a block Gauss-Seidel sweep over the groups
  X = [u,v,w,p] (momentum + continuity saddle) and Y = [T,S]
  (tracers), with each group's inverse approximated by its exact
  batched vertical-column solve (the natural TPU "inverse factory" —
  one batched MXU solve per group, cf. preconditioner.py).  The
  coupling blocks (B_ST buoyancy, B_uv/B_w advection of tracers) ride
  the Gauss-Seidel structure, which is what distinguishes this from
  the plain 6-variable Columns preconditioner.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stencil import (NP, NUN, UU, VV, WW, PP, TT, SS,
                           pad_state, offsets)

_OFFS = offsets()

# variable groups of the De Niet blocking (Rearranger.H:47-53)
GROUPS = {
    "uv": (UU, VV),
    "w": (WW,),
    "p": (PP,),
    "ST": (TT, SS),
}

# the 10 structurally nonzero blocks: key -> (row group, col group)
# (Rearranger.H keys_ / blockLocations_, rows/cols in uv,w,p,ST order)
BLOCK_KEYS = {
    "A_uv": ("uv", "uv"),   # momentum operator (incl. Coriolis)
    "E_uv": ("uv", "w"),    # vertical advection of momentum
    "G_uv": ("uv", "p"),    # horizontal pressure gradient
    "G_w":  ("w", "p"),     # vertical pressure gradient (hydrostatic)
    "B_ST": ("w", "ST"),    # buoyancy T,S -> w
    "D_uv": ("p", "uv"),    # horizontal divergence
    "D_w":  ("p", "w"),     # vertical divergence
    "B_uv": ("ST", "uv"),   # tracer advection by u,v
    "B_w":  ("ST", "w"),    # tracer advection by w
    "A_ST": ("ST", "ST"),   # tracer operator (incl. mixing)
}

# diagonal "dummy row" fixes (land cells, surface w, pressure Dirichlet
# points) live outside the 10 physics blocks; the reference carries
# them implicitly inside Teko's blocked operator (the
# BlockPreconditioner detects them separately,
# TRIOS_BlockPreconditioner.H:478-487)
DUMMY_KEYS = {
    "D_ww": ("w", "w"),
    "D_pp": ("p", "p"),
}


def apply_stencil_rect(An_sub: jnp.ndarray, x_cols: jnp.ndarray, *,
                       periodic: bool) -> jnp.ndarray:
    """Rectangular-block stencil matvec: An_sub (27, nA, nB, l, m, n)
    applied to x_cols (nB, l, m, n) -> (nA, l, m, n)."""
    nB, l, m, n = x_cols.shape
    xp = pad_state(x_cols, periodic)
    windows = jnp.stack([
        xp[:, 1 + dk:1 + dk + l, 1 + dj:1 + dj + m, 1 + di:1 + di + n]
        for (di, dj, dk) in _OFFS
    ])
    return jnp.einsum('pABkji,pBkji->Akji', An_sub, windows)


class Rearranger:
    """Blocked view of a stencil Jacobian (Rearranger.H:23-60)."""

    def __init__(self, An: jnp.ndarray, *, periodic: bool):
        self.An = An
        self.periodic = periodic

    def sub(self, rows, cols) -> jnp.ndarray:
        """Coefficient sub-tensor for a (rows, cols) variable block."""
        return self.An[:, np.asarray(rows)][:, :, np.asarray(cols)]

    def block(self, key: str):
        """Matvec closure for one named block: x_cols -> y_rows."""
        rg, cg = {**BLOCK_KEYS, **DUMMY_KEYS}[key]
        sub = self.sub(GROUPS[rg], GROUPS[cg])
        periodic = self.periodic
        return lambda xc: apply_stencil_rect(sub, xc, periodic=periodic)

    def nonzero_pattern(self, tol: float = 0.0) -> dict:
        """Max |coefficient| per (row group, col group) — the analog of
        the reference's numNonzBlocks_=10 structure check."""
        out = {}
        for rg, rows in GROUPS.items():
            for cg, cols in GROUPS.items():
                sub = self.sub(rows, cols)
                out[(rg, cg)] = float(jnp.max(jnp.abs(sub)))
        return out

    def apply_blocked(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full matvec reassembled from the 10 named blocks (the
        finalMatrix_ rebuild check, Rearranger.H:57-58).  Structurally
        zero blocks (e.g. w<-uv) are NOT applied; equality with the
        plain stencil matvec verifies the 10-block tiling."""
        y = jnp.zeros_like(x)
        parts = {g: x[np.asarray(v)] for g, v in GROUPS.items()}
        for key, (rg, cg) in {**BLOCK_KEYS, **DUMMY_KEYS}.items():
            yr = self.block(key)(parts[cg])
            y = y.at[np.asarray(GROUPS[rg])].add(yr)
        return y


# ---------------------------------------------------------------------
# Teko-style block preconditioner
# ---------------------------------------------------------------------

def _column_inverse_sub(An: jnp.ndarray, vars_: tuple, *,
                        shift_p: bool, eps: float = 1e-8) -> jnp.ndarray:
    """Batched inverses of the vertical-column blocks restricted to a
    variable subset (the per-group 'inverse factory').  Mirrors
    preconditioner.build_column_blocks incl. the rank-one shift of the
    column-constant pressure mode when the group contains p."""
    vars_ = np.asarray(vars_)
    Asub = An[:, vars_][:, :, vars_]
    _, nv, _, l, m, n = Asub.shape
    d = nv * l
    diag = Asub[4].transpose(2, 3, 4, 0, 1)    # (l, m, n, nv, nv)
    down = Asub[13].transpose(2, 3, 4, 0, 1)
    up = Asub[22].transpose(2, 3, 4, 0, 1)

    B = jnp.zeros((m, n, l, nv, l, nv))
    kk = jnp.arange(l)
    B = B.at[:, :, kk, :, kk, :].set(diag)
    B = B.at[:, :, kk[1:], :, kk[:-1], :].set(down[1:])
    B = B.at[:, :, kk[:-1], :, kk[1:], :].set(up[:-1])
    B = B.reshape(m * n, d, d)
    if shift_p:
        ip = int(np.where(vars_ == PP)[0][0])
        e = jnp.zeros(d).at[ip::nv].set(1.0 / jnp.sqrt(jnp.float64(l)))
        scale = jnp.max(jnp.abs(B), axis=(1, 2), keepdims=True)
        B = B + jnp.maximum(scale, 1.0) * e[:, None] * e[None, :]
    B = B + eps * jnp.eye(d)
    from ..ops.batched_linalg import inv as _binv
    return _binv(B)


def _apply_column_sub(Binv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """r (nv, l, m, n) -> Binv r, per water column."""
    nv, l, m, n = r.shape
    rc = r.transpose(2, 3, 1, 0).reshape(m * n, l * nv)
    zc = jnp.einsum('bij,bj->bi', Binv, rc)
    return zc.reshape(m, n, l, nv).transpose(3, 2, 0, 1)


_XVARS = (UU, VV, WW, PP)
_YVARS = (TT, SS)


def build(An: jnp.ndarray, *, periodic: bool) -> dict:
    """Factor the Teko-style preconditioner for a Jacobian An."""
    return {
        "An": An,
        "Minv_X": _column_inverse_sub(An, _XVARS, shift_p=True),
        "Minv_Y": _column_inverse_sub(An, _YVARS, shift_p=False),
        "C_XY": An[:, np.asarray(_XVARS)][:, :, np.asarray(_YVARS)],
        "C_YX": An[:, np.asarray(_YVARS)][:, :, np.asarray(_XVARS)],
    }


def apply(fac: dict, r: jnp.ndarray, *, periodic: bool,
          sweeps: int = 1) -> jnp.ndarray:
    """One (or more) block Gauss-Seidel sweeps
        z_Y = Minv_Y r_Y
        z_X = Minv_X (r_X - C_XY z_Y)
        [extra sweeps re-relax both groups]
    — the TekoPreconditioner::ApplyInverse equivalent
    (TekoPreconditioner.H:63-88 with an LU-block inverse factory)."""
    xv, yv = np.asarray(_XVARS), np.asarray(_YVARS)
    rX, rY = r[xv], r[yv]
    zY = _apply_column_sub(fac["Minv_Y"], rY)
    zX = _apply_column_sub(
        fac["Minv_X"],
        rX - apply_stencil_rect(fac["C_XY"], zY, periodic=periodic))
    for _ in range(sweeps - 1):
        zY = _apply_column_sub(
            fac["Minv_Y"],
            rY - apply_stencil_rect(fac["C_YX"], zX, periodic=periodic))
        zX = _apply_column_sub(
            fac["Minv_X"],
            rX - apply_stencil_rect(fac["C_XY"], zY, periodic=periodic))
    z = jnp.zeros_like(r)
    z = z.at[xv].set(zX)
    z = z.at[yv].set(zY)
    return z
