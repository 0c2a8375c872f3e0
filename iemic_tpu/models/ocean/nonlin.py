"""State-dependent (advective / nonlinear-EOS) stencil atoms.

Faithful JAX re-derivation of the reference's nonlinear atom builders
(src/ocean/spf.F90:362-790 ``tnlin``/``wnlin``/``unlin``/``vnlin``) and
the ghost-field extraction ``usol`` (src/ocean/usrc.F90:997-1104).

These depend on the state and are traced/jitted; all loop bounds of the
Fortran (including the deliberately restricted i/j ranges near domain
edges) are reproduced exactly via slice assignments.

Ghost-array layout ([k, j, i], 0-based, Fortran index == array index):
    u, v   : (l+2, m+1, n+1)   Fortran u(0:n, 0:m,   0:l+1)
    w      : (l+1, m+2, n+2)   Fortran w(0:n+1, 0:m+1, 0:l)
    p,t,s  : (l+2, m+2, n+2)   Fortran p(0:n+1, 0:m+1, 0:l+1)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...grid import Grid
from ...ops.stencil import UU, VV, WW, PP, TT, SS, LAND

NP = 27


def usol(x: jnp.ndarray, landm: np.ndarray, periodic: bool,
         grid: Grid) -> tuple:
    """Extract ghosted u,v,w,p,t,s fields from state (usrc.F90:997-1104)."""
    nun, l, m, n = x.shape
    dtype = x.dtype
    U = jnp.zeros((l + 2, m + 1, n + 1), dtype)
    V = jnp.zeros((l + 2, m + 1, n + 1), dtype)
    W = jnp.zeros((l + 1, m + 2, n + 2), dtype)
    P = jnp.zeros((l + 2, m + 2, n + 2), dtype)
    T = jnp.zeros((l + 2, m + 2, n + 2), dtype)
    S = jnp.zeros((l + 2, m + 2, n + 2), dtype)

    U = U.at[1:l + 1, 1:, 1:].set(x[UU])
    V = V.at[1:l + 1, 1:, 1:].set(x[VV])
    W = W.at[1:l + 1, 1:m + 1, 1:n + 1].set(x[WW])
    P = P.at[1:l + 1, 1:m + 1, 1:n + 1].set(x[PP])
    T = T.at[1:l + 1, 1:m + 1, 1:n + 1].set(x[TT])
    S = S.at[1:l + 1, 1:m + 1, 1:n + 1].set(x[SS])

    ksl, jsl, isl = slice(1, l + 1), slice(1, m + 1), slice(1, n + 1)

    # -- x-direction ghosts (k=1..l, j=1..m) --------------------------
    # NOTE: the U/V periodic ghost copy happens at the END of this
    # function, after wall zeroing and land masking.  The reference
    # copies first (usrc.F90:1030-1034) and zeroes the northern wall
    # only for i=1..n (:1058-1060), which leaves the stale state value
    # of u(n,m) in the ghost u(0,m) — a dependency of the RHS that its
    # own Jacobian assembly drops (boundaries() zeroes stencil slots
    # pointing at wall velocity points).  Copying ghosts from the
    # already-zeroed/masked columns keeps RHS and Jacobian exactly
    # consistent (Newton quadratic convergence at wrap corners) and
    # agrees with the reference at every steady state, where the wall
    # rows force those points to zero anyway.
    if periodic:
        W = W.at[ksl, jsl, n + 1].set(W[ksl, jsl, 1])
        W = W.at[ksl, jsl, 0].set(W[ksl, jsl, n])
        P = P.at[ksl, jsl, n + 1].set(P[ksl, jsl, 1])
        P = P.at[ksl, jsl, 0].set(P[ksl, jsl, n])
        T = T.at[ksl, jsl, n + 1].set(T[ksl, jsl, 1])
        T = T.at[ksl, jsl, 0].set(T[ksl, jsl, n])
        S = S.at[ksl, jsl, n + 1].set(S[ksl, jsl, 1])
        S = S.at[ksl, jsl, 0].set(S[ksl, jsl, n])
    else:
        U = U.at[ksl, jsl, 0].set(0.0)
        U = U.at[ksl, jsl, n].set(0.0)   # eastern wall: u = 0
        V = V.at[ksl, jsl, 0].set(0.0)
        V = V.at[ksl, jsl, n].set(0.0)
        P = P.at[ksl, jsl, 0].set(0.0)
        P = P.at[ksl, jsl, n + 1].set(0.0)
        T = T.at[ksl, jsl, 0].set(T[ksl, jsl, 1])
        T = T.at[ksl, jsl, n + 1].set(T[ksl, jsl, n])
        S = S.at[ksl, jsl, 0].set(S[ksl, jsl, 1])
        S = S.at[ksl, jsl, n + 1].set(S[ksl, jsl, n])

    # -- y-direction ghosts (k=1..l, i=1..n) --------------------------
    U = U.at[ksl, 0, isl].set(0.0)
    U = U.at[ksl, m, isl].set(0.0)       # northern wall: u = 0
    V = V.at[ksl, 0, isl].set(0.0)
    V = V.at[ksl, m, isl].set(0.0)
    P = P.at[ksl, 0, isl].set(0.0)
    P = P.at[ksl, m + 1, isl].set(0.0)
    T = T.at[ksl, 0, isl].set(T[ksl, 1, isl])
    T = T.at[ksl, m + 1, isl].set(T[ksl, m, isl])
    S = S.at[ksl, 0, isl].set(S[ksl, 1, isl])
    S = S.at[ksl, m + 1, isl].set(S[ksl, m, isl])

    # -- z-direction ghosts (j=1..m, i=1..n) --------------------------
    U = U.at[0, jsl, isl].set(U[1, jsl, isl])
    U = U.at[l + 1, jsl, isl].set(U[l, jsl, isl])
    V = V.at[0, jsl, isl].set(V[1, jsl, isl])
    V = V.at[l + 1, jsl, isl].set(V[l, jsl, isl])
    W = W.at[l, jsl, isl].set(0.0)       # rigid lid: w(surface) = 0
    W = W.at[0, jsl, isl].set(0.0)
    P = P.at[l + 1, jsl, isl].set(0.0)
    P = P.at[0, jsl, isl].set(0.0)
    T = T.at[l + 1, jsl, isl].set(T[l, jsl, isl])
    T = T.at[0, jsl, isl].set(T[1, jsl, isl])
    S = S.at[l + 1, jsl, isl].set(S[l, jsl, isl])
    S = S.at[0, jsl, isl].set(S[1, jsl, isl])

    # -- land masking of velocity points (usrc.F90:1087-1102) ---------
    Lint = (landm[1:l + 1, 1:m + 1, 1:n + 1] == LAND)
    Lpad = np.zeros((l, m + 2, n + 2), dtype=bool)
    Lpad[:, 1:m + 1, 1:n + 1] = Lint
    # u/v index (b, a) is zeroed if any of the 4 adjacent cells is land
    zero = (Lpad[:, 0:m + 1, 0:n + 1] | Lpad[:, 1:m + 2, 0:n + 1]
            | Lpad[:, 0:m + 1, 1:n + 2] | Lpad[:, 1:m + 2, 1:n + 2])
    keep = jnp.asarray(~zero, dtype)
    U = U.at[1:l + 1].multiply(keep)
    V = V.at[1:l + 1].multiply(keep)

    # -- x-periodic velocity ghosts, from the masked/zeroed columns ---
    if periodic:
        U = U.at[:, :, 0].set(U[:, :, n])
        V = V.at[:, :, 0].set(V[:, :, n])

    return U, V, W, P, T, S


# ---------------------------------------------------------------------
# slicing helpers: interior-aligned windows of ghost arrays
# ---------------------------------------------------------------------

def _win(F: jnp.ndarray, di: int, dj: int, dk: int,
         l: int, m: int, n: int) -> jnp.ndarray:
    """Window F(i+di, j+dj, k+dk) over the interior (1..n, 1..m, 1..l)
    for arrays whose Fortran index equals the array index."""
    return F[1 + dk:1 + dk + l, 1 + dj:1 + dj + m, 1 + di:1 + di + n]


def _zeros_atom(l: int, m: int, n: int, dtype) -> jnp.ndarray:
    return jnp.zeros((NP, l, m, n), dtype)


def tnlin(grid: Grid, typ: int, U, V, W, T, surf) -> jnp.ndarray:
    """Tracer advection atoms (spf.F90:362-484).  ``T`` may be the
    ghosted temperature or salinity field; ``surf`` is the literal
    (1 - landm(i,j,l)) surface factor with shape (m, n)."""
    l, m, n = grid.l, grid.m, grid.n
    dt = T.dtype
    atom = _zeros_atom(l, m, n, dt)
    y = grid.y_ext    # y(0:m+1)
    yv = grid.yv      # yv(0:m)

    def w_(di, dj, dk):
        return _win(W, di, dj, dk, l, m, n)

    def t_(di, dj, dk):
        return _win(T, di, dj, dk, l, m, n)

    if typ == 1:
        atom = atom.at[4].set(1.0)
    elif typ == 2:   # urTx
        c = (1.0 / (4.0 * np.cos(y[1:m + 1]) * grid.dx))[None, :, None] * surf
        t0, tm, tp = t_(0, 0, 0), t_(-1, 0, 0), t_(1, 0, 0)
        atom = atom.at[1].set(-(t0 + tm) * c)
        atom = atom.at[3].set((tp + t0) * c)
        atom = atom.at[0].set(-(t0 + tm) * c)
        atom = atom.at[4].set((tp + t0) * c)
    elif typ == 3:   # Utrx
        c = (1.0 / (4.0 * np.cos(y[1:m + 1]) * grid.dx))[None, :, None] * surf
        # u(i-1,j,k), u(i-1,j-1,k), u(i,j,k), u(i,j-1,k)
        um1 = U[1:l + 1, 1:m + 1, 0:n]
        um1jm = U[1:l + 1, 0:m, 0:n]
        u0 = U[1:l + 1, 1:m + 1, 1:n + 1]
        u0jm = U[1:l + 1, 0:m, 1:n + 1]
        a2 = -(um1 + um1jm) * c
        a8 = (u0 + u0jm) * c
        atom = atom.at[1].set(a2)
        atom = atom.at[7].set(a8)
        atom = atom.at[4].set(a2 + a8)
    elif typ == 4:   # vrTy
        c = (1.0 / (4.0 * np.cos(y[1:m + 1]) * grid.dy))[None, :, None] * surf
        cvm = np.cos(yv[0:m])[None, :, None]
        cvp = np.cos(yv[1:m + 1])[None, :, None]
        t0, tjm, tjp = t_(0, 0, 0), t_(0, -1, 0), t_(0, 1, 0)
        a4 = -c * (t0 + tjm) * cvm
        a5 = c * (tjp + t0) * cvp
        atom = atom.at[3].set(a4)
        atom = atom.at[0].set(a4)
        atom = atom.at[4].set(a5)
        atom = atom.at[1].set(a5)
    elif typ == 5:   # Vtry
        c = (1.0 / (4.0 * np.cos(y[1:m + 1]) * grid.dy))[None, :, None] * surf
        cvm = np.cos(yv[0:m])[None, :, None]
        cvp = np.cos(yv[1:m + 1])[None, :, None]
        # v(i,j-1,k), v(i-1,j-1,k), v(i,j,k), v(i-1,j,k)
        vjm = V[1:l + 1, 0:m, 1:n + 1]
        vjmim = V[1:l + 1, 0:m, 0:n]
        v0 = V[1:l + 1, 1:m + 1, 1:n + 1]
        vim = V[1:l + 1, 1:m + 1, 0:n]
        a4 = -(vjm + vjmim) * c * cvm
        a6 = (v0 + vim) * c * cvp
        atom = atom.at[3].set(a4)
        atom = atom.at[5].set(a6)
        atom = atom.at[4].set(a4 + a6)
    elif typ == 6:   # wrTz
        tdzi = 1.0 / (2.0 * grid.dz)
        dfzT = grid.dfzT[:, None, None]
        t0, tkm, tkp = t_(0, 0, 0), t_(0, 0, -1), t_(0, 0, 1)
        a14 = -tdzi * surf * (t0 + tkm) / dfzT
        a5 = tdzi * surf * (tkp + t0) / dfzT
        atom = atom.at[13].set(a14)
        atom = atom.at[4, :l - 1].set(a5[:l - 1])  # k = l: atom(5) = 0
    elif typ == 7:   # Wtrz
        tdzi = 1.0 / (2.0 * grid.dz)
        dfzT = grid.dfzT[:, None, None]
        a14 = -w_(0, 0, -1) * surf * tdzi / dfzT
        a23 = w_(0, 0, 0) * surf * tdzi / dfzT
        atom = atom.at[13].set(a14)
        atom = atom.at[22].set(a23)
        atom = atom.at[4].set(a14 + a23)
    else:
        raise ValueError(typ)
    return atom


def wnlin(grid: Grid, typ: int, T) -> jnp.ndarray:
    """Nonlinear-EOS buoyancy atoms for the w-equation
    (spf.F90:486-542); cases 1/3 for the Jacobian, 2/4 for the RHS."""
    l, m, n = grid.l, grid.m, grid.n
    atom = _zeros_atom(l, m, n, T.dtype)
    t0 = _win(T, 0, 0, 0, l, m, n)
    tkp = _win(T, 0, 0, 1, l, m, n)
    ksl = slice(0, l - 1)
    if typ == 1:
        val = (t0 + tkp) / 2.0
        atom = atom.at[22, ksl].set(val[ksl])
        atom = atom.at[4, ksl].set(val[ksl])
    elif typ == 2:
        atom = atom.at[22, ksl].set((tkp / 4.0)[ksl])
        atom = atom.at[4, ksl].set(((t0 + 2.0 * tkp) / 4.0)[ksl])
    elif typ == 3:
        val = 0.375 * (t0 + tkp) ** 2
        atom = atom.at[4, ksl].set(val[ksl])
        atom = atom.at[22, ksl].set(val[ksl])
    elif typ == 4:
        a5 = 0.125 * (t0 * t0 + 3.0 * tkp * t0 + 3.0 * tkp * tkp)
        a23 = 0.125 * tkp * tkp
        atom = atom.at[4, ksl].set(a5[ksl])
        atom = atom.at[22, ksl].set(a23[ksl])
    else:
        raise ValueError(typ)
    return atom


def unlin(grid: Grid, typ: int, U, V, W) -> jnp.ndarray:
    """u-momentum advection atoms (spf.F90:544-665)."""
    l, m, n = grid.l, grid.m, grid.n
    atom = _zeros_atom(l, m, n, U.dtype)
    yv = grid.yv

    cyv = (1.0 / (2.0 * np.cos(yv[1:m + 1]) * grid.dx))[None, :, None]
    cyv_dy = (1.0 / (2.0 * np.cos(yv[1:m + 1]) * grid.dy))[None, :, None]
    tanr = np.tan(yv[1:m + 1])[None, :, None]
    tdzi = (1.0 / (8.0 * grid.dfzT * grid.dz))[:, None, None]

    if typ == 1:     # uux
        up1 = U[1:l + 1, 1:m + 1, 2:n + 1]       # u(i+1), i=1..n-1
        um1 = U[1:l + 1, 1:m + 1, 1:n]           # u(i-1), i=2..n
        atom = atom.at[7, :, :, 0:n - 1].set(up1 * cyv)
        atom = atom.at[1, :, :, 1:n].set(-um1 * cyv)
    elif typ == 2:   # Urux
        up1 = U[1:l + 1, 1:m + 1, 2:n + 1]
        um1 = U[1:l + 1, 1:m + 1, 1:n]
        atom = atom.at[7, :, :, 0:n - 1].set(2.0 * up1 * cyv)
        atom = atom.at[1, :, :, 1:n].set(-2.0 * um1 * cyv)
    elif typ == 3:   # uvy1
        cvm = np.cos(yv[0:m])[None, :, None]
        vjm = V[1:l + 1, 0:m, 1:n + 1]           # v(i,j-1), j=2..m rows
        vjp = V[1:l + 1, 2:m + 1, 1:n + 1]       # v(i,j+1), j=1..m-1
        atom = atom.at[3, :, 1:m, :].set(
            (-vjm * cvm * cyv_dy)[:, 1:m, :])
        atom = atom.at[5, :, 0:m - 1, :].set(
            vjp * np.cos(yv[2:m + 1])[None, :, None]
            * cyv_dy[:, 0:m - 1, :])
    elif typ == 4:   # Urvy1
        cvm = np.cos(yv[0:m])[None, :, None]
        ujm = U[1:l + 1, 0:m, 1:n + 1]           # u(i,j-1)
        ujp = U[1:l + 1, 2:m + 1, 1:n + 1]       # u(i,j+1)
        atom = atom.at[3, :, 1:m, :].set(
            (-ujm * cvm * cyv_dy)[:, 1:m, :])
        atom = atom.at[5, :, 0:m - 1, :].set(
            ujp * np.cos(yv[2:m + 1])[None, :, None]
            * cyv_dy[:, 0:m - 1, :])
    elif typ == 5:   # uwz
        w4 = (_win(W, 0, 0, 0, l, m, n) + _win(W, 0, 1, 0, l, m, n)
              + _win(W, 1, 0, 0, l, m, n) + _win(W, 1, 1, 0, l, m, n))
        w4m = (_win(W, 0, 0, -1, l, m, n) + _win(W, 0, 1, -1, l, m, n)
               + _win(W, 1, 0, -1, l, m, n) + _win(W, 1, 1, -1, l, m, n))
        a23 = w4 * tdzi
        a14 = -w4m * tdzi
        atom = atom.at[22].set(a23)
        atom = atom.at[13].set(a14)
        atom = atom.at[4].set(a14 + a23)
    elif typ == 6:   # Urwz
        u0 = U[1:l + 1, 1:m + 1, 1:n + 1]
        ukp = U[2:l + 2, 1:m + 1, 1:n + 1]       # u(k+1) incl. ghost l+1
        ukm = U[0:l, 1:m + 1, 1:n + 1]           # u(k-1) incl. ghost 0
        up = (u0 + ukp) * tdzi
        um = -(u0 + ukm) * tdzi
        for loc in (5, 6, 8, 9):
            atom = atom.at[loc - 1].set(up)
        for loc in (14, 15, 17, 18):
            atom = atom.at[loc - 1].set(um)
    elif typ == 7:   # uvy2
        v0 = V[1:l + 1, 1:m + 1, 1:n + 1]
        atom = atom.at[4].set(v0 * tanr)
    elif typ == 8:   # Urvy2
        u0 = U[1:l + 1, 1:m + 1, 1:n + 1]
        atom = atom.at[4].set(u0 * tanr)
    else:
        raise ValueError(typ)
    return atom


def vnlin(grid: Grid, typ: int, U, V, W) -> jnp.ndarray:
    """v-momentum advection atoms (spf.F90:667-790)."""
    l, m, n = grid.l, grid.m, grid.n
    atom = _zeros_atom(l, m, n, U.dtype)
    yv = grid.yv
    cyv = (1.0 / (2.0 * np.cos(yv[1:m + 1]) * grid.dx))[None, :, None]
    cyv_dy = (1.0 / (2.0 * np.cos(yv[1:m + 1]) * grid.dy))[None, :, None]
    tanr = np.tan(yv[1:m + 1])[None, :, None]
    tdzi = (1.0 / (8.0 * grid.dfzT * grid.dz))[:, None, None]

    if typ == 1:     # uvx
        up1 = U[1:l + 1, 1:m + 1, 2:n + 1]
        um1 = U[1:l + 1, 1:m + 1, 1:n]
        atom = atom.at[7, :, :, 0:n - 1].set(up1 * cyv)
        atom = atom.at[1, :, :, 1:n].set(-um1 * cyv)
    elif typ == 2:   # uVrx
        vp1 = V[1:l + 1, 1:m + 1, 2:n + 1]
        vm1 = V[1:l + 1, 1:m + 1, 1:n]
        atom = atom.at[7, :, :, 0:n - 1].set(vp1 * cyv)
        atom = atom.at[1, :, :, 1:n].set(-vm1 * cyv)
    elif typ == 3:   # vvry
        cvm = np.cos(yv[0:m])[None, :, None]
        vjp = V[1:l + 1, 2:m + 1, 1:n + 1]
        vjm = V[1:l + 1, 0:m, 1:n + 1]
        atom = atom.at[5, :, 0:m - 1, :].set(
            vjp * np.cos(yv[2:m + 1])[None, :, None]
            * cyv_dy[:, 0:m - 1, :])
        atom = atom.at[3, :, 1:m, :].set((-vjm * cvm * cyv_dy)[:, 1:m, :])
    elif typ == 4:   # Vrvy
        cvm = np.cos(yv[0:m])[None, :, None]
        vjp = V[1:l + 1, 2:m + 1, 1:n + 1]
        vjm = V[1:l + 1, 0:m, 1:n + 1]
        atom = atom.at[5, :, 0:m - 1, :].set(
            2.0 * vjp * np.cos(yv[2:m + 1])[None, :, None]
            * cyv_dy[:, 0:m - 1, :])
        atom = atom.at[3, :, 1:m, :].set(
            (-2.0 * vjm * cvm * cyv_dy)[:, 1:m, :])
    elif typ == 5:   # vwz — same window pattern as unlin uwz
        return unlin(grid, 5, U, V, W)
    elif typ == 6:   # Vrwz
        v0 = V[1:l + 1, 1:m + 1, 1:n + 1]
        vkp = V[2:l + 2, 1:m + 1, 1:n + 1]
        vkm = V[0:l, 1:m + 1, 1:n + 1]
        vp = (v0 + vkp) * tdzi
        vm = -(v0 + vkm) * tdzi
        for loc in (5, 6, 8, 9):
            atom = atom.at[loc - 1].set(vp)
        for loc in (14, 15, 17, 18):
            atom = atom.at[loc - 1].set(vm)
    elif typ == 7:   # wvrz (reference uses u here)
        u0 = U[1:l + 1, 1:m + 1, 1:n + 1]
        atom = atom.at[4].set(u0 * tanr)
    elif typ == 8:   # Urt2
        u0 = U[1:l + 1, 1:m + 1, 1:n + 1]
        atom = atom.at[4].set(2.0 * u0 * tanr)
    else:
        raise ValueError(typ)
    return atom
