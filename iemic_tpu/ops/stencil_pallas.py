"""Pallas TPU kernel for the 27-point x 6-variable stencil matvec.

The hot op of every Newton-Krylov iteration is y = An*x with
An (27, 6, 6, l, m, n): 972 coefficient planes of (m, n) streamed from
HBM — strictly memory-bound.  Design (measured on the bench chip,
whose sustained HBM bandwidth calibrates to ~270 GB/s r+w via a pure
scale-copy, far below the v5e paper number):

  * An is pre-permuted once per Jacobian into dk-major offset order
    (``prepare``), so the grid (l, dk, q) addresses it with purely
    affine index maps (Mosaic stalls on div/mod index maps).
  * x is NOT expanded into 27 windows (the round-1 kernel did, adding
    ~190 MB of traffic per matvec); instead 9 horizontally-shifted
    copies of the padded field (~38 MB) are built by XLA and the
    vertical shift rides the block index ``k + dk``, so the kernel
    body is a pure 6x6 VPU multiply-accumulate with no in-kernel
    shifting at all.
  * Coefficients may be stored bf16 (f32 accumulation) to halve the
    dominant An traffic — used for preconditioner-internal matvecs
    where 3 significant digits suffice.

Measured inside a jitted loop (the FGMRES use case) this kernel is
~5x faster than the round-1 windows kernel and runs at ~70% of the
chip's measured copy roofline in f32.

Mosaic has no f64, so this is the *mixed-precision* hot path: outer
Newton-Krylov stays f64 (XLA), while the Krylov-loop operator and
preconditioner applications ride this kernel (fgmres._fgmres_ir_flat).
(The reference is f64-only; mixed precision is part of the TPU-native
redesign, SURVEY §7 hard part 4.)

Reference semantics being reproduced: CSR SpMV on the assembled
stencil (matetc.F90:147-166 matAvec; assembly from the dependency
array usrc.F90:588-604).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import offsets, pad_state, NP

NUN = 6
_OFFS = offsets()

# dk-major permutation: slot (dk+1)*9 + q holds the offset with
# vertical shift dk and horizontal shift q = 3*(di+1) + (dj+1)
_PERM = np.zeros(NP, np.int64)
for _p in range(NP):
    _di, _dj, _dk = _OFFS[_p]
    _PERM[(_dk + 1) * 9 + 3 * (_di + 1) + (_dj + 1)] = _p


def prepare(An: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Permute An into the kernel's dk-major offset order and cast to
    the kernel coefficient dtype (f32 or bf16).  One full pass over An;
    do this once per Jacobian, not per matvec."""
    return An[_PERM].astype(dtype)


def _kernel(an_ref, xs_ref, y_ref):
    """Grid (l, 3, 9).  Blocks:
      an_ref : (1, NUN, NUN, 1, m, n) — prepared An[9*dk+q, :, :, k]
      xs_ref : (1, NUN, 1, m, n)      — shift q of x at plane k+dk
      y_ref  : (NUN, 1, m, n)         — accumulated output plane k
    """
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    an = an_ref[0, :, :, 0]                  # (NUN, NUN, m, n)
    xw = xs_ref[0, :, 0]                     # (NUN, m, n)
    acc = an[:, 0].astype(jnp.float32) * xw[0][None]
    for B in range(1, NUN):
        acc += an[:, B].astype(jnp.float32) * xw[B][None]
    y_ref[:] += acc[:, None]


@functools.partial(jax.jit, static_argnames=("periodic", "interpret"))
def apply_stencil_prepared(AnK: jnp.ndarray, x: jnp.ndarray, *,
                           periodic: bool,
                           interpret: bool = False) -> jnp.ndarray:
    """y[A] = sum_{p,B} An[p,A,B] * shift_p(x[B]) with AnK from
    :func:`prepare`.  f32 output; matches ops.stencil.apply_stencil to
    the coefficient working precision."""
    nun, l, m, n = x.shape
    x = x.astype(jnp.float32)
    xp = pad_state(x, periodic)              # (NUN, l+2, m+2, n+2)
    # 9 horizontally shifted copies; the vertical shift is the block
    # index k + dk (no in-kernel shifting, no 27-window materialization)
    xs = jnp.stack([xp[:, :, 1 + dj:1 + dj + m, 1 + di:1 + di + n]
                    for q in range(9)
                    for (di, dj) in [(q // 3 - 1, q % 3 - 1)]])

    adt = jnp.dtype(AnK.dtype).itemsize
    return pl.pallas_call(
        _kernel,
        grid=(l, 3, 9),
        in_specs=[
            # q*0: index-map zeros must derive from an i32 grid index
            # (under x64 a literal 0 traces i64 and Mosaic rejects it)
            pl.BlockSpec((1, NUN, NUN, 1, m, n),
                         lambda k, d, q: (d * np.int32(9) + q, q * 0,
                                          q * 0, k, q * 0, q * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUN, 1, m, n),
                         lambda k, d, q: (q, q * 0, k + d, q * 0, q * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NUN, 1, m, n),
                               lambda k, d, q: (q * 0, k, q * 0, q * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NUN, l, m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * NP * NUN * NUN * l * m * n,
            bytes_accessed=(NP * NUN * NUN * l * m * n * adt
                            + 2 * 9 * NUN * (l + 2) * m * n * 4
                            + NUN * l * m * n * 4),
            transcendentals=0),
        interpret=interpret,
    )(AnK, xs)


@functools.partial(jax.jit,
                   static_argnames=("periodic", "interpret", "dtype"))
def apply_stencil_pallas(An: jnp.ndarray, x: jnp.ndarray, *,
                         periodic: bool, interpret: bool = False,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Convenience wrapper: prepare + apply in one call.  Prefer
    calling :func:`prepare` once per Jacobian and
    :func:`apply_stencil_prepared` per matvec — the permutation is a
    full extra pass over An."""
    return apply_stencil_prepared(prepare(An, dtype), x,
                                  periodic=periodic, interpret=interpret)
