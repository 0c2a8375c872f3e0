"""Pallas TPU kernel for the 27-point x 6-variable stencil matvec.

The hot op of every Newton-Krylov iteration is y = An*x with
An (27, 6, 6, l, m, n): 972 coefficient planes of (m, n) streamed from
HBM — strictly memory-bound.  Design (v3, lane-aligned):

  * An is pre-permuted once per Jacobian into dk-major offset order
    (``prepare``), so the grid (l, dk, q) addresses it with purely
    affine index maps (Mosaic stalls on div/mod index maps).
  * x is NOT expanded into 27 windows (the round-1 kernel did, adding
    ~190 MB of traffic per matvec); instead 9 horizontally-shifted
    copies of the padded field are built by XLA and the vertical shift
    rides the block index ``k + dk``, so the kernel body is a pure
    6x6 VPU multiply-accumulate with no in-kernel shifting at all.
  * v3: the horizontal plane (m, n) is flattened and retiled to
    (S, 128) so the minor dimension fills the 128-lane VPU exactly.
    TPU HBM stores arrays padded to (8, 128) tiles in the last two
    dims; with the natural (m, n) = (96, 96) layout every coefficient
    plane paid a 33% lane-padding tax (96 -> 128), which v2 streamed
    from HBM as pure waste.  Flattened, 96*96 = 9216 = 72*128 tiles
    exactly; the 96x38 production grid pads 12% instead of 40%.
  * Coefficients may be stored bf16 (f32 accumulation) to halve the
    dominant An traffic — used for preconditioner-internal matvecs
    where 3 significant digits suffice.

Measured inside a jitted loop (the FGMRES use case) on the bench chip
(calibrated copy roofline ~665 GB/s r+w; overhead-cancelling harness,
bench.fori_time): 96x96x16 f32 1.14 ms/matvec = 130M gridpoints/s =
~610 GB/s total HBM traffic (~92% of the copy rate); bf16 An 0.76 ms
= 193M gridpoints/s.

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
LANE = 128
_OFFS = offsets()

# dk-major permutation: slot (dk+1)*9 + q holds the offset with
# vertical shift dk and horizontal shift q = 3*(di+1) + (dj+1)
_PERM = np.zeros(NP, np.int64)
for _p in range(NP):
    _di, _dj, _dk = _OFFS[_p]
    _PERM[(_dk + 1) * 9 + 3 * (_di + 1) + (_dj + 1)] = _p


def _nlanes(m: int, n: int) -> int:
    """Number of 128-wide lane rows covering one (m, n) plane."""
    return -((m * n) // -LANE)


def prepare(An: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Permute An into the kernel's dk-major offset order, cast to the
    kernel coefficient dtype (f32 or bf16), and retile the (m, n)
    plane to (S, 128) lane rows.  One full pass over An; do this once
    per Jacobian, not per matvec."""
    np_, a, b, l, m, n = An.shape
    S = _nlanes(m, n)
    flat = An[_PERM].astype(dtype).reshape(np_, a, b, l, m * n)
    flat = jnp.pad(flat, ((0, 0),) * 4 + ((0, S * LANE - m * n),))
    return flat.reshape(3, 9, a, b, l, S, LANE)


def _kernel(an_ref, xs_ref, y_ref):
    """Grid (l, 3).  Blocks:
      an_ref : (1, 9, NUN, NUN, 1, S, 128) — prepared An[dk, :, :, :, k]
      xs_ref : (9, NUN, 1, S, 128)         — all 9 shifts at plane k+dk
      y_ref  : (NUN, 1, S, 128)            — accumulated output plane k

    One grid step streams a ~12 MB coefficient block (all 9 horizontal
    taps of one (k, dk) pair) — large DMAs keep the HBM pipe full; the
    9x6x6 multiply-accumulate is fully unrolled on the VPU.
    """
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    an = an_ref[0, :, :, :, 0]               # (9, NUN, NUN, S, 128)
    xw = xs_ref[:, :, 0]                     # (9, NUN, S, 128)
    acc = an[0, :, 0].astype(jnp.float32) * xw[0, 0][None]
    for q in range(9):
        for B in range(NUN):
            if q == 0 and B == 0:
                continue
            acc += an[q, :, B].astype(jnp.float32) * xw[q, B][None]
    y_ref[:] += acc[:, None]


@functools.partial(jax.jit, static_argnames=("periodic", "interpret"))
def apply_stencil_prepared(AnK: jnp.ndarray, x: jnp.ndarray, *,
                           periodic: bool,
                           interpret: bool = False) -> jnp.ndarray:
    """y[A] = sum_{p,B} An[p,A,B] * shift_p(x[B]) with AnK from
    :func:`prepare`.  f32 output; matches ops.stencil.apply_stencil to
    the coefficient working precision."""
    nun, l, m, n = x.shape
    S = AnK.shape[-2]
    x = x.astype(jnp.float32)
    xp = pad_state(x, periodic)              # (NUN, l+2, m+2, n+2)
    # 9 horizontally shifted copies, flattened to lane rows; the
    # vertical shift rides the block index k + dk (no in-kernel
    # shifting, no 27-window materialization)
    xs = jnp.stack([xp[:, :, 1 + dj:1 + dj + m, 1 + di:1 + di + n]
                    for q in range(9)
                    for (di, dj) in [(q // 3 - 1, q % 3 - 1)]])
    xs = xs.reshape(9, nun, l + 2, m * n)
    xs = jnp.pad(xs, ((0, 0),) * 3 + ((0, S * LANE - m * n),))
    xs = xs.reshape(9, nun, l + 2, S, LANE)

    adt = jnp.dtype(AnK.dtype).itemsize
    y = pl.pallas_call(
        _kernel,
        grid=(l, 3),
        in_specs=[
            # d*0: index-map zeros must derive from an i32 grid index
            # (under x64 a literal 0 traces i64 and Mosaic rejects it)
            pl.BlockSpec((1, 9, NUN, NUN, 1, S, LANE),
                         lambda k, d: (d, d * 0, d * 0, d * 0, k,
                                       d * 0, d * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, NUN, 1, S, LANE),
                         lambda k, d: (d * 0, d * 0, k + d, d * 0, d * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NUN, 1, S, LANE),
                               lambda k, d: (d * 0, k, d * 0, d * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NUN, l, S, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * NP * NUN * NUN * l * S * LANE,
            bytes_accessed=(NP * NUN * NUN * l * S * LANE * adt
                            + 2 * 9 * NUN * (l + 2) * S * LANE * 4
                            + NUN * l * S * LANE * 4),
            transcendentals=0),
        # the ~12 MB double-buffered coefficient block exceeds the
        # default 16 MB scoped-vmem budget; raise it (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(AnK, xs)
    return y.reshape(nun, l, S * LANE)[..., :m * n].reshape(nun, l, m, n)


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
