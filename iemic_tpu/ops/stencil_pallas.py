"""Pallas TPU kernel for the 27-point x 6-variable stencil matvec.

The hot op of every Newton-Krylov iteration is y = An*x with
An (27, 6, 6, l, m, n): 972 coefficient planes of (m, n) streamed from
HBM — strictly memory-bound.  This kernel streams An through VMEM
exactly once, double-buffered by the Pallas pipeline over a (l, 27)
grid, and accumulates the 6x6 variable block per stencil location on
the VPU.  The 27 shifted windows of x (162 planes, ~17% of the An
traffic) are produced by XLA slicing outside the kernel — Mosaic
cannot vector-load at dynamic lane offsets, and x-traffic is not the
bottleneck.

Mosaic has no f64, so this kernel runs in f32 (or bf16 coefficients
with f32 accumulation).  That makes it the *mixed-precision* hot path:
outer Newton-Krylov stays f64 (XLA), while preconditioner applications
and eigensolver matvecs — which only need a few correct digits — ride
this kernel at 2-4x the effective HBM bandwidth.  (The reference is
f64-only; mixed precision is part of the TPU-native redesign, SURVEY
§7 hard part 4.)

Reference semantics being reproduced: CSR SpMV on the assembled
stencil (matetc.F90:147-166 matAvec; assembly from the dependency
array usrc.F90:588-604).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import offsets, pad_state, NP

_OFFS = offsets()


def _kernel(an_ref, w_ref, y_ref):
    """Grid (l, NP).  Blocks:
      an_ref : (1, NUN, NUN, 1, m, n)  — An[p, :, :, k]
      w_ref  : (1, NUN, 1, m, n)       — shifted window p of x at k
      y_ref  : (NUN, 1, m, n)          — accumulated output plane k
    """
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    an = an_ref[0, :, :, 0].astype(jnp.float32)   # (NUN, NUN, m, n)
    xw = w_ref[0, :, 0]                            # (NUN, m, n)
    # 6x6 variable block as unrolled VPU multiply-accumulates (Mosaic
    # has no batched-dot lowering for pointwise-matrix contractions)
    acc = an[:, 0] * xw[0][None]
    for B in range(1, xw.shape[0]):
        acc += an[:, B] * xw[B][None]
    y_ref[:] += acc[:, None, :, :]


@functools.partial(jax.jit,
                   static_argnames=("periodic", "interpret", "dtype"))
def apply_stencil_pallas(An: jnp.ndarray, x: jnp.ndarray, *,
                         periodic: bool, interpret: bool = False,
                         dtype=jnp.float32) -> jnp.ndarray:
    """y[A] = sum_{p,B} An[p,A,B] * shift_p(x[B]) on the TPU VPU.

    f32 (or bf16-coefficient) fast path; cast f64 inputs down outside
    the double-precision Krylov loop.  Matches
    ops.stencil.apply_stencil to the working precision.
    """
    nun, l, m, n = x.shape
    An = An.astype(dtype)
    x = x.astype(jnp.float32)

    xp = pad_state(x, periodic)
    windows = jnp.stack([
        xp[:, 1 + dk:1 + dk + l, 1 + dj:1 + dj + m, 1 + di:1 + di + n]
        for (di, dj, dk) in _OFFS
    ])  # (NP, nun, l, m, n)

    y = pl.pallas_call(
        _kernel,
        grid=(l, NP),
        in_specs=[
            # zeros derived from the i32 grid index: under x64, literal
            # 0 traces as i64 and Mosaic rejects the mixed-type index map
            pl.BlockSpec((1, nun, nun, 1, m, n),
                         lambda k, p: (p, p * 0, p * 0, k, p * 0, p * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nun, 1, m, n),
                         lambda k, p: (p, p * 0, k, p * 0, p * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nun, 1, m, n),
                               lambda k, p: (p * 0, k, p * 0, p * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nun, l, m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * NP * nun * nun * l * m * n,
            bytes_accessed=(An.size * An.dtype.itemsize
                            + windows.size * 4 + nun * l * m * n * 4),
            transcendentals=0),
        interpret=interpret,
    )(An, windows)
    return y
