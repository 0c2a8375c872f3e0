"""Stencil operator unit tests (reference test strategy: test_domain.C
matvec equivalence)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.ops.stencil import (apply_stencil, stencil_to_dense,
                                   from_flat, to_flat, offsets, NP, NUN)


def test_offsets_match_reference_shift():
    """Offsets must match assemble.F90 shift(): loc 5 = center,
    loc 14 = below, loc 23 = above, loc 2 = west, etc."""
    offs = offsets()
    assert tuple(offs[5 - 1]) == (0, 0, 0)      # center
    assert tuple(offs[14 - 1]) == (0, 0, -1)    # below
    assert tuple(offs[23 - 1]) == (0, 0, 1)     # above
    assert tuple(offs[2 - 1]) == (-1, 0, 0)     # west
    assert tuple(offs[8 - 1]) == (1, 0, 0)      # east
    assert tuple(offs[4 - 1]) == (0, -1, 0)     # south
    assert tuple(offs[6 - 1]) == (0, 1, 0)      # north
    assert tuple(offs[1 - 1]) == (-1, -1, 0)    # southwest
    assert tuple(offs[27 - 1]) == (1, 1, 1)     # above-northeast


def test_flat_roundtrip():
    rng = np.random.default_rng(0)
    l, m, n = 3, 4, 5
    x = rng.standard_normal(NUN * l * m * n)
    assert np.allclose(to_flat(from_flat(jnp.asarray(x), l, m, n)), x)


def test_flat_ordering_matches_find_row2():
    """row = nun*((k*m + j)*n + i) + X (matetc.F90:123-144)."""
    l, m, n = 3, 4, 5
    x = np.zeros((NUN, l, m, n))
    i, j, k, X = 2, 1, 2, 4   # 0-based
    x[X, k, j, i] = 7.0
    flat = np.asarray(to_flat(jnp.asarray(x)))
    row = NUN * ((k * m + j) * n + i) + X
    assert flat[row] == 7.0
    assert np.count_nonzero(flat) == 1


def _random_stencil(l, m, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((NP, NUN, NUN, l, m, n))


def test_apply_matches_dense_nonperiodic():
    l, m, n = 3, 4, 5
    An = _random_stencil(l, m, n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((NUN, l, m, n))
    y = np.asarray(apply_stencil(jnp.asarray(An), jnp.asarray(x),
                                 periodic=False))
    A = stencil_to_dense(An, periodic=False)
    y_ref = (A @ np.asarray(to_flat(jnp.asarray(x))))
    assert np.allclose(np.asarray(to_flat(jnp.asarray(y))), y_ref,
                       atol=1e-12)


def test_apply_matches_dense_periodic():
    l, m, n = 3, 4, 5
    An = _random_stencil(l, m, n, seed=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((NUN, l, m, n))
    y = np.asarray(apply_stencil(jnp.asarray(An), jnp.asarray(x),
                                 periodic=True))
    A = stencil_to_dense(An, periodic=True)
    y_ref = (A @ np.asarray(to_flat(jnp.asarray(x))))
    assert np.allclose(np.asarray(to_flat(jnp.asarray(y))), y_ref,
                       atol=1e-12)
