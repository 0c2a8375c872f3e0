"""Pallas stencil matvec (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.ops.stencil import apply_stencil
from iemic_tpu.ops.stencil_pallas import apply_stencil_pallas


@pytest.mark.parametrize("periodic", [False, True])
def test_pallas_matches_xla(periodic):
    rng = np.random.default_rng(3)
    n, m, l = 8, 8, 4
    An = jnp.asarray(rng.standard_normal((27, 6, 6, l, m, n)))
    x = jnp.asarray(rng.standard_normal((6, l, m, n)))
    y_ref = apply_stencil(An, x, periodic=periodic)
    y = apply_stencil_pallas(An, x, periodic=periodic, interpret=True)
    # f32 working precision
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
