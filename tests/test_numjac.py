"""NumericalJacobian utility tests (reference
src/utils/NumericalJacobian.H + TestDefinitions.H testEntries)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.utils.numjac import NumericalJacobian


def _quad_fn(A, x):
    return jnp.asarray(A) @ x + 0.1 * x * x


def test_numjac_matches_analytic():
    rng = np.random.default_rng(0)
    N = 20
    A = rng.standard_normal((N, N))
    x0 = jnp.asarray(rng.standard_normal(N))
    nj = NumericalJacobian(lambda x: _quad_fn(A, x), x0)
    Jex = A + np.diag(0.2 * np.asarray(x0))
    assert np.abs(nj.mat - Jex).max() < 1e-7


def test_numjac_ccs():
    N = 6
    A = np.diag(np.arange(1.0, N + 1))
    nj = NumericalJacobian(lambda x: jnp.asarray(A) @ x,
                           jnp.zeros(N))
    beg, jco, co = nj.ccs(drop_tol=1e-10)
    assert len(co) == N                 # diagonal only
    np.testing.assert_array_equal(jco, np.arange(N))
    np.testing.assert_allclose(co, np.arange(1.0, N + 1), atol=1e-8)


def test_numjac_test_entries():
    rng = np.random.default_rng(1)
    N = 15
    A = rng.standard_normal((N, N))
    x0 = jnp.asarray(rng.standard_normal(N))
    nj = NumericalJacobian(lambda x: _quad_fn(A, x), x0)

    def apply_analytic(v):
        return jnp.asarray(A) @ v + 0.2 * x0 * v

    worst = nj.test_entries(apply_analytic, tol=1e-5)
    assert worst < 1e-5
