"""State-hash utility tests (Utils::hash analog, Utils.C:333-352) and
the synchronization-idempotence check of test_coupled.C:828."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.utils.hashing import state_hash, model_hash


def test_hash_detects_single_bit_change():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(257)
    h0 = state_hash(x)
    assert state_hash(x.copy()) == h0
    y = x.copy()
    y[100] = np.nextafter(y[100], np.inf)
    assert state_hash(y) != h0


def test_hash_on_jax_arrays():
    x = jnp.linspace(0.0, 1.0, 64)
    assert state_hash(x) == state_hash(np.asarray(x))


def test_synchronize_is_idempotent():
    """A second synchronize() with unchanged states must leave every
    model state hash untouched (test_coupled.C:828 pattern)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_coupled import make_coupled

    cpld = make_coupled(use_seaice=True, comb=0.1)
    rng = np.random.default_rng(5)
    x = jnp.asarray(0.01 * rng.standard_normal(cpld.get_state().shape))
    cpld.set_state(x)
    cpld.synchronize()
    hashes = [model_hash(m) for m in cpld.models]
    cpld.synchronize()
    assert [model_hash(m) for m in cpld.models] == hashes
