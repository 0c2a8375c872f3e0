"""Deterministic state hashing.

Analog of the reference's ``Utils::hash`` (reference
src/utils/Utils.H:197, Utils.C:333-352): an XOR-and-rotate combine of
per-element hashes, used to compare model states cheaply — e.g. the
synchronization semantics checks of test_coupled.C:828 assert that a
second synchronize() with unchanged inputs leaves every state hash
untouched.

The element hash here is the raw IEEE-754 bit pattern (the reference
uses std::hash<double>, also bit-based), so the hash is exact — any
single-bit state change flips it — and platform-independent.
"""

from __future__ import annotations

import numpy as np

_MASK = (1 << 64) - 1


def state_hash(x) -> int:
    """XOR-rotate hash of an array (or pytree leaf list) of floats."""
    arr = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    bits = arr.view(np.uint64).reshape(-1)
    seed = 2
    for b in bits.tolist():
        seed ^= (b + ((seed << 6) & _MASK) + (seed >> 2)) & _MASK
        seed &= _MASK
    return seed


def model_hash(model) -> int:
    """Hash a model's state vector (Utils::hash on getState('V'))."""
    return state_hash(np.asarray(model.get_state()))
