"""2D spatial domain decomposition over a TPU device mesh.

The TPU-native analog of ``TRIOS::Domain`` (reference
src/trios/TRIOS_Domain.H:39-379):

  * ``decomp2d`` — pick the processor-grid shape (py, px), the analog
    of Decomp2D (reference TRIOS_Domain.C Decomp2D), minimizing halo
    surface subject to divisibility.
  * ``Domain`` — owns the ``jax.sharding.Mesh`` over ('y', 'x') and the
    static ``NamedSharding``s that replace the reference's Epetra maps:
       - state map      (nun, l, m, n)         sharded over (m->y, n->x)
       - stencil map    (27, nun, nun, l, m, n) likewise
       - surface map    (m, n) depth-averaged dof=1 fields
         (reference TRIOS_Domain.H:188-201)
       - replicated map (anything small, on every device)
    The Import/Export objects become compiled collective schedules:
    GSPMD inserts halos for jitted code with these shardings, and
    :mod:`.halo` provides the explicit ppermute schedule for the hot
    matvec.

z is never partitioned, exactly like the reference (z-integrals stay
local, TRIOS_Domain.H:63-84).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def decomp2d(n_devices: int, n: int, m: int) -> tuple[int, int]:
    """Pick (py, px) with py*px == n_devices, py | m, px | n, minimizing
    the halo perimeter per shard (n/px + m/py).

    Analog of the reference's Decomp2D processor-grid factorization
    (reference src/trios/TRIOS_Domain.C, Decomp2D).
    """
    best = None
    for py in range(1, n_devices + 1):
        if n_devices % py:
            continue
        px = n_devices // py
        if m % py or n % px:
            continue
        cost = n / px + m / py
        if best is None or cost < best[0]:
            best = (cost, py, px)
    if best is None:
        raise ValueError(
            f"cannot decompose grid {n}x{m} over {n_devices} devices: "
            "no factorization py*px with py|m and px|n exists")
    return best[1], best[2]


class Domain:
    """2D ('y','x') device mesh + shardings for a (nun, l, m, n) grid."""

    def __init__(self, n: int, m: int, l: int, *,
                 periodic: bool = False,
                 devices=None, shape: tuple[int, int] | None = None):
        if devices is None:
            devices = jax.devices()
        multihost = len({getattr(d, "process_index", 0)
                         for d in devices}) > 1
        if shape is None:
            if multihost:
                from .multihost import decomp2d_multihost
                shape = decomp2d_multihost(devices, n, m)
            else:
                shape = decomp2d(len(devices), n, m)
        py, px = shape
        if py * px > len(devices):
            raise ValueError(f"mesh {py}x{px} needs {py * px} devices, "
                             f"have {len(devices)}")
        if m % py or n % px:
            raise ValueError(f"grid {n}x{m} not divisible by mesh "
                             f"{px}x{py}")
        self.n, self.m, self.l = n, m, l
        self.periodic = periodic
        self.py, self.px = py, px
        if multihost:
            # host-spanning mesh: y (latitude bands) over DCN, x on
            # ICI (see parallel/multihost.py; single-host CI cannot
            # exercise this — unit-tested with mocked devices)
            from .multihost import host_spanning_device_array
            dev_arr = host_spanning_device_array(
                devices[:py * px], py, px)
        else:
            dev_arr = np.asarray(devices[:py * px]).reshape(py, px)
        self.mesh = Mesh(dev_arr, ("y", "x"))

        # the "maps" (reference TRIOS_Domain.H:186-214): static specs
        self.state_spec = P(None, None, "y", "x")        # (nun,l,m,n)
        self.stencil_spec = P(None, None, None, None, "y", "x")
        self.surface_spec = P("y", "x")                  # (m,n)
        self.replicated_spec = P()

        self.state_sharding = NamedSharding(self.mesh, self.state_spec)
        self.stencil_sharding = NamedSharding(self.mesh, self.stencil_spec)
        self.surface_sharding = NamedSharding(self.mesh, self.surface_spec)
        self.replicated_sharding = NamedSharding(self.mesh,
                                                 self.replicated_spec)

    # -- placement helpers (the Import/Export analogs) -----------------
    def shard_state(self, x):
        """Place a (nun, l, m, n) array on the mesh (Standard map)."""
        return jax.device_put(x, self.state_sharding)

    def shard_stencil(self, An):
        """Place a (27, nun, nun, l, m, n) stencil tensor on the mesh."""
        return jax.device_put(An, self.stencil_sharding)

    def shard_surface(self, f):
        """Place an (m, n) surface field on the mesh (surface map,
        reference TRIOS_Domain.H:188-201)."""
        return jax.device_put(f, self.surface_sharding)

    def replicate(self, v):
        """Replicate on all mesh devices (the reference's replicated
        ColMap, Utils.H:352-391)."""
        return jax.device_put(v, self.replicated_sharding)

    def constrain_state(self, x):
        """In-jit sharding constraint (keeps XLA from resharding the
        hot path)."""
        return jax.lax.with_sharding_constraint(x, self.state_sharding)

    def gather(self, x) -> np.ndarray:
        """Gather a sharded array to a replicated host array (the
        reference's Utils::Gather/AllGather, Utils.H:352-391) — used for
        diagnostics and checkpoint I/O only."""
        return np.asarray(jax.device_get(x))

    @property
    def local_shape(self) -> tuple[int, int]:
        """(m_loc, n_loc) per-shard block size (the Standard map's local
        elements)."""
        return self.m // self.py, self.n // self.px

    def __repr__(self):
        return (f"Domain(grid {self.n}x{self.m}x{self.l}, mesh "
                f"{self.py}x{self.px}, periodic={self.periodic})")
