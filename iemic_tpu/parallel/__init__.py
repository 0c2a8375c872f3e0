"""TPU-native domain decomposition (the TRIOS::Domain analog).

The reference parallelizes by a 2D processor grid over (lon, lat) with
2-deep ghost layers and Epetra Import/Export halo transfers
(reference src/trios/TRIOS_Domain.H:29-99, :342-348).  Here the same
strategy becomes a ``jax.sharding.Mesh`` over named axes ('y', 'x'),
static ``NamedSharding``s in place of Epetra maps, and a
``shard_map``-based stencil matvec whose halo exchange is explicit
``lax.ppermute`` traffic over ICI (periodic wraparound in x included,
reference TRIOS_Domain.H:337-340).
"""

from .domain import Domain, decomp2d
from .halo import (halo_pad_shard, make_sharded_stencil_apply,
                   make_sharded_ops)

__all__ = ["Domain", "decomp2d", "halo_pad_shard",
           "make_sharded_stencil_apply", "make_sharded_ops"]
