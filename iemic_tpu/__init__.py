"""iemic_tpu — a TPU-native implicit Earth-system model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of I-EMIC
(the Implicit Earth-system Model of Intermediate Complexity,
reference: jthies/i-emic): a fully implicit ocean-atmosphere-sea-ice
model built for bifurcation analysis of the climate system via
pseudo-arclength continuation of steady states F(x, lambda) = 0,
Newton-Krylov correctors, physics-based block preconditioning and
generalized eigensolves for stability analysis.

Design stance (TPU-first, not a port):
  * The sparse 27-point x 6-variable stencil Jacobian of the reference
    (CSR assembled from the Fortran dependency array ``Al(np,nun,nun,n,m,l)``,
    reference src/ocean/usrc.F90:588) becomes a dense structured
    coefficient tensor of shape ``(27, nun, nun, l, m, n)`` applied
    matrix-free by fused XLA/Pallas stencil contractions.
  * Parallelism is 2D lat-lon domain decomposition expressed as a
    ``jax.sharding.Mesh`` over ('y', 'x') axes; halo exchange is done
    by the XLA SPMD partitioner / explicit ppermute, replacing the
    reference's Epetra Import/Export ghost transfers
    (reference src/trios/TRIOS_Domain.H:29-99).
  * Newton-Krylov (FGMRES/IDR(s)), continuation, theta time stepping and
    eigensolves are jitted pure functions over pytrees.

Double precision is required for the implicit solvers; importing this
package enables jax_enable_x64.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
