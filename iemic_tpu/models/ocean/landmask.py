"""Land-mask construction and mask-file I/O.

Re-implements the reference's mask handling: mkmask file reading
(src/ocean/topo.F90:41-140 ``readmask``), dummy-layer setup and the
land-inversion fix (src/ocean/usrc.F90:79-107, 372-391), the salinity
perturbation mask reader (src/ocean/forcing.F90:457-486), and the
idealized no-land topography (itopo == 1).

Mask array layout: (l+2, m+2, n+2) int, [k, j, i], values
OCEAN/LAND/WATER/PERIO (par.F90:77-81).
"""

from __future__ import annotations

import numpy as np

from ...grid import Grid
from ...ops.stencil import OCEAN, LAND, PERIO


def no_land(grid: Grid) -> np.ndarray:
    """itopo == 1: all-ocean interior."""
    l, m, n = grid.l, grid.m, grid.n
    landm = np.full((l + 2, m + 2, n + 2), LAND, dtype=np.int32)
    landm[1:l + 1, 1:m + 1, 1:n + 1] = OCEAN
    return landm


def read_mask_file(path: str, grid: Grid) -> np.ndarray:
    """Read a mkmask-format land mask: per level k = 0..l+1 a header
    line then m+2 digit rows from j = m+1 down to 0 (topo.F90:41-66)."""
    l, m, n = grid.l, grid.m, grid.n
    landm = np.full((l + 2, m + 2, n + 2), LAND, dtype=np.int32)
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    pos = 0
    for k in range(l + 2):
        pos += 1  # header line
        for j in range(m + 1, -1, -1):
            row = lines[pos]
            pos += 1
            digits = [int(ch) for ch in row.strip()[:n + 2]]
            landm[k, j, :len(digits)] = digits
    return landm


def finalize_mask(landm: np.ndarray, grid: Grid, periodic: bool,
                  flat: bool = False) -> np.ndarray:
    """Dummy layers, periodic ring, land-inversion fix and optional
    flat bottom, mirroring usrc.F90 init/set_landmask."""
    landm = landm.copy()
    l, m, n = grid.l, grid.m, grid.n

    if flat:  # remove bottom topography (topo.F90:107-111)
        for k in range(1, l):
            landm[k, :, :] = landm[l, :, :]

    # land inversion fix (usrc.F90:372-381)
    for k in range(l, 1, -1):
        inv = (landm[k, 1:m + 1, 1:n + 1] == LAND) \
            & (landm[k - 1, 1:m + 1, 1:n + 1] == OCEAN)
        landm[k - 1, 1:m + 1, 1:n + 1] = np.where(
            inv, LAND, landm[k - 1, 1:m + 1, 1:n + 1])

    # dummy layers (usrc.F90:100-107)
    if periodic:
        # x-ring carries the wrap values (PERIO markers behave as ocean
        # in all ==LAND / ==OCEAN comparisons; use real wrap content)
        landm[:, :, 0] = landm[:, :, n]
        landm[:, :, n + 1] = landm[:, :, 1]
        landm[:, :, 0][landm[:, :, 0] == PERIO] = OCEAN
        landm[:, :, n + 1][landm[:, :, n + 1] == PERIO] = OCEAN
    else:
        landm[:, :, 0] = LAND
        landm[:, :, n + 1] = LAND
    landm[:, 0, :] = LAND
    landm[:, m + 1, :] = LAND
    landm[0, :, :] = LAND
    landm[l + 1, :, :] = LAND
    return landm


def read_spert_mask(path: str, grid: Grid, landm: np.ndarray) -> np.ndarray:
    """Salinity perturbation mask (forcing.F90:457-486): rows j = m+1..0
    of n+2 digits; spert(i,j) = (1 - dum(i,j)) * (1 - landm(i,j,l))."""
    l, m, n = grid.l, grid.m, grid.n
    dum = np.zeros((m + 2, n + 2), dtype=np.int32)
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    for idx, j in enumerate(range(m + 1, -1, -1)):
        digits = [int(ch) for ch in lines[idx].strip()[:n + 2]]
        dum[j, :len(digits)] = digits
    surf = 1.0 - landm[l, 1:m + 1, 1:n + 1].astype(np.float64)
    return (1.0 - dum[1:m + 1, 1:n + 1]) * surf
