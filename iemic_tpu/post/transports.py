"""Volume-transport diagnostics (reference matlab/compute_transports.m):
integrate velocities across sections of the model grid."""

from __future__ import annotations

import numpy as np


def compute_transports(ocean, i_section: int | None = None,
                       j_section: int | None = None):
    """Volume transport [Sv] through a meridional section i=i_section
    (zonal velocity u integrated over y,z) and/or a zonal section
    j=j_section (meridional velocity v integrated over x,z).

    Dimensionalization: u* = udim * u, dy* = r0dim * dy,
    dz* = hdim * dz (reference usr.F90 scales)."""
    g = ocean.grid
    x = np.asarray(ocean.get_state()).reshape(6, g.l, g.m, g.n)
    u, v = x[0], x[1]
    UDIM, R0DIM = 0.1, 6.37e6
    SV = 1e6
    ocean_mask = (ocean.landm[1:-1, 1:-1, 1:-1] == 0)

    dz = g.dz * g.dfzT * g.hdim                      # (l,)
    out = {}
    if i_section is not None:
        dy = g.dy * R0DIM
        upts = np.where(ocean_mask[:, :, i_section], u[:, :, i_section],
                        0.0)
        out["zonal"] = float(
            (upts * dz[:, None]).sum() * dy * UDIM / SV)
    if j_section is not None:
        cosy = np.cos(g.yv[1 + j_section])
        dx = g.dx * R0DIM * cosy
        vpts = np.where(ocean_mask[:, j_section, :], v[:, j_section, :],
                        0.0)
        out["meridional"] = float(
            (vpts * dz[:, None]).sum() * dx * UDIM / SV)
    return out
