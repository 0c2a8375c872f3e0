"""Reaction-coordinate (score) functions for rare-event algorithms.

Re-implements the reference's ScoreFunctions
(src/transient/ScoreFunctions.C:32-190): normalized Gaussian-windowed
distance to the A/B steady states, with an optional third (unstable)
state setting the distance factor, and the ocean variant restricted to
the meridional-velocity variable.
"""

from __future__ import annotations

import numpy as np


def _norm(v) -> float:
    return float(np.linalg.norm(np.ravel(np.asarray(v))))


def default_score_function(sol1, sol2, sol3=None):
    """(ScoreFunctions.C:32-66)"""
    nrm = _norm(sol1 - sol2)
    dist_factor = 0.5
    if sol3 is not None:
        dist_factor = _norm(sol1 - sol3) / nrm

    def dist(x):
        d1 = _norm(x - sol1) / nrm
        d2 = _norm(x - sol2) / nrm
        return (dist_factor
                - dist_factor * np.exp(-0.5 * (d1 / 0.25) ** 2)
                + (1.0 - dist_factor) * np.exp(-0.5 * (d2 / 0.25) ** 2))
    return dist


def ocean_score_function(sol1, sol2, sol3=None, vvar: int = 1):
    """Ocean variant using only the v-velocity component
    (ScoreFunctions.C:114-190).  States in field layout (6, l, m, n)."""

    def var_norm(x):
        return float(np.linalg.norm(np.ravel(np.asarray(x)[vvar])))

    nrm = var_norm(sol1 - sol2)
    dist_factor = 0.5
    if sol3 is not None:
        dist_factor = var_norm(sol1 - sol3) / nrm

    def dist(x):
        d1 = var_norm(x - sol1) / nrm
        d2 = var_norm(x - sol2) / nrm
        return (dist_factor
                - dist_factor * np.exp(-0.5 * (d1 / 0.25) ** 2)
                + (1.0 - dist_factor) * np.exp(-0.5 * (d2 / 0.25) ** 2))
    return dist
