"""Jacobian analysis, mask-fix cycles and conservation integrals.

Mirrors the reference's defensive-correctness machinery:
Ocean::analyzeJacobian1/2 + the adjustMask loop (Ocean.C:273-423,
490-570) and the integral checks (integrals.F90:17-89,
src/tests/test_integrals.C).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.models.ocean import analysis, landmask as lmk
from tests.test_ocean_core import make_ocean, _project
from tests.test_continuation_2dmoc import make_2dmoc_ocean


def test_analyze1_clean_mask():
    """An all-ocean box has no problem P rows (every continuity row
    sees horizontal divergence entries)."""
    ocean = make_ocean(n=5, m=5, l=4)
    ocean.compute_jacobian()
    flags = analysis.analyze_jacobian1(ocean)
    assert (flags == 2).sum() == 0


def test_analyze1_land_rows_flagged_one():
    """Land identity rows get flag 1 (sum == 1, Ocean.C:317-321) and
    corner-trapped water columns (walled by land+domain boundary on
    all four sides) are flagged 2 exactly like the reference."""
    ocean = make_ocean(n=5, m=5, l=4)
    landm = ocean.landm.copy()
    landm[1:, 2:4, 2:4] = 1
    ocean.set_land_mask(lmk.finalize_mask(landm, ocean.grid, False),
                        finalized=True)
    ocean.compute_jacobian()
    flags = analysis.analyze_jacobian1(ocean)
    land = np.asarray(ocean.landm)[1:5, 1:6, 1:6] != 0
    assert np.all(flags[land] == 1)
    # the SW corner column is trapped between walls and the land block
    assert np.all(flags[:, 0, 0] == 2)


def test_analyze1_flags_isolated_column():
    """An isolated single water column has continuity rows that only
    see w — exactly the 'problem rows' of Ocean.C:322-331."""
    ocean = make_ocean(n=6, m=6, l=4)
    landm = ocean.landm.copy()
    # land everywhere in a block except one interior column
    landm[1:, 2:5, 2:5] = 1
    landm[1:, 3, 3] = 0
    ocean.set_land_mask(lmk.finalize_mask(landm, ocean.grid, False),
                        finalized=True)
    ocean.compute_jacobian()
    flags = analysis.analyze_jacobian1(ocean)
    # the isolated column (0-based j=2, i=2) must be flagged
    assert np.all(flags[:, 2, 2] == 2)


def test_mask_fix_cycle_lands_isolated_column():
    ocean = make_ocean(n=6, m=6, l=4)
    landm = ocean.landm.copy()
    landm[1:, 2:5, 2:5] = 1
    landm[1:, 3, 3] = 0
    ocean.set_land_mask(lmk.finalize_mask(landm, ocean.grid, False),
                        finalized=True)
    ocean.compute_jacobian()
    landed = analysis.mask_fix_cycle(ocean, max_fixes=3)
    assert landed >= 4  # the column cells got landed
    assert np.all(np.asarray(ocean.landm)[1:5, 3, 3] == 1)
    flags = analysis.analyze_jacobian1(ocean)
    assert (flags == 2).sum() == 0


def test_column_integrals_vanish_2dmoc():
    """Salt is conserved: S-column volume integrals of the Jacobian
    vanish on a physical state (the analyzeJacobian2 criterion)."""
    ocean = make_2dmoc_ocean(n=3, m=6, l=4)
    ocean.set_par("Combined Forcing", 0.5)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    dx = ocean.solve(-ocean.rhs)
    ocean.set_state(ocean.state + dx)
    ocean.compute_jacobian()
    ints = analysis.column_integral(ocean, use_sres=False)
    assert float(np.abs(ints).max()) < 1e-6


def test_integral_checks_vanish():
    """Salt advection / diffusion ocean integrals are zero on physical
    states (integrals.F90 telescoping; test_integrals.C analog)."""
    ocean = make_2dmoc_ocean(n=3, m=6, l=4)
    ocean.set_par("Combined Forcing", 0.5)
    ocean.compute_rhs()
    ocean.compute_jacobian()
    dx = ocean.solve(-ocean.rhs)
    ocean.set_state(ocean.state + dx)
    checks = ocean.integral_checks()
    assert abs(checks["salt advection"]) < 1e-10
    assert abs(checks["salt diffusion"]) < 1e-10


def test_get_land_mask_adjust():
    """Ocean.get_land_mask(..., adjust_mask=True) runs the fix cycle
    (Ocean::getLandMask adjustMask path)."""
    import os
    import tempfile
    ocean = make_ocean(n=6, m=6, l=4)
    # write a pathological mask file: block of land with a pinhole
    landm = np.zeros((4, 6, 6), np.int32)
    landm[:, 1:4, 1:4] = 1
    landm[:, 2, 2] = 0
    from iemic_tpu.post import masks as postmasks
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "testmask")
        postmasks.write_mask_file(path, landm)
        fixed = ocean.get_land_mask(path, adjust_mask=True)
    assert np.all(fixed[1:5, 3, 3] == 1)
