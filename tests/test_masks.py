"""Land-mask data round-trip tests (the reference's data/mkmask masks
+ topo.F90:41-66 reader + matlab/create_mask.m tooling)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MKMASK = os.path.join(REPO, "data", "mkmask")


@pytest.fixture(scope="module", autouse=True)
def ensure_masks():
    if not os.path.exists(os.path.join(MKMASK, "test8x8x4_1")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "make_masks.py")],
                       check=True)


def test_write_read_roundtrip(tmp_path):
    from iemic_tpu.post.masks import write_mask_file
    from iemic_tpu.models.ocean import landmask as lm
    from iemic_tpu.grid import make_grid

    rng = np.random.default_rng(0)
    l, m, n = 3, 5, 4
    raw = (rng.random((l, m, n)) < 0.3).astype(np.int64)
    raw[-1] = 0                      # keep the surface open
    path = os.path.join(tmp_path, "m")
    write_mask_file(path, raw)
    grid = make_grid(n, m, l, xmin_deg=286.0, xmax_deg=350.0,
                     ymin_deg=10.0, ymax_deg=74.0)
    back = lm.read_mask_file(path, grid)
    assert np.array_equal(back[1:l + 1, 1:m + 1, 1:n + 1], raw)


def test_ocean_reads_mkmask_file():
    """Ocean with 'Read Land Mask' consumes the generated data set and
    produces a consistent Jacobian (land rows = identity)."""
    from iemic_tpu.models.ocean import Ocean
    import jax.numpy as jnp

    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 8, "Global Grid-Size m": 8,
        "Global Grid-Size l": 4,
        "Read Land Mask": True,
        "Land Mask": "test8x8x4_3",
        "Starting Parameters": {"Combined Forcing": 0.0,
                                "Temperature Forcing": 10.0,
                                "Wind Forcing": 1.0},
    }}, data_dir=os.path.join(REPO, "data"))
    lm_int = np.asarray(ocean.landm)[1:5, 1:9, 1:9]
    assert (lm_int == 1).any()       # the island is present
    ocean.compute_jacobian()
    An = np.asarray(ocean.jac)
    land = lm_int == 1
    # land rows: zero except identity diagonal (boundary.F90:381-387)
    for a in range(6):
        assert np.allclose(An[4, a, a][land], 1.0)
    # Dirichlet residual on land rows: F = x there
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.01 * rng.standard_normal(ocean.state.shape))
    ocean.set_state(x)
    ocean.compute_rhs()
    F = np.asarray(ocean.rhs)
    xn = np.asarray(x)
    for a in range(6):
        assert np.allclose(F[a][land], xn[a][land], atol=1e-12)


def test_global_mask_loads():
    from iemic_tpu.models.ocean import landmask as lm
    from iemic_tpu.grid import make_grid
    grid = make_grid(96, 38, 12, xmin_deg=0.0, xmax_deg=360.0,
                     ymin_deg=-85.0, ymax_deg=85.0, periodic=True)
    raw = lm.read_mask_file(
        os.path.join(MKMASK, "mask_global_96x38x12"), grid)
    assert raw.shape == (14, 40, 98)
    interior = raw[1:13, 1:39, 1:97]
    frac = (interior == 1).mean()
    assert 0.05 < frac < 0.5          # continents exist, mostly ocean


def test_depth_to_land_pipeline():
    """depth3land + fillbays + flood (topo.F90:136-177): bathymetry to
    a mask with bays removed and disconnected pockets landed."""
    from iemic_tpu.grid import make_grid
    from iemic_tpu.models.ocean import landmask as lmk
    from iemic_tpu.ops.stencil import OCEAN, LAND

    grid = make_grid(12, 10, 4, xmin_deg=0.0, xmax_deg=60.0,
                     ymin_deg=-30.0, ymax_deg=30.0, hdim=4000.0)
    depth = np.full((10, 12), -4000.0)
    depth[:, 0:2] = 100.0              # a continent (floor above sea)
    depth[4:6, 5:7] = -2900.0          # a shelf (3 of 4 levels wet)
    depth[0, 11] = -4000.0
    raw = lmk.depth_to_land(depth, grid)
    inner = raw[1:5, 1:11, 1:13]
    # continent is land at every depth
    assert np.all(inner[:, :, 0:2] == LAND)
    # deep basin is ocean at the surface
    assert inner[3, 7, 7] == OCEAN
    # the shelf: ocean above the floor, land below it
    assert inner[3, 4, 5] == OCEAN
    assert inner[1, 4, 5] == OCEAN
    assert inner[0, 4, 5] == LAND
    # no WATER left (all pockets resolved)
    assert not np.any(raw == 2)


def test_miocene_continents():
    from iemic_tpu.grid import make_grid
    from iemic_tpu.models.ocean import landmask as lmk
    from iemic_tpu.ops.stencil import OCEAN, LAND

    grid = make_grid(36, 18, 4, xmin_deg=0.0, xmax_deg=360.0,
                     ymin_deg=-80.0, ymax_deg=80.0)
    raw = lmk.miocene(grid)
    inner = raw[1:5, 1:19, 1:37]
    assert (inner == LAND).any() and (inner == OCEAN).any()
    # south america block: x in (250, 315) deg, y in (-60, 0)
    i = int((282 - 5) / 10)   # cell centers at 5,15,...
    j = int((-30 + 80 - 4.44) / (160 / 18))
    assert inner[0, j, i] == LAND


def test_ocean_miocene_topography_option():
    from iemic_tpu.models.ocean import Ocean
    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 16, "Global Grid-Size m": 8,
        "Global Grid-Size l": 3,
        "Global Bound xmin": 0.0, "Global Bound xmax": 360.0,
        "Global Bound ymin": -80.0, "Global Bound ymax": 80.0,
        "Periodic": True, "Topography": 2,
    }})
    ocean.compute_rhs()
    assert np.isfinite(float(np.linalg.norm(np.asarray(ocean.rhs))))
