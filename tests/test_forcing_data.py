"""Levitus/monthly/wind data-forcing tests (reference
src/ocean/levitus.F90, monthly.F90, forcing.F90:268-454)."""

import numpy as np

from iemic_tpu.grid import make_grid
from iemic_tpu.models.ocean import landmask as lm
from iemic_tpu.models.ocean import forcing_data as fd


def _write_levitus(path, nlayers, func):
    """Write a synthetic Levitus-94 ASCII file: value = func(lon_deg,
    lat_deg, layer)."""
    lines = []
    for k in range(nlayers):
        vals = []
        for j in range(180):          # lat index 1..180 -> -89.5..89.5
            for i in range(1, 361):
                vals.append(func(i - 0.5, j - 89.5, k))
        for i0 in range(0, len(vals), 10):
            lines.append("".join("%8.4f" % v
                                 for v in vals[i0:i0 + 10]))
    path.write_text("\n".join(lines) + "\n")


def _grid():
    g = make_grid(8, 8, 4, xmin_deg=286.0, xmax_deg=350.0,
                  ymin_deg=10.0, ymax_deg=74.0)
    landm = lm.finalize_mask(lm.no_land(g), g, periodic=False, flat=True)
    return g, landm


def test_levitus_surface_constant(tmp_path):
    g, landm = _grid()
    p = tmp_path / "t00an1"
    _write_levitus(p, 1, lambda lon, lat, k: 20.0)
    sst = fd.levitus_surface(str(p), g, landm, "TEMP")
    assert sst.shape == (g.m, g.n)
    # constant 20 C minus reference T0=15 -> 5 everywhere (ocean pts)
    np.testing.assert_allclose(sst, 5.0, atol=1e-3)


def test_levitus_surface_gradient(tmp_path):
    g, landm = _grid()
    p = tmp_path / "t00an1"
    _write_levitus(p, 1, lambda lon, lat, k: 0.1 * lat)
    sst = fd.levitus_surface(str(p), g, landm, "TEMP")
    # meridional gradient preserved: row means increase with latitude
    rows = sst.mean(axis=1)
    assert np.all(np.diff(rows) > 0)
    # value approximates 0.1*lat(j) - 15
    lat = g.y * 180.0 / np.pi
    np.testing.assert_allclose(rows, 0.1 * lat - 15.0, atol=0.5)


def test_levitus_missing_widening(tmp_path):
    """Cells whose box holds only missing data must widen, not fail
    (levitus.F90:191-205)."""
    g, landm = _grid()
    p = tmp_path / "s00an1"

    def func(lon, lat, k):
        # poke a missing hole covering ~the first model cell
        if 286 <= lon <= 296 and 10 <= lat <= 20:
            return fd.MISSING
        return 35.5
    _write_levitus(p, 1, func)
    sss = fd.levitus_surface(str(p), g, landm, "SALT")
    np.testing.assert_allclose(sss, 0.5, atol=1e-3)


def test_split_time_weights():
    # weights always sum to 1 and are in [0,1]; month wraps at year end
    for frac in [0.0, 0.3, 0.99]:
        t = frac * fd.SECS_PER_YEAR / (fd.R0DIM / fd.UDIM)
        _, months, weights = fd.split_time(t)
        assert abs(sum(weights) - 1.0) < 1e-12
        assert all(0.0 <= w <= 1.0 for w in weights if w)
        assert 0 <= months[0] < 12 and 0 <= months[1] < 12
    # mid-December interpolates December with January (wraparound)
    t = 0.97 * fd.SECS_PER_YEAR / (fd.R0DIM / fd.UDIM)
    _, months, _ = fd.split_time(t)
    assert months[0] == 11 and months[1] == 0


def test_monthly_forcing_blend():
    m, n = 4, 5
    ann = np.full((m, n), 2.0)
    mon = np.stack([np.full((m, n), float(k)) for k in range(12)])
    mf = fd.MonthlyForcing(ataux=ann, atauy=ann, atatm=ann, aemip=ann,
                           mtaux=mon, mtauy=mon, mtatm=mon, memip=mon)
    # gamma=0: annual only
    tx, ty, ta, em = mf.update(0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(tx, 2.0)
    np.testing.assert_allclose(em, 2.0)
    # gamma=1 at month boundary: first month exactly
    t0 = 0.5 * fd.SECS_PER_MONTH / (fd.R0DIM / fd.UDIM)
    tx, ty, ta, em = mf.update(t0, 1.0, 1.0, 1.0)
    # halfway through month 0: between months 0 and 1
    assert 0.0 <= tx[0, 0] <= 1.0
    # interpolation continuity across a month boundary
    eps = 1e-4 * fd.SECS_PER_MONTH / (fd.R0DIM / fd.UDIM)
    t1 = fd.SECS_PER_MONTH / (fd.R0DIM / fd.UDIM)
    a = mf.update(t1 - eps, 1.0, 1.0, 1.0)[0][0, 0]
    b = mf.update(t1 + eps, 1.0, 1.0, 1.0)[0][0, 0]
    assert abs(a - b) < 1e-2


def test_wind_file_roundtrip(tmp_path):
    """windfit reads header, lon, lat, then (taux,tauy) pairs
    (forcing.F90:292-314)."""
    p = tmp_path / "trtau.dat"
    nx, ny = 145, 72
    lon = np.linspace(0.0, 360.0, nx)
    lat = np.linspace(-88.75, 88.75, ny)
    lines = ["header"]
    lines += ["%f" % v for v in lon]
    lines += ["%f" % v for v in lat]
    for i in range(nx):
        for j in range(ny):
            lines.append("%f %f" % (0.01 * lat[j], 0.5))
    p.write_text("\n".join(lines) + "\n")

    g, _ = _grid()
    tx, ty = fd.windfit(str(p), g)
    assert tx.shape == (g.m, g.n)
    np.testing.assert_allclose(ty, 0.5, atol=1e-6)
    lat_v = g.yv[1:] * 180.0 / np.pi
    np.testing.assert_allclose(tx.mean(axis=1), 0.01 * lat_v, atol=1e-3)


def test_time_dependent_forcing_cycle():
    """'Time Dependent Forcing' + 'Time' parameter drive the seasonal
    interpolation of the data-driven surface fields (THCM::setParameter
    param==0, THCM.C:1883-1914 + m_monthly update_forcing)."""
    import jax.numpy as jnp
    from iemic_tpu.models.ocean import Ocean

    ocean = Ocean({"THCM": {
        "Global Grid-Size n": 4, "Global Grid-Size m": 4,
        "Global Grid-Size l": 3,
        "Levitus S": 0,              # data-driven salinity flux
        "Time Dependent Forcing": True,
        "Starting Parameters": {"Combined Forcing": 1.0,
                                "Salinity Forcing": 1.0},
    }})
    assert ocean.monthly_forcing is not None
    mf = ocean.monthly_forcing
    m, n = 4, 4
    # install a seasonal salinity-flux cycle: month k has amplitude k
    mf.memip = np.stack([np.full((m, n), float(k)) for k in range(12)])
    mf.mtaux = np.zeros((12, m, n))
    mf.mtauy = np.zeros((12, m, n))
    mf.mtatm = np.zeros((12, m, n))

    ocean.set_par("Time", 0.0)
    e0 = np.asarray(ocean.fields.emip).mean()
    from iemic_tpu.models.ocean.forcing_data import (SECS_PER_YEAR,
                                                      R0DIM, UDIM)
    year_nd = SECS_PER_YEAR / (R0DIM / UDIM)
    ocean.set_par("Time", 0.5 * year_nd)
    e6 = np.asarray(ocean.fields.emip).mean()
    assert e6 > e0   # mid-year months have larger amplitude
    # the rhs must feel the season (emip enters the S surface forcing)
    ocean.compute_rhs()
    r_mid = np.asarray(ocean.rhs).copy()
    ocean.set_par("Time", 0.0)
    ocean.compute_rhs()
    r_jan = np.asarray(ocean.rhs)
    assert np.abs(r_mid - r_jan).max() > 1e-8
    # negative time resets to constant (annual) forcing
    ocean.set_par("Time", -1.0)
    assert np.allclose(np.asarray(ocean.fields.emip), 0.0)
