"""Checkpoint/restart tests (reference Model.H save/load contract:
HDF5 state + parameters, restart with any decomposition; golden-state
pattern of reft_ocean.C)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean


def make_ocean(tmp, **over):
    pars = {"THCM": {"Global Grid-Size n": 4, "Global Grid-Size m": 4,
                     "Global Grid-Size l": 3,
                     "Starting Parameters": {"Combined Forcing": 0.25,
                                             "Temperature Forcing": 7.0}},
            "Output file": str(tmp / "ocean_output.h5"),
            "Input file": str(tmp / "ocean_output.h5"),
            "Save state": True}
    pars.update(over)
    return Ocean(pars)


def test_save_load_roundtrip(tmp_path):
    ocean = make_ocean(tmp_path)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal(ocean.state.shape))
    ocean.set_state(x)
    ocean.save_state_to_file()

    ocean2 = make_ocean(tmp_path)
    ocean2.set_par("Combined Forcing", 99.0)  # will be overwritten
    assert ocean2.load_state_from_file() == 0
    assert np.allclose(np.asarray(ocean2.state), np.asarray(x))
    assert abs(ocean2.get_par("Combined Forcing") - 0.25) < 1e-14
    assert abs(ocean2.get_par("Temperature Forcing") - 7.0) < 1e-14


def test_reference_hdf5_layout(tmp_path):
    """The file must use the reference's dataset paths
    (State/Values, Parameters/<name>, Grid/*)."""
    import h5py
    ocean = make_ocean(tmp_path)
    ocean.save_state_to_file()
    with h5py.File(tmp_path / "ocean_output.h5", "r") as f:
        assert "State/Values" in f
        assert f["State/Values"].shape == (ocean.grid.ndim,)
        assert "Parameters/Combined Forcing" in f
        assert "Grid/n" in f and "Grid/x" in f
        assert int(np.asarray(f["Grid/n"])) == 4


def test_backup_double_buffer(tmp_path):
    """Every save first copies the previous output to .bak
    (Model.H:254-258)."""
    import os
    ocean = make_ocean(tmp_path)
    ocean.save_state_to_file()
    ocean.set_state(ocean.state + 1.0)
    ocean.save_state_to_file()
    assert os.path.exists(str(tmp_path / "ocean_output.h5.bak"))


def test_missing_file_gives_trivial_state(tmp_path):
    ocean = make_ocean(tmp_path, **{"Input file":
                                    str(tmp_path / "nonexistent.h5")})
    ocean.set_state(ocean.state + 3.0)
    assert ocean.load_state_from_file() == 1
    assert float(jnp.linalg.norm(ocean.state)) == 0.0


def test_eigenvector_file(tmp_path):
    from iemic_tpu.utils import hdf5 as h5
    import h5py
    alphas = np.array([1 + 2j, 3 + 0j])
    betas = np.array([1.0, 1.0])
    vecs = [np.arange(5, dtype=complex), np.ones(5, dtype=complex)]
    fn = str(tmp_path / "ev.h5")
    h5.save_eigenvectors(fn, alphas, betas, vecs)
    with h5py.File(fn, "r") as f:
        assert int(np.asarray(f["MetaData/NumEigs"])) == 2
        assert np.allclose(np.asarray(f["EigenValues/AlphaRe"]), [1, 3])
        assert "EV_Real_0/Values" in f


def test_flux_saves_and_fort3(tmp_path):
    """'Save salinity/temperature flux' write flux datasets into the
    checkpoint (Ocean::additionalExports, Ocean.C:1904-1946) and
    'Use legacy fort.3 output' writes the inout.F90 text format."""
    import h5py
    import numpy as np
    from iemic_tpu.models.ocean import Ocean

    out = str(tmp_path / "ocean_output.h5")
    ocean = Ocean({"Save state": True, "Output file": out,
                   "Save salinity flux": True,
                   "Save temperature flux": True,
                   "THCM": {
                       "Global Grid-Size n": 4, "Global Grid-Size m": 4,
                       "Global Grid-Size l": 3,
                       "Starting Parameters": {"Combined Forcing": 0.1,
                                               "Temperature Forcing": 10.0,
                                               "Salinity Forcing": 1.0}}})
    ocean.save_state_to_file(out)
    with h5py.File(out, "r") as f:
        sal = np.asarray(f["SalinityFlux/Values"])
        tem = np.asarray(f["TemperatureFlux/Values"])
    assert sal.shape == (4, 4)
    assert np.abs(tem).max() > 0          # idealized T forcing is on

    f3 = tmp_path / "fort.3"
    ocean.write_fort3(str(f3))
    lines = f3.read_text().splitlines()
    assert lines[0].startswith("Version")
    ndim = 6 * 3 * 4 * 4
    assert len(lines) > ndim              # header + params + solution
