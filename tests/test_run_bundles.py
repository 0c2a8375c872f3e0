"""Every shipped run/ bundle must launch via its CLI without
hand-editing (VERDICT r4 #7; reference run/* bundles are canonical
ready-to-run XML sets).  This validates each bundle end-to-end at the
configuration layer: all XMLs parse, validate against the consuming
class's default parameter registry, and the model objects construct.
(The multi-hour continuations themselves are exercised by the
intt-style integration tests on tiny grids.)
"""

import glob
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN = os.path.join(ROOT, "run")


def _read(bundle, name):
    from iemic_tpu.config import read_xml
    path = os.path.join(RUN, bundle, name)
    return read_xml(path) if os.path.exists(path) else None


def _solver_with_prec(bundle):
    """Mimic main.run_ocean.read_solver_params for a bundle dir."""
    sp = _read(bundle, "solver_params.xml")
    prec = _read(bundle, "ocean_preconditioner_params.xml")
    if prec is not None:
        if sp is None:
            from iemic_tpu.config import ParameterList
            sp = ParameterList("Solver parameters")
        sp.sublist("Preconditioner").update(prec)
    return sp


ALL_BUNDLES = sorted(os.path.basename(d)
                     for d in glob.glob(os.path.join(RUN, "*"))
                     if os.path.isdir(d))


def test_bundle_inventory():
    # the reference's experiment set (run/*) plus the global subdir
    for b in ["2dmoc", "aquaplanet", "coupled", "couplingschemes",
              "lyapunov", "ocean", "topo", "tuning"]:
        assert b in ALL_BUNDLES, f"missing bundle run/{b}"
    assert os.path.isdir(os.path.join(RUN, "ocean", "global"))


@pytest.mark.parametrize("bundle", ALL_BUNDLES + ["ocean/global"])
def test_bundle_xmls_parse(bundle):
    files = glob.glob(os.path.join(RUN, bundle, "*.xml"))
    assert files, f"empty bundle run/{bundle}"
    from iemic_tpu.config import read_xml
    for f in files:
        read_xml(f)          # malformed XML raises


@pytest.mark.parametrize("bundle", ["2dmoc", "ocean", "topo",
                                    "lyapunov", "tuning"])
def test_ocean_bundle_constructs(bundle):
    """Ocean + solver(+nested preconditioner) + continuation params
    validate against their registries — the failure mode this guards
    is an XML knob the code no longer (or never) accepted."""
    from iemic_tpu.models.ocean import Ocean
    from iemic_tpu.continuation import Continuation

    ocean_params = _read(bundle, "ocean_params.xml")
    # shrink the grid: construction cost only, config contract intact
    t = ocean_params.sublist("THCM")
    t.set("Global Grid-Size n", max(4, t.get("Global Grid-Size n") // 4))
    t.set("Global Grid-Size m", max(4, t.get("Global Grid-Size m") // 4))
    t.set("Global Grid-Size l", max(3, t.get("Global Grid-Size l") // 4))
    if t.get("Read Land Mask", False):
        t.set("Read Land Mask", False)   # mask file is size-bound
    ocean = Ocean(ocean_params, solver_params=_solver_with_prec(bundle),
                  data_dir=os.path.join(ROOT, "data"))
    cont = _read(bundle, "continuation_params.xml")
    if cont is not None:
        Continuation(ocean, cont)


def test_global_bundle_constructs():
    """The masked global production bundle (run/ocean/global) resolves
    its mask through the in-bundle 'Data directory' without kwargs."""
    from iemic_tpu.models.ocean import Ocean
    params = _read("ocean/global", "ocean_params.xml")
    cwd = os.getcwd()
    os.chdir(os.path.join(RUN, "ocean", "global"))
    try:
        ocean = Ocean(params,
                      solver_params=_solver_with_prec("ocean/global"))
        assert ocean.cfg.n == 96 and ocean.cfg.m == 38
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("bundle", ["coupled", "aquaplanet",
                                    "couplingschemes"])
def test_coupled_bundle_constructs(bundle):
    from iemic_tpu.models.ocean import Ocean
    from iemic_tpu.models.atmosphere import Atmosphere
    from iemic_tpu.models.seaice import SeaIce
    from iemic_tpu.models.coupled import CoupledModel

    def shrink(p, keys=("Global Grid-Size n", "Global Grid-Size m",
                        "Global Grid-Size l")):
        tt = p.sublist("THCM") if p.is_sublist("THCM") else p
        for k in keys:
            if k in tt:
                tt.set(k, max(3, int(tt.get(k)) // 8))
        return p

    ocean = Ocean(shrink(_read(bundle, "ocean_params.xml")),
                  solver_params=_solver_with_prec(bundle))
    atmos_p = _read(bundle, "atmosphere_params.xml")
    seaice_p = _read(bundle, "seaice_params.xml")
    atmos = Atmosphere(shrink(atmos_p)) if atmos_p else None
    seaice = SeaIce(shrink(seaice_p)) if seaice_p else None
    CoupledModel(ocean, atmos, seaice,
                 params=_read(bundle, "coupledmodel_params.xml"))


def test_timestepper_and_jdqz_and_rare_event_params():
    """The aux bundle lists validate against their consumers."""
    from iemic_tpu.solvers.eigen import JDQZ, default_jdqz_params
    for bundle in ["ocean", "coupled", "aquaplanet", "couplingschemes",
                   "tuning"]:
        p = _read(bundle, "jdqz_params.xml")
        if p is not None:
            p.validate_and_set_defaults(default_jdqz_params())
    # timestepper/ams/lyapunov lists are consumed as plain dicts; they
    # must at least carry the keys their consumers read
    ts = _read("2dmoc", "timestepper_params.xml")
    assert ts.get("theta") is not None
    assert ts.get("number of time steps") is not None
    ams = _read("2dmoc", "ams_params.xml")
    assert ams.get("number of experiments") is not None
    assert ams.get("solution 1") and ams.get("solution 2")
    ly = _read("2dmoc", "lyapunov_params.xml")
    assert ly.is_sublist("Lyapunov Solver")
