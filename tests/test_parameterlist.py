"""Contract tests for the layered parameter-list config system.

Mirrors the reference's test_parameterlist.C (src/tests/
test_parameterlist.C:11-441): default/overwrite/missing semantics,
hierarchical dominance (CoupledModel/Continuation lists overwrite
submodel lists), XML round-trip, and validation errors."""

import os

import pytest

from iemic_tpu.config import ParameterList, read_xml, write_xml


def test_get_sets_default():
    p = ParameterList("t")
    assert p.get("alpha", 2.5) == 2.5
    # second get returns the stored value, ignoring a new default
    assert p.get("alpha", 9.0) == 2.5


def test_get_missing_raises():
    p = ParameterList("t")
    with pytest.raises(KeyError):
        p.get("nope")


def test_set_overwrites():
    p = ParameterList("t")
    p.set("x", 1)
    p.set("x", 2)
    assert p.get("x") == 2


def test_sublist_creation_and_type_guard():
    p = ParameterList("t")
    s = p.sublist("Sub")
    s.set("y", 3)
    assert p.sublist("Sub").get("y") == 3
    p.set("val", 1.0)
    with pytest.raises(TypeError):
        p.sublist("val")


def test_update_recursive_overwrite():
    """The reference's overwriteParameters (Utils.H:189): dominant list
    entries overwrite, others are kept."""
    base = ParameterList("base", {"a": 1, "Sub": {"x": 1.0, "y": 2.0}})
    dom = ParameterList("dom", {"Sub": {"y": 7.0}, "b": 4})
    base.update(dom)
    assert base.get("a") == 1
    assert base.get("b") == 4
    assert base.sublist("Sub").get("x") == 1.0
    assert base.sublist("Sub").get("y") == 7.0


def test_validate_unknown_parameter_raises():
    defaults = ParameterList("d", {"known": 1})
    p = ParameterList("p", {"unknown": 2})
    with pytest.raises(KeyError):
        p.validate_and_set_defaults(defaults)


def test_validate_fills_missing():
    defaults = ParameterList("d", {"a": 1, "Sub": {"b": 2.0}})
    p = ParameterList("p", {"a": 5})
    p.validate_and_set_defaults(defaults)
    assert p.get("a") == 5
    assert p.sublist("Sub").get("b") == 2.0


def test_validate_type_shape_mismatch():
    defaults = ParameterList("d", {"Sub": {"b": 2.0}})
    p = ParameterList("p", {"Sub": 3})
    with pytest.raises(TypeError):
        p.validate_and_set_defaults(defaults)


def test_validate_defaults_deepcopied():
    """Filled-in sublists must not alias the defaults object."""
    defaults = ParameterList("d", {"Sub": {"b": 2.0}})
    p = ParameterList("p")
    p.validate_and_set_defaults(defaults)
    p.sublist("Sub").set("b", 9.0)
    assert defaults.sublist("Sub").get("b") == 2.0


def test_xml_roundtrip(tmp_path):
    p = ParameterList("Ocean", {
        "Save state": True,
        "Output file": "x.h5",
        "THCM": {"Global Grid-Size n": 16, "Depth hdim": 4000.0},
    })
    path = os.path.join(tmp_path, "pl.xml")
    write_xml(p, path)
    q = read_xml(path)
    assert q.get("Save state") is True
    assert q.get("Output file") == "x.h5"
    assert q.sublist("THCM").get("Global Grid-Size n") == 16
    assert q.sublist("THCM").get("Depth hdim") == 4000.0


def test_reference_xml_configs_load():
    """The shipped experiment bundles (reference run/<exp>/*.xml
    layout) parse and expose reference-named parameters."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "run", "2dmoc", "ocean_params.xml")
    p = read_xml(path)
    t = p.sublist("THCM")
    assert "Global Grid-Size n" in t
    cpath = os.path.join(here, "run", "2dmoc", "continuation_params.xml")
    c = read_xml(cpath)
    assert "continuation parameter" in c


def test_hierarchical_dominance_coupled():
    """CoupledModel/Continuation dominance over submodel lists
    (run_coupled.C:85-97 semantics)."""
    ocean = ParameterList("Ocean", {"THCM": {"Global Grid-Size n": 16}})
    coupled = ParameterList("CoupledModel", {
        "Ocean": {"THCM": {"Global Grid-Size n": 8}}})
    ocean.update(coupled.sublist("Ocean"))
    assert ocean.sublist("THCM").get("Global Grid-Size n") == 8
