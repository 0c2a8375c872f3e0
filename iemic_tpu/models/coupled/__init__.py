from .coupled import CoupledModel  # noqa: F401


def build_coupled_from_files(workdir: str | None = None):
    """Build a CoupledModel from the XML bundle in ``workdir`` (CWD by
    default) — the file-layout contract of the reference's coupled CLIs
    (reference src/main/run_coupled.C:64-108: per-model XML files with
    hierarchical overwrite)."""
    import os
    from ..ocean import Ocean
    from ..atmosphere import Atmosphere
    from ..seaice import SeaIce
    from ...config import read_xml

    def load(name):
        path = os.path.join(workdir, name) if workdir else name
        return read_xml(path) if os.path.exists(path) else None

    ocean_params = load("ocean_params.xml")
    atmos_params = load("atmosphere_params.xml")
    seaice_params = load("seaice_params.xml")
    coupled_params = load("coupledmodel_params.xml")
    solver_params = load("solver_params.xml")

    ocean = Ocean(ocean_params, solver_params=solver_params)
    atmos = Atmosphere(atmos_params) if atmos_params else None
    seaice = SeaIce(seaice_params) if seaice_params else None
    sp = {}
    if solver_params:
        sp = {k: v for k, v in solver_params.items()
              if not hasattr(v, "items")}
    return CoupledModel(ocean, atmos, seaice,
                        params=coupled_params, solver_params=sp)
