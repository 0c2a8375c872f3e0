"""run_coupled — coupled ocean-atmosphere(-seaice) continuation.

TPU-native analog of the reference CLI (src/main/run_coupled.C:35-130):
reads the six XML parameter files with hierarchical overwrite (coupled
and continuation lists dominate, reference run_coupled.C:64-97 using
Utils::overwriteParameters), builds the coupled model and runs the
continuation with optional eigenvalue analysis.

Usage: python -m iemic_tpu.main.run_coupled [workdir]
"""

from __future__ import annotations

import os
import sys

from .run_ocean import initialize_environment


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else None
    log = initialize_environment(workdir)

    from ..config import read_xml
    from ..models.ocean import Ocean
    from ..models.atmosphere import Atmosphere
    from ..models.seaice import SeaIce
    from ..models.coupled import CoupledModel
    from ..continuation import Continuation
    from ..solvers.eigen import JDQZ

    def load(name):
        return read_xml(name) if os.path.exists(name) else None

    ocean_params = load("ocean_params.xml")
    atmos_params = load("atmosphere_params.xml")
    seaice_params = load("seaice_params.xml")
    coupled_params = load("coupledmodel_params.xml")
    cont_params = load("continuation_params.xml")
    from .run_ocean import read_solver_params
    solver_params = read_solver_params()

    ocean = Ocean(ocean_params, solver_params=solver_params)
    atmos = Atmosphere(atmos_params) if atmos_params else None
    seaice = SeaIce(seaice_params) if seaice_params else None

    sp = {}
    if solver_params:
        sp = {k: v for k, v in solver_params.items()
              if not hasattr(v, "items")}
    coupled = CoupledModel(ocean, atmos, seaice,
                           params=coupled_params, solver_params=sp)

    continuation = Continuation(coupled, cont_params)
    if os.path.exists("jdqz_params.xml"):
        continuation.set_eigen_solver(
            JDQZ(coupled, read_xml("jdqz_params.xml")))

    status = continuation.run()
    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    sys.exit(main())
