"""time_ocean — implicit (theta) time stepping of the ocean.

TPU-native analog of the reference CLI (src/main/time_ocean.C:21-80):
reads ``ocean_params.xml``, ``solver_params.xml`` and
``timestepper_params.xml``, runs the adaptive theta stepper and writes
``tdata.txt`` plus transient HDF5 states.

Usage: python -m iemic_tpu.main.time_ocean [workdir]
"""

from __future__ import annotations

import os
import sys

from .run_ocean import initialize_environment


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else None
    log = initialize_environment(workdir)
    log.set_cdata_file("tdata.txt")

    from ..config import read_xml
    from ..models.ocean import Ocean
    from ..transient import transient_factory

    ocean_params = read_xml("ocean_params.xml")
    from .run_ocean import read_solver_params
    solver_params = read_solver_params()
    time_params = read_xml("timestepper_params.xml") \
        if os.path.exists("timestepper_params.xml") else None

    ocean = Ocean(ocean_params, solver_params=solver_params)
    pars = dict(time_params.items()) if time_params else {}
    stepper = transient_factory(ocean, pars)
    status = stepper.run()
    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    sys.exit(main())
