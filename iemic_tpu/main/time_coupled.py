"""time_coupled — implicit (theta) time stepping of the coupled model.

TPU-native analog of the reference CLI (src/main/time_coupled.C):
reads the per-model XML files plus ``timestepper_params.xml``, builds
the coupled ocean-atmosphere-seaice model and runs the adaptive theta
stepper, writing ``tdata.txt`` and per-submodel HDF5 states.

Usage: python -m iemic_tpu.main.time_coupled [workdir]
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
    from ..models.coupled import build_coupled_from_files
    from ..transient import transient_factory

    coupled = build_coupled_from_files()
    time_params = read_xml("timestepper_params.xml") \
        if os.path.exists("timestepper_params.xml") else None
    pars = dict(time_params.items()) if time_params else {}
    stepper = transient_factory(coupled, pars)
    status = stepper.run()
    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    sys.exit(main())
