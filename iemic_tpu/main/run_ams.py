"""run_ams — rare-event (AMS/TAMS/GPA) transitions between states.

TPU-native analog of the reference CLI (src/main/run_ams.C:25-100):
loads steady states A, B (and optionally an unstable state D) from
HDF5, builds a stochastic theta stepper with a score function, and
runs the configured rare-event method, reporting transition
probability / mean first passage time.

Usage: python -m iemic_tpu.main.run_ams [workdir]
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

    import jax.numpy as jnp
    from ..config import read_xml
    from ..models.ocean import Ocean
    from ..transient import transient_factory
    from ..utils import hdf5 as h5

    ocean_params = read_xml("ocean_params.xml")
    from .run_ocean import read_solver_params
    solver_params = read_solver_params()
    ams_params = read_xml("ams_params.xml")
    pars = dict(ams_params.items())

    ocean = Ocean(ocean_params, solver_params=solver_params)

    def load_flat(name):
        state, _ = h5.load_state(name)
        if state is None:
            raise FileNotFoundError(name)
        return ocean.from_flat(jnp.asarray(state))

    sol1 = load_flat(pars.get("solution 1", "sol1.h5"))
    sol2 = load_flat(pars.get("solution 2", "sol2.h5"))
    sol3 = None
    f3 = pars.get("solution 3", "")
    if f3 and os.path.exists(f3):
        sol3 = load_flat(f3)

    pars.setdefault("score function", "ocean")
    tr = transient_factory(ocean, pars, sol1=sol1, sol2=sol2, sol3=sol3)
    status = tr.run()
    log.INFO(f"probability = {tr.get_probability()}")
    log.INFO(f"mfpt        = {tr.get_mfpt()}")
    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    sys.exit(main())
