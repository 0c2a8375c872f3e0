"""run_ocean — ocean continuation with eigenvalue analysis.

TPU-native analog of the reference CLI (src/main/run_ocean.C:32-112):
reads ``ocean_params.xml``, ``continuation_params.xml``,
``solver_params.xml`` and optionally ``jdqz_params.xml`` from the
current working directory, runs a pseudo-arclength continuation of the
ocean model, writes ``cdata.txt``, ``info_0.txt``, ``profile_output``
and HDF5 state files.

Usage: python -m iemic_tpu.main.run_ocean [workdir]
"""

from __future__ import annotations

import os
import sys

import jax


def initialize_environment(workdir: str | None = None):
    """(reference GlobalDefinitions.C:88 initializeEnvironment)"""
    jax.config.update("jax_enable_x64", True)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_compilation_cache_dir", cache)
    if workdir:
        os.chdir(workdir)
    from ..utils import logging as log
    log.set_log_stream(open("info_0.txt", "w"))
    log.set_cdata_file("cdata.txt")
    log.reset_profile()
    return log


def read_solver_params():
    """solver_params.xml, with an optional separate nested
    ``ocean_preconditioner_params.xml`` merged in as the
    "Preconditioner" sublist — the reference keeps the per-block
    preconditioner configuration in its own 4-level nested file
    (parameterfiles/ocean_preconditioner_params.xml:427-560, read by
    THCM alongside the solver list)."""
    from ..config import read_xml
    solver_params = read_xml("solver_params.xml") \
        if os.path.exists("solver_params.xml") else None
    if os.path.exists("ocean_preconditioner_params.xml"):
        prec = read_xml("ocean_preconditioner_params.xml")
        if solver_params is None:
            from ..config import ParameterList
            solver_params = ParameterList("Solver parameters")
        solver_params.sublist("Preconditioner").update(prec)
    return solver_params


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else None
    log = initialize_environment(workdir)

    from ..config import read_xml
    from ..models.ocean import Ocean
    from ..continuation import Continuation
    from ..solvers.eigen import JDQZ

    ocean_params = read_xml("ocean_params.xml")
    cont_params = read_xml("continuation_params.xml")
    solver_params = read_solver_params()

    ocean = Ocean(ocean_params,
                  solver_params=solver_params)
    continuation = Continuation(ocean, cont_params)

    if os.path.exists("jdqz_params.xml"):
        jdqz = JDQZ(ocean, read_xml("jdqz_params.xml"))
        continuation.set_eigen_solver(jdqz)

    status = continuation.run()

    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    sys.exit(main())
