"""run_lyapunov — continuation of a LyapunovModel-wrapped ocean.

TPU-native analog of the reference CLI (src/main/run_lyapunov.C):
reads ``ocean_params.xml``, ``continuation_params.xml``,
``lyapunov_params.xml`` from the working directory, wraps the ocean in
:class:`iemic_tpu.lyapunov.LyapunovModel` and runs a pseudo-arclength
continuation; at each converged point the stationary covariance of the
stochastically forced linearization is solved (RAILS-equivalent) and
its trace/spectrum recorded.

Usage: python -m iemic_tpu.main.run_lyapunov [workdir]
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
    from ..continuation import Continuation
    from ..lyapunov import LyapunovModel

    ocean_params = read_xml("ocean_params.xml")
    cont_params = read_xml("continuation_params.xml")
    from .run_ocean import read_solver_params
    solver_params = read_solver_params()
    lyap_params = dict(read_xml("lyapunov_params.xml").items()) \
        if os.path.exists("lyapunov_params.xml") else {}

    ocean = Ocean(ocean_params, solver_params=solver_params)
    lyap = LyapunovModel(ocean, lyap_params)
    continuation = Continuation(lyap, cont_params)
    status = continuation.run()

    with open("lyapunov_data.txt", "w") as f:
        f.write("#   par          trace        resnorm      its  conv\n")
        for r in lyap.results:
            f.write("%12.6e %12.6e %12.4e %4d %s\n"
                    % (r["par"], r["trace"], r["resnorm"],
                       r["iterations"], r["converged"]))
    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    sys.exit(main())
