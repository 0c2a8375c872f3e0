"""run_topo — topography homotopy continuation over a mask sequence.

TPU-native analog of the reference CLI (src/main/run_topo.C:19-90):
reads ``ocean_params.xml``, ``topo_params.xml``,
``continuation_params.xml`` (and optionally ``solver_params.xml``)
from the working directory, then for each consecutive pair of land
masks runs a pseudo-arclength continuation in "Delta" from 0 to 1,
deforming the steady state from one topography to the next.

Usage: python -m iemic_tpu.main.run_topo [workdir]
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
    from ..topo import Topo

    ocean_params = read_xml("ocean_params.xml")
    topo_params = read_xml("topo_params.xml")
    cont_params = read_xml("continuation_params.xml")
    from .run_ocean import read_solver_params
    solver_params = read_solver_params()

    ocean = Ocean(ocean_params, solver_params=solver_params)
    topo = Topo(ocean, topo_params)
    continuation = Continuation(topo, cont_params)

    status = 0
    for mask_idx in range(topo.start_mask, topo.n_masks - 1):
        topo.set_mask_index(mask_idx)
        topo.initialize()

        with log.timer("TOPO: Predictor"):
            topo.predictor()

        with log.timer("TOPO: Homotopy Continuation"):
            result = continuation.run()
        status = result.status
        if status != 0:
            log.WARNING(f"topo leg {mask_idx} failed: {status}")
            break

        topo.set_par("Delta", 1.0)
        topo.post_process()

    log.print_profile("profile_output")
    return status


if __name__ == "__main__":
    raise SystemExit(main())
