#!/usr/bin/env python
"""Solver/preconditioner tuning sweep (the analog of the reference's
run/tuning/tuning.sh + eps.sh): run the standalone ocean continuation
over a grid of solver knobs (preconditioner method, FGMRES tolerance,
precision mode) and tabulate wall-clock and MV effort.

Usage: python scripts/tuning.py <bundle_dir>
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_one(bundle: str, prec: str, tol: float, precision: str) -> dict:
    from iemic_tpu.config import read_xml, write_xml
    from iemic_tpu.main import run_ocean

    work = tempfile.mkdtemp(prefix=f"tune_{prec}_")
    for f in os.listdir(bundle):
        if f.endswith(".xml"):
            shutil.copy(os.path.join(bundle, f), work)
    sp_path = os.path.join(work, "solver_params.xml")
    sp = read_xml(sp_path) if os.path.exists(sp_path) else None
    if sp is None:
        from iemic_tpu.config import ParameterList
        sp = ParameterList("solver")
    sp.set("Preconditioning", prec)
    sp.set("FGMRES tolerance", tol)
    sp.set("Precision", precision)
    write_xml(sp, sp_path)

    cwd = os.getcwd()
    t0 = time.perf_counter()
    try:
        run_ocean.main([work])
    finally:
        os.chdir(cwd)
    wall = time.perf_counter() - t0

    mv = steps = 0
    cdata = os.path.join(work, "cdata.txt")
    if os.path.exists(cdata):
        with open(cdata) as f:
            for line in f:
                if not line.startswith("#"):
                    cols = line.split()
                    if len(cols) >= 6:
                        steps += 1
                        mv += int(cols[5])
    return dict(prec=prec, tol=tol, precision=precision, wall=wall,
                steps=steps, MV=mv)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    bundle = sys.argv[1]
    grid = [("Columns", 1e-8, "Double"),
            ("Columns", 1e-8, "Mixed"),
            ("BGS", 1e-8, "Double"),
            ("Columns", 1e-6, "Double")]
    print(f"{'prec':>9}{'tol':>9}{'mode':>8}{'wall[s]':>9}"
          f"{'steps':>7}{'MV':>9}")
    for prec, tol, precision in grid:
        r = run_one(bundle, prec, tol, precision)
        print(f"{r['prec']:>9}{r['tol']:>9.0e}{r['precision']:>8}"
              f"{r['wall']:>9.1f}{r['steps']:>7}{r['MV']:>9}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
