#!/usr/bin/env python
"""Coupling-scheme comparison driver (the analog of the reference's
run/couplingschemes/run_comparison.sh): run the same coupled
continuation under solving schemes D / Q / C and preconditioning
schemes D (diagonal) / F / B (block Gauss-Seidel), and tabulate the
Newton (NR) and FGMRES (MV) effort per scheme.

Usage: python scripts/run_comparison.py <bundle_dir> [schemes...]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_one(bundle: str, solving: str, prec: str) -> dict:
    from iemic_tpu.config import read_xml, write_xml
    from iemic_tpu.main import run_coupled

    work = tempfile.mkdtemp(prefix=f"cmp_{solving}{prec}_")
    for f in os.listdir(bundle):
        if f.endswith(".xml"):
            shutil.copy(os.path.join(bundle, f), work)
    cp_path = os.path.join(work, "coupledmodel_params.xml")
    cp = read_xml(cp_path)
    cp.set("Solving scheme", solving)
    cp.set("Preconditioning", prec)
    write_xml(cp, cp_path)

    cwd = os.getcwd()
    try:
        run_coupled.main([work])
    finally:
        os.chdir(cwd)

    nr = mv = steps = 0
    cdata = os.path.join(work, "cdata.txt")
    if os.path.exists(cdata):
        with open(cdata) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                cols = line.split()
                if len(cols) >= 6:
                    steps += 1
                    nr += int(cols[4])
                    mv += int(cols[5])
    return dict(scheme=solving, prec=prec, steps=steps, NR=nr, MV=mv,
                workdir=work)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    bundle = sys.argv[1]
    combos = [("D", "D"), ("Q", "D"), ("C", "D"), ("C", "F"),
              ("C", "B")]
    if len(sys.argv) > 2:
        combos = [(s[0], s[1]) for s in sys.argv[2:]]
    print(f"{'scheme':>7}{'prec':>6}{'steps':>7}{'NR':>7}{'MV':>9}")
    for solving, prec in combos:
        r = run_one(bundle, solving, prec)
        print(f"{r['scheme']:>7}{r['prec']:>6}{r['steps']:>7}"
              f"{r['NR']:>7}{r['MV']:>9}   ({r['workdir']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
