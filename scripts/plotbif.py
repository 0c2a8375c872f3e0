#!/usr/bin/env python
"""Live bifurcation-diagram plot from cdata.txt (analog of the
reference's scripts/plotbif.sh terminal plotting).

Usage: plotbif.py [cdata.txt] [--out bif.png] [--watch]
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cdata", nargs="?", default="cdata.txt")
    ap.add_argument("--out", default=None)
    ap.add_argument("--ycol", type=int, default=6)
    ap.add_argument("--watch", action="store_true",
                    help="re-plot every 10 s")
    args = ap.parse_args()

    from iemic_tpu.post.plotting import plot_bif, read_cdata

    while True:
        dat = read_cdata(args.cdata)
        if dat.size == 0:
            print("no data yet", file=sys.stderr)
        elif args.out:
            plot_bif(args.cdata, ycol=args.ycol, fname=args.out)
            print(f"wrote {args.out} ({dat.shape[0]} points)")
        else:
            # terminal sparkline like the reference's shell plot
            ys = dat[:, args.ycol]
            lo, hi = ys.min(), ys.max()
            span = (hi - lo) or 1.0
            blocks = "▁▂▃▄▅▆▇█"
            line = "".join(blocks[int((y - lo) / span * 7)] for y in ys)
            print(f"par {dat[0, 0]:.3g}..{dat[-1, 0]:.3g}  "
                  f"ψ {lo:.3g}..{hi:.3g}  {line}")
        if not args.watch:
            break
        time.sleep(10)
    return 0


if __name__ == "__main__":
    sys.exit(main())
