#!/usr/bin/env python
"""Gather profile_output files from multiple runs into one CSV table
(analog of the reference's scripts/gatherprofile.sh, which converts
profiles to MATLAB-readable form).

Usage: gatherprofile.py <profile_output> [more ...] [--out profiles.csv]
"""

import argparse
import csv
import sys


def parse_profile(path):
    """Parse the label / total / calls / avg table written by
    iemic_tpu.utils.logging.print_profile."""
    rows = []
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith(("#", "-", "=")):
                continue
            parts = line.rsplit(None, 3)
            if len(parts) != 4:
                continue
            label, total, calls, avg = parts
            try:
                rows.append((label.strip(), float(total), int(calls),
                             float(avg)))
            except ValueError:
                continue
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profiles", nargs="+")
    ap.add_argument("--out", default="profiles.csv")
    args = ap.parse_args()

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "label", "total_s", "calls", "avg_s"])
        for path in args.profiles:
            for label, total, calls, avg in parse_profile(path):
                w.writerow([path, label, total, calls, avg])
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
