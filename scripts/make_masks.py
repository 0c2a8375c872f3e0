#!/usr/bin/env python
"""Generate the land-mask data set (the analog of the reference's
data/mkmask/: binary/ascii masks incl. the test masks
test8x8x4/test6x6x4/test6x12x4_* and idealized global/North-Atlantic
masks; reference data/mkmask listing + matlab/create_mask.m).

Masks are written in the ascii mkmask format read by
iemic_tpu.models.ocean.landmask.read_mask_file (topo.F90:41-66).

Usage: python scripts/make_masks.py [outdir]   (default data/mkmask)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from iemic_tpu.post.masks import write_mask_file  # noqa: E402


def flat(n, m, l):
    return np.zeros((l, m, n), dtype=np.int64)


def test_masks(outdir):
    """Small test masks in the spirit of data/mkmask/test8x8x4 etc.:
    variants with a meridional ridge, a coastal shelf and an island,
    used by the topography-continuation tests."""
    # test8x8x4: three variants of an 8x8x4 basin
    n = m = 8
    l = 4
    a = flat(n, m, l)                              # 1: flat basin
    b = a.copy()
    b[0:2, :, n // 2] = 1                          # 2: bottom ridge
    c = b.copy()
    c[:, m // 2, n // 2] = 1                       # 3: ridge + island
    for i, raw in enumerate((a, b, c), 1):
        write_mask_file(os.path.join(outdir, f"test8x8x4_{i}"), raw)

    # test6x6x4: flat + seamount
    n = m = 6
    l = 4
    a = flat(n, m, l)
    b = a.copy()
    b[0, m // 2, n // 2] = 1
    write_mask_file(os.path.join(outdir, "test6x6x4"), a)
    write_mask_file(os.path.join(outdir, "test6x6x4_2"), b)

    # test6x12x4: tall basin, west coastal shelf widening
    n, m, l = 6, 12, 4
    a = flat(n, m, l)
    a[0:1, :, 0] = 1
    b = a.copy()
    b[0:2, :, 0:2] = 1
    write_mask_file(os.path.join(outdir, "test6x12x4_1"), a)
    write_mask_file(os.path.join(outdir, "test6x12x4_2"), b)


def global_mask(outdir, n=96, m=38, l=12):
    """Idealized global mask (the mask_global_<nxmxl> analog): two
    meridional continents (Americas / Africa-Eurasia caricature) on a
    periodic x domain with a circumpolar channel in the south."""
    raw = flat(n, m, l)
    lat = np.linspace(-85.0, 85.0, m)
    for j in range(m):
        if lat[j] < -60.0:
            continue                      # circumpolar channel
        # continent 1: "Americas", slanted strip
        i1 = int((0.22 + 0.08 * np.sin(lat[j] / 60.0)) * n)
        w1 = max(2, int(0.06 * n)) if lat[j] < 55.0 else max(3, n // 12)
        raw[:, j, i1:i1 + w1] = 1
        # continent 2: "Africa-Eurasia", wider strip
        i2 = int(0.58 * n)
        w2 = max(3, int(0.10 * n))
        if lat[j] > -35.0:
            raw[:, j, i2:i2 + w2] = 1
    # polar caps
    raw[:, lat > 78.0, :] = 1
    write_mask_file(os.path.join(outdir, f"mask_global_{n}x{m}x{l}"),
                    raw)


def natl_mask(outdir, n=16, m=16, l=8):
    """Idealized North-Atlantic sector mask (mask_natl16 analog):
    closed basin with western/eastern continental shelves."""
    raw = flat(n, m, l)
    for j in range(m):
        wshelf = max(1, int(1 + j / (m / 2)))
        raw[: max(1, l // 4), j, :wshelf] = 1
        raw[: max(1, l // 4), j, n - 1:] = 1
    write_mask_file(os.path.join(outdir, f"mask_natl{n}"), raw)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "mkmask")
    os.makedirs(outdir, exist_ok=True)
    test_masks(outdir)
    global_mask(outdir, 96, 38, 12)
    global_mask(outdir, 32, 16, 8)
    natl_mask(outdir, 16, 16, 8)
    print(f"masks written to {outdir}")


if __name__ == "__main__":
    main()
