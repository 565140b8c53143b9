"""Blank-fraction check CLI.

Prints the fraction of pixels that are zero in all bands for each raster —
the dataset pipeline's blank-tile filter input (reference
tools/dataset_building/zero_frac.py:1-17, which uses gdalnumeric; this uses
the native reader).
"""

from __future__ import annotations

import argparse

from witw_tpu.tools.convert_8bit import zero_fraction
from witw_tpu.tools.geotiff import GeoTiff


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fraction of all-band-zero pixels")
    parser.add_argument("paths", nargs="+")
    args = parser.parse_args(argv)
    for path in args.paths:
        with GeoTiff(path) as tif:
            print(f"{zero_fraction(tif.read()):.6f} {path}")


if __name__ == "__main__":
    main()
