"""SpaceNet AOI registry.

The 11 SpaceNet city strips the WITW dataset is built from, with their UTM
EPSG codes, satellite sources and imagery licenses (reference
tools/dataset_building/sitetiles.py:15-80 and
tools/dataset_building/reproject_strips.py:10-36).
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class City:
    index: int
    name: str
    fullname: str
    epsg: int            # UTM zone EPSG for the reprojected strip
    satellite: str       # WorldView-2 / WorldView-3 (per AOI)
    license: str


CITIES: Dict[str, City] = {
    c.name: c
    for c in [
        City(1, "rio", "Rio de Janeiro", 32723, "WV-2", "CC BY-SA 4.0"),
        City(2, "vegas", "Las Vegas", 32611, "WV-3", "CC BY-SA 4.0"),
        City(3, "paris", "Paris", 32631, "WV-3", "CC BY-SA 4.0"),
        City(4, "shanghai", "Shanghai", 32651, "WV-3", "CC BY-SA 4.0"),
        City(5, "khartoum", "Khartoum", 32636, "WV-3", "CC BY-SA 4.0"),
        City(6, "atlanta", "Atlanta", 32616, "WV-2", "CC BY-SA 4.0"),
        City(7, "moscow", "Moscow", 32637, "WV-2", "CC BY-SA 4.0"),
        City(8, "mumbai", "Mumbai", 32643, "WV-2", "CC BY-SA 4.0"),
        City(9, "san", "San Juan", 32619, "WV-2", "CC BY-SA 4.0"),
        City(10, "dar", "Dar es Salaam", 32737, "WV-2", "CC BY-SA 4.0"),
        City(11, "rotterdam", "Rotterdam", 32631, "WV-2", "CC BY-SA 4.0"),
    ]
}

# Strip filename convention used by the tools: {index:02d}_{name}.tif
def strip_filename(name: str) -> str:
    c = CITIES[name]
    return f"{c.index:02d}_{c.name}.tif"


# Test split: Paris is the held-out test city; the other 10 train
# (reference tools/dataset_building/build_dataset:59-63).
TEST_CITIES = ("paris",)
