"""Scraper configuration: city bounding boxes + API settings.

YAML-configurable like the reference (reference
tools/download/flickr/config.yaml:1-53, src/config.py:3-22); defaults cover
the 11 SpaceNet cities. Bounding boxes are (min_lon, min_lat, max_lon, max_lat).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

BBox = Tuple[float, float, float, float]

# Approximate SpaceNet AOI bounding boxes (lon/lat).
DEFAULT_CITY_BBOXES: Dict[str, BBox] = {
    "rio": (-43.80, -23.10, -43.10, -22.75),
    "vegas": (-115.38, 36.00, -114.95, 36.35),
    "paris": (2.20, 48.78, 2.48, 48.95),
    "shanghai": (121.20, 31.00, 121.80, 31.45),
    "khartoum": (32.40, 15.45, 32.70, 15.70),
    "atlanta": (-84.55, 33.60, -84.25, 33.90),
    "moscow": (37.40, 55.60, 37.85, 55.90),
    "mumbai": (72.75, 18.85, 73.05, 19.25),
    "san": (-66.20, 18.35, -65.95, 18.50),
    "dar": (39.15, -6.90, 39.40, -6.70),
    "rotterdam": (4.35, 51.85, 4.60, 52.00),
}

# CC + public-domain license ids accepted by the scraper (Flickr license codes).
ALLOWED_LICENSES = ("1", "2", "3", "4", "5", "6", "7", "8", "9", "10")


@dataclasses.dataclass
class ScraperConfig:
    api_key: str = ""
    api_secret: str = ""
    cities: Dict[str, BBox] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_CITY_BBOXES)
    )
    max_per_box: int = 4000       # Flickr caps geo queries ~4000 results
    per_page: int = 250
    licenses: Tuple[str, ...] = ALLOWED_LICENSES
    out_dir: str = "./flickr_out"
    lambda_name: Optional[str] = None  # AWS fan-out (reference :278-342), optional
    bucket: Optional[str] = None
    # Area-guarded bisection + throttling (reference flickr_search.py:85-99:
    # boxes above max_area split without querying; boxes below min_area stop
    # splitting regardless of count; time_delay sleeps between API calls).
    max_area_m2: float = 5.0e8
    min_area_m2: float = 1.0e4
    time_delay: float = 1.0
    # Search filters (reference flickr_search.py:18-21).
    privacy_filter: int = 1   # public only
    content_type: int = 1     # photos only
    geo_context: int = 0      # 0=all, 1=indoor, 2=outdoor

    @classmethod
    def from_yaml(cls, path: str) -> "ScraperConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        cfg = cls()
        for key, val in raw.items():
            if key == "cities":
                cfg.cities = {k: tuple(v) for k, v in val.items()}
            elif hasattr(cfg, key):
                setattr(cfg, key, val)
        return cfg
