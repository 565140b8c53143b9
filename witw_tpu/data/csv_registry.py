"""CSV pair registry.

Reads the (surface, overhead) image-path pairs from a dataset CSV honoring
both reference schemas (reference model/cvig_fov.py:54-97): CVUSA headerless
with [overhead, surface] at columns 0/1; WITW 17-column with header, columns
15/16 = [surface, overhead]. Relative paths are resolved against the CSV's
directory (or an explicit base path), like the reference's applymap
relativization (cvig_fov.py:79).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import pandas as pd

from witw_tpu.configs.base import DatasetConfig


def read_pair_paths(
    dataset: DatasetConfig,
    csv_path: str,
    base_path: Optional[str] = None,
) -> List[Tuple[str, str]]:
    """Return [(surface_path, overhead_path), ...] with absolute paths."""
    base = base_path if base_path is not None else os.path.dirname(csv_path)
    frame = pd.read_csv(
        csv_path,
        header=dataset.header,
        names=dataset.path_names,
        usecols=list(dataset.path_columns),
    )

    def absolutize(p: str) -> str:
        if isinstance(p, str) and len(p) > 0 and p[0] != "/":
            return os.path.join(base, p)
        return p

    pairs = []
    for _, row in frame.iterrows():
        surface = absolutize(row["surface"])
        overhead = absolutize(row["overhead"])
        if dataset.semantic:
            # Semantic datasets read .tif siblings of the listed paths
            # (reference cvig_semantic.py:89-90).
            surface = os.path.splitext(surface)[0] + ".tif"
            overhead = os.path.splitext(overhead)[0] + ".tif"
        pairs.append((surface, overhead))
    return pairs
