"""End-to-end WITW dataset construction pipeline.

Python orchestrator replacing the reference bash pipeline
(reference tools/dataset_building/build_dataset:1-74). Stages:

1. metadata.json files -> annotated dataset.csv (tiles.build_csv)
2. drop single-band (grayscale) photos           (build_dataset:24-29)
3. drop indoor photos via a pluggable classifier (build_dataset:31-37 uses an
   external Places365 CNN; here any callable(path) -> bool is accepted and the
   stage is skipped when none is given)
4. drop preset photo IDs                          (build_dataset:39-46)
5. clip 225 m overhead tiles per photo            (build_dataset:48-51)
6. drop tiles with > 5% blank pixels              (build_dataset:53-57)
7. train/test split: Paris held out as test city  (build_dataset:59-63)
8. write train.csv / test.csv into the dataset layout (build_dataset:65-74)
"""

from __future__ import annotations

import argparse
import os
import shutil
from typing import Callable, Iterable, Optional

import numpy as np
import pandas as pd

from witw_tpu.tools import tiles
from witw_tpu.tools.convert_8bit import zero_fraction
from witw_tpu.tools.filter_csv import filter_frame
from witw_tpu.tools.geotiff import GeoTiff


def is_single_band(photo_path: str) -> bool:
    """Grayscale check (the reference shells out to `file` and greps
    'components 1', build_dataset:24-29)."""
    try:
        from PIL import Image

        with Image.open(photo_path) as im:
            return len(im.getbands()) == 1
    except Exception:
        return True


def build(
    metadata_root: str,
    photo_dir: str,
    sat_dir: str,
    out_dir: str,
    edge: float = 225.0,
    blank_threshold: float = 0.05,
    remove_ids: Optional[Iterable[str]] = None,
    indoor_classifier: Optional[Callable[[str], bool]] = None,
    verbose: bool = True,
) -> pd.DataFrame:
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "surface"), exist_ok=True)

    def log(msg):
        if verbose:
            print(msg)

    # 1. CSV from metadata
    frame = tiles.build_csv(metadata_root, os.path.join(out_dir, "dataset.csv"))
    log(f"stage 1: {len(frame)} photos from metadata")

    # 2. single-band filter
    def photo_path(row):
        return os.path.join(photo_dir, row["aoi"], f"{row['id']}.jpg")

    keep = [
        os.path.exists(photo_path(row)) and not is_single_band(photo_path(row))
        for _, row in frame.iterrows()
    ]
    frame = frame[np.asarray(keep)].reset_index(drop=True)
    log(f"stage 2: {len(frame)} after single-band/existence filter")

    # 3. indoor filter (pluggable; reference uses Places365)
    if indoor_classifier is not None:
        keep = [not indoor_classifier(photo_path(row)) for _, row in frame.iterrows()]
        frame = frame[np.asarray(keep)].reset_index(drop=True)
        log(f"stage 3: {len(frame)} after indoor filter")

    # 4. preset removals
    if remove_ids:
        frame = filter_frame(frame, remove_ids, mode="remove")
        log(f"stage 4: {len(frame)} after preset removals")

    # 5. tile clipping
    frame = tiles.clip_tiles(frame, sat_dir, out_dir, edge=edge)
    log(f"stage 5: {len(frame)} tiles clipped")

    # 6. blank-tile filter
    keep = []
    for _, row in frame.iterrows():
        with GeoTiff(os.path.join(out_dir, row["overhead_path"])) as tif:
            keep.append(zero_fraction(tif.read()) <= blank_threshold)
    frame = frame[np.asarray(keep)].reset_index(drop=True)
    log(f"stage 6: {len(frame)} after blank filter")

    # copy surface photos into layout
    for _, row in frame.iterrows():
        src = photo_path(row)
        dst = os.path.join(out_dir, row["surface_path"])
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)

    # 7-8. split + write
    train, test = tiles.split_train_test(frame)
    frame.to_csv(os.path.join(out_dir, "dataset.csv"), index=False)
    train.to_csv(os.path.join(out_dir, "train.csv"), index=False)
    test.to_csv(os.path.join(out_dir, "test.csv"), index=False)
    log(f"stage 7-8: {len(train)} train / {len(test)} test rows written")
    return frame


def main(argv=None):
    parser = argparse.ArgumentParser(description="Build the WITW dataset")
    parser.add_argument("--metadata-root", required=True)
    parser.add_argument("--photo-dir", required=True)
    parser.add_argument("--sat-dir", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--edge", type=float, default=225.0)
    parser.add_argument("--blank-threshold", type=float, default=0.05)
    parser.add_argument("--remove-ids", default=None, help="file with ids to drop")
    args = parser.parse_args(argv)
    remove_ids = None
    if args.remove_ids:
        from witw_tpu.tools.filter_csv import load_id_set

        remove_ids = load_id_set(args.remove_ids)
    build(
        args.metadata_root, args.photo_dir, args.sat_dir, args.out_dir,
        edge=args.edge, blank_threshold=args.blank_threshold, remove_ids=remove_ids,
    )


if __name__ == "__main__":
    main()
