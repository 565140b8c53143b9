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


def torch_indoor_classifier(
    checkpoint_path: str,
    io_map_path: str,
    device: str = "cpu",
    input_size: int = 224,
) -> Callable[[str], bool]:
    """Indoor/outdoor classifier from a user-supplied torch scene-classifier
    checkpoint — the reference's Places365 stage (build_dataset:31-37 invokes
    an external run_placesCNN_cut.py over a Places365 CNN).

    ``io_map_path``: text file with one entry per class, 1 = indoor,
    2 = outdoor (the format of the official Places365 ``IO_places365.txt``;
    a bare 0/1 column with 1 = indoor also works). Classification: resize to
    ``input_size``², ImageNet-normalize, argmax class -> indoor flag.
    """
    import torch
    from PIL import Image

    model = torch.load(checkpoint_path, map_location=device, weights_only=False)
    if not hasattr(model, "eval"):
        raise ValueError(
            f"{checkpoint_path} is not a full nn.Module checkpoint"
        )
    model.eval()
    flags = []
    with open(io_map_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            val = int(parts[-1])
            flags.append(val == 1)  # 1 = indoor in IO_places365.txt
    io_flags = np.asarray(flags, bool)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def is_indoor(photo_path: str) -> bool:
        try:
            with Image.open(photo_path) as im:
                img = np.asarray(
                    im.convert("RGB").resize((input_size, input_size)),
                    np.float32,
                )
        except Exception:
            return True  # unreadable photos are dropped
        x = (img / 255.0 - mean) / std
        t = torch.tensor(np.transpose(x, (2, 0, 1))[None], device=device)
        with torch.no_grad():
            logits = model(t)
        cls = int(torch.argmax(logits.reshape(-1)))
        return bool(io_flags[cls]) if cls < len(io_flags) else False

    return is_indoor


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
        direct = os.path.join(photo_dir, row["aoi"], f"{row['id']}.jpg")
        if os.path.exists(direct):
            return direct
        # the downloaders (flickr/uploader.download_local, lambda_handler)
        # save under the URL basename ({id}_{secret}_x.jpg) — the reference
        # resolves photos the same way (build_dataset:65-70 copies
        # $flickr_folder/$aoi/$url_basename to surface/$id.jpg)
        url = str(row.get("url", "") or "")
        if url:
            return os.path.join(photo_dir, row["aoi"], url.rsplit("/", 1)[-1])
        return direct

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
    parser.add_argument(
        "--places-checkpoint", default=None,
        help="torch scene-classifier checkpoint (full nn.Module, e.g. "
             "Places365) for the indoor-photo filter stage",
    )
    parser.add_argument(
        "--places-io-map", default=None,
        help="per-class indoor/outdoor map (IO_places365.txt format; "
             "required with --places-checkpoint)",
    )
    args = parser.parse_args(argv)
    remove_ids = None
    if args.remove_ids:
        from witw_tpu.tools.filter_csv import load_id_set

        remove_ids = load_id_set(args.remove_ids)
    indoor = None
    if args.places_checkpoint:
        if not args.places_io_map:
            parser.error("--places-checkpoint requires --places-io-map")
        indoor = torch_indoor_classifier(args.places_checkpoint, args.places_io_map)
    build(
        args.metadata_root, args.photo_dir, args.sat_dir, args.out_dir,
        edge=args.edge, blank_threshold=args.blank_threshold, remove_ids=remove_ids,
        indoor_classifier=indoor,
    )


if __name__ == "__main__":
    main()
