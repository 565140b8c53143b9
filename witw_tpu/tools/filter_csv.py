"""CSV row filter by ID list.

Replaces the reference's bash + `look -b` binary-search filter
(reference tools/dataset_building/filter_csv:1-35) with a set lookup.
"""

from __future__ import annotations

import argparse
from typing import Iterable, Set

import pandas as pd


def load_id_set(path: str) -> Set[str]:
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def filter_frame(
    frame: pd.DataFrame, ids: Iterable[str], mode: str = "retain", id_column: str = "id"
) -> pd.DataFrame:
    ids = set(str(i) for i in ids)
    member = frame[id_column].astype(str).isin(ids)
    if mode == "retain":
        return frame[member].reset_index(drop=True)
    if mode == "remove":
        return frame[~member].reset_index(drop=True)
    raise ValueError(mode)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Retain/remove CSV rows by id list")
    parser.add_argument("mode", choices=["retain", "remove"])
    parser.add_argument("--csv", required=True)
    parser.add_argument("--ids", required=True, help="file with one id per line")
    parser.add_argument("--out", required=True)
    parser.add_argument("--id-column", default="id")
    args = parser.parse_args(argv)
    frame = pd.read_csv(args.csv)
    out = filter_frame(frame, load_id_set(args.ids), args.mode, args.id_column)
    out.to_csv(args.out, index=False)
    print(f"{args.mode}: {len(out)}/{len(frame)} rows")


if __name__ == "__main__":
    main()
