"""Build a serving GalleryIndex from a dataset CSV's overhead tiles.

The serving daemon (tools/serve.py) and the programmatic retrieval API
(evaluation/index.py) consume a prebuilt :class:`GalleryIndex`.
``tools/heatmap.py --index-cache`` builds grid indexes from a satellite
strip; this tool builds one from a dataset CSV in either reference schema
(CVUSA headerless / WITW 17-column, reference model/cvig_fov.py:27-51) —
e.g. the CVUSA test gallery — so a trained checkpoint can serve
dataset-style galleries too. The reference has no persistent gallery at all:
its serve path re-embeds every tile on every sweep
(tools/heatmap/heatmap.py:159-168).

Run: ``python -m witw_tpu.tools.build_index --csv test.csv --out gallery.npz
--dataset witw --fov 70 [--int8] [--meta-cols longitude:x,latitude:y]``
(headerless CVUSA CSVs address extra columns by position: ``2:x,3:y``)
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np


def build_index(
    csv_path: str,
    out_path: Optional[str] = None,
    dataset: str = "witw",
    fov: int = 70,
    checkpoint_dir: str = "./weights",
    tag: Optional[str] = None,
    batch_size: int = 64,
    int8: bool = False,
    meta_cols: Optional[Sequence[str]] = None,
    state=None,
    cfg=None,
    verbose: bool = True,
    family: str = "fov",
):
    """Embed every overhead tile listed in ``csv_path`` with the overhead
    tower and persist a GalleryIndex (embeddings + optional CSV metadata
    columns + precision/weights fingerprint) to ``out_path``.

    ``family="safa"`` embeds with the VGG16+SAFA overhead tower into a
    :class:`~witw_tpu.evaluation.vector_index.VectorIndex` (unit vectors,
    Euclidean serving — the daemon's ``--family safa``). ``family="baseline"``
    embeds raw 750^2 tiles with the 7-conv GeM overhead tower
    (cvig_baseline.py:282-283) into a VectorIndex; its f/||f||^0.5
    embeddings are NOT unit vectors, so distances are unbounded and the
    daemon reports a distance-calibrated score (see serve.py).

    ``meta_cols``: CSV column names copied into the index meta; a
    ``"src:dst"`` entry renames on the way in (e.g. ``["lon:x", "lat:y"]``
    lands the coordinates under the ``x``/``y`` keys the serving daemon
    formats into responses). Numeric columns are stored as float64,
    everything else as strings. ``int8`` embeds with the static-int8 towers
    calibrated on a sample spanning the whole gallery (same coverage
    contract as the heatmap sweep)."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from witw_tpu.configs import fov_experiment
    from witw_tpu.data.csv_registry import read_pair_paths
    from witw_tpu.data.loader import decode_image, resize_host
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.train.checkpoint import Checkpointer
    from witw_tpu.train.pipeline import make_pipeline
    from witw_tpu.utils.hashing import params_fingerprint

    if family not in ("fov", "safa", "baseline"):
        raise ValueError(f"unsupported index family {family!r}")
    vector = family in ("safa", "baseline")
    baseline = family == "baseline"
    if cfg is None:
        if baseline:
            from witw_tpu.configs import baseline_experiment

            cfg = baseline_experiment(dataset=dataset)
        elif vector:
            from witw_tpu.configs import safa_experiment

            cfg = safa_experiment(dataset=dataset, fov=fov)
        else:
            cfg = fov_experiment(dataset=dataset, fov=fov)
    d = cfg.data
    pipeline = make_pipeline(cfg)
    if state is None:
        ckpt = Checkpointer(
            os.path.join(checkpoint_dir, tag or f"{family}_{fov}_{dataset}")
        )
        state = ckpt.restore("best", pipeline.init(jax.random.PRNGKey(0)))

    pairs = read_pair_paths(cfg.data.dataset, csv_path)
    overhead_paths = [o for _, o in pairs]
    n = len(overhead_paths)

    # Baseline towers consume raw 750^2 tiles (cli/common.host_geometry;
    # reference cvig_baseline.py uses native tiles, no polar transform and no
    # normalization — the encoder scales to [-1,1] internally).
    if baseline:
        from witw_tpu.cli.common import host_geometry

        tile_size = host_geometry(cfg)[1][0]
    else:
        tile_size = d.overhead_size

    def read_tile(path):
        tile = decode_image(path).astype(np.float32)
        return resize_host(tile[..., : d.channels], tile_size, tile_size)

    def _preprocess(x):
        from witw_tpu.ops.image import normalize_images
        from witw_tpu.ops.polar import polar_transform

        if baseline:
            return x  # raw pixels: the encoder owns its input scaling
        x = normalize_images(x, d.img_mean, d.img_std)
        return polar_transform(x, d.surface_height, d.surface_width_max)

    sq_box = [None]

    @jax.jit
    def embed(params, batch_stats, x):
        from witw_tpu.models.quantize import (
            quantized_baseline_forward_static,
            quantized_fov_forward_static,
            quantized_safa_forward_static,
        )

        polar = _preprocess(x)
        if int8:
            if baseline:
                return quantized_baseline_forward_static(sq_box[0], polar)
            if vector:
                return quantized_safa_forward_static(*sq_box[0], polar, True)
            return quantized_fov_forward_static(sq_box[0], polar, True)
        if baseline:
            return pipeline.overhead_model.apply(
                {"params": params["overhead"],
                 "batch_stats": batch_stats["overhead"]},
                polar, train=False,
            )
        return pipeline.overhead_model.apply({"params": params["overhead"]},
                                             polar)

    sat_frac = None
    calib_tiles = {}
    if int8:
        from witw_tpu.models.quantize import (
            calibrate_overhead_span,
            quantize_baseline_tower_static,
            quantize_safa_tower_static,
        )

        if baseline:
            # folds the eval-mode BN affines, so it needs batch_stats too
            variables = {"params": state.params["overhead"],
                         "batch_stats": state.batch_stats["overhead"]}
            quantize_fn = (
                lambda _p, batches, _c:
                quantize_baseline_tower_static(variables, batches)
            )
        else:
            quantize_fn = quantize_safa_tower_static if vector else None
        # gallery-spanning calibration sample (same coverage contract as the
        # heatmap sweep); sampled tiles are reused in the embed loop
        sq_box[0], calib_tiles = calibrate_overhead_span(
            state.params["overhead"], lambda i: read_tile(overhead_paths[i]),
            n, batch_size, _preprocess,
            quantize_fn=quantize_fn,
        )

    # Decode batches in a producer thread and hold up to 3 un-fetched device
    # results: consecutive batches' upload+embed+fetch legs overlap instead
    # of paying one full round trip per batch (the same bounded-in-flight
    # pipelining as tools/heatmap.sweep — measured 1.9x on that cold path).
    import collections

    from witw_tpu.data.loader import prefetch_iter

    def tile_batches():
        for start in range(0, n, batch_size):
            stop = min(start + batch_size, n)
            buf = np.zeros((batch_size, tile_size, tile_size, d.channels),
                           np.float32)
            for j in range(stop - start):
                tile = calib_tiles.pop(start + j, None)
                buf[j] = (read_tile(overhead_paths[start + j])
                          if tile is None else tile)
            yield stop - start, buf

    parts = []
    pending = collections.deque()
    for real, buf in prefetch_iter(tile_batches(), depth=2):
        if int8 and sat_frac is None:
            from witw_tpu.models.quantize import (
                check_saturation,
                static_int8_saturation_baseline,
                static_int8_saturation_safa,
            )

            sat_frac = check_saturation(
                sq_box[0], _preprocess(jnp.asarray(buf)), True,
                context="gallery",
                saturation_fn=(
                    static_int8_saturation_baseline if baseline
                    else static_int8_saturation_safa if vector
                    else None),
            )
        pending.append(
            (embed(state.params, state.batch_stats, jnp.asarray(buf)), real)
        )
        if len(pending) >= 3:
            emb, r = pending.popleft()
            parts.append(np.asarray(emb)[:r])
    while pending:
        emb, r = pending.popleft()
        parts.append(np.asarray(emb)[:r])
    embeds = np.concatenate(parts)[:n]

    meta = {
        "precision": "int8" if int8 else "f32",
        "family": family,
        "params_sha": params_fingerprint(state.params["overhead"]),
        "path": np.asarray(overhead_paths),
    }
    if sat_frac is not None:
        meta["int8_saturation"] = sat_frac
    if meta_cols:
        frame = pd.read_csv(csv_path, header=cfg.data.dataset.header)
        for spec in meta_cols:
            col, _, dst = spec.partition(":")
            dst = dst or col
            if col not in frame.columns:
                # Headerless schemas (CVUSA) have integer RangeIndex columns:
                # a numeric spec like "2:x" addresses them positionally.
                try:
                    icol = int(col)
                except ValueError:
                    icol = None
                if icol is not None and icol in frame.columns:
                    col = icol
                else:
                    raise ValueError(
                        f"--meta-cols column {col!r} not in CSV "
                        f"(has: {list(frame.columns)}; headerless CSVs use "
                        f"integer positions, e.g. '2:x')"
                    )
            vals = frame[col].to_numpy()
            meta[dst] = (
                vals.astype(np.float64)
                if np.issubdtype(vals.dtype, np.number)
                else vals.astype(str)
            )

    if vector:
        from witw_tpu.evaluation.vector_index import VectorIndex

        index = VectorIndex(embeds, meta=meta)
    else:
        index = GalleryIndex(embeds, meta=meta)
    if out_path:
        index.save(out_path)
        if verbose:
            print(f"embedded {n} tiles -> {out_path}")
    return index


def main(argv=None):
    from witw_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--csv", required=True, help="dataset CSV (either schema)")
    parser.add_argument("--out", required=True, help="output GalleryIndex .npz")
    parser.add_argument("--dataset", default="witw", choices=["cvusa", "witw"])
    parser.add_argument("--fov", type=int, default=70)
    parser.add_argument("--weights", default="./weights")
    parser.add_argument("--tag", default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--int8", action="store_true",
                        help="embed with the static-int8 towers")
    parser.add_argument("--family", choices=("fov", "safa", "baseline"),
                        default="fov",
                        help="tower/index family: fov = FOV-DSM feature-map "
                             "GalleryIndex (default); safa = VGG16+SAFA "
                             "Euclidean VectorIndex; baseline = 7-conv GeM "
                             "towers on raw 750^2 tiles (Euclidean "
                             "VectorIndex; --fov ignored)")
    parser.add_argument("--meta-cols", default=None,
                        help="comma-separated CSV columns to copy into the "
                             "index meta; 'src:dst' renames (e.g. "
                             "lon:x,lat:y for the serving daemon's x/y)")
    args = parser.parse_args(argv)
    build_index(
        args.csv, args.out, dataset=args.dataset, fov=args.fov,
        checkpoint_dir=args.weights, tag=args.tag,
        batch_size=args.batch_size, int8=args.int8,
        meta_cols=args.meta_cols.split(",") if args.meta_cols else None,
        family=args.family,
    )


if __name__ == "__main__":
    main()
