#!/usr/bin/env python
"""Round 4: the 100k-tile heatmap sweep, measured end-to-end (VERDICT r3 #8).

Drives the REAL tools/heatmap.sweep() at the WITW city-tile config
(BASELINE.json: 225 m tiles, 56.25 m offset, fov=70, 256^2 tiles resampled
from a synthetic 2 m/px UTM strip) over a 316x316 grid = 99,856 tiles, on the
real TPU through the axon tunnel:

  phase A  cold sweep  — tile extraction (native windowed reads + Lanczos) +
           int8 calibration + embed + score + index-cache save
  phase B  warm sweep  — index-cache hit: load + photo embed + score
  phase C  score-only  — one more photo against the loaded index

Run (long; ~20-40 min cold on the 1-core tunnel host):
  PYTHONPATH=$PYTHONPATH:/root/repo python exp/r4_sweep_100k.py [--n-side 316]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-side", type=int, default=316)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--f32-tiles", action="store_true")
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--serial", action="store_true",
                    help="disable the extraction/embed overlap "
                         "(prefetch_tiles=0) for the cold-path A/B")
    ap.add_argument("--cold-only", action="store_true",
                    help="phase A only (for bounded A/B runs)")
    ap.add_argument("--instrument", action="store_true",
                    help="accumulate host-extraction time (windowed reads + "
                         "resample) via wrappers, reported after phase A — "
                         "attributes the cold path's serial/overlap split")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.tools import geotiff as gt
    from witw_tpu.tools.heatmap import sweep, window_grid
    from witw_tpu.train.pipeline import make_pipeline

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="witw_100k_")

    # --- synthetic 2 m/px UTM strip covering an n_side x n_side tile grid ---
    e0, n0 = 500000.0, 4000000.0
    edge, offset = 225.0, 56.25
    extent = args.n_side * offset  # grid extent in meters
    bounds = (e0, n0 - extent, e0 + extent, n0)
    ce, cn, windows = window_grid(bounds, edge, offset)
    n_tiles = len(windows)
    print(f"grid: {n_tiles} tiles over {extent/1000:.1f} km "
          f"({args.n_side}x{args.n_side})", flush=True)

    res = 2.0  # m/px
    pad = edge  # strip must cover window overhang on every side
    px = int((extent + 2 * pad) / res) + 2
    print(f"writing synthetic strip {px}x{px}x3 u8 "
          f"({px*px*3/1e6:.0f} MB)...", flush=True)
    strip = rng.integers(1, 255, size=(px, px, 3), dtype=np.uint8)
    gtf = np.array([e0 - pad, res, 0, n0 + pad, 0, -res])
    sat_path = os.path.join(tmp, "13_city.tif")
    t0 = time.time()
    gt.write_geotiff_u8(sat_path, strip, gtf, 32618, compress=False)
    del strip
    print(f"strip written in {time.time()-t0:.1f}s -> {sat_path}", flush=True)

    photo_path = os.path.join(tmp, "q.jpg")
    Image.fromarray(
        rng.integers(0, 255, (512, 1024, 3), dtype=np.uint8)
    ).save(photo_path)

    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    # materialize params before timing
    np.asarray(jax.tree.leaves(state.params)[0])

    cache = os.path.join(tmp, "index.npz")
    csv_path = os.path.join(tmp, "match.csv")
    common = dict(
        edge=edge, offset=offset, fov=70, state=state, index_cache=cache,
        int8=not args.no_int8, batch_size=args.batch_size, verbose=False,
        tile_dtype="float32" if args.f32_tiles else "uint8",
        prefetch_tiles=0 if args.serial else 2,
    )

    extract_s = [0.0]
    if args.instrument:
        from witw_tpu.tools import geotiff as gt_mod
        from witw_tpu.tools import heatmap as hm_mod

        def timed(fn):
            def wrap(*a, **k):
                t = time.perf_counter()
                out = fn(*a, **k)
                extract_s[0] += time.perf_counter() - t
                return out
            return wrap

        gt_mod.GeoTiff.read_world_window = timed(
            gt_mod.GeoTiff.read_world_window)
        hm_mod.resample = timed(hm_mod.resample)

    print("phase A: cold sweep (extract + calibrate + embed + score + "
          "cache save)...", flush=True)
    t0 = time.time()
    frame = sweep(sat_path, photo_path, csv_path, bounds, **common)
    t_cold = time.time() - t0
    if args.instrument:
        print(f"  host extraction (reads+resample): {extract_s[0]:.1f}s "
              f"of {t_cold:.1f}s", flush=True)
    assert len(frame) == n_tiles
    assert np.all(np.isfinite(frame["score"]))
    print(f"phase A cold: {t_cold:.1f}s "
          f"({n_tiles/t_cold:.0f} tiles/s incl. everything); "
          f"cache {os.path.getsize(cache)/1e9:.2f} GB", flush=True)
    if args.cold_only:
        print(f"SUMMARY n={n_tiles} cold={t_cold:.1f}s "
              f"serial={args.serial}", flush=True)
        return

    print("phase B: warm sweep (cache hit)...", flush=True)
    t0 = time.time()
    frame2 = sweep(sat_path, photo_path, csv_path, bounds, **common)
    t_warm = time.time() - t0
    np.testing.assert_allclose(frame2["score"], frame["score"], rtol=1e-6)
    print(f"phase B warm: {t_warm:.1f}s (load cache + embed photo + score "
          f"{n_tiles} tiles)", flush=True)

    # phase C: score-only against the resident index (per-photo serving cost)
    from witw_tpu.evaluation.index import GalleryIndex

    t0 = time.time()
    index = GalleryIndex.load(cache)
    t_load = time.time() - t0
    import jax.numpy as jnp

    from witw_tpu.ops.image import normalize_images
    q = rng.standard_normal(
        (1, cfg.data.surface_height, cfg.data.surface_width, 3)
    ).astype(np.float32)
    qn = normalize_images(jnp.asarray(q), cfg.data.img_mean, cfg.data.img_std)
    s_emb = np.asarray(
        pipeline.surface_model.apply({"params": state.params["surface"]}, qn)
    )
    d, o = index.score_all(s_emb, gallery_chunk=2048)  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        d, o = index.score_all(s_emb, gallery_chunk=2048)
        times.append(time.time() - t0)
    print(f"phase C: cache load {t_load:.1f}s; score_all over {n_tiles} "
          f"tiles warm: {', '.join(f'{t:.2f}' for t in times)} s", flush=True)

    # phase D: warm top-k search latency against the same resident gallery
    # (the serving daemon's exact-search path; single-dispatch lax.map kernel)
    _ = index.search(s_emb, k=10)  # compile
    t_search = []
    for _ in range(3):
        t0 = time.time()
        _ = index.search(s_emb, k=10)
        t_search.append(time.time() - t0)
    print(f"phase D: search k=10 warm: "
          f"{', '.join(f'{t:.3f}' for t in t_search)} s", flush=True)
    print(f"SUMMARY n={n_tiles} cold={t_cold:.1f}s warm={t_warm:.1f}s "
          f"score_warm={min(times):.2f}s search_warm={min(t_search):.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
