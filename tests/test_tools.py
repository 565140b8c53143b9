"""Dataset tools: 8-bit conversion, tiling, density, filtering, modify,
heatmap grid, semantic masks, flickr scraper logic (stubbed API)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from witw_tpu.tools import geotiff as gt
from witw_tpu.tools.convert_8bit import (
    band_percentiles,
    convert_to_8bit,
    rescale_to_u8,
    zero_fraction,
)
from witw_tpu.tools.density import haversine_m, limit_density
from witw_tpu.tools.filter_csv import filter_frame
from witw_tpu.tools.modify import center_crop, fov_slice, modify_pair, random_zoom
from witw_tpu.tools.tiles import annotate_frame, clip_tiles, metadata_to_frame, split_train_test
from witw_tpu.tools.heatmap import window_grid
from witw_tpu.tools.semantic_masks import heuristic_road_mask, precompute_masks
from witw_tpu.tools.flickr.config import ScraperConfig
from witw_tpu.tools.flickr.search import partition_bboxes, scrape_city, split_bbox
from witw_tpu.tools.flickr.uploader import download_local, replay_metadata


# ---------------------------------------------------------------- 8-bit


def test_band_percentiles_positive_only(rng):
    band = np.zeros((100, 100))
    band[:50] = rng.uniform(100, 200, (50, 100))
    lo, hi = band_percentiles(band, 2, 98)
    assert 100 <= lo <= 110
    assert 190 <= hi <= 200


def test_rescale_and_zero_fraction(rng):
    img = rng.uniform(0, 2000, (20, 20, 3))
    out = rescale_to_u8(img, rescale="clip", fixed_range=(0, 2000))
    assert out.dtype == np.uint8
    np.testing.assert_allclose(out.astype(float), img / 2000 * 255, atol=1.0)
    img[:10] = 0
    assert zero_fraction(img) == pytest.approx(0.5)


def test_convert_to_8bit_16bit_input(tmp_path, rng):
    from PIL import Image

    # A 4-band 16-bit raster written band-interleaved via our writer path is
    # not possible (u8 writer), so write 16-bit grayscale stack with PIL.
    data = rng.integers(0, 4000, size=(30, 30), dtype=np.uint16)
    src = str(tmp_path / "in.tif")
    Image.fromarray(data).save(src)
    dst = str(tmp_path / "out.tif")
    ok = convert_to_8bit(src, dst, bands=(1, 1, 1))
    assert ok
    with gt.GeoTiff(dst) as tif:
        out = tif.read()
        assert out.dtype == np.uint8
        assert out.shape == (30, 30, 3)


def test_convert_skips_blank(tmp_path, rng):
    from PIL import Image

    data = np.zeros((20, 20), np.uint16)
    data[:2, :2] = 100  # 99% zeros
    src = str(tmp_path / "blank.tif")
    Image.fromarray(data).save(src)
    assert not convert_to_8bit(src, str(tmp_path / "o.tif"), bands=(1, 1, 1))


# ---------------------------------------------------------------- tiles / csv


def _write_metadata(tmp_path, city, records):
    d = tmp_path / city
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "metadata.json", "w") as f:
        json.dump(records, f)
    return str(tmp_path)


def test_metadata_to_annotated_frame(tmp_path):
    root = _write_metadata(
        tmp_path / "meta", "paris",
        [{"id": 1, "owner": "o", "latitude": 48.85, "longitude": 2.35,
          "license": "4", "url_o": "http://x/1.jpg"}],
    )
    frame = metadata_to_frame(os.path.join(root, "paris", "metadata.json"), "paris")
    ann = annotate_frame(frame)
    # surface/overhead paths must land at columns 15/16 — the schema the
    # models read (reference cvig_fov.py:45-50).
    assert list(ann.columns)[15] == "surface_path"
    assert list(ann.columns)[16] == "overhead_path"
    assert ann.iloc[0]["satellite"] == "WorldView-3"
    assert "creativecommons" in ann.iloc[0]["license_url"]


def test_clip_tiles_and_split(tmp_path, rng):
    # Synthetic 600m Paris strip at 0.3 m/px, centered on a known point.
    e, n, epsg = gt.wgs84_to_utm(48.8566, 2.3522)
    strip = rng.integers(1, 255, size=(2000, 2000, 3), dtype=np.uint8)
    gtf = np.array([e - 300, 0.3, 0, n + 300, 0, -0.3])
    sat_dir = tmp_path / "sat"
    sat_dir.mkdir()
    gt.write_geotiff_u8(str(sat_dir / "03_paris.tif"), strip, gtf, epsg)

    frame = annotate_frame(
        pd.DataFrame(
            [
                {"aoi": "paris", "id": "100", "latitude": 48.8566, "longitude": 2.3522},
                {"aoi": "paris", "id": "101", "latitude": 48.8570, "longitude": 2.3530},
                # far outside the strip -> zero tile -> dropped
                {"aoi": "paris", "id": "102", "latitude": 48.90, "longitude": 2.50},
            ]
        )
    )
    out_dir = tmp_path / "out"
    kept = clip_tiles(frame, str(sat_dir), str(out_dir), edge=225.0)
    assert set(kept["id"]) == {"100", "101"}
    with gt.GeoTiff(str(out_dir / kept.iloc[0]["overhead_path"])) as tile:
        assert tile.width == 750  # 225 m / 0.3 m/px
        assert tile.epsg == epsg
    train, test = split_train_test(kept)
    assert len(train) == 0 and len(test) == 2  # paris is the held-out city


# ---------------------------------------------------------------- density / filter


def test_haversine_and_density():
    # ~111 m per 0.001 degree latitude
    d = haversine_m(48.0, 2.0, 48.001, 2.0)
    assert 110 < float(d) < 112.5
    frame = pd.DataFrame(
        {
            "aoi": ["a"] * 3,
            "id": ["1", "2", "3"],
            "latitude": [48.0, 48.0, 48.001],
            "longitude": [2.0, 2.0000001, 2.0],
        }
    )
    out = limit_density(frame, threshold_m=10.0)
    assert len(out) == 2  # the two near-identical points collapse to one


def test_filter_frame():
    frame = pd.DataFrame({"id": ["1", "2", "3"], "x": [1, 2, 3]})
    assert list(filter_frame(frame, ["2"], "retain")["id"]) == ["2"]
    assert list(filter_frame(frame, ["2"], "remove")["id"]) == ["1", "3"]


# ---------------------------------------------------------------- modify


def test_modify_options(rng):
    surface = rng.integers(0, 255, (100, 360, 3), dtype=np.uint8)
    overhead = rng.integers(0, 255, (700, 700, 3), dtype=np.uint8)
    g = np.random.default_rng(0)
    s = fov_slice(surface, g)
    assert s.shape == (100, 70, 3)  # 70/360 * 360
    z = random_zoom(surface, g)
    assert z.shape[0] <= 100 and z.shape[1] <= 90
    c = center_crop(overhead, 550)
    assert c.shape == (550, 550, 3)
    np.testing.assert_array_equal(c, overhead[75:625, 75:625])
    s2, o2 = modify_pair(surface, overhead, [10, 50], g)
    assert s2.shape == (100, 70, 3)
    assert o2.shape == (550, 550, 3)


def test_fov_slice_wraps(rng):
    width = 200
    surface = np.tile(np.arange(width, dtype=np.uint8)[None, :, None], (4, 1, 3))
    g = np.random.default_rng(5)
    for _ in range(20):
        s = fov_slice(surface, g)
        assert s.shape[1] == round(70 / 360 * width)
        cols = s[0, :, 0].astype(int)
        assert np.all(np.diff(cols) % width == 1)  # contiguous modulo wrap


# ---------------------------------------------------------------- heatmap grid


def test_window_grid():
    bounds = (0.0, 0.0, 450.0, 450.0)
    ce, cn, windows = window_grid(bounds, edge=225.0, offset=112.5)
    assert len(windows) == len(ce) == len(cn)
    # grid spans the bounds with half-edge margins
    assert len(ce) == 16
    ulx, uly, lrx, lry = windows[0]
    assert lrx - ulx == 225.0 and uly - lry == 225.0


# ---------------------------------------------------------------- semantic masks


def test_semantic_mask_precompute(tmp_path, rng):
    overhead_dir = tmp_path / "overhead"
    overhead_dir.mkdir()
    tile = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    gt.write_geotiff_u8(str(overhead_dir / "t.tif"), tile)
    n = precompute_masks(str(overhead_dir), verbose=False)
    assert n == 1
    out_path = tmp_path / "cresi_uint8" / "t.tif"
    with gt.GeoTiff(str(out_path)) as tif:
        out = tif.read()
        assert out.shape == (64, 64, 4)
        np.testing.assert_array_equal(out[..., :3], tile)
    mask = heuristic_road_mask(tile.astype(np.float32))
    assert mask.shape == (64, 64)
    assert 0 <= mask.min() and mask.max() <= 1


# ---------------------------------------------------------------- flickr (stubbed)


def make_stub_api(photos_by_region):
    """Stub: photos_by_region maps bbox-inclusion to synthetic photos with
    lat/lon; the stub filters by the requested bbox."""

    def api(params, key, retries=3):
        bbox = tuple(float(v) for v in params["bbox"].split(","))
        hits = [
            p for p in photos_by_region
            if bbox[0] <= p["longitude"] <= bbox[2] and bbox[1] <= p["latitude"] <= bbox[3]
        ]
        per_page = int(params.get("per_page", 250))
        page = int(params.get("page", 1))
        start = (page - 1) * per_page
        return {
            "stat": "ok",
            "photos": {
                "total": len(hits),
                "pages": max(1, -(-len(hits) // per_page)),
                "photo": hits[start : start + per_page],
            },
        }

    return api


def test_flickr_partition_and_scrape(tmp_path, rng):
    photos = [
        {"id": str(i), "latitude": float(rng.uniform(48.8, 48.9)),
         "longitude": float(rng.uniform(2.2, 2.4)), "url_o": f"http://x/{i}.jpg"}
        for i in range(50)
    ]
    # duplicate one id across regions to exercise dedup
    photos.append(dict(photos[0]))
    api = make_stub_api(photos)
    cfg = ScraperConfig(out_dir=str(tmp_path), max_per_box=20, time_delay=0.0,
                        cities={"paris": (2.2, 48.8, 2.4, 48.9)})
    boxes = partition_bboxes(cfg.cities["paris"], cfg, api)
    assert len(boxes) >= 3  # 50 photos / cap 20 forces splits
    records = scrape_city("paris", cfg, api)
    assert len(records) == 50  # deduped
    assert os.path.exists(tmp_path / "paris" / "metadata.json")
    urls = open(tmp_path / "paris" / "urls").read().splitlines()
    assert len(urls) == 50


def test_flickr_scrape_resume_after_kill(tmp_path, rng):
    """Kill a scrape mid-city, re-run, and converge to the same deduped set
    as an uninterrupted run (VERDICT r2 missing #2; reference
    metadata.py:70-137 cross-run merge). Also: previously saved records are
    merged, not overwritten, and on_photo fires only for NEW photos."""
    from witw_tpu.tools.flickr.search import get_known_urls, read_metadata

    photos = [
        {"id": str(i), "latitude": float(rng.uniform(48.8, 48.9)),
         "longitude": float(rng.uniform(2.2, 2.4)), "url_o": f"http://x/{i}.jpg"}
        for i in range(50)
    ]
    full_api = make_stub_api(photos)
    cfg = ScraperConfig(out_dir=str(tmp_path), max_per_box=20, time_delay=0.0,
                        cities={"paris": (2.2, 48.8, 2.4, 48.9)})

    # uninterrupted reference run in a separate dir
    cfg_ref = ScraperConfig(out_dir=str(tmp_path / "ref"), max_per_box=20,
                            time_delay=0.0, cities=cfg.cities)
    want = {r["id"] for r in scrape_city("paris", cfg_ref, full_api)}

    # run 1: the API dies during the SECOND box's collection (partitioning
    # and the first box complete, so one snapshot lands on disk)
    calls = {"n": 0}

    def dying_api(params, key, retries=3):
        if "extras" in params:  # collect_photos call (not a count query)
            calls["n"] += 1
            if calls["n"] > 1:
                raise RuntimeError("killed mid-city")
        return full_api(params, key, retries)

    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        scrape_city("paris", cfg, dying_api)
    partial = read_metadata(str(tmp_path / "paris"))
    assert 0 < len(partial) < 50  # some boxes snapshotted before the kill

    # run 2: resumes, merges, converges; on_photo only sees new photos
    new_ids = []
    records = scrape_city("paris", cfg, full_api,
                          on_photo=lambda p: new_ids.append(p["id"]))
    assert {r["id"] for r in records} == want
    assert set(new_ids).isdisjoint({r["id"] for r in partial})
    assert len(new_ids) == 50 - len(partial)
    # on-disk snapshot matches, urls regenerated from the merged set
    assert {r["id"] for r in read_metadata(str(tmp_path / "paris"))} == want
    assert len(get_known_urls(str(tmp_path / "paris"))) == 50

    # run 3: nothing new — stable fixed point
    records3 = scrape_city("paris", cfg, full_api,
                           on_photo=lambda p: new_ids.append(p["id"]))
    assert {r["id"] for r in records3} == want
    assert len(new_ids) == 50 - len(partial)  # no new on_photo fires


def test_split_bbox_long_axis():
    a, b = split_bbox((0, 0, 10, 2))
    assert a[2] == 5 and b[0] == 5
    a, b = split_bbox((0, 0, 2, 10))
    assert a[3] == 5 and b[1] == 5


def test_download_local_and_replay(tmp_path):
    def fetch(url):
        if "bad" in url:
            raise IOError("404")
        return b"data-" + url.encode()

    ok, failed = download_local(
        [("http://x/a.jpg", "paris"), ("http://x/bad.jpg", "paris")],
        str(tmp_path / "dl"), n_workers=2, fetch=fetch,
    )
    assert len(ok) == 1 and len(failed) == 1
    assert (tmp_path / "dl" / "paris" / "a.jpg").read_bytes() == b"data-http://x/a.jpg"

    root = tmp_path / "meta"
    (root / "paris").mkdir(parents=True)
    with open(root / "paris" / "metadata.json", "w") as f:
        json.dump([{"id": "1", "url_o": "http://x/a.jpg"}], f)
    n_ok, n_fail = replay_metadata(
        str(root), out_dir=str(tmp_path / "dl2"),
        failures_path=str(tmp_path / "failed.txt"), fetch=fetch,
    )
    assert (n_ok, n_fail) == (1, 0)


def test_bbox_area_guards():
    """Area guards: oversized boxes split without counting; undersized boxes
    never split (reference flickr_search.py:85-99)."""
    from witw_tpu.tools.flickr.search import est_area_m2, partition_bboxes

    # Paris-ish box ~ (0.2 deg x 0.1 deg) ~ 160 km^2
    box = (2.2, 48.8, 2.4, 48.9)
    assert 1.0e8 < est_area_m2(box) < 3.0e8

    calls = []

    def api(params, key, retries=3):
        calls.append(params["bbox"])
        return {"stat": "ok", "photos": {"total": 10_000, "pages": 1, "photo": []}}

    # max_area below the box area forces one split before any API call.
    cfg = ScraperConfig(max_per_box=100, time_delay=0.0, max_area_m2=1.0e8,
                        min_area_m2=9.0e7)
    boxes = partition_bboxes(box, cfg, api)
    # children are at/below min_area -> kept despite total >= cap
    assert len(boxes) == 2
    assert len(calls) == 2  # never counted the oversized parent


def test_torch_checkpoint_mask_parity(tmp_path, rng):
    """A torch segmentation checkpoint run through the tool reproduces the
    reference augment.py math (input/255 -> model -> sigmoid -> min-max ->
    *255 -> uint8 truncation) exactly."""
    torch = pytest.importorskip("torch")

    from witw_tpu.tools.geotiff import write_geotiff_u8, GeoTiff
    from witw_tpu.tools.semantic_masks import precompute_masks, torch_segmenter

    model = torch.nn.Conv2d(3, 1, 3, padding=1)
    torch.manual_seed(0)
    with torch.no_grad():
        model.weight.normal_(0, 0.5)
        model.bias.zero_()
    ckpt = str(tmp_path / "seg.pth")
    torch.save(model, ckpt)

    overhead_dir = tmp_path / "overhead"
    overhead_dir.mkdir()
    tiles = {}
    for i in range(2):
        tile = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        write_geotiff_u8(str(overhead_dir / f"t{i}.tif"), tile)
        tiles[f"t{i}"] = tile

    n = precompute_masks(
        str(overhead_dir), segmenter=torch_segmenter(ckpt), minmax=True,
        verbose=False,
    )
    assert n == 2

    out_dir = tmp_path / "cresi_uint8"
    for name, tile in tiles.items():
        with GeoTiff(str(out_dir / f"{name}.tif")) as tif:
            got = tif.read()
        assert got.shape == (16, 16, 4)
        np.testing.assert_array_equal(got[..., :3], tile)
        # transcribed reference math (augment.py:72-85)
        x = torch.tensor(tile.transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
        with torch.no_grad():
            pred = torch.sigmoid(model(x)).squeeze()
        pred = (pred - pred.min()) / (pred.max() - pred.min())
        want = (pred * 255).to(torch.uint8).numpy()
        np.testing.assert_array_equal(got[..., 3], want)


def test_torch_segmenter_rejects_state_dict(tmp_path):
    torch = pytest.importorskip("torch")
    from witw_tpu.tools.semantic_masks import torch_segmenter

    ckpt = str(tmp_path / "sd.pth")
    torch.save(torch.nn.Conv2d(3, 1, 3).state_dict(), ckpt)
    with pytest.raises(ValueError):
        torch_segmenter(ckpt)


def test_torch_indoor_classifier(tmp_path, rng):
    """Places365-style indoor filter: user torch checkpoint + IO map."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    from witw_tpu.tools.build_dataset import torch_indoor_classifier

    # 4-class "scene classifier" whose logits are monotone in brightness:
    # class 0 wins on dark inputs, class 3 on bright ones
    model = torch.nn.Sequential(
        torch.nn.AdaptiveAvgPool2d(1), torch.nn.Flatten(), torch.nn.Linear(3, 4)
    )
    with torch.no_grad():
        model[2].weight.copy_(torch.tensor(
            [[-1.0] * 3, [-0.33] * 3, [0.33] * 3, [1.0] * 3]))
        model[2].bias.zero_()
    ckpt = str(tmp_path / "places.pth")
    torch.save(model, ckpt)
    io_map = tmp_path / "io.txt"
    io_map.write_text("a 1\nb 1\nc 2\nd 2\n")  # classes 0,1 indoor; 2,3 outdoor

    dark = tmp_path / "dark.jpg"
    bright = tmp_path / "bright.jpg"
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(dark)
    Image.fromarray(np.full((64, 64, 3), 255, np.uint8)).save(bright)

    is_indoor = torch_indoor_classifier(ckpt, str(io_map))
    # dark image -> mean ~ -2 -> class 0 (indoor); bright -> ~ +2 -> class 3
    assert is_indoor(str(dark)) is True
    assert is_indoor(str(bright)) is False
    # unreadable file -> treated as indoor (dropped)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"nope")
    assert is_indoor(str(bad)) is True


def test_heatmap_cache_staleness_predicate():
    """An embedding cache is stale when the tile grid or the towers'
    precision changed, and a missing 'x' meta never crashes the check
    (review findings, round 2)."""
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.heatmap import _cache_is_stale

    emb = np.zeros((4, 1, 2, 8), np.float32)
    xs = np.arange(4.0)
    idx = GalleryIndex(emb, meta={"x": xs, "precision": "f32",
                                  "params_sha": "abc"})
    assert not _cache_is_stale(idx, 4, xs, "f32")
    assert not _cache_is_stale(idx, 4, xs, "f32", "abc")
    assert _cache_is_stale(idx, 5, np.arange(5.0), "f32")   # grid size
    assert _cache_is_stale(idx, 4, xs + 1.0, "f32")         # grid centers
    assert _cache_is_stale(idx, 4, xs, "int8")              # precision
    assert _cache_is_stale(idx, 4, xs, "f32", "OTHER")      # weights changed
    # family: unstamped caches default to fov; a safa sweep must rebuild them
    assert _cache_is_stale(idx, 4, xs, "f32", family="safa")
    assert not _cache_is_stale(idx, 4, xs, "f32", family="fov")
    bare = GalleryIndex(emb)                                # no meta at all
    assert _cache_is_stale(bare, 4, xs, "f32")
    assert _cache_is_stale(bare, 4, xs, "f32", "abc")       # no recorded sha


def test_params_fingerprint_sensitivity():
    """The weights fingerprint changes on any leaf perturbation and is
    order-stable/deterministic."""
    from witw_tpu.utils.hashing import params_fingerprint

    params = {"a": {"kernel": np.arange(12.0).reshape(3, 4), "bias": np.zeros(4)},
              "b": {"kernel": np.ones((2, 2))}}
    h1 = params_fingerprint(params)
    assert h1 == params_fingerprint(params)  # deterministic
    import copy

    p2 = copy.deepcopy(params)
    p2["a"]["kernel"][0, 0] += 1e-7
    assert params_fingerprint(p2) != h1
    # dtype and shape both participate
    p3 = copy.deepcopy(params)
    p3["b"]["kernel"] = p3["b"]["kernel"].astype(np.float32)
    assert params_fingerprint(p3) != h1


def test_static_int8_saturation_guard(rng):
    """static_int8_saturation is ~0 on the calibration data itself and large
    on inputs far outside the calibrated range (VERDICT r2 weak #4)."""
    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.models.quantize import (
        quantize_tower_static,
        static_int8_saturation,
    )
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="cvusa", fov=360)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    sq = quantize_tower_static(
        jax.tree.map(np.asarray, state.params)["surface"], [x], False)
    on_calib = static_int8_saturation(sq, x, False)
    on_hot = static_int8_saturation(sq, 10.0 * x, False)
    assert on_calib < 1e-3
    assert on_hot > 0.02  # measured ~0.048: clipping re-normalizes downstream
    assert on_hot > on_calib * 10

    # first_conv_bf16 towers must report their conv1_1 clip too — the
    # bf16_conv epilogue clips at +127 outside requant(), and that rail was
    # previously invisible to the guard.
    sq_bf = quantize_tower_static(
        jax.tree.map(np.asarray, state.params)["surface"], [x], False,
        first_conv_bf16=True)
    bf_hot = static_int8_saturation(sq_bf, 10.0 * x, False)
    assert bf_hot > 0.02
    assert static_int8_saturation(sq_bf, x, False) < 1e-3


def test_build_index_from_dataset_csv(tmp_path):
    """tools/build_index embeds a dataset CSV's overhead tiles into a
    serving GalleryIndex: embeddings match a manual overhead-tower pass,
    metadata columns round-trip, and the saved index answers searches."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from witw_tpu.configs import fov_experiment
    from witw_tpu.data import write_synthetic_dataset
    from witw_tpu.data.csv_registry import read_pair_paths
    from witw_tpu.data.loader import decode_image, resize_host
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.ops.image import normalize_images
    from witw_tpu.ops.polar import polar_transform
    from witw_tpu.tools.build_index import build_index
    from witw_tpu.train.pipeline import make_pipeline

    csv_path = write_synthetic_dataset(
        str(tmp_path / "data"), n=5, schema="witw",
        surface_hw=(32, 64), overhead_hw=(32, 32),
    )
    cfg = fov_experiment(dataset="witw", fov=70)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=64,
            overhead_size=32),
        # f32 compute so the batched tool pass and the one-shot manual pass
        # agree to tolerance (bf16 rounding is batch-layout dependent)
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    out = str(tmp_path / "gallery.npz")
    index = build_index(
        csv_path, out, dataset="witw", fov=70, batch_size=2,
        meta_cols=["overhead_path", "col0:x"], state=state, cfg=cfg,
        verbose=False,
    )
    assert len(index) == 5

    # embeddings match a manual overhead-tower pass over the same tiles
    pairs = read_pair_paths(cfg.data.dataset, csv_path)
    tiles = np.stack([
        resize_host(decode_image(o).astype(np.float32), 32, 32)
        for _, o in pairs
    ])
    polar = polar_transform(
        normalize_images(jnp.asarray(tiles), cfg.data.img_mean,
                         cfg.data.img_std), 32, 64)
    want = np.asarray(pipeline.overhead_model.apply(
        {"params": state.params["overhead"]}, polar))
    np.testing.assert_allclose(index.embeds, want, rtol=1e-5, atol=1e-5)

    # persisted meta: precision, weights fingerprint, paths, CSV column
    loaded = GalleryIndex.load(out)
    assert str(loaded.meta["precision"]) == "f32"
    assert len(str(loaded.meta["params_sha"])) == 64
    assert loaded.meta["path"].shape == (5,)
    assert all("overhead/" in p for p in loaded.meta["overhead_path"])
    # 'src:dst' rename: col0 (empty -> NaN float) lands under serving's 'x'
    assert "x" in loaded.meta and loaded.meta["x"].shape == (5,)

    # the saved index serves top-k queries
    q = np.asarray(pipeline.surface_model.apply(
        {"params": state.params["surface"]},
        normalize_images(
            jnp.asarray(np.stack([
                resize_host(decode_image(s).astype(np.float32), 32, 64)
                for s, _ in pairs[:2]
            ])), cfg.data.img_mean, cfg.data.img_std),
    ))
    idx, dist, orient = loaded.search(q, k=3)
    assert idx.shape == (2, 3) and np.all(np.isfinite(dist))

    # unknown meta column is rejected, not silently dropped
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build_index(csv_path, None, state=state, cfg=cfg,
                    meta_cols=["nope"], verbose=False, batch_size=2)


def test_build_index_baseline_family(tmp_path):
    """--family baseline: raw 750^2 tiles through the 7-conv GeM overhead
    tower (batch_stats-aware, no polar/normalization) into a VectorIndex;
    embeddings match a manual eval-mode tower pass and the saved index
    serves Euclidean top-k."""
    import jax
    import jax.numpy as jnp

    from witw_tpu.configs import baseline_experiment
    from witw_tpu.data import write_synthetic_dataset
    from witw_tpu.data.csv_registry import read_pair_paths
    from witw_tpu.data.loader import decode_image, resize_host
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.tools.build_index import build_index
    from witw_tpu.train.pipeline import make_pipeline

    csv_path = write_synthetic_dataset(
        str(tmp_path / "data"), n=3, schema="witw",
        surface_hw=(32, 64), overhead_hw=(32, 32),
    )
    import dataclasses

    cfg = baseline_experiment(dataset="witw")
    # f32 compute so the batched tool pass and the one-shot manual pass agree
    # to tolerance (bf16 rounding is batch-layout dependent, like the fov
    # build_index test above)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    out = str(tmp_path / "base.npz")
    index = build_index(
        csv_path, out, dataset="witw", batch_size=2, state=state, cfg=cfg,
        verbose=False, family="baseline",
    )
    assert index.embeds.shape == (3, 1536)

    pairs = read_pair_paths(cfg.data.dataset, csv_path)
    tiles = np.stack([
        resize_host(decode_image(o).astype(np.float32), 750, 750)
        for _, o in pairs
    ])
    want = np.asarray(pipeline.overhead_model.apply(
        {"params": state.params["overhead"],
         "batch_stats": state.batch_stats["overhead"]},
        jnp.asarray(tiles), train=False))
    np.testing.assert_allclose(index.embeds, want, rtol=1e-4, atol=1e-4)

    loaded = VectorIndex.load(out)
    assert str(loaded.meta["family"]) == "baseline"
    assert str(loaded.meta["precision"]) == "f32"
    idx, dist = loaded.search(index.embeds[:2], k=2)
    assert np.array_equal(idx[:, 0], [0, 1])  # self-match at distance ~0


def test_build_index_headerless_integer_meta_cols(tmp_path):
    """Headerless (CVUSA-schema) CSVs have integer RangeIndex columns: a
    numeric --meta-cols spec like '2:x' addresses them positionally (named
    specs can never match and must fail with the positional hint)."""
    import dataclasses

    import jax
    import pytest as _pytest

    from witw_tpu.configs import fov_experiment
    from witw_tpu.data import write_synthetic_dataset
    from witw_tpu.tools.build_index import build_index
    from witw_tpu.train.pipeline import make_pipeline

    csv_path = write_synthetic_dataset(
        str(tmp_path / "data"), n=4, schema="cvusa",
        surface_hw=(32, 64), overhead_hw=(32, 32),
    )
    # append a numeric coordinate column (position 2) to the headerless CSV
    with open(csv_path) as f:
        lines = f.read().splitlines()
    with open(csv_path, "w") as f:
        for i, line in enumerate(lines):
            f.write(f"{line},{100.0 + i}\n")

    cfg = fov_experiment(dataset="cvusa", fov=70)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=64,
            overhead_size=32),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    index = build_index(
        csv_path, None, dataset="cvusa", batch_size=2,
        meta_cols=["2:x"], state=state, cfg=cfg, verbose=False,
    )
    np.testing.assert_allclose(index.meta["x"], 100.0 + np.arange(4))

    # named specs cannot match a RangeIndex; the error teaches the fix
    with _pytest.raises(ValueError, match="integer positions"):
        build_index(csv_path, None, dataset="cvusa", batch_size=2,
                    meta_cols=["lon:x"], state=state, cfg=cfg, verbose=False)


def test_reference_yaml_config_compat(tmp_path):
    """ScraperConfig.from_yaml loads the REFERENCE config.yaml shape: cities
    as a list of {name: 'NN_code', bounding_boxes: [[...]]} entries and the
    reference key names (density_limit/page_size/min_area/max_area)."""
    from witw_tpu.tools.flickr.config import ScraperConfig

    p = tmp_path / "ref.yaml"
    p.write_text(
        "url_field: \"url_m\"\n"
        "page_size: 100\n"
        "density_limit: 4000\n"
        "min_area: 1\n"
        "max_area: 2000000\n"
        "time_delay: 2\n"
        "refresh_metadata: False\n"
        "cities:\n"
        "  - name: \"03_paris\"\n"
        "    bounding_boxes: [[2.1109464,48.4492509,2.3131089,49.0767795]]\n"
        "    download: \"both\"\n"
        "    download_limit: -1\n"
        "  - name: \"09_san\"\n"
        "    bounding_boxes: [[-66.0202785,18.3164733,-65.8945476,18.510336]]\n"
        "    download: \"both\"\n"
        "    download_limit: -1\n"
    )
    cfg = ScraperConfig.from_yaml(str(p))
    assert cfg.per_page == 100
    assert cfg.max_per_box == 4000
    assert cfg.min_area_m2 == 1 and cfg.max_area_m2 == 2000000
    assert cfg.time_delay == 2
    assert cfg.url_field == "url_m"
    assert set(cfg.cities) == {"paris", "san"}
    assert cfg.cities["paris"][0] == 2.1109464


def test_photo_url_fallback_chain():
    from witw_tpu.tools.flickr.search import photo_url

    assert photo_url({"url_o": "O", "url_m": "M"}) == "O"
    assert photo_url({"url_m": "M"}) == "M"  # url_o absent for most photos
    assert photo_url({"url_o": "O", "url_m": "M"}, prefer="url_m") == "M"
    assert photo_url({"url": "legacy"}) == "legacy"
    assert photo_url({}) == ""


def test_api_key_secret_file_precedence(tmp_path, monkeypatch):
    """Credential chain: CLI flag > FLICKR_API_KEY > FLICKR_API_KEY_FILE >
    docker secret (reference mounts flickr_api_key as a compose secret,
    tools/download/docker-compose.yaml:11-21 + secrets.py get_secret)."""
    from witw_tpu.tools.flickr.search import read_secret_file, resolve_api_key

    secret_root = tmp_path / "run_secrets"
    secret_root.mkdir()
    (secret_root / "flickr_api_key").write_text("docker-secret-key\n")
    key_file = tmp_path / "keyfile"
    key_file.write_text("file-key\n")

    monkeypatch.delenv("FLICKR_API_KEY", raising=False)
    monkeypatch.delenv("FLICKR_API_KEY_FILE", raising=False)
    # docker secret is the last resort
    assert resolve_api_key(secret_root=str(secret_root)) == "docker-secret-key"
    # FLICKR_API_KEY_FILE beats the docker secret
    monkeypatch.setenv("FLICKR_API_KEY_FILE", str(key_file))
    assert resolve_api_key(secret_root=str(secret_root)) == "file-key"
    # env var beats the file
    monkeypatch.setenv("FLICKR_API_KEY", "env-key")
    assert resolve_api_key(secret_root=str(secret_root)) == "env-key"
    # explicit CLI value beats everything
    assert resolve_api_key("cli-key", secret_root=str(secret_root)) == "cli-key"
    # absent files resolve to "" (fall-through), never raise
    assert read_secret_file(str(tmp_path / "missing")) == ""
    monkeypatch.delenv("FLICKR_API_KEY", raising=False)
    monkeypatch.delenv("FLICKR_API_KEY_FILE", raising=False)
    assert resolve_api_key(secret_root=str(tmp_path / "nope")) == ""
    # a typo'd FLICKR_API_KEY_FILE warns and FALLS THROUGH to the docker
    # secret rather than silently disabling credentials
    monkeypatch.setenv("FLICKR_API_KEY_FILE", str(tmp_path / "typo"))
    assert resolve_api_key(secret_root=str(secret_root)) == "docker-secret-key"
    # docker-secret semantics: first line only, stripped — a multi-line
    # secret file must not leak embedded newlines into the api_key param
    multiline = tmp_path / "multiline"
    multiline.write_text("top-line-key\ntrailing junk\n")
    assert read_secret_file(str(multiline)) == "top-line-key"


def test_rescale_reference_semantics(rng):
    """clip spans the full 16-bit range (reference create_8bit_images.py:
    126-127), every mode floors lo at 1 (:136), and the reference's fixed
    SN3 per-band tables drive 'dict' via convert_to_8bit(table=...)."""
    from witw_tpu.tools.convert_8bit import RESCALE_TABLES, rescale_to_u8

    img = np.zeros((2, 2, 1), np.uint16)
    img[0, 0, 0] = 65535
    img[0, 1, 0] = 2000
    out = rescale_to_u8(img, rescale="clip")
    assert out[0, 0, 0] == 255
    assert out[0, 1, 0] == round((2000 - 1) / (65535 - 1) * 255)  # ~8, not 255

    # dict mode requires explicit ranges (no silent fallback stretch)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="per_band_ranges"):
        rescale_to_u8(img, rescale="dict")
    out = rescale_to_u8(img, rescale="dict",
                        per_band_ranges={0: RESCALE_TABLES["tot_8band"][5]})
    lo, hi = RESCALE_TABLES["tot_8band"][5]
    assert out[0, 0, 0] == 255 and out[1, 1, 0] == 0


def test_modify_option_20_overrides_10(rng):
    """Reference crops options 10 and 20 BOTH from the original extended
    panorama (modify.py:61-84): together, 20's crop is at the full-panorama
    angular scale, not a crop of 10's 70-degree slice."""
    from witw_tpu.tools.modify import modify_pair

    w = 720
    surface = rng.integers(0, 255, (180, w, 3), dtype=np.uint8)
    overhead = rng.integers(0, 255, (600, 600, 3), dtype=np.uint8)
    out, _ = modify_pair(surface, overhead, (10, 20), np.random.default_rng(0))
    # 30-60 degree FOV of the FULL panorama; a crop of the 70-degree slice
    # would be 5.8-11.7 degrees (12-23 px)
    min_w = round(30 / 360 * w * 0.5)   # x aspect-model width factor >= 0.5
    assert out.shape[1] >= min_w, out.shape


def test_aoi_band_orders_match_reference():
    """Band table parity with convert_strips.py: PS-MS AOIs (incl. moscow/
    mumbai/san/dar) use [5,3,2]; atlanta/rotterdam [3,2,1]; rio is never
    converted (pre-processed RGB)."""
    from witw_tpu.tools.convert_8bit import BAND_ORDERS, DEFAULT_AOI_BANDS

    assert DEFAULT_AOI_BANDS["rio"] is None
    for c in ("vegas", "paris", "shanghai", "khartoum",
              "moscow", "mumbai", "san", "dar"):
        assert BAND_ORDERS[DEFAULT_AOI_BANDS[c]] == (5, 3, 2), c
    for c in ("atlanta", "rotterdam"):
        assert BAND_ORDERS[DEFAULT_AOI_BANDS[c]] == (3, 2, 1), c
    # registry parity: San Juan is zone 20N; WV-3 for AOIs 2-5 and 7-10
    from witw_tpu.tools.cities import CITIES

    assert CITIES["san"].epsg == 32620
    for c in ("moscow", "mumbai", "san", "dar"):
        assert CITIES[c].satellite == "WorldView-3"


def test_build_index_safa_family(tmp_path):
    """--family safa builds a VectorIndex: embeddings match a manual
    VGG16+SAFA overhead-tower pass (unit vectors), the family is stamped in
    the meta, and the saved index answers Euclidean top-k searches."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from witw_tpu.configs import safa_experiment
    from witw_tpu.data import write_synthetic_dataset
    from witw_tpu.data.csv_registry import read_pair_paths
    from witw_tpu.data.loader import decode_image, resize_host
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.ops.image import normalize_images
    from witw_tpu.ops.polar import polar_transform
    from witw_tpu.tools.build_index import build_index
    from witw_tpu.train.pipeline import make_pipeline

    csv_path = write_synthetic_dataset(
        str(tmp_path / "data"), n=5, schema="witw",
        surface_hw=(32, 64), overhead_hw=(32, 32),
    )
    cfg = safa_experiment(dataset="witw", fov=360)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=64,
            overhead_size=32),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    out = str(tmp_path / "gallery_safa.npz")
    index = build_index(
        csv_path, out, dataset="witw", fov=360, batch_size=2,
        state=state, cfg=cfg, verbose=False, family="safa",
    )
    assert len(index) == 5 and index.embeds.ndim == 2

    pairs = read_pair_paths(cfg.data.dataset, csv_path)
    tiles = np.stack([
        resize_host(decode_image(o).astype(np.float32), 32, 32)
        for _, o in pairs
    ])
    polar = polar_transform(
        normalize_images(jnp.asarray(tiles), cfg.data.img_mean,
                         cfg.data.img_std), 32, 64)
    want = np.asarray(pipeline.overhead_model.apply(
        {"params": state.params["overhead"]}, polar))
    np.testing.assert_allclose(index.embeds, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(index.embeds, axis=1), 1.0, rtol=1e-5)

    loaded = VectorIndex.load(out)
    assert str(loaded.meta["family"]) == "safa"
    assert str(loaded.meta["precision"]) == "f32"

    q = np.asarray(pipeline.surface_model.apply(
        {"params": state.params["surface"]},
        normalize_images(
            jnp.asarray(np.stack([
                resize_host(decode_image(s).astype(np.float32), 32, 64)
                for s, _ in pairs[:2]
            ])), cfg.data.img_mean, cfg.data.img_std),
    ))
    idx, dist = loaded.search(q, k=3)
    assert idx.shape == (2, 3) and np.all(np.isfinite(dist))
    assert np.all(np.diff(dist, axis=1) >= 0)
