"""End-to-end pipeline tests: dataset construction -> loader -> model,
reprojection warp, heatmap sweep on a synthetic satellite strip."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from witw_tpu.tools import geotiff as gt
from witw_tpu.tools.build_dataset import build
from witw_tpu.tools.reproject import reproject_to_utm, _utm_to_wgs84_vec, _wgs84_to_utm_vec


@pytest.fixture
def synthetic_city(tmp_path, rng):
    """Metadata + photos + satellite strip for 'paris'."""
    from PIL import Image

    e, n, epsg = gt.wgs84_to_utm(48.8566, 2.3522)
    strip = rng.integers(1, 255, size=(1600, 1600, 3), dtype=np.uint8)
    gtf = np.array([e - 240, 0.3, 0, n + 240, 0, -0.3])
    sat_dir = tmp_path / "sat"
    sat_dir.mkdir()
    gt.write_geotiff_u8(str(sat_dir / "03_paris.tif"), strip, gtf, epsg)

    photo_dir = tmp_path / "photos" / "paris"
    photo_dir.mkdir(parents=True)
    meta_dir = tmp_path / "meta" / "paris"
    meta_dir.mkdir(parents=True)
    records = []
    for i in range(4):
        pid = str(1000 + i)
        img = rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
        Image.fromarray(img).save(photo_dir / f"{pid}.jpg")
        records.append(
            {"id": pid, "latitude": 48.8566 + i * 1e-4, "longitude": 2.3522,
             "license": "4", "url_o": f"http://x/{pid}.jpg"}
        )
    # one grayscale photo that must be filtered out
    pid = "9999"
    Image.fromarray(rng.integers(0, 255, (64, 128), dtype=np.uint8), mode="L").save(
        photo_dir / f"{pid}.jpg"
    )
    records.append({"id": pid, "latitude": 48.8566, "longitude": 2.3522, "license": "4"})
    with open(meta_dir / "metadata.json", "w") as f:
        json.dump(records, f)
    return {
        "meta_root": str(tmp_path / "meta"),
        "photo_dir": str(tmp_path / "photos"),
        "sat_dir": str(sat_dir),
        "out_dir": str(tmp_path / "dataset"),
    }


def test_build_dataset_end_to_end(synthetic_city):
    frame = build(
        synthetic_city["meta_root"],
        synthetic_city["photo_dir"],
        synthetic_city["sat_dir"],
        synthetic_city["out_dir"],
        edge=60.0,  # 200 px tiles from the small strip
        verbose=False,
    )
    assert len(frame) == 4  # grayscale photo dropped
    out = synthetic_city["out_dir"]
    assert os.path.exists(os.path.join(out, "train.csv"))
    test_frame = pd.read_csv(os.path.join(out, "test.csv"))
    assert len(test_frame) == 4  # paris is the test city
    # CSV columns 15/16 hold the pair paths readable by the data layer
    from witw_tpu.configs import DATASETS
    from witw_tpu.data import read_pair_paths

    pairs = read_pair_paths(DATASETS["witw"], os.path.join(out, "test.csv"))
    assert len(pairs) == 4
    for surface, overhead in pairs:
        assert os.path.exists(surface)
        assert os.path.exists(overhead)
    # and the loader can decode them
    from witw_tpu.data import PairLoader

    loader = PairLoader(pairs, batch_size=2, surface_hw=(32, 64), overhead_hw=(32, 32),
                        num_workers=2)
    batch = next(iter(loader))
    assert batch["surface"].shape == (2, 32, 64, 3)
    assert batch["overhead"].shape == (2, 32, 32, 3)


def test_vectorized_geodesy_roundtrip():
    lats = np.array([[48.85, 48.86], [48.87, 48.88]])
    lons = np.array([[2.34, 2.35], [2.36, 2.37]])
    e, n = _wgs84_to_utm_vec(lats, lons, 32631)
    lat2, lon2 = _utm_to_wgs84_vec(e, n, 32631)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    # matches the native scalar path
    e_s, n_s, _ = gt.wgs84_to_utm(48.85, 2.34)
    assert abs(e[0, 0] - e_s) < 1e-6 and abs(n[0, 0] - n_s) < 1e-6


def test_reproject_wgs84_strip_to_utm(tmp_path, rng):
    """A small EPSG:4326 raster warped to UTM: constant regions must stay
    constant and the output georeferencing must cover the source."""
    data = np.full((200, 200, 3), 99, np.uint8)
    # ~0.0001 deg/px near Paris
    gtf = np.array([2.3500, 1e-5, 0, 48.8600, 0, -1e-5])
    src = str(tmp_path / "src4326.tif")
    gt.write_geotiff_u8(src, data, gtf, 4326)
    dst = str(tmp_path / "utm.tif")
    reproject_to_utm(src, dst, 32631, resolution=0.3, block=256)
    with gt.GeoTiff(dst) as out:
        assert out.epsg == 32631
        img = out.read()
        # interior of the warped raster keeps the constant value
        h, w = img.shape[:2]
        interior = img[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4]
        assert (interior == 99).mean() > 0.99


@pytest.mark.slow
def test_heatmap_sweep_synthetic(tmp_path, rng):
    """Full sweep: synthetic UTM strip + query photo + fresh towers."""
    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.tools.heatmap import layer, sweep
    from witw_tpu.train.pipeline import make_pipeline

    e0, n0 = 447600.0, 5411900.0
    strip = rng.integers(1, 255, size=(1200, 1200, 3), dtype=np.uint8)
    gtf = np.array([e0, 0.3, 0, n0, 0, -0.3])
    sat_path = str(tmp_path / "03_paris.tif")
    gt.write_geotiff_u8(sat_path, strip, gtf, 32631)

    from PIL import Image

    photo_path = str(tmp_path / "img.jpg")
    Image.fromarray(rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)).save(photo_path)

    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    csv_path = str(tmp_path / "match.csv")
    bounds = (e0 + 30, n0 - 250, e0 + 250, n0 - 30)
    cache = str(tmp_path / "tiles.npz")
    frame = sweep(sat_path, photo_path, csv_path, bounds,
                  edge=225.0, offset=112.5, fov=70, state=state,
                  index_cache=cache, verbose=False)
    assert os.path.exists(cache)
    # the prefetch producer thread (default cold path) only overlaps WHEN
    # batches are built, not what is in them: the serial path is bit-equal
    frame_serial = sweep(sat_path, photo_path, str(tmp_path / "match_s.csv"),
                         bounds, edge=225.0, offset=112.5, fov=70,
                         state=state, verbose=False, prefetch_tiles=0)
    np.testing.assert_array_equal(frame_serial["dissimilarity"],
                                  frame["dissimilarity"])
    np.testing.assert_array_equal(frame_serial["orientation"],
                                  frame["orientation"])
    # second sweep hits the embedding cache and reproduces the scores
    frame2 = sweep(sat_path, photo_path, csv_path, bounds,
                   edge=225.0, offset=112.5, fov=70, state=state,
                   index_cache=cache, verbose=False)
    np.testing.assert_allclose(frame2["score"], frame["score"], rtol=1e-6)
    # multi-chip scoring (--shard-gallery): gallery resident-sharded over the
    # 8-device mesh, identical sweep output
    from witw_tpu.parallel import make_mesh

    frame_sh = sweep(sat_path, photo_path, str(tmp_path / "match_sh.csv"),
                     bounds, edge=225.0, offset=112.5, fov=70, state=state,
                     index_cache=cache, verbose=False,
                     mesh=make_mesh(n_data=8))
    np.testing.assert_allclose(frame_sh["score"], frame["score"], rtol=1e-5)
    # multi-photo sweep: one embed batch + one gallery pass for all queries
    # (reference reruns the whole script per photo); rows gain a 'photo'
    # column and identical photos produce identical rows
    photo2 = str(tmp_path / "img2.jpg")
    Image.fromarray(rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
                    ).save(photo2)
    frame_mq = sweep(sat_path, [photo_path, photo_path, photo2],
                     str(tmp_path / "match_mq.csv"), bounds,
                     edge=225.0, offset=112.5, fov=70, state=state,
                     index_cache=cache, verbose=False)
    assert list(frame_mq.columns)[0] == "photo"
    assert len(frame_mq) == 3 * len(frame)
    a = frame_mq[frame_mq.index < len(frame)].reset_index(drop=True)
    b = frame_mq[(frame_mq.index >= len(frame))
                 & (frame_mq.index < 2 * len(frame))].reset_index(drop=True)
    np.testing.assert_array_equal(a["score"], b["score"])
    # batch embedding matches the single-query sweep (same tower math; bf16
    # batch-layout rounding only)
    np.testing.assert_allclose(a["score"], frame["score"], rtol=5e-2)
    np.testing.assert_array_equal(frame_sh["orientation"], frame["orientation"])
    # the cache records tower precision so an --int8 rerun treats it as stale
    # (staleness logic unit-tested in tests/test_tools.py)
    from witw_tpu.evaluation.index import GalleryIndex

    assert str(GalleryIndex.load(cache).meta.get("precision")) == "f32"

    # the cache is fingerprinted against the overhead tower's weights: a
    # sweep with a retrained checkpoint must NOT serve the old embeddings
    sha_before = str(GalleryIndex.load(cache).meta.get("params_sha"))
    assert len(sha_before) == 64
    state2 = pipeline.init(jax.random.PRNGKey(1))  # "retrained" weights
    sweep(sat_path, photo_path, csv_path, bounds,
          edge=225.0, offset=112.5, fov=70, state=state2,
          index_cache=cache, verbose=False)
    sha_after = str(GalleryIndex.load(cache).meta.get("params_sha"))
    assert sha_after != sha_before  # cache was rebuilt, not served stale

    assert set(frame.columns) == {"x", "y", "orientation", "dissimilarity", "score"}
    assert len(frame) >= 4
    assert np.all(np.isfinite(frame["score"]))
    assert np.all(frame["dissimilarity"] >= 0)
    np.testing.assert_allclose(
        frame["score"], np.exp(10 * (1 - frame["dissimilarity"])), rtol=1e-5
    )

    layer_path = str(tmp_path / "layer.tif")
    layer(sat_path, bounds, layer_path)
    with gt.GeoTiff(layer_path) as out:
        want_px = round((bounds[2] - bounds[0]) / 0.3)
        assert abs(out.width - want_px) <= 1
        assert abs(out.height - round((bounds[3] - bounds[1]) / 0.3)) <= 1


@pytest.mark.slow
def test_heatmap_sweep_int8_small_geometry(tmp_path, rng):
    """int8 sweep wiring at reduced geometry: grid-spanning calibration,
    recorded saturation guard, weights-fingerprinted int8 cache. Small dims
    because XLA:CPU lowers int8 convs at reference speed (measured >100x
    slower than f32 at full geometry); the int8 *numerics* are covered at
    unit level in tests/test_quantize.py and on real TPU by bench.py."""
    import dataclasses

    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.heatmap import SATURATION_WARN_FRACTION, sweep
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="witw", fov=90)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=128,
            overhead_size=64,
        ),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    e0, n0 = 447600.0, 5411900.0
    strip = rng.integers(1, 255, size=(1200, 1200, 3), dtype=np.uint8)
    gtf = np.array([e0, 0.3, 0, n0, 0, -0.3])
    sat_path = str(tmp_path / "03_paris.tif")
    gt.write_geotiff_u8(sat_path, strip, gtf, 32631)

    from PIL import Image

    photo_path = str(tmp_path / "img.jpg")
    Image.fromarray(
        rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    ).save(photo_path)

    csv_path = str(tmp_path / "match.csv")
    bounds = (e0 + 30, n0 - 250, e0 + 250, n0 - 30)
    cache8 = str(tmp_path / "tiles_int8.npz")
    frame8 = sweep(sat_path, photo_path, csv_path, bounds,
                   edge=225.0, offset=112.5, fov=90, state=state,
                   index_cache=cache8, int8=True, verbose=False, cfg=cfg,
                   batch_size=8)  # int8 on XLA:CPU is slow; keep batches tiny
    meta8 = GalleryIndex.load(cache8).meta
    assert str(meta8.get("precision")) == "int8"
    assert len(str(meta8.get("params_sha"))) == 64
    sat = float(meta8.get("int8_saturation"))
    assert 0.0 <= sat < SATURATION_WARN_FRACTION
    assert np.all(np.isfinite(frame8["score"]))
    assert len(frame8) >= 4


@pytest.mark.slow
def test_heatmap_sweep_uint8_tiles(tmp_path, rng):
    """tile_dtype='uint8' (4x less H2D tile traffic): scores agree with the
    f32 tile path within the <=0.5-LSB resample rounding, and the index
    cache treats a tile-dtype mismatch as stale."""
    import dataclasses

    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.heatmap import sweep
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="witw", fov=90)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=128,
            overhead_size=64,
        ),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    e0, n0 = 447600.0, 5411900.0
    strip = rng.integers(1, 255, size=(1200, 1200, 3), dtype=np.uint8)
    gtf = np.array([e0, 0.3, 0, n0, 0, -0.3])
    sat_path = str(tmp_path / "03_paris.tif")
    gt.write_geotiff_u8(sat_path, strip, gtf, 32631)

    from PIL import Image

    photo_path = str(tmp_path / "img.jpg")
    Image.fromarray(
        rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    ).save(photo_path)

    csv_path = str(tmp_path / "match.csv")
    bounds = (e0 + 30, n0 - 250, e0 + 250, n0 - 30)
    cache = str(tmp_path / "tiles_u8.npz")
    common = dict(edge=225.0, offset=112.5, fov=90, state=state,
                  verbose=False, cfg=cfg, batch_size=8)
    frame_f32 = sweep(sat_path, photo_path, csv_path, bounds, **common)
    frame_u8 = sweep(sat_path, photo_path, csv_path, bounds,
                     index_cache=cache, tile_dtype="uint8", **common)
    assert str(GalleryIndex.load(cache).meta.get("tile_dtype")) == "uint8"
    np.testing.assert_allclose(
        frame_u8["dissimilarity"], frame_f32["dissimilarity"],
        rtol=0.05, atol=0.02,
    )
    assert (np.argmin(frame_u8["dissimilarity"])
            == np.argmin(frame_f32["dissimilarity"]))
    # an f32 sweep against the u8 cache must rebuild, not serve it
    sweep(sat_path, photo_path, csv_path, bounds, index_cache=cache, **common)
    assert str(GalleryIndex.load(cache).meta.get("tile_dtype")) == "float32"


@pytest.mark.slow
def test_parity_harness_plumbing(tmp_path, rng):
    """End-to-end parity-harness run on the synthetic fixture: fake reference
    tower .pth checkpoints -> conversion -> full eval -> 0.5-pt gate. Proves
    the plumbing so a real-data run only needs mounted CSVs + weights
    (BASELINE.md gate; VERDICT r1 missing #7)."""
    torch = pytest.importorskip("torch")
    import dataclasses
    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.data import write_synthetic_dataset
    from witw_tpu.models.backbones.vgg16 import VGG16_CONVS
    from witw_tpu.models.fov_dsm import HEAD_CONVS
    from witw_tpu.tools.parity import run_parity

    csv_path = write_synthetic_dataset(
        str(tmp_path / "data"), n=6, schema="cvusa",
        surface_hw=(128, 512), overhead_hw=(256, 256),
    )

    # Fake reference checkpoints in the reference's key format
    # (model.features.N.layer.{weight,bias}, OIHW) with correct shapes.
    g = torch.Generator().manual_seed(0)
    def fake_tower(path):
        sd = {}
        cin = 3
        for idx, cout in VGG16_CONVS:
            sd[f"model.features.{idx}.layer.weight"] = torch.randn(
                (cout, cin, 3, 3), generator=g) * 0.05
            sd[f"model.features.{idx}.layer.bias"] = torch.randn(
                (cout,), generator=g) * 0.01
            cin = cout
        for name, cout, _, _ in HEAD_CONVS:
            idx = int(name.split("_")[1])
            sd[f"model.features.{idx}.weight"] = torch.randn(
                (cout, cin, 3, 3), generator=g) * 0.05
            sd[f"model.features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.01
            cin = cout
        torch.save(sd, path)

    s_pth = str(tmp_path / "fov_360_surface_best.pth")
    o_pth = str(tmp_path / "fov_360_overhead_best.pth")
    fake_tower(s_pth)
    fake_tower(o_pth)

    cfg = fov_experiment(dataset="cvusa", fov=360)
    ds = dataclasses.replace(cfg.data.dataset, test_csv=csv_path)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, dataset=ds),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
        eval=dataclasses.replace(cfg.eval, batch_size=2),
    )
    report = run_parity(cfg, s_pth, o_pth, verbose=False)
    res = report["witw_tpu"]
    assert res["locations"] == 6
    assert all(np.isfinite(res[k]) for k in ("top_1", "avg_rank"))

    # side-by-side + gate path: compare against itself -> delta 0, PASS
    report2 = run_parity(cfg, s_pth, o_pth, reference_metrics=res, verbose=True)
    assert report2["gate_pass"] and report2["recall1_delta_pt"] == 0.0


@pytest.mark.slow
def test_serving_daemon_end_to_end(tmp_path, rng):
    """HTTP serving daemon: healthz + top-k geolocate over a prebuilt index,
    bad-input handling."""
    import io
    import json
    import threading
    import urllib.request
    import urllib.error

    import jax
    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.serve import GeolocateService, serve
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    n = 12
    h, w, c = 4, 64, 16  # plausible embed-map geometry
    embeds = rng.standard_normal((n, h, w, c)).astype(np.float32)
    index = GalleryIndex(
        embeds,
        meta={"x": np.arange(n, dtype=np.float64) * 100.0,
              "y": np.arange(n, dtype=np.float64) * -50.0},
    )
    service = GeolocateService(index, cfg, state)
    server = serve(service, port=0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["gallery_size"] == n

        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/geolocate?k=3", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        results = out["results"]
        assert len(results) == 3
        assert results[0]["distance"] <= results[1]["distance"] <= results[2]["distance"]
        for item in results:
            assert {"x", "y", "tile", "distance", "orientation_deg", "score"} <= set(item)
            assert -180.0 <= item["orientation_deg"] <= 180.0

        # approximate mode: full candidate pool == exact results
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/geolocate?k=3&candidates=12",
            data=buf.getvalue(), method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out_approx = json.loads(r.read())
        assert [it["tile"] for it in out_approx["results"]] == [
            it["tile"] for it in results
        ]
        np.testing.assert_allclose(
            [it["distance"] for it in out_approx["results"]],
            [it["distance"] for it in results], rtol=1e-5, atol=1e-6,
        )

        # observability: /stats counts the two successful searches above
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 2 and stats["dispatches"] == 2
        assert stats["exact_searches"] == 1 and stats["approx_searches"] == 1
        assert stats["errors"] == 0 and stats["uptime_s"] >= 0
        assert stats["mean_batch"] == 1.0

        # bad input: not an image
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/geolocate", data=b"not an image",
            method="POST",
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # bad query params: negative candidates must NOT silently enable a
        # k-sized approximate pool (ADVICE r2); k < 1 is rejected too
        for qs in ("candidates=-1", "k=0", "k=-3"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/geolocate?{qs}",
                data=buf.getvalue(), method="POST",
            )
            try:
                urllib.request.urlopen(req)
                assert False, f"expected 400 for {qs}"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()


@pytest.mark.slow
def test_serving_daemon_int8_lazy_calibration(tmp_path, rng):
    """--int8 serving calibrates on the first real query (not a probe) and
    keeps answering consistently afterwards."""
    import io

    import jax
    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.serve import GeolocateService

    cfg = fov_experiment(dataset="witw", fov=70)
    from witw_tpu.train.pipeline import make_pipeline

    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    index = GalleryIndex(rng.standard_normal((6, 4, 64, 16)).astype(np.float32))
    service = GeolocateService(index, cfg, state, int8=True)
    assert service._sq is None  # not calibrated until traffic arrives

    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (80, 160, 3), dtype=np.uint8)).save(
        buf, format="JPEG")
    r1 = service.geolocate(buf.getvalue(), k=3)
    assert service._sq is not None  # calibrated from the query
    r2 = service.geolocate(buf.getvalue(), k=3)
    assert [x["tile"] for x in r1] == [x["tile"] for x in r2]
    assert r1[0]["distance"] == r2[0]["distance"]


@pytest.mark.slow
def test_serving_request_microbatching(rng):
    """max_batch >= 2: concurrent requests are grouped into shared device
    dispatches (fewer dispatches than requests), every caller gets its own
    k-sized answer, and results match the unbatched service exactly (same
    embed math — batching only changes grouping). Exact and approximate
    requests in one group keep their separate contracts."""
    import io
    import threading

    import jax
    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.serve import GeolocateService

    cfg = fov_experiment(dataset="witw", fov=70)
    from witw_tpu.train.pipeline import make_pipeline

    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    index = GalleryIndex(
        rng.standard_normal((12, 4, 64, 16)).astype(np.float32)
    )
    plain = GeolocateService(index, cfg, state)
    batched = GeolocateService(index, cfg, state, max_batch=4,
                               batch_window_ms=2000.0)
    try:
        photos = []
        for i in range(4):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (80, 160, 3), dtype=np.uint8)
            ).save(buf, format="PNG")  # lossless: identical decode both paths
            photos.append(buf.getvalue())

        # mixed ks + one approximate request in the same burst
        kwargs = [dict(k=3), dict(k=1), dict(k=5), dict(k=2, candidates=8)]
        want = [plain.geolocate(p, **kw) for p, kw in zip(photos, kwargs)]

        got = [None] * 4

        def call(i):
            got[i] = batched.geolocate(photos[i], **kwargs[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert batched.stats["requests"] == 4
        # the 2 s window must have grouped the burst (1 dispatch, 2 if a
        # straggler thread missed the first group)
        assert batched.stats["dispatches"] <= 2, batched.stats
        for w, g, kw in zip(want, got, kwargs):
            assert len(g) == len(w) == kw["k"]
            assert [x["tile"] for x in g] == [x["tile"] for x in w]
            # batch-4 vs batch-1 conv lowering reorders f32 reductions:
            # ~2e-5 relative embed deltas are expected, ranks are stable
            np.testing.assert_allclose(
                [x["distance"] for x in g], [x["distance"] for x in w],
                rtol=1e-4, atol=1e-5,
            )
    finally:
        batched.close()
        assert batched._workers == []  # close() is clean + idempotent
        batched.close()


@pytest.mark.slow
def test_serving_daemon_sharded_gallery(rng):
    """--shard-gallery serving: the index is resident-sharded across all 8
    mesh devices, exact queries take the shard_map top-k path, and answers
    match the single-device service exactly."""
    import io

    import jax
    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.parallel import make_mesh
    from witw_tpu.tools.serve import GeolocateService
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    embeds = rng.standard_normal((20, 4, 64, 16)).astype(np.float32)
    index_a = GalleryIndex(embeds)
    index_b = GalleryIndex(embeds)
    plain = GeolocateService(index_a, cfg, state)
    mesh = make_mesh(n_data=8)
    sharded = GeolocateService(index_b, cfg, state, mesh=mesh)
    assert sharded._mesh is mesh
    assert len(index_b.last_gallery_sharding.device_set) == 8

    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (80, 160, 3), dtype=np.uint8)).save(
        buf, format="JPEG")
    r_plain = plain.geolocate(buf.getvalue(), k=4)
    r_shard = sharded.geolocate(buf.getvalue(), k=4)
    assert [x["tile"] for x in r_shard] == [x["tile"] for x in r_plain]
    np.testing.assert_allclose(
        [x["distance"] for x in r_shard],
        [x["distance"] for x in r_plain], rtol=1e-5, atol=1e-6,
    )
    # approximate requests keep their own (unsharded two-stage) path
    r_approx = sharded.geolocate(buf.getvalue(), k=4, candidates=20)
    assert [x["tile"] for x in r_approx] == [x["tile"] for x in r_plain]

    # k beyond the placed per-shard top-k width is CLAMPED, never silently
    # served by a single-device full-gallery fallback (which would defeat
    # the sharding and OOM a gallery sized for the whole mesh)
    index_b.place_sharded(mesh, max_k=4)
    r_big = sharded.geolocate(buf.getvalue(), k=10)
    assert len(r_big) == 4
    assert [x["tile"] for x in r_big] == [x["tile"] for x in r_plain]


def test_serving_refuses_mismatched_index(rng):
    """The daemon refuses to score queries against an index built at a
    different precision or by a different checkpoint (the mismatch
    heatmap._cache_is_stale rebuilds caches to avoid) unless explicitly
    overridden; indexes without the recorded keys pass unchecked."""
    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.serve import GeolocateService
    from witw_tpu.train.pipeline import make_pipeline
    from witw_tpu.utils.hashing import params_fingerprint

    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    embeds = rng.standard_normal((4, 4, 64, 16)).astype(np.float32)
    sha = params_fingerprint(state.params["overhead"])

    # precision mismatch: int8-built index + f32 daemon (and vice versa)
    idx8 = GalleryIndex(embeds, meta={"precision": "int8", "params_sha": sha})
    with pytest.raises(ValueError, match="precision"):
        GeolocateService(idx8, cfg, state, int8=False)
    idxf = GalleryIndex(embeds, meta={"precision": "f32", "params_sha": sha})
    with pytest.raises(ValueError, match="precision"):
        GeolocateService(idxf, cfg, state, int8=True)

    # checkpoint mismatch: fingerprint from different weights
    stale = GalleryIndex(
        embeds, meta={"precision": "f32", "params_sha": "0" * 64})
    with pytest.raises(ValueError, match="checkpoint"):
        GeolocateService(stale, cfg, state)

    # matching meta, bare index, and the explicit override all construct
    GeolocateService(idxf, cfg, state).close()
    GeolocateService(GalleryIndex(embeds), cfg, state).close()
    GeolocateService(stale, cfg, state, allow_mismatch=True).close()


def test_serving_sharded_k_clamp_spares_approx(rng):
    """The per-shard top-k width limit applies only to requests that take the
    sharded exact path; approximate requests (candidates > 0) never touch it
    and keep their full k."""
    import io

    import jax
    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.parallel import make_mesh
    from witw_tpu.tools.serve import GeolocateService
    from witw_tpu.train.pipeline import make_pipeline

    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    index = GalleryIndex(rng.standard_normal((16, 4, 64, 16)).astype(np.float32))
    mesh = make_mesh(n_data=8)
    service = GeolocateService(index, cfg, state, mesh=mesh)
    # force a narrow placed width so the clamp is observable below n
    service.index._sharded["max_k"] = 2

    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (80, 160, 3), dtype=np.uint8)).save(
        buf, format="JPEG")
    # exact sharded request: clamped to the placed width
    assert len(service.geolocate(buf.getvalue(), k=6)) == 2
    # approximate request: full k served (single-device two-stage path)
    assert len(service.geolocate(buf.getvalue(), k=6, candidates=8)) == 6


def test_serving_warmup_restores_stats_and_serves(rng):
    """warmup() drives the real group path for every batch bucket (including
    the padded top bucket of a non-power-of-two max_batch) and each k bucket,
    restores /stats to pre-warmup values, and the service then answers
    normally."""
    import io

    import jax
    from PIL import Image

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.tools.serve import GeolocateService

    cfg = fov_experiment(dataset="witw", fov=70)
    from witw_tpu.train.pipeline import make_pipeline

    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    index = GalleryIndex(rng.standard_normal((8, 4, 64, 16)).astype(np.float32))
    service = GeolocateService(index, cfg, state, max_batch=3)  # pads to 4
    try:
        service.warmup(ks=(2,))
        assert service.stats["requests"] == 0  # restored
        assert service.stats["dispatches"] == 0
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (80, 160, 3), dtype=np.uint8)
                        ).save(buf, format="JPEG")
        results = service.geolocate(buf.getvalue(), k=2)
        assert len(results) == 2
        assert service.stats["requests"] == 1
    finally:
        service.close()


@pytest.mark.slow
def test_heatmap_sweep_safa_family(tmp_path, rng):
    """--family safa sweep: VGG16+SAFA towers embed tiles to unit VECTORS
    (VectorIndex cache), tiles score by plain Euclidean distance, the CSV has
    no orientation column, and a family mismatch at the cache path rebuilds
    instead of serving the other family's embeddings. Reduced geometry: the
    int8 leg runs through XLA:CPU's slow int8 conv lowering (NOTES.md)."""
    import dataclasses

    import jax

    from witw_tpu.configs import safa_experiment
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.tools.heatmap import SATURATION_WARN_FRACTION, sweep
    from witw_tpu.train.pipeline import make_pipeline

    cfg = safa_experiment(dataset="witw", fov=90)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=128,
            overhead_size=64,
        ),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    e0, n0 = 447600.0, 5411900.0
    strip = rng.integers(1, 255, size=(1200, 1200, 3), dtype=np.uint8)
    gtf = np.array([e0, 0.3, 0, n0, 0, -0.3])
    sat_path = str(tmp_path / "03_paris.tif")
    gt.write_geotiff_u8(sat_path, strip, gtf, 32631)

    from PIL import Image

    photo_path = str(tmp_path / "img.jpg")
    Image.fromarray(
        rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    ).save(photo_path)

    csv_path = str(tmp_path / "match.csv")
    bounds = (e0 + 30, n0 - 250, e0 + 250, n0 - 30)
    cache = str(tmp_path / "tiles_safa.npz")
    frame = sweep(sat_path, photo_path, csv_path, bounds,
                  edge=225.0, offset=112.5, fov=90, state=state,
                  index_cache=cache, verbose=False, cfg=cfg, family="safa")
    assert set(frame.columns) == {"x", "y", "dissimilarity", "score"}
    assert len(frame) >= 4
    assert np.all(np.isfinite(frame["score"]))
    assert np.all(frame["dissimilarity"] >= 0)
    idx = VectorIndex.load(cache)
    assert idx.embeds.ndim == 2
    assert str(idx.meta.get("family")) == "safa"
    # unit embeddings from the SAFA head
    np.testing.assert_allclose(
        np.linalg.norm(idx.embeds, axis=1), 1.0, rtol=1e-4
    )

    # cache hit reproduces scores; sharded scoring matches
    frame2 = sweep(sat_path, photo_path, csv_path, bounds,
                   edge=225.0, offset=112.5, fov=90, state=state,
                   index_cache=cache, verbose=False, cfg=cfg, family="safa")
    np.testing.assert_allclose(frame2["score"], frame["score"], rtol=1e-6)
    from witw_tpu.parallel import make_mesh

    frame_sh = sweep(sat_path, photo_path, str(tmp_path / "m_sh.csv"), bounds,
                     edge=225.0, offset=112.5, fov=90, state=state,
                     index_cache=cache, verbose=False, cfg=cfg, family="safa",
                     mesh=make_mesh(n_data=8))
    np.testing.assert_allclose(frame_sh["score"], frame["score"], rtol=1e-5)

    # an FOV sweep pointed at the safa cache must rebuild (type + family
    # mismatch), not serve vector embeddings through the FFT scorer
    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex

    cfg_fov = fov_experiment(dataset="witw", fov=90)
    cfg_fov = dataclasses.replace(
        cfg_fov,
        data=dataclasses.replace(
            cfg_fov.data, surface_height=32, surface_width_max=128,
            overhead_size=64,
        ),
    )
    pipeline_fov = make_pipeline(cfg_fov)
    state_fov = pipeline_fov.init(jax.random.PRNGKey(0))
    frame_fov = sweep(sat_path, photo_path, str(tmp_path / "m_fov.csv"),
                      bounds, edge=225.0, offset=112.5, fov=90,
                      state=state_fov, index_cache=cache, verbose=False,
                      cfg=cfg_fov)
    assert "orientation" in frame_fov.columns
    assert GalleryIndex.load(cache).embeds.ndim == 4  # rebuilt as FOV

    # int8 leg: static SAFA trunk, saturation recorded, int8-stamped cache
    cache8 = str(tmp_path / "tiles_safa8.npz")
    frame8 = sweep(sat_path, photo_path, csv_path, bounds,
                   edge=225.0, offset=112.5, fov=90, state=state,
                   index_cache=cache8, int8=True, verbose=False, cfg=cfg,
                   family="safa", batch_size=8)
    meta8 = VectorIndex.load(cache8).meta
    assert str(meta8.get("precision")) == "int8"
    assert str(meta8.get("family")) == "safa"
    sat = float(meta8.get("int8_saturation"))
    assert 0.0 <= sat < SATURATION_WARN_FRACTION
    assert np.all(np.isfinite(frame8["score"]))
    # int8 trunk tracks the f32 scores (rank-preserving quantization)
    assert np.corrcoef(frame8["dissimilarity"], frame["dissimilarity"])[0, 1] > 0.9


@pytest.mark.slow
def test_heatmap_sweep_baseline_family(tmp_path, rng):
    """--family baseline sweep: the 7-conv GeM towers embed RAW 750^2 tiles
    (no polar, no normalization) to 1536-d f/||f||^0.5 vectors (VectorIndex
    cache), scored by plain Euclidean distance with score = exp(-d). The
    geometry is the production one (host_geometry pins witw at 500^2 photos /
    750^2 tiles; the architecture's 7 valid k=4 s=2 convs need >=382 inputs,
    so there is no reduced-geometry variant). f32 only: XLA:CPU runs int8
    convs at reference-lowering speed (NOTES.md) and this geometry is the
    largest in the suite — the baseline int8 forward itself is pinned by
    tests/test_quantize.py."""
    import jax

    from witw_tpu.configs import baseline_experiment
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.tools.heatmap import sweep
    from witw_tpu.train.pipeline import make_pipeline

    cfg = baseline_experiment(dataset="witw")
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    e0, n0 = 447600.0, 5411900.0
    strip = rng.integers(1, 255, size=(1200, 1200, 3), dtype=np.uint8)
    gtf = np.array([e0, 0.3, 0, n0, 0, -0.3])
    sat_path = str(tmp_path / "03_paris.tif")
    gt.write_geotiff_u8(sat_path, strip, gtf, 32631)

    from PIL import Image

    photo_path = str(tmp_path / "img.jpg")
    Image.fromarray(
        rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    ).save(photo_path)

    csv_path = str(tmp_path / "match.csv")
    bounds = (e0 + 30, n0 - 250, e0 + 250, n0 - 30)
    cache = str(tmp_path / "tiles_base.npz")
    frame = sweep(sat_path, photo_path, csv_path, bounds,
                  edge=225.0, offset=112.5, state=state,
                  index_cache=cache, verbose=False, family="baseline")
    assert set(frame.columns) == {"x", "y", "dissimilarity", "score"}
    assert len(frame) >= 4
    assert np.all(np.isfinite(frame["score"]))
    assert np.all(frame["dissimilarity"] >= 0)
    np.testing.assert_allclose(
        frame["score"], np.exp(-frame["dissimilarity"]), rtol=1e-6)
    idx = VectorIndex.load(cache)
    assert idx.embeds.shape == (len(frame), 1536)
    assert str(idx.meta.get("family")) == "baseline"
    # f/||f||^0.5 embeddings: ||emb|| = sqrt(||f||), NOT unit
    norms = np.linalg.norm(idx.embeds, axis=1)
    assert not np.allclose(norms, 1.0, rtol=1e-2)

    # cache hit reproduces scores; a safa sweep pointed at this cache must
    # rebuild (family mismatch), not serve baseline embeddings
    frame2 = sweep(sat_path, photo_path, csv_path, bounds,
                   edge=225.0, offset=112.5, state=state,
                   index_cache=cache, verbose=False, family="baseline")
    np.testing.assert_allclose(frame2["score"], frame["score"], rtol=1e-6)


@pytest.mark.slow
def test_serving_daemon_baseline_family(rng):
    """--family baseline daemon: embeds 500^2 raw photos with the baseline
    surface tower (batch_stats-aware, no normalization), searches a
    VectorIndex, reports score = exp(-distance) (unbounded-distance
    calibration) and orientation_deg null."""
    import io
    import json
    import threading
    import urllib.request

    import jax
    from PIL import Image

    from witw_tpu.configs import baseline_experiment
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.tools.serve import GeolocateService, serve
    from witw_tpu.train.pipeline import make_pipeline

    cfg = baseline_experiment(dataset="witw")
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    n = 10
    embeds = rng.standard_normal((n, 1536)).astype(np.float32)
    index = VectorIndex(
        embeds,
        meta={"x": np.arange(n, dtype=np.float64) * 100.0,
              "y": np.arange(n, dtype=np.float64) * -50.0},
    )

    service = GeolocateService(index, cfg, state, family="baseline")
    assert service._surface_hw == (500, 500)
    server = serve(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["family"] == "baseline" and health["gallery_size"] == n

        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/geolocate?k=3", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        results = out["results"]
        assert len(results) == 3
        assert (results[0]["distance"] <= results[1]["distance"]
                <= results[2]["distance"])
        for item in results:
            assert item["orientation_deg"] is None
            np.testing.assert_allclose(
                item["score"], np.exp(-item["distance"]), rtol=1e-6)
    finally:
        server.shutdown()
        service.close()


@pytest.mark.slow
def test_serving_daemon_safa_family(rng):
    """--family safa daemon: embeds queries with the SAFA surface tower,
    searches a VectorIndex, answers with orientation_deg null; index/family
    type mismatches are refused at construction."""
    import dataclasses
    import io
    import json
    import threading
    import urllib.request

    import jax
    from PIL import Image

    from witw_tpu.configs import safa_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.tools.serve import GeolocateService, serve
    from witw_tpu.train.pipeline import make_pipeline

    cfg = safa_experiment(dataset="witw", fov=70)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, surface_height=32, surface_width_max=128,
            overhead_size=64,
        ),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    n, dim = 12, cfg.model.num_heads * 512  # SAFA embeds are [M*C]
    embeds = rng.standard_normal((n, dim)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    index = VectorIndex(
        embeds,
        meta={"x": np.arange(n, dtype=np.float64) * 100.0,
              "y": np.arange(n, dtype=np.float64) * -50.0},
    )

    # family/index type mismatches fail loudly at construction
    with pytest.raises(ValueError, match="GalleryIndex"):
        GeolocateService(index, cfg, state, family="fov")
    with pytest.raises(ValueError, match="VectorIndex"):
        GeolocateService(
            GalleryIndex(rng.standard_normal((4, 2, 8, 4)).astype(np.float32)),
            cfg, state, family="safa",
        )

    service = GeolocateService(index, cfg, state, family="safa")
    server = serve(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["family"] == "safa" and health["gallery_size"] == n

        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/geolocate?k=3", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        results = out["results"]
        assert len(results) == 3
        assert (results[0]["distance"] <= results[1]["distance"]
                <= results[2]["distance"])
        for item in results:
            assert item["orientation_deg"] is None
            assert np.isfinite(item["score"])

        # candidates> 0 is served exactly for vector families (their exact
        # search is already one GEMM per chunk) — same results, exact counter
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/geolocate?k=3&candidates=8",
            data=buf.getvalue(), method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out2 = json.loads(r.read())
        assert [it["tile"] for it in out2["results"]] == [
            it["tile"] for it in results
        ]
        assert service.stats["exact_searches"] == 2
        assert service.stats["approx_searches"] == 0
    finally:
        server.shutdown()
        service.close()
