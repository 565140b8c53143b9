"""Native GeoTIFF IO + geodesy tests."""

import os

import numpy as np
import pytest

from witw_tpu.tools import geotiff as gt


@pytest.fixture(scope="module")
def lib():
    lib = gt.native_lib()
    if lib is None:
        pytest.skip("native geotiff_io library unavailable")
    return lib


def test_write_read_roundtrip(tmp_path, lib, rng):
    data = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
    path = str(tmp_path / "rt.tif")
    gtf = np.array([447000.0, 0.3, 0, 5411000.0, 0, -0.3])
    gt.write_geotiff_u8(path, data, geotransform=gtf, epsg=32631)
    with gt.GeoTiff(path) as tif:
        assert (tif.height, tif.width, tif.bands) == (37, 53, 3)
        assert tif.epsg == 32631
        np.testing.assert_allclose(tif.geotransform, gtf)
        out = tif.read()
        np.testing.assert_array_equal(out, data)
        # windowed read incl. out-of-bounds zero fill
        win = tif.read_window(-5, 10, 20, 20)
        np.testing.assert_array_equal(win[:, :5], 0)
        np.testing.assert_array_equal(win[:, 5:], data[10:30, 0:15])


def test_reads_pil_written_tiffs(tmp_path, lib, rng):
    """Interop: read TIFFs produced by another writer (PIL), with and without
    compression."""
    from PIL import Image

    data = rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)
    for name, kw in [
        ("raw.tif", {}),
        ("deflate.tif", {"compression": "tiff_adobe_deflate"}),
        ("lzw.tif", {"compression": "tiff_lzw"}),
    ]:
        path = str(tmp_path / name)
        Image.fromarray(data).save(path, **kw)
        with gt.GeoTiff(path) as tif:
            np.testing.assert_array_equal(tif.read(), data, err_msg=name)


def test_read_uint16(tmp_path, lib, rng):
    from PIL import Image

    data = rng.integers(0, 65535, size=(25, 31), dtype=np.uint16)
    path = str(tmp_path / "u16.tif")
    Image.fromarray(data).save(path)
    with gt.GeoTiff(path) as tif:
        assert tif.dtype == np.uint16
        np.testing.assert_array_equal(tif.read()[..., 0], data)


def test_pil_reads_our_tiffs(tmp_path, lib, rng):
    from PIL import Image

    data = rng.integers(0, 255, size=(33, 44, 3), dtype=np.uint8)
    path = str(tmp_path / "ours.tif")
    gt.write_geotiff_u8(path, data, compress=True)
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, data)


def snyder_utm(lat, lon, zone):
    """Independent oracle: USGS/Snyder Transverse Mercator series
    (Map Projections — A Working Manual, eqs. 8-9..8-14)."""
    import math

    a, f, k0 = 6378137.0, 1 / 298.257223563, 0.9996
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    phi, lam = math.radians(lat), math.radians(lon)
    lam0 = math.radians(zone * 6 - 183)
    big_n = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    t = math.tan(phi) ** 2
    c = ep2 * math.cos(phi) ** 2
    aa = (lam - lam0) * math.cos(phi)
    m = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * phi)
        - (35 * e2**3 / 3072) * math.sin(6 * phi)
    )
    east = 500000 + k0 * big_n * (
        aa + (1 - t + c) * aa**3 / 6 + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * aa**5 / 120
    )
    north = k0 * (
        m + big_n * math.tan(phi) * (
            aa**2 / 2 + (5 - t + 9 * c + 4 * c**2) * aa**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * aa**6 / 720
        )
    )
    if lat < 0:
        north += 10000000.0
    return east, north


def test_wgs84_utm_vs_snyder_oracle(lib):
    cases = [(48.8566, 2.3522, 31, 32631),   # Paris
             (-22.9068, -43.1729, 23, 32723),  # Rio
             (55.7558, 37.6173, 37, 32637)]   # Moscow
    for lat, lon, zone, want_epsg in cases:
        e, n, epsg = gt.wgs84_to_utm(lat, lon)
        assert epsg == want_epsg
        e_o, n_o = snyder_utm(lat, lon, zone)
        assert abs(e - e_o) < 0.01
        assert abs(n - n_o) < 0.01


def test_utm_roundtrip(lib):
    for lat, lon in [(48.8566, 2.3522), (-22.9068, -43.1729), (55.7558, 37.6173)]:
        e, n, epsg = gt.wgs84_to_utm(lat, lon)
        lat2, lon2 = gt.utm_to_wgs84(e, n, epsg)
        assert abs(lat - lat2) < 1e-7
        assert abs(lon - lon2) < 1e-7


def test_python_utm_matches_native(lib):
    e_n, n_n, _ = gt.wgs84_to_utm(48.8566, 2.3522)
    e_p, n_p = gt._py_wgs84_to_utm(48.8566, 2.3522, 31, True)
    assert abs(e_n - e_p) < 1e-6
    assert abs(n_n - n_p) < 1e-6


def test_resample_constant_preserved(lib):
    src = np.full((16, 16, 2), 7.0, np.float32)
    for method in ("bilinear", "lanczos"):
        out = gt.resample(src, 9, 23, method)
        assert out.shape == (9, 23, 2)
        np.testing.assert_allclose(out, 7.0, rtol=1e-5)


def test_resample_downscale_average(lib):
    # 2x downscale of a checkerboard -> mid value under area-weighted bilinear.
    src = np.indices((8, 8)).sum(0) % 2
    src = (src * 200.0).astype(np.float32)[..., None]
    out = gt.resample(src, 4, 4, "bilinear")
    # interior exactly averaged; edges deviate slightly from border clamping
    np.testing.assert_allclose(out[1:-1, 1:-1], 100.0, atol=1e-4)
    np.testing.assert_allclose(out, 100.0, atol=7.0)


def test_world_window_read(tmp_path, lib, rng):
    data = rng.integers(0, 255, size=(100, 100, 3), dtype=np.uint8)
    path = str(tmp_path / "w.tif")
    gtf = np.array([1000.0, 0.5, 0, 2000.0, 0, -0.5])  # 0.5 m pixels
    gt.write_geotiff_u8(path, data, geotransform=gtf, epsg=32631)
    with gt.GeoTiff(path) as tif:
        # 10m x 10m window starting 5m into the raster = pixels [10:30, 10:30]
        tile = tif.read_world_window(1005.0, 1995.0, 1015.0, 1985.0)
        np.testing.assert_array_equal(tile, data[10:30, 10:30])
