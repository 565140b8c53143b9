"""Python binding for the native geotiff_io library (ctypes).

Replaces the reference's GDAL usage (reference
tools/dataset_building/sitetiles.py:10-11, tools/heatmap/heatmap.py:13-14)
with witw_tpu's own C++ windowed GeoTIFF reader/writer + geodesy
(witw_tpu/native/geotiff_io.cpp). Builds the shared library on first use; a
pure-Python fallback (imageio whole-file read) covers environments without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgeotiff_io.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "geotiff_io.cpp")
_HASH_PATH = os.path.join(_NATIVE_DIR, ".geotiff_io.srchash")
_lib: Optional[ctypes.CDLL] = None


def _build_native() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libgeotiff_io.so"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
        )
        try:  # record what source the binary was built from (see _lib_is_stale)
            with open(_HASH_PATH, "w") as f:
                f.write(_src_hash())
        except OSError:
            pass
        return True
    except subprocess.CalledProcessError as err:
        _warn_build_failure(err.stderr)
        return False
    except Exception as err:
        _warn_build_failure(str(err).encode())
        return False


def _warn_build_failure(stderr) -> None:
    import warnings

    msg = (stderr or b"").decode(errors="replace").strip()
    warnings.warn(
        "building witw_tpu/native/libgeotiff_io.so failed:\n" + msg,
        stacklevel=3,
    )


def _src_hash() -> str:
    import hashlib

    with open(_SRC_PATH, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _lib_is_stale() -> bool:
    """True when geotiff_io.cpp changed since the .so was built (edit-and-
    rerun must not silently load the old binary). Compares a source content
    hash recorded at build time — mtime skew from archive extraction or image
    copies must not false-positive (it used to, hard-failing toolchain-less
    environments); mtime is only the fallback when no hash was recorded."""
    try:
        with open(_HASH_PATH) as f:
            return f.read().strip() != _src_hash()
    except OSError:
        pass
    try:
        return os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


def native_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH) or _lib_is_stale()) and not _build_native():
        if not os.path.exists(_LIB_PATH):
            return None
        if _lib_is_stale():
            # Never silently run an old binary after a source edit: the build
            # failure was warned above with the compiler output.
            raise RuntimeError(
                "witw_tpu/native/geotiff_io.cpp changed but rebuilding "
                "libgeotiff_io.so failed (see warning above); refusing to "
                "load the stale binary"
            )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gt_open.restype = ctypes.c_void_p
    lib.gt_open.argtypes = [ctypes.c_char_p]
    lib.gt_close.argtypes = [ctypes.c_void_p]
    for fn in ("gt_width", "gt_height"):
        getattr(lib, fn).restype = ctypes.c_long
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("gt_bands", "gt_bits", "gt_epsg", "gt_has_geo"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.gt_geotransform.restype = ctypes.c_int
    lib.gt_geotransform.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.gt_read_window.restype = ctypes.c_int
    lib.gt_read_window.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint16),
    ]
    lib.gt_write_u8.restype = ctypes.c_int
    lib.gt_write_u8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
    ]
    lib.geo_wgs84_to_utm.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.geo_utm_to_wgs84.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.geo_utm_epsg.restype = ctypes.c_int
    lib.geo_utm_epsg.argtypes = [ctypes.c_double, ctypes.c_double]
    lib.geo_utm_zone.restype = ctypes.c_int
    lib.geo_utm_zone.argtypes = [ctypes.c_double]
    lib.gt_resample.restype = ctypes.c_int
    lib.gt_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long, ctypes.c_int,
    ]
    _lib = lib
    return _lib


class GeoTiff:
    """Windowed GeoTIFF raster with GDAL-free geotransform support."""

    def __init__(self, path: str):
        self.path = path
        lib = native_lib()
        self._lib = lib
        self._handle = None
        self._fallback: Optional[np.ndarray] = None
        if lib is not None:
            h = lib.gt_open(path.encode())
            if h:
                self._handle = ctypes.c_void_p(h)
        if self._handle is None:
            import imageio.v3 as iio

            arr = np.asarray(iio.imread(path))
            if arr.ndim == 2:
                arr = arr[..., None]
            self._fallback = arr
            self._gt = np.array([0, 1, 0, 0, 0, -1], np.float64)
            self._epsg = 0

    # ---- metadata ----

    @property
    def width(self) -> int:
        if self._handle:
            return self._lib.gt_width(self._handle)
        return self._fallback.shape[1]

    @property
    def height(self) -> int:
        if self._handle:
            return self._lib.gt_height(self._handle)
        return self._fallback.shape[0]

    @property
    def bands(self) -> int:
        if self._handle:
            return self._lib.gt_bands(self._handle)
        return self._fallback.shape[2]

    @property
    def dtype(self):
        if self._handle:
            return np.uint16 if self._lib.gt_bits(self._handle) == 16 else np.uint8
        return self._fallback.dtype

    @property
    def epsg(self) -> int:
        if self._handle:
            return self._lib.gt_epsg(self._handle)
        return self._epsg

    @property
    def geotransform(self) -> np.ndarray:
        """GDAL-style affine [x0, dx, 0, y0, 0, dy]."""
        if self._handle:
            gt = (ctypes.c_double * 6)()
            self._lib.gt_geotransform(self._handle, gt)
            return np.asarray(gt[:], np.float64)
        return self._gt

    # ---- IO ----

    def read_window(self, x0: int, y0: int, w: int, h: int) -> np.ndarray:
        """Read a pixel window (clipped; outside = 0) as HWC in native dtype."""
        if self._handle:
            buf = np.zeros((h, w, self.bands), np.uint16)
            rc = self._lib.gt_read_window(
                self._handle, x0, y0, w, h,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            )
            if rc != 0:
                raise IOError(f"gt_read_window failed on {self.path}")
            return buf.astype(self.dtype)
        out = np.zeros((h, w, self.bands), self._fallback.dtype)
        sx0, sy0 = max(0, x0), max(0, y0)
        sx1, sy1 = min(self.width, x0 + w), min(self.height, y0 + h)
        if sx0 < sx1 and sy0 < sy1:
            out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = self._fallback[
                sy0:sy1, sx0:sx1
            ]
        return out

    def read(self) -> np.ndarray:
        return self.read_window(0, 0, self.width, self.height)

    def world_to_pixel(self, x: float, y: float) -> Tuple[float, float]:
        gt = self.geotransform
        return (x - gt[0]) / gt[1], (y - gt[3]) / gt[5]

    def pixel_to_world(self, px: float, py: float) -> Tuple[float, float]:
        gt = self.geotransform
        return gt[0] + px * gt[1], gt[3] + py * gt[5]

    def read_world_window(self, x_min, y_max, x_max, y_min, out_size=None) -> np.ndarray:
        """Read by world coords (projWin-style: ulx, uly, lrx, lry —
        the reference clips tiles with gdal.Translate(projWin=...),
        sitetiles.py:168-171)."""
        if self._handle is None:
            # The imageio fallback has NO georeferencing (identity transform,
            # EPSG 0): interpreting UTM meters as pixel indices would read
            # off-raster and return silently-black tiles.
            raise IOError(
                f"{self.path}: world-coordinate reads need the native GeoTIFF "
                "reader (the imageio fallback carries no geotransform) — "
                "build witw_tpu/native (make -C witw_tpu/native) or use "
                "pixel-space read_window()"
            )
        px0, py0 = self.world_to_pixel(x_min, y_max)
        px1, py1 = self.world_to_pixel(x_max, y_min)
        x0, y0 = int(round(px0)), int(round(py0))
        w, h = int(round(px1 - px0)), int(round(py1 - py0))
        tile = self.read_window(x0, y0, max(w, 1), max(h, 1))
        if out_size is not None and (tile.shape[0], tile.shape[1]) != out_size:
            tile = resample(tile.astype(np.float32), out_size[0], out_size[1]).astype(
                self.dtype
            )
        return tile

    def close(self):
        if self._handle:
            self._lib.gt_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def write_geotiff_u8(
    path: str,
    data: np.ndarray,
    geotransform: Optional[np.ndarray] = None,
    epsg: int = 0,
    compress: bool = True,
) -> None:
    """Write an HWC uint8 array as a (Geo)TIFF."""
    lib = native_lib()
    data = np.ascontiguousarray(data.astype(np.uint8))
    if data.ndim == 2:
        data = data[..., None]
    h, w, bands = data.shape
    if lib is not None:
        gt_ptr = None
        if geotransform is not None:
            gt_arr = (ctypes.c_double * 6)(*[float(v) for v in geotransform])
            gt_ptr = gt_arr
        rc = lib.gt_write_u8(
            path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, bands, gt_ptr, epsg, 1 if compress else 0,
        )
        if rc != 0:
            raise IOError(f"gt_write_u8 failed ({rc}) for {path}")
        return
    import imageio.v3 as iio

    iio.imwrite(path, data.squeeze())


def wgs84_to_utm(
    lat: float, lon: float, zone: Optional[int] = None,
    epsg: Optional[int] = None,
) -> Tuple[float, float, int]:
    """(lat, lon) -> (easting, northing, epsg). Replaces
    osr.CoordinateTransformation (reference sitetiles.py:147-151).

    ``epsg`` pins BOTH the zone and the hemisphere (false northing) of the
    target grid — required when projecting into an EXISTING raster's grid: a
    photo just across a 6-degree zone boundary (or the equator) from its
    city's strip would otherwise land in the adjacent grid, hundreds of km
    (or 10,000 km of false northing) off."""
    lib = native_lib()
    if epsg is not None:
        zone = epsg % 100
        north = (epsg // 100) == 326
    else:
        if zone is None:
            zone = int((lon + 180.0) / 6.0) + 1
        north = lat >= 0
        epsg = (32600 if north else 32700) + zone
    if lib is not None:
        e = ctypes.c_double()
        n = ctypes.c_double()
        lib.geo_wgs84_to_utm(lat, lon, zone, 1 if north else 0, ctypes.byref(e), ctypes.byref(n))
        return e.value, n.value, epsg
    return _py_wgs84_to_utm(lat, lon, zone, north) + (epsg,)


def utm_to_wgs84(easting: float, northing: float, epsg: int) -> Tuple[float, float]:
    lib = native_lib()
    north = 32600 <= epsg < 32700
    zone = epsg - (32600 if north else 32700)
    if lib is not None:
        lat = ctypes.c_double()
        lon = ctypes.c_double()
        lib.geo_utm_to_wgs84(easting, northing, zone, 1 if north else 0,
                             ctypes.byref(lat), ctypes.byref(lon))
        return lat.value, lon.value
    return _py_utm_to_wgs84(easting, northing, zone, north)


def resample(src: np.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> np.ndarray:
    """Native separable resample (bilinear | lanczos), HWC float32."""
    lib = native_lib()
    src = np.ascontiguousarray(src, np.float32)
    if src.ndim == 2:
        src = src[..., None]
    h, w, bands = src.shape
    if lib is not None:
        dst = np.zeros((out_h, out_w, bands), np.float32)
        rc = lib.gt_resample(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h, bands,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_w, out_h,
            1 if method == "lanczos" else 0,
        )
        if rc != 0:
            # a swallowed failure (e.g. bad_alloc on the native tmp buffer)
            # would return the untouched all-zero dst as "valid" pixels
            raise MemoryError(f"gt_resample failed (rc={rc}) at "
                              f"{h}x{w}x{bands} -> {out_h}x{out_w}")
        return dst
    import cv2

    interp = cv2.INTER_LANCZOS4 if method == "lanczos" else cv2.INTER_LINEAR
    out = cv2.resize(src, (out_w, out_h), interpolation=interp)
    return out[..., None] if out.ndim == 2 else out


def _py_wgs84_to_utm(lat, lon, zone, north):
    import math

    a, f, k0, e0 = 6378137.0, 1 / 298.257223563, 0.9996, 500000.0
    n = f / (2 - f)
    lat_r = math.radians(lat)
    lon_r = math.radians(lon) - math.radians(zone * 6 - 183)
    t = math.sinh(
        math.atanh(math.sin(lat_r))
        - 2 * math.sqrt(n) / (1 + n) * math.atanh(2 * math.sqrt(n) / (1 + n) * math.sin(lat_r))
    )
    xi = math.atan2(t, math.cos(lon_r))
    eta = math.atanh(math.sin(lon_r) / math.sqrt(1 + t * t))
    big_a = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = [0, n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16, 13 * n**2 / 48 - 3 * n**3 / 5, 61 * n**3 / 240]
    xi_s, eta_s = xi, eta
    for j in (1, 2, 3):
        xi_s += alpha[j] * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_s += alpha[j] * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    easting = e0 + k0 * big_a * eta_s
    northing = k0 * big_a * xi_s
    if not north:
        northing += 10000000.0
    return easting, northing


def _py_utm_to_wgs84(easting, northing, zone, north):
    """Inverse Krueger series (3rd order in n), mirroring the native
    geo_utm_to_wgs84 so reproject/heatmap degrade gracefully without the
    compiled .so; agrees with the native lib to <1e-6 deg (test-gated)."""
    import math

    a, f, k0, e0 = 6378137.0, 1 / 298.257223563, 0.9996, 500000.0
    n = f / (2 - f)
    if not north:
        northing -= 10000000.0
    big_a = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    xi = northing / (k0 * big_a)
    eta = (easting - e0) / (k0 * big_a)
    beta = [0, n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96, n**2 / 48 + n**3 / 15,
            17 * n**3 / 480]
    xi_p, eta_p = xi, eta
    for j in (1, 2, 3):
        xi_p -= beta[j] * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= beta[j] * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    delta = [0, 2 * n - 2 * n**2 / 3 - 2 * n**3, 7 * n**2 / 3 - 8 * n**3 / 5,
             56 * n**3 / 15]
    lat_r = chi
    for j in (1, 2, 3):
        lat_r += delta[j] * math.sin(2 * j * chi)
    lon = math.degrees(math.atan2(math.sinh(eta_p), math.cos(xi_p)))
    return math.degrees(lat_r), lon + (zone * 6 - 183)
