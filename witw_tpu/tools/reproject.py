"""Raster reprojection to UTM at fixed ground resolution.

Replaces reference tools/dataset_building/reproject_strips.py (which shells
out ``gdalwarp -t_srs EPSG:<utm> -tr .3 .3 -r lanczos``): inverse-mapped warp
using the native geodesy + Lanczos sampling. The source raster may be in
geographic WGS84 (EPSG:4326) or another UTM zone; each destination pixel is
inverse-projected to source coordinates and sampled.
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

from witw_tpu.tools.cities import CITIES, strip_filename
from witw_tpu.tools.geotiff import (
    GeoTiff,
    utm_to_wgs84,
    wgs84_to_utm,
    write_geotiff_u8,
)


def _lanczos3(x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    nz = (np.abs(x) < 3) & (x != 0)
    px = math.pi * x[nz]
    out[nz] = 3.0 * np.sin(px) * np.sin(px / 3.0) / (px * px)
    out[x == 0] = 1.0
    return out


def _sample_lanczos(img: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample img (HWC) at float coords (xs, ys) with a 6x6 Lanczos3 kernel."""
    h, w, c = img.shape
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    acc = np.zeros((*xs.shape, c), np.float64)
    wsum = np.zeros(xs.shape, np.float64)
    for dy in range(-2, 4):
        wy = _lanczos3(ys - (y0 + dy))
        yy = np.clip(y0 + dy, 0, h - 1)
        for dx in range(-2, 4):
            wx = _lanczos3(xs - (x0 + dx))
            xx = np.clip(x0 + dx, 0, w - 1)
            wgt = wx * wy
            acc += wgt[..., None] * img[yy, xx]
            wsum += wgt
    return acc / np.maximum(wsum, 1e-12)[..., None]


def reproject_to_utm(
    src_path: str,
    dst_path: str,
    dst_epsg: int,
    resolution: float = 0.3,
    block: int = 2048,
    resample: str = "lanczos",
) -> None:
    """Warp a WGS84 (EPSG:4326) raster to a UTM grid at `resolution` m/px."""
    with GeoTiff(src_path) as src:
        gt = src.geotransform
        src_epsg = src.epsg

        def src_world_to_utm(lon, lat):
            # epsg= pins zone AND hemisphere to the destination grid: a
            # northern-grid strip dipping below the equator must not get
            # +10,000,000 m false northing on its southern corners (which
            # inflated out_h to ~33M rows)
            e, n, _ = wgs84_to_utm(lat, lon, epsg=dst_epsg)
            return e, n

        # destination bounds: project source corners
        corners = []
        for px, py in [(0, 0), (src.width, 0), (0, src.height), (src.width, src.height)]:
            x, y = src.pixel_to_world(px, py)
            if src_epsg in (0, 4326):
                lon, lat = x, y
            else:
                lat, lon = utm_to_wgs84(x, y, src_epsg)
            corners.append(src_world_to_utm(lon, lat))
        es = [c[0] for c in corners]
        ns = [c[1] for c in corners]
        e_min, e_max = min(es), max(es)
        n_min, n_max = min(ns), max(ns)
        out_w = int(math.ceil((e_max - e_min) / resolution))
        out_h = int(math.ceil((n_max - n_min) / resolution))

        out = np.zeros((out_h, out_w, src.bands), np.uint8)

        for by in range(0, out_h, block):
            for bx in range(0, out_w, block):
                bw = min(block, out_w - bx)
                bh = min(block, out_h - by)
                jj, ii = np.meshgrid(np.arange(bw), np.arange(bh))
                easting = e_min + (bx + jj + 0.5) * resolution
                northing = n_max - (by + ii + 0.5) * resolution
                # dst UTM -> WGS84 -> source pixel coords
                lat, lon = _utm_to_wgs84_vec(easting, northing, dst_epsg)
                if src_epsg in (0, 4326):
                    sx = (lon - gt[0]) / gt[1]
                    sy = (lat - gt[3]) / gt[5]
                else:
                    se, sn = _wgs84_to_utm_vec(lat, lon, src_epsg)
                    sx = (se - gt[0]) / gt[1]
                    sy = (sn - gt[3]) / gt[5]
                # Windowed source read covering this block's sample coords
                # plus the 6-tap Lanczos support (the replaced gdalwarp
                # streams both sides; a whole-raster read would need tens of
                # GB for a full city strip). Clipping the window to the
                # raster keeps the kernel's coordinate clamp equal to the
                # old whole-image edge-replicate behavior.
                cx = np.clip(sx, -4.0, src.width + 4.0)
                cy = np.clip(sy, -4.0, src.height + 4.0)
                x0 = max(0, int(math.floor(cx.min())) - 3)
                x1 = min(src.width, int(math.ceil(cx.max())) + 4)
                y0 = max(0, int(math.floor(cy.min())) - 3)
                y1 = min(src.height, int(math.ceil(cy.max())) + 4)
                if x0 >= x1 or y0 >= y1:
                    continue  # block entirely off-raster: stays zero
                win = src.read_window(x0, y0, x1 - x0, y1 - y0).astype(np.float32)
                lx, ly = sx - x0, sy - y0
                if resample == "lanczos":
                    vals = _sample_lanczos(win, lx, ly)
                else:
                    xi = np.clip(np.round(lx).astype(int), 0, win.shape[1] - 1)
                    yi = np.clip(np.round(ly).astype(int), 0, win.shape[0] - 1)
                    vals = win[yi, xi]
                inside = (sx >= -0.5) & (sx < src.width - 0.5) & (sy >= -0.5) & (sy < src.height - 0.5)
                vals = np.where(inside[..., None], vals, 0)
                out[by : by + bh, bx : bx + bw] = np.clip(np.round(vals), 0, 255).astype(np.uint8)

        dst_gt = np.array([e_min, resolution, 0.0, n_max, 0.0, -resolution])
        write_geotiff_u8(dst_path, out, dst_gt, dst_epsg)


# Vectorized Krueger-series transforms (numpy) — same math as the native
# geodesy (geotiff_io.cpp), validated against it in tests.
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0
_N = _F / (2.0 - _F)


def _utm_to_wgs84_vec(e, n, epsg):
    north = 32600 <= epsg < 32700
    zone = epsg - (32600 if north else 32700)
    nn = _N
    big_a = _A / (1 + nn) * (1 + nn**2 / 4 + nn**4 / 64)
    y = np.asarray(n, np.float64) - (0.0 if north else 10000000.0)
    xi = y / (_K0 * big_a)
    eta = (np.asarray(e, np.float64) - _E0) / (_K0 * big_a)
    beta = [0, nn / 2 - 2 * nn**2 / 3 + 37 * nn**3 / 96, nn**2 / 48 + nn**3 / 15, 17 * nn**3 / 480]
    xi_p, eta_p = xi.copy(), eta.copy()
    for j in (1, 2, 3):
        xi_p -= beta[j] * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= beta[j] * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    lat = chi.copy()
    delta = [0, 2 * nn - 2 * nn**2 / 3 - 2 * nn**3, 7 * nn**2 / 3 - 8 * nn**3 / 5, 56 * nn**3 / 15]
    for j in (1, 2, 3):
        lat += delta[j] * np.sin(2 * j * chi)
    lon0 = zone * 6.0 - 183.0
    return np.degrees(lat), lon0 + np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))


def _wgs84_to_utm_vec(lat, lon, epsg):
    north = 32600 <= epsg < 32700
    zone = epsg - (32600 if north else 32700)
    nn = _N
    lat_r = np.radians(np.asarray(lat, np.float64))
    lon_r = np.radians(np.asarray(lon, np.float64)) - math.radians(zone * 6 - 183)
    s = np.sin(lat_r)
    t = np.sinh(np.arctanh(s) - 2 * math.sqrt(nn) / (1 + nn) * np.arctanh(2 * math.sqrt(nn) / (1 + nn) * s))
    xi = np.arctan2(t, np.cos(lon_r))
    eta = np.arctanh(np.sin(lon_r) / np.sqrt(1 + t * t))
    big_a = _A / (1 + nn) * (1 + nn**2 / 4 + nn**4 / 64)
    alpha = [0, nn / 2 - 2 * nn**2 / 3 + 5 * nn**3 / 16, 13 * nn**2 / 48 - 3 * nn**3 / 5, 61 * nn**3 / 240]
    xi_s, eta_s = xi.copy(), eta.copy()
    for j in (1, 2, 3):
        xi_s += alpha[j] * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_s += alpha[j] * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    easting = _E0 + _K0 * big_a * eta_s
    northing = _K0 * big_a * xi_s + (0.0 if north else 10000000.0)
    return easting, northing


def reproject_strips(src_dir: str, dst_dir: str, resolution: float = 0.3):
    """Per-city driver (reference reproject_strips.py:39-54)."""
    os.makedirs(dst_dir, exist_ok=True)
    for name, city in CITIES.items():
        fn = strip_filename(name)
        src = os.path.join(src_dir, fn)
        if not os.path.exists(src):
            continue
        reproject_to_utm(src, os.path.join(dst_dir, fn), city.epsg, resolution)
        print(f"reprojected {fn} -> EPSG:{city.epsg}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Reproject strips to UTM")
    parser.add_argument("--src-dir", required=True)
    parser.add_argument("--dst-dir", required=True)
    parser.add_argument("--resolution", type=float, default=0.3)
    args = parser.parse_args(argv)
    reproject_strips(args.src_dir, args.dst_dir, args.resolution)


if __name__ == "__main__":
    main()
