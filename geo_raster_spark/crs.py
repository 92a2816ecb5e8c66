"""Pure-NumPy CRS transforms.

The reference delegates to OSR/pyproj [ref: mod/geo_base_c.pyx:1000-1045,
844-998]; neither is available here, and the reference only ever uses three
families of CRS: geographic (EPSG:4326), MODIS sinusoidal (the ``modis_projection``
default, lib/global_task.py:94), and occasional projected meters.  We implement
the closed-form forward/inverse for those on NumPy arrays — *exact* per-pixel
transforms, replacing the reference's control-grid bilinear approximation
[ref: mod/geo_base_c.pyx:844-998] as documented in SURVEY.md §4 (intentional
deviation; parity gated by allclose).

CRS ids are strings: ``"EPSG:4326"``, ``"SINU"`` (MODIS sinusoidal,
R=6371007.181), ``"EPSG:3857"`` (spherical web mercator), and UTM zones
as ``"EPSG:326xx"`` (north) / ``"EPSG:327xx"`` (south) or ``"UTM:18N"`` —
the ellipsoidal transverse Mercator via the standard 4th-order Krüger /
Karney series (sub-mm inside a zone), which covers the UTM catalogs the
reference reads through OSR [ref: mod/geo_base_c.pyx:1000-1045].
"""

from __future__ import annotations

import math
import re

import numpy as np

R_SINU = 6371007.181   # MODIS sphere radius  [ref: lib/global_task.py:89]
R_MERC = 6378137.0     # WGS84 semi-major (spherical mercator)

GEOGRAPHIC = "EPSG:4326"
SINUSOIDAL = "SINU"
MERCATOR = "EPSG:3857"

# --- WGS84 ellipsoid + Krüger series coefficients (order n^4) -------------
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_N = _WGS84_F / (2.0 - _WGS84_F)
_A_BAR = _WGS84_A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)
_K0 = 0.9996
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
    61 * _N**3 / 240 - 103 * _N**4 / 140,
    49561 * _N**4 / 161280,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
    17 * _N**3 / 480 - 37 * _N**4 / 840,
    4397 * _N**4 / 161280,
)
_DELTA = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45,
    56 * _N**3 / 15 - 136 * _N**4 / 35,
    4279 * _N**4 / 630,
)
_UTM_RE = re.compile(r"^(?:EPSG:32([67])(\d{2})|UTM:(\d{1,2})([NS]))$", re.I)


def parse_utm(crs: str):
    """-> (zone, north) or None.  Accepts EPSG:326xx/327xx and UTM:xxN/S."""
    m = _UTM_RE.match(crs.strip())
    if not m:
        return None
    if m.group(1) is not None:
        return int(m.group(2)), m.group(1) == "6"
    return int(m.group(3)), m.group(4).upper() == "N"


def _utm_forward(zone: int, north: bool, lon, lat):
    lon0 = math.radians(zone * 6 - 183)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - lon0
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    c = 2.0 * math.sqrt(_N) / (1.0 + _N)
    t = np.sinh(np.arctanh(np.sin(phi)) - c * np.arctanh(c * np.sin(phi)))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(_ALPHA, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    E = 500000.0 + _K0 * _A_BAR * x
    Nn = (0.0 if north else 10_000_000.0) + _K0 * _A_BAR * y
    return E, Nn


def _utm_inverse(zone: int, north: bool, E, Nn):
    lon0 = math.radians(zone * 6 - 183)
    xi = (np.asarray(Nn, dtype=np.float64)
          - (0.0 if north else 10_000_000.0)) / (_K0 * _A_BAR)
    eta = (np.asarray(E, dtype=np.float64) - 500000.0) / (_K0 * _A_BAR)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam + lon0), np.degrees(phi)


def is_geographic(crs: str) -> bool:
    return crs.upper() in ("EPSG:4326", "WGS84", "CRS84")


def _to_geog(crs, x, y):
    """Inverse: (crs coords) -> (lon, lat) degrees."""
    c = crs.upper()
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if is_geographic(c):
        return x, y
    if c == SINUSOIDAL:
        lat = np.degrees(y / R_SINU)
        with np.errstate(invalid="ignore", divide="ignore"):
            lon = np.degrees(x / (R_SINU * np.cos(np.radians(lat))))
        return lon, lat
    if c == MERCATOR:
        lon = np.degrees(x / R_MERC)
        lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERC)) - math.pi / 2)
        return lon, lat
    utm = parse_utm(c)
    if utm is not None:
        return _utm_inverse(utm[0], utm[1], x, y)
    raise ValueError(f"unknown crs {crs}")


def _from_geog(crs, lon, lat):
    """Forward: (lon, lat) degrees -> crs coords."""
    c = crs.upper()
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if is_geographic(c):
        return lon, lat
    if c == SINUSOIDAL:
        y = R_SINU * np.radians(lat)
        x = R_SINU * np.radians(lon) * np.cos(np.radians(lat))
        return x, y
    if c == MERCATOR:
        x = R_MERC * np.radians(lon)
        lat_c = np.clip(lat, -85.06, 85.06)
        y = R_MERC * np.log(np.tan(math.pi / 4 + np.radians(lat_c) / 2))
        return x, y
    utm = parse_utm(c)
    if utm is not None:
        return _utm_forward(utm[0], utm[1], lon, lat)
    raise ValueError(f"unknown crs {crs}")


def transform(src_crs: str, dst_crs: str, x, y):
    """Vectorized coordinate transform src -> dst.

    Role of the reference's ``projection_transform.project``
    [ref: mod/geo_base_c.pyx:956-998] but exact, whole-array.
    """
    if src_crs.upper() == dst_crs.upper():
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = _to_geog(src_crs, x, y)
    return _from_geog(dst_crs, lon, lat)


def transform_extent(src_crs, dst_crs, ext, div=21):
    """Reproject an extent by densifying its boundary (``segment_ratio``-style
    edge densification, ref mod/geo_base_c.pyx:712-736) and taking the bbox."""
    minx, miny, maxx, maxy = ext
    t = np.linspace(0.0, 1.0, div)
    xs = np.concatenate([
        minx + (maxx - minx) * t, np.full(div, maxx),
        maxx - (maxx - minx) * t, np.full(div, minx)])
    ys = np.concatenate([
        np.full(div, maxy), maxy - (maxy - miny) * t,
        np.full(div, miny), miny + (maxy - miny) * t])
    tx, ty = transform(src_crs, dst_crs, xs, ys)
    ok = np.isfinite(tx) & np.isfinite(ty)
    tx, ty = tx[ok], ty[ok]
    return (float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max()))
