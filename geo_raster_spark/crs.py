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
R=6371007.181), ``"EPSG:3857"`` (spherical web mercator).
"""

from __future__ import annotations

import math

import numpy as np

R_SINU = 6371007.181   # MODIS sphere radius  [ref: lib/global_task.py:89]
R_MERC = 6378137.0     # WGS84 semi-major (spherical mercator)

GEOGRAPHIC = "EPSG:4326"
SINUSOIDAL = "SINU"
MERCATOR = "EPSG:3857"


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
