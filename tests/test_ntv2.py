"""NTv2 grid-shift datum tests over spec-built synthetic .gsb fixtures.

The engine ships no grid files (none exist in-sandbox and the format is
the contract, not any one grid) — fixtures are constructed byte-by-byte
from the public NTv2 layout: 16-byte name/value header records, float32
node quads from the (S_LAT, E_LONG) corner with longitude positive WEST
and columns increasing westward.  The interpolation oracle is analytic:
a bilinear field sampled AT the nodes must be reproduced EXACTLY (up to
float32 node storage) by bilinear interpolation anywhere inside.
"""
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from geo_raster_spark import crs, ntv2

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rec(name: str, val: bytes) -> bytes:
    assert len(val) == 8
    return name.encode().ljust(8)[:8] + val


def _int_rec(name, v, bo="<"):
    return _rec(name, struct.pack(bo + "i", v) + b"\x00" * 4)


def _dbl_rec(name, v, bo="<"):
    return _rec(name, struct.pack(bo + "d", v))


def _str_rec(name, s):
    return _rec(name, s.encode().ljust(8)[:8])


def build_gsb(subgrids, bo="<", gs_type="SECONDS"):
    """subgrids: list of dicts with bounds/incs in arc-seconds
    (positive-west longitudes) and shift(lat_sec, lonw_sec) callables
    returning (dlat_sec, dlonw_sec)."""
    out = [
        _int_rec("NUM_OREC", 11, bo), _int_rec("NUM_SREC", 11, bo),
        _int_rec("NUM_FILE", len(subgrids), bo),
        _str_rec("GS_TYPE", gs_type), _str_rec("VERSION", "NTv2.0"),
        _str_rec("SYSTEM_F", "NAD27"), _str_rec("SYSTEM_T", "NAD83"),
        _dbl_rec("MAJOR_F", 6378206.4, bo), _dbl_rec("MINOR_F", 6356583.8,
                                                     bo),
        _dbl_rec("MAJOR_T", 6378137.0, bo), _dbl_rec("MINOR_T", 6356752.3,
                                                     bo),
    ]
    for g in subgrids:
        nrows = int(round((g["n_lat"] - g["s_lat"]) / g["lat_inc"])) + 1
        ncols = int(round((g["w_long"] - g["e_long"]) / g["long_inc"])) + 1
        out += [
            _str_rec("SUB_NAME", g["name"]),
            _str_rec("PARENT", g.get("parent", "NONE")),
            _str_rec("CREATED", "20260817"), _str_rec("UPDATED", "20260817"),
            _dbl_rec("S_LAT", g["s_lat"], bo), _dbl_rec("N_LAT", g["n_lat"],
                                                        bo),
            _dbl_rec("E_LONG", g["e_long"], bo),
            _dbl_rec("W_LONG", g["w_long"], bo),
            _dbl_rec("LAT_INC", g["lat_inc"], bo),
            _dbl_rec("LONG_INC", g["long_inc"], bo),
            _int_rec("GS_COUNT", nrows * ncols, bo),
        ]
        nodes = []
        for r in range(nrows):
            for c in range(ncols):
                lat_sec = g["s_lat"] + r * g["lat_inc"]
                lonw_sec = g["e_long"] + c * g["long_inc"]
                dlat, dlonw = g["shift"](lat_sec, lonw_sec)
                nodes.append(struct.pack(bo + "4f", dlat, dlonw, 0.1, 0.1))
        out.append(b"".join(nodes))
    return b"".join(out)


# a CONUS-ish window: lat 30..40N, lon 90..100W (positive-west seconds)
def _linear_shift(lat_sec, lonw_sec):
    """Bilinear-exact analytic field (arc-seconds)."""
    dlat = 0.8 + 1e-5 * (lat_sec - 108000.0) + 2e-6 * (lonw_sec - 324000.0)
    dlonw = 1.6 - 5e-6 * (lat_sec - 108000.0) + 1e-5 * (lonw_sec - 324000.0)
    return dlat, dlonw


_PARENT = dict(name="CONUS", s_lat=30 * 3600.0, n_lat=40 * 3600.0,
               e_long=90 * 3600.0, w_long=100 * 3600.0,
               lat_inc=1800.0, long_inc=1800.0, shift=_linear_shift)
# a denser child over lat 33..35, lon 94..96W with a DIFFERENT field
_CHILD = dict(name="DENSE", parent="CONUS", s_lat=33 * 3600.0,
              n_lat=35 * 3600.0, e_long=94 * 3600.0, w_long=96 * 3600.0,
              lat_inc=300.0, long_inc=300.0,
              shift=lambda a, b: (2.5, -1.0))


def test_parse_and_bilinear_matches_analytic_field():
    g = ntv2.parse_ntv2(build_gsb([_PARENT]))
    assert g.system_f == "NAD27" and g.system_t == "NAD83"
    (sub,) = g.subgrids
    assert (sub.nrows, sub.ncols) == (21, 21)
    rng = np.random.default_rng(7)
    lat = rng.uniform(30.01, 39.99, 500)
    lon = -rng.uniform(90.01, 99.99, 500)  # east-negative = west
    dlat, dlonw, cov = g.shift(lon, lat)
    assert cov.all()
    exp_dlat, exp_dlonw = _linear_shift(lat * 3600.0, -lon * 3600.0)
    # float32 node storage is the only error source for a bilinear field
    np.testing.assert_allclose(dlat, exp_dlat, atol=5e-6)
    np.testing.assert_allclose(dlonw, exp_dlonw, atol=5e-6)


def test_big_endian_fixture_identical():
    gle = ntv2.parse_ntv2(build_gsb([_PARENT], bo="<"))
    gbe = ntv2.parse_ntv2(build_gsb([_PARENT], bo=">"))
    lat = np.array([31.7, 36.2, 39.1])
    lon = np.array([-91.3, -95.5, -99.2])
    for a, b in zip(gle.shift(lon, lat), gbe.shift(lon, lat)):
        np.testing.assert_array_equal(a, b)


def test_child_subgrid_wins_inside_parent_outside():
    g = ntv2.parse_ntv2(build_gsb([_PARENT, _CHILD]))
    dlat, dlonw, cov = g.shift(np.array([-95.0, -91.0]),
                               np.array([34.0, 31.0]))
    assert cov.all()
    # inside the child: its constant field
    assert dlat[0] == pytest.approx(2.5, abs=1e-6)
    assert dlonw[0] == pytest.approx(-1.0, abs=1e-6)
    # outside the child: the parent's analytic field
    e = _linear_shift(31 * 3600.0, 91 * 3600.0)
    assert dlat[1] == pytest.approx(e[0], abs=5e-6)
    assert dlonw[1] == pytest.approx(e[1], abs=5e-6)


def test_forward_inverse_round_trip_and_coverage():
    g = ntv2.parse_ntv2(build_gsb([_PARENT]))
    lon = np.array([-95.0, -120.0])  # second point OUTSIDE coverage
    lat = np.array([35.0, 45.0])
    flon, flat, cov = g.forward(lon, lat)
    assert cov.tolist() == [True, False]
    # positive-west shift moves the east-longitude WEST (more negative)
    assert flon[0] < lon[0] and flat[0] > lat[0]
    assert flon[1] == lon[1] and flat[1] == lat[1]  # uncovered: passthrough
    blon, blat, _ = g.inverse(flon[:1], flat[:1])
    np.testing.assert_allclose(blon, lon[:1], atol=1e-10)
    np.testing.assert_allclose(blat, lat[:1], atol=1e-10)


def test_loud_raises_on_malformed_files():
    with pytest.raises(ValueError, match="NUM_OREC"):
        ntv2.parse_ntv2(b"GARBAGE!" + b"\x00" * 200)
    with pytest.raises(ValueError, match="byte order"):
        ntv2.parse_ntv2(_int_rec("NUM_OREC", 12) + b"\x00" * 160)
    with pytest.raises(ValueError, match="GS_TYPE"):
        ntv2.parse_ntv2(build_gsb([_PARENT], gs_type="RADIANS"))
    # corrupt GS_COUNT
    good = bytearray(build_gsb([_PARENT]))
    off = 11 * 16 + 10 * 16  # GS_COUNT record value in the subgrid header
    good[off + 8: off + 12] = struct.pack("<i", 999)
    with pytest.raises(ValueError, match="GS_COUNT"):
        ntv2.parse_ntv2(bytes(good))
    # truncated node section
    with pytest.raises(ValueError, match="truncated"):
        ntv2.parse_ntv2(build_gsb([_PARENT])[:-16])
    # degenerate 1-row grid
    bad = dict(_PARENT, n_lat=_PARENT["s_lat"])
    with pytest.raises(ValueError, match="degenerate"):
        ntv2.parse_ntv2(build_gsb([bad]))


@pytest.fixture
def nad27_grid():
    g = ntv2.parse_ntv2(build_gsb([_PARENT]))
    crs.register_grid_shift("NAD27", g)
    try:
        yield g
    finally:
        crs.unregister_grid_shift("NAD27")


def test_crs_transform_routes_through_registered_grid(nad27_grid):
    lon, lat = np.array([-95.2]), np.array([34.6])
    # EPSG:4267 (NAD27 geographic) -> WGS84 must equal the grid forward
    glon, glat = crs.transform("EPSG:4267", "EPSG:4326", lon, lat)
    elon, elat, cov = nad27_grid.forward(lon, lat)
    assert cov.all()
    np.testing.assert_allclose(glon, elon, atol=1e-12)
    np.testing.assert_allclose(glat, elat, atol=1e-12)
    # differs from the mean-Helmert answer by a detectable amount
    hlon, hlat = crs._helmert_to_wgs84(lon, lat, "NAD27")
    assert abs(glon[0] - hlon[0]) + abs(glat[0] - hlat[0]) > 1e-6
    # round-trip through the grid inverse closes
    blon, blat = crs.transform("EPSG:4326", "EPSG:4267", glon, glat)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat, atol=1e-9)


def test_outside_coverage_falls_back_to_mean_helmert(nad27_grid):
    lon, lat = np.array([-120.0]), np.array([45.0])  # outside the fixture
    glon, glat = crs.transform("EPSG:4267", "EPSG:4326", lon, lat)
    hlon, hlat = crs._helmert_to_wgs84(lon, lat, "NAD27")
    np.testing.assert_allclose(glon, hlon, atol=1e-12)
    np.testing.assert_allclose(glat, hlat, atol=1e-12)


def test_projected_nad27_crs_uses_grid_datum_leg(nad27_grid):
    # EPSG:26715 = NAD27 / UTM 15N covers the fixture window
    x, y = crs.transform("EPSG:4326", "EPSG:26715",
                                np.array([-95.0]), np.array([34.0]))
    lon2, lat2 = crs.transform("EPSG:26715", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, [-95.0], atol=1e-7)
    np.testing.assert_allclose(lat2, [34.0], atol=1e-7)
    # and the grid made a measurable difference vs the Helmert-only path
    crs.unregister_grid_shift("NAD27")
    xh, yh = crs.transform("EPSG:4326", "EPSG:26715",
                                  np.array([-95.0]), np.array([34.0]))
    assert abs(x[0] - xh[0]) + abs(y[0] - yh[0]) > 0.5  # metres


def test_register_guards():
    with pytest.raises(ValueError, match="registered Helmert datum"):
        crs.register_grid_shift("PSAD56", ntv2.parse_ntv2(
            build_gsb([_PARENT])))
    with pytest.raises(TypeError):
        crs.register_grid_shift("NAD27", 42)


def test_env_seam_reaches_executor_workers(tmp_path):
    """The warp/tile_cut datum leg runs inside applyInPandas on executor
    Python workers — separate processes from the driver, so a driver-side
    register_grid_shift cannot reach them.  Prove the GSR_NTV2_GRIDS env
    seam does: fresh session in a subprocess with the var set, shift
    evaluated INSIDE mapInPandas, compared to the grid oracle."""
    p = tmp_path / "conus.gsb"
    p.write_bytes(build_gsb([_PARENT]))
    child = '''
import sys
sys.path.insert(0, %r)
import pandas as pd
from geo_raster_spark.session import get_spark
spark = get_spark(app_name="ntv2seam", cores=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame([(-95.2, 34.6)], "lon double, lat double")
def shift(it):
    from geo_raster_spark import crs
    for pdf in it:
        lon, lat = crs._datum_to_wgs84(pdf.lon.values, pdf.lat.values,
                                       "NAD27")
        yield pd.DataFrame({"lon": lon, "lat": lat})
row = df.mapInPandas(shift, "lon double, lat double").collect()[0]
print("RESULT %%.12f %%.12f" %% (row.lon, row.lat))
''' % _REPO
    env = dict(os.environ, GSR_NTV2_GRIDS=f"NAD27={p}")
    r = subprocess.run([sys.executable, "-c", child], env=env,
                       capture_output=True, text=True, timeout=300)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    assert lines, (r.stdout[-500:], r.stderr[-2000:])
    lon, lat = map(float, lines[0].split()[1:])
    g = ntv2.parse_ntv2(build_gsb([_PARENT]))
    elon, elat, cov = g.forward(np.array([-95.2]), np.array([34.6]))
    assert cov.all()
    assert lon == pytest.approx(elon[0], abs=1e-9)
    assert lat == pytest.approx(elat[0], abs=1e-9)


def test_env_seam_loads_grid_per_process(tmp_path, monkeypatch):
    p = tmp_path / "conus.gsb"
    p.write_bytes(build_gsb([_PARENT]))
    monkeypatch.setenv("GSR_NTV2_GRIDS", f"NAD27={p}")
    monkeypatch.setattr(crs, "_env_grids_loaded", False)
    monkeypatch.setattr(crs, "_GRID_SHIFTS", {})
    g = crs._grid_for("NAD27")
    assert isinstance(g, ntv2.Ntv2Grid) and g.system_f == "NAD27"
    # malformed entries raise loudly, not silently skip
    monkeypatch.setenv("GSR_NTV2_GRIDS", "justapath.gsb")
    monkeypatch.setattr(crs, "_env_grids_loaded", False)
    monkeypatch.setattr(crs, "_GRID_SHIFTS", {})
    with pytest.raises(ValueError, match="GSR_NTV2_GRIDS"):
        crs._grid_for("NAD27")
    # a failed load must NOT latch: Spark reuses Python workers across
    # task retries, and a latched failure would silently downgrade every
    # later transform to the mean Helmert (review r7, third pass)
    with pytest.raises(ValueError, match="GSR_NTV2_GRIDS"):
        crs._grid_for("NAD27")
    # a missing grid FILE keeps raising on retry too, and a half-valid
    # multi-entry spec registers nothing
    monkeypatch.setenv("GSR_NTV2_GRIDS",
                       f"NAD27={p};ED50={tmp_path}/missing.gsb")
    monkeypatch.setattr(crs, "_env_grids_loaded", False)
    monkeypatch.setattr(crs, "_GRID_SHIFTS", {})
    for _ in range(2):
        with pytest.raises(FileNotFoundError):
            crs._grid_for("NAD27")
    assert crs._GRID_SHIFTS == {}   # the valid NAD27 entry did NOT leak in
    # pathlib.Path registration works (the docstring invites paths)
    import pathlib
    monkeypatch.setattr(crs, "_GRID_SHIFTS", {})
    crs.register_grid_shift("NAD27", pathlib.Path(p))
    assert crs._GRID_SHIFTS["NAD27"].system_f == "NAD27"
