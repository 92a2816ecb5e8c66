"""NTv2 grid-shift datum support (.gsb reader + bilinear shift math).

[ref: mod/geo_base_c.pyx:1000-1045 — the reference resolves NAD27-class
CRSs through OSR, which applies NADCON/NTv2 grid files when they are
installed; without grids it falls back to whatever TOWGS84 the CRS
carries.]  This module implements the same capability natively: it reads
the PUBLIC NTv2 binary format (the ``.gsb`` layout Natural Resources
Canada published, consumed by PROJ/GDAL/GeoTools) and bilinearly
interpolates the per-node latitude/longitude shifts.  ``crs`` routes a
datum's transform through a REGISTERED grid instead of its single mean
Helmert (see ``crs.register_grid_shift``), upgrading e.g. NAD27 from the
EPSG:1173 ~10 m mean-shift class to the grid's survey-grade accuracy —
deployment drops in the published ``conus.gsb``/``ntv2_0.gsb`` files; the
engine itself ships none (tests build spec-exact synthetic fixtures).

Scale shape: grids are megabyte-class arrays loaded once per Python
worker process (lazily, via the ``GSR_NTV2_GRIDS`` env seam — the same
per-worker registration pattern as ``GSR_FASTJPEG``) and interpolation is
vectorized NumPy over the whole coordinate batch, so the datum leg of a
cross-datum warp/tile_cut keeps its plan shape: no per-row Python, no
driver participation, nothing shuffled.

Format notes (all public spec):
- 11 overview records of 16 bytes (8-char name + 8-byte value), then per
  subgrid 11 header records + ``GS_COUNT`` nodes of 4 float32s
  (lat shift, lon shift, lat accuracy, lon accuracy), shifts in
  arc-seconds FROM the source datum TO the target.
- Longitudes are in arc-seconds POSITIVE WEST; nodes run row-major from
  the (S_LAT, E_LONG) corner, column index increasing WESTWARD.
- Byte order is sniffed from NUM_OREC's int32 value (11 in LE or BE).
- Child subgrids densify a region of their parent; the finest subgrid
  containing a point wins.
"""
from __future__ import annotations

import struct

import numpy as np

_REC = 16  # bytes per header record: 8-char name + 8-byte value
_HDR_N = 11  # records per overview header AND per subgrid header


def _records(data: bytes, off: int, n: int) -> dict:
    """n raw 16-byte records at off -> {name: 8-byte value bytes}."""
    if off + n * _REC > len(data):
        raise ValueError("NTv2: truncated header (file too short)")
    out = {}
    for i in range(n):
        rec = data[off + i * _REC: off + (i + 1) * _REC]
        out[rec[:8].decode("ascii", "replace").strip()] = rec[8:]
    return out


def _int(val: bytes, bo: str) -> int:
    return struct.unpack(bo + "i", val[:4])[0]


def _dbl(val: bytes, bo: str) -> float:
    return struct.unpack(bo + "d", val)[0]


def _str(val: bytes) -> str:
    return val.decode("ascii", "replace").strip()


class Ntv2SubGrid:
    """One subgrid: bounds/increments in arc-seconds (positive-west
    longitudes) + (nrows, ncols) float64 shift arrays in arc-seconds."""

    __slots__ = ("name", "parent", "s_lat", "n_lat", "e_long", "w_long",
                 "lat_inc", "long_inc", "nrows", "ncols",
                 "lat_shift", "long_shift")

    def __init__(self, name, parent, s_lat, n_lat, e_long, w_long,
                 lat_inc, long_inc, lat_shift, long_shift):
        self.name, self.parent = name, parent
        self.s_lat, self.n_lat = s_lat, n_lat
        self.e_long, self.w_long = e_long, w_long
        self.lat_inc, self.long_inc = lat_inc, long_inc
        self.nrows, self.ncols = lat_shift.shape
        self.lat_shift, self.long_shift = lat_shift, long_shift

    def contains(self, lat_sec, lonw_sec):
        return ((lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
                & (lonw_sec >= self.e_long) & (lonw_sec <= self.w_long))

    def interp(self, lat_sec, lonw_sec):
        """Bilinear (dlat_sec, dlonw_sec) at points INSIDE the bounds
        (boundary points clamp into the outermost cell)."""
        fr = (lat_sec - self.s_lat) / self.lat_inc
        fc = (lonw_sec - self.e_long) / self.long_inc
        r0 = np.clip(np.floor(fr).astype(np.int64), 0, self.nrows - 2)
        c0 = np.clip(np.floor(fc).astype(np.int64), 0, self.ncols - 2)
        dr, dc = fr - r0, fc - c0

        def bl(g):
            return (g[r0, c0] * (1 - dr) * (1 - dc)
                    + g[r0, c0 + 1] * (1 - dr) * dc
                    + g[r0 + 1, c0] * dr * (1 - dc)
                    + g[r0 + 1, c0 + 1] * dr * dc)

        return bl(self.lat_shift), bl(self.long_shift)


class Ntv2Grid:
    """A parsed NTv2 file: subgrids + source/target system labels."""

    def __init__(self, subgrids, system_f: str, system_t: str):
        if not subgrids:
            raise ValueError("NTv2: no subgrids")
        self.subgrids = list(subgrids)
        self.system_f, self.system_t = system_f, system_t
        # coarse-to-fine application order: a finer (smaller-cell) child
        # OVERWRITES its parent's values where both contain the point
        self._order = sorted(
            range(len(self.subgrids)),
            key=lambda i: -(self.subgrids[i].lat_inc
                            * self.subgrids[i].long_inc))

    def shift(self, lon, lat):
        """(dlat_sec, dlonw_sec, covered) at (lon east-deg, lat deg)
        arrays; uncovered points get zero shift and covered=False."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lat_sec = np.ravel(lat) * 3600.0
        lonw_sec = -np.ravel(lon) * 3600.0  # east-positive -> west-positive
        dlat = np.zeros_like(lat_sec)
        dlonw = np.zeros_like(lonw_sec)
        covered = np.zeros(lat_sec.shape, dtype=bool)
        for i in self._order:
            sub = self.subgrids[i]
            m = sub.contains(lat_sec, lonw_sec)
            if m.any():
                a, b = sub.interp(lat_sec[m], lonw_sec[m])
                dlat[m], dlonw[m] = a, b
                covered[m] = True
        shp = np.shape(lat)
        return dlat.reshape(shp), dlonw.reshape(shp), covered.reshape(shp)

    def forward(self, lon, lat):
        """Source datum -> target datum (e.g. NAD27 -> NAD83): returns
        (lon, lat, covered); uncovered points pass through unchanged."""
        dlat, dlonw, cov = self.shift(lon, lat)
        return (np.asarray(lon, np.float64) - dlonw / 3600.0,
                np.asarray(lat, np.float64) + dlat / 3600.0, cov)

    def inverse(self, lon, lat, iters: int = 4):
        """Target datum -> source datum by fixed-point iteration (the
        grid is sampled at SOURCE coordinates, so invert iteratively —
        shifts vary slowly, a handful of steps converge to float64)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lon_s, lat_s = lon.copy(), lat.copy()
        cov = np.zeros(np.shape(lat), dtype=bool)
        for _ in range(iters):
            dlat, dlonw, cov = self.shift(lon_s, lat_s)
            lon_s = lon + dlonw / 3600.0
            lat_s = lat - dlat / 3600.0
        return lon_s, lat_s, cov


def parse_ntv2(data: bytes) -> Ntv2Grid:
    """Parse a .gsb byte string (either byte order).  Loud-raise
    discipline: unknown GS_TYPE units, node-count mismatches, degenerate
    grids, and truncation are errors, never silent approximations."""
    if len(data) < _HDR_N * _REC or data[:8] != b"NUM_OREC":
        raise ValueError(
            "not an NTv2 file: expected a NUM_OREC overview record first")
    for bo in ("<", ">"):
        if _int(data[8:16], bo) == _HDR_N:
            break
    else:
        raise ValueError("NTv2: cannot determine byte order "
                         "(NUM_OREC is not 11 in either)")
    ov = _records(data, 0, _HDR_N)
    try:
        if _int(ov["NUM_SREC"], bo) != _HDR_N:
            raise ValueError("NTv2: NUM_SREC != 11 is not valid")
        n_sub = _int(ov["NUM_FILE"], bo)
        gs_type = _str(ov["GS_TYPE"])
    except KeyError as e:
        raise ValueError(f"NTv2: overview header missing {e}") from None
    if n_sub <= 0:
        raise ValueError("NTv2: NUM_FILE must be positive")
    if gs_type != "SECONDS":
        raise ValueError(
            f"NTv2: GS_TYPE {gs_type!r} unsupported (only SECONDS; "
            "refusing to guess a unit conversion)")
    off = _HDR_N * _REC
    subs = []
    for _ in range(n_sub):
        h = _records(data, off, _HDR_N)
        off += _HDR_N * _REC
        try:
            s_lat, n_lat = _dbl(h["S_LAT"], bo), _dbl(h["N_LAT"], bo)
            e_long, w_long = _dbl(h["E_LONG"], bo), _dbl(h["W_LONG"], bo)
            lat_inc, long_inc = _dbl(h["LAT_INC"], bo), _dbl(h["LONG_INC"],
                                                            bo)
            count = _int(h["GS_COUNT"], bo)
        except KeyError as e:
            raise ValueError(f"NTv2: subgrid header missing {e}") from None
        if lat_inc <= 0 or long_inc <= 0:
            raise ValueError("NTv2: non-positive grid increment")
        nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
        ncols = int(round((w_long - e_long) / long_inc)) + 1
        if nrows < 2 or ncols < 2:
            raise ValueError("NTv2: degenerate subgrid (needs >= 2x2 "
                             "nodes for bilinear interpolation)")
        if nrows * ncols != count:
            raise ValueError(
                f"NTv2: GS_COUNT {count} != {nrows}x{ncols} from bounds")
        nbytes = count * 16
        if off + nbytes > len(data):
            raise ValueError("NTv2: truncated node section")
        nodes = np.frombuffer(data, dtype=bo + "f4", count=count * 4,
                              offset=off).reshape(count, 4)
        off += nbytes
        subs.append(Ntv2SubGrid(
            _str(h["SUB_NAME"]), _str(h["PARENT"]),
            s_lat, n_lat, e_long, w_long, lat_inc, long_inc,
            # nodes: col 0 lat shift, col 1 lon shift (cols 2-3 accuracy)
            nodes[:, 0].astype(np.float64).reshape(nrows, ncols),
            nodes[:, 1].astype(np.float64).reshape(nrows, ncols)))
    return Ntv2Grid(subs, _str(ov.get("SYSTEM_F", b"")),
                    _str(ov.get("SYSTEM_T", b"")))


def load_ntv2(path: str) -> Ntv2Grid:
    with open(path, "rb") as f:
        return parse_ntv2(f.read())
