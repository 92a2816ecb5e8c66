"""Affine grid math + the global tile grid.

Pure NumPy — no Spark imports.  These are the formula-level semantics of the
reference engine, re-derived for vectorized evaluation:

- coordinate<->cell transforms use the reference's *truncation toward zero*
  convention (``int()``, not ``floor``)  [ref: mod/geo_raster_c.pyx:1406-1414]
- ``to_location`` returns the pixel-center coordinate (+0.5)
- the global tile grid spans ``[-p, p] x [-p/2, p/2]`` with step
  ``image_size * cell_size`` map units laid row-major from the top-left
  origin ``(-p, p/2)``; geographic mode has ``p = 180`` and half as many
  rows as columns  [ref: lib/global_task.py:83-137]
- tile tags are ``h%03dv%03d``; geo tags like ``123E45N``
  [ref: lib/global_task.py:206-243]
- ``align`` snaps an extent outward onto a band's grid origin
  [ref: mod/geo_raster_c.pyx:274-314, 84-88]
- ``read_window`` clips/pads a block to an extent with nodata fill
  [ref: mod/geo_raster_c.pyx:435-493]
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

SINUSOIDAL_RADIUS = 6371007.181  # ref: lib/global_task.py:89


# ---------------------------------------------------------------------------
# affine transforms (GDAL 6-tuple convention: [x0, dx, 0, y0, 0, -dy])
# ---------------------------------------------------------------------------

def to_cell(gt, x, y):
    """Coordinate -> (col, row), truncating toward zero.

    Matches the reference exactly (``int()`` truncation, NOT floor) —
    negative fractional offsets truncate toward the grid origin.
    Vectorized: x/y may be NumPy arrays.
    """
    col = np.trunc((np.asarray(x, dtype=np.float64) - gt[0]) / gt[1]).astype(np.int64)
    row = np.trunc((np.asarray(y, dtype=np.float64) - gt[3]) / gt[5]).astype(np.int64)
    return col, row


def to_location(gt, col, row):
    """(col, row) -> pixel-center coordinate."""
    c = np.asarray(col, dtype=np.float64) + 0.5
    r = np.asarray(row, dtype=np.float64) + 0.5
    x = gt[0] + gt[1] * c + gt[2] * r
    y = gt[3] + gt[4] * c + gt[5] * r
    return x, y


def align_min(v, origin, cell):
    """Snap ``v`` down onto the grid defined by (origin, cell)."""
    return origin + math.floor((v - origin) / cell) * cell


def align_max(v, origin, cell):
    """Snap ``v`` up onto the grid defined by (origin, cell)."""
    return origin + math.ceil((v - origin) / cell) * cell


@dataclass(frozen=True)
class RasterInfo:
    """Georeferencing of a raster block: the reference's ``geo_raster_info``.

    [ref: mod/geo_raster_c.pyx:106-213]
    """

    gt: tuple  # 6-tuple affine
    width: int
    height: int
    crs: str = "EPSG:4326"

    @property
    def cell_size(self):
        return self.gt[1]

    def extent(self):
        """(minx, miny, maxx, maxy) of the full raster."""
        x0, y0 = self.gt[0], self.gt[3]
        x1 = x0 + self.gt[1] * self.width
        y1 = y0 + self.gt[5] * self.height
        return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))

    def subset(self, col, row, width, height):
        """Sub-block info by col/row offset. [ref: mod/geo_raster_c.pyx:177-190]"""
        gt = (
            self.gt[0] + col * self.gt[1],
            self.gt[1], self.gt[2],
            self.gt[3] + row * self.gt[5],
            self.gt[4], self.gt[5],
        )
        return RasterInfo(gt, width, height, self.crs)

    def scale(self, ratio=None, ceil=False, cell_size=None):
        """Re-gridded info at a different resolution.

        [ref: mod/geo_raster_c.pyx:316-334]
        """
        gt = list(self.gt)
        r = ratio
        if cell_size is not None:
            r = gt[1] / cell_size
        if r is None:
            raise ValueError("need ratio or cell_size")
        cols = int(math.ceil(self.width * r) if ceil else math.floor(self.width * r))
        rows = int(math.ceil(self.height * r) if ceil else math.floor(self.height * r))
        gt[1] /= r
        gt[2] /= r
        gt[4] /= r
        gt[5] /= r
        return RasterInfo(tuple(gt), cols, rows, self.crs)

    def align(self, ext, clip=False):
        """Snap extent (minx,miny,maxx,maxy) outward onto this grid.

        [ref: mod/geo_raster_c.pyx:274-314]
        """
        cell = self.gt[1]
        sx, sy = self.gt[0], self.gt[3]
        minx = align_min(ext[0], sx, cell)
        maxx = align_max(ext[2], sx, cell)
        miny = align_min(ext[1], sy, cell)
        maxy = align_max(ext[3], sy, cell)
        if clip:
            e = self.extent()
            minx, miny = max(e[0], minx), max(e[1], miny)
            maxx, maxy = min(e[2], maxx), min(e[3], maxy)
        cols = int(round((maxx - minx) / cell))
        rows = int(round((maxy - miny) / cell))
        return RasterInfo((minx, cell, 0.0, maxy, 0.0, -cell), cols, rows, self.crs)


def read_window(data, info: RasterInfo, ext, nodata=0.0, roundup=True):
    """Clip/pad ``data`` to ``ext`` with nodata fill.

    The reference's windowed read [ref: mod/geo_raster_c.pyx:435-493]:
    output grid is ``ext`` aligned to the source grid; source pixels outside
    the array are filled with nodata.  ``roundup`` expands to cover partial
    cells (ceil), else exact truncation.
    """
    cell = info.gt[1]
    minx = align_min(ext[0], info.gt[0], cell)
    maxy = align_max(ext[3], info.gt[3], cell)
    if roundup:
        cols = int(math.ceil((ext[2] - minx) / cell))
        rows = int(math.ceil((maxy - ext[1]) / cell))
    else:
        cols = int((ext[2] - minx) / cell)
        rows = int((maxy - ext[1]) / cell)

    out = np.full((rows, cols), nodata, dtype=data.dtype)
    # source index of output origin
    c0 = int(round((minx - info.gt[0]) / cell))
    r0 = int(round((info.gt[3] - maxy) / cell))
    # overlapping region in output coords
    src_r = slice(max(0, r0), min(info.height, r0 + rows))
    src_c = slice(max(0, c0), min(info.width, c0 + cols))
    if src_r.start < src_r.stop and src_c.start < src_c.stop:
        dst_r = slice(src_r.start - r0, src_r.stop - r0)
        dst_c = slice(src_c.start - c0, src_c.stop - c0)
        out[dst_r, dst_c] = data[src_r, src_c]
    gt = (minx, cell, 0.0, maxy, 0.0, -cell)
    return out, RasterInfo(gt, cols, rows, info.crs)


# ---------------------------------------------------------------------------
# global tile grid
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TileGrid:
    """The reference's global grid decomposition.  [ref: lib/global_task.py:83-137]

    Square tiles of ``image_size * cell_size`` map units laid row-major from
    ``(-p, p/2)``.  ``is_geog`` -> p = 180 (degrees), rows = cols/2;
    else sinusoidal meters, p = pi * R.
    """

    image_size: int = 100
    cell_size: float = 0.01
    edge: int = 1
    is_geog: bool = True
    crs: str = "EPSG:4326"

    @property
    def p(self):
        return 180.0 if self.is_geog else SINUSOIDAL_RADIUS * math.pi

    @property
    def tile_size(self):
        return self.image_size * self.cell_size

    @property
    def n_cols(self):
        return int(2 * self.p / self.tile_size)

    @property
    def n_rows(self):
        n = int(2 * self.p / self.tile_size)
        return int(n / 2) if self.is_geog else n

    def tile_gt(self, col, row):
        """[ref: lib/global_task.py:131]"""
        s, c, p = self.image_size, self.cell_size, self.p
        return (-p + col * s * c, c, 0.0, p / 2 - row * s * c, 0.0, -c)

    def tile_info(self, col, row):
        n = self.image_size + self.edge
        return RasterInfo(self.tile_gt(col, row), n, n, self.crs)

    def tile_extent(self, col, row):
        """Tile extent INCLUDING the edge halo (matches reference ``tiles.list``
        which tests intersection on the haloed extent, lib/global_task.py:120-121)."""
        s = (self.image_size + self.edge) * self.cell_size
        x = -self.p + col * self.tile_size
        y = self.p / 2 - row * self.tile_size
        return (x, y - s, x + s, y)

    def tile_cols_rows_for_extent(self, ext):
        """Inclusive (col0, col1, row0, row1) ranges of tiles whose haloed
        extent intersects ``ext`` — closed-form version of the reference's
        full-grid scan loop (lib/global_task.py:102-128)."""
        ts = self.tile_size
        halo = self.edge * self.cell_size
        # tile x-span is [x0, x0 + ts + halo], x0 = -p + col*ts; closed-interval
        # intersection with [minx, maxx] iff x0 <= maxx AND x0 + ts + halo >= minx
        col0 = max(0, int(math.ceil((ext[0] - halo - ts + self.p) / ts - 1e-12)))
        col1 = min(self.n_cols - 1, int(math.floor((ext[2] + self.p) / ts + 1e-12)))
        # tile y-span is [ytop - ts - halo, ytop], ytop = p/2 - row*ts
        row0 = max(0, int(math.ceil((self.p / 2 - ext[3] - halo - ts) / ts - 1e-12)))
        row1 = min(self.n_rows - 1, int(math.floor((self.p / 2 - ext[1]) / ts + 1e-12)))
        return col0, col1, row0, row1

    def list_tiles(self, ext=None):
        """Yield (col, row) of tiles intersecting ``ext`` (or all).

        Semantics match the reference's brute scan (strict ``is_intersect``:
        open intervals — touching extents do NOT intersect,
        ref mod/geo_base_c.pyx:415-421 uses > / < comparisons... actually
        the reference uses non-strict: see geo_extent.is_intersect).  We use
        non-strict (closed) intersection like OGR extents.
        """
        if ext is None:
            for row in range(self.n_rows):
                for col in range(self.n_cols):
                    yield col, row
            return
        # columns are NOT clamped: an extent reaching past ±p (dateline-
        # crossing footprint) matches out-of-range raw cols that wrap onto
        # the far side via modulo — the exact NumPy twin of the Spark path's
        # unclamped range + pmod [ref: util/raster_extent2shp.py:83-123]
        ts, halo = self.tile_size, self.edge * self.cell_size
        c0 = int(math.ceil((ext[0] - halo - ts + self.p) / ts - 1e-12))
        c1 = int(math.floor((ext[2] + self.p) / ts + 1e-12))
        c1 = min(c1, c0 + self.n_cols - 1)  # never emit a tile twice
        _, _, r0, r1 = self.tile_cols_rows_for_extent(ext)
        seen = set()
        for row in range(r0, r1 + 1):
            for col_raw in range(c0, c1 + 1):
                te = self.tile_extent(col_raw, row)  # raw frame, may exceed ±p
                col = col_raw % self.n_cols
                if (te[0] <= ext[2] and te[2] >= ext[0]
                        and te[1] <= ext[3] and te[3] >= ext[1]
                        and (col, row) not in seen):
                    seen.add((col, row))
                    yield col, row


def tile_tag(col, row):
    """``h%03dv%03d``  [ref: lib/global_task.py:225-232]"""
    return "h%03dv%03d" % (col, row)


def _geo_coord_str(v, decimals, width, sign_p, sign_n):
    """[ref: lib/global_task.py:206-209]"""
    n = width if decimals == 0 else (width + 1 + decimals)
    s = ("%%0%d.%df" % (n, decimals)) % abs(v)
    return s + (sign_p if v >= 0 else sign_n)


def geo_tile_tag(grid: TileGrid, col, row, decimals=0):
    """Geo-coded tag like ``123E45N`` from the tile's top-left corner.

    [ref: lib/global_task.py:234-243]
    """
    x = -grid.p + col * grid.tile_size
    y = grid.p / 2 - row * grid.tile_size
    lon = _geo_coord_str(x, decimals, 3, "E", "W")
    lat = _geo_coord_str(y, decimals, 2, "N", "S")
    return lon + lat


def tile_output_path(d_out, col, row, tag_suffix, use_data_path=True):
    """``<out>/data/<h>/<v>/<h><v>/<h><v>_<tag>``  [ref: lib/global_task.py:245-259]"""
    h, v = "h%03d" % col, "v%03d" % row
    t = h + v
    parts = [d_out]
    if use_data_path:
        parts.append("data")
    parts += [h, v, t, "%s_%s" % (t, tag_suffix)]
    return "/".join(parts)
