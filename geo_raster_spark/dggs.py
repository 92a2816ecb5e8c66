"""Hierarchical discrete-global-grid cell index (the engine's H3-role index).

The north rule calls for an H3/S2-style cell index; the ``h3`` library is not
available in this environment, so the engine ships its own equal-angle
hierarchical DGGS ("geocell"): at resolution ``r`` the world splits into
``2^(r+1)`` columns x ``2^r`` rows of square (in degrees) cells, quadtree-
refining between resolutions.  Cell ids pack ``(res, col, row)`` into an
int64.  This supports the three operations the engine needs — point->cell,
k-ring neighborhood expansion, and polygon covering — with the same join
patterns H3 would give (equi-join on cell id, k-ring candidate generation).

Everything here is pure NumPy *and* has a Spark-column twin in
``geo_raster_spark.functions`` so the hot path stays JVM-side.

Default resolution 7 -> 1.40625° cells (comparable to the 1° reference tile).
"""

from __future__ import annotations

import numpy as np

DEFAULT_RES = 7
_RES_SHIFT = 58
_COL_SHIFT = 29
_ROW_MASK = (1 << 29) - 1
_COL_MASK = (1 << 29) - 1


def res_dims(res: int):
    """(n_cols, n_rows, cell_w_deg, cell_h_deg) at resolution ``res``."""
    n_rows = 1 << res
    n_cols = n_rows * 2
    return n_cols, n_rows, 360.0 / n_cols, 180.0 / n_rows


def pack(res, col, row):
    return (np.int64(res) << _RES_SHIFT) | (np.asarray(col, dtype=np.int64) << _COL_SHIFT) | np.asarray(row, dtype=np.int64)


def unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> _RES_SHIFT).astype(np.int64)
    col = (cell >> _COL_SHIFT) & _COL_MASK
    row = cell & _ROW_MASK
    return res, col, row


def latlng_to_cell(lon, lat, res: int = DEFAULT_RES):
    """Vectorized point -> cell id (lon/lat degrees)."""
    n_cols, n_rows, cw, ch = res_dims(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    col = np.clip(np.floor((lon + 180.0) / cw), 0, n_cols - 1).astype(np.int64)
    row = np.clip(np.floor((90.0 - lat) / ch), 0, n_rows - 1).astype(np.int64)
    return pack(res, col, row)


def cell_to_bbox(cell):
    """Cell id(s) -> (minx, miny, maxx, maxy) arrays."""
    res, col, row = unpack(cell)
    # all cells in one call must share a resolution for vectorized math
    r = int(np.asarray(res).flat[0])
    n_cols, n_rows, cw, ch = res_dims(r)
    minx = -180.0 + col * cw
    maxy = 90.0 - row * ch
    return minx, maxy - ch, minx + cw, maxy


def cell_center(cell):
    minx, miny, maxx, maxy = cell_to_bbox(cell)
    return (minx + maxx) / 2.0, (miny + maxy) / 2.0


def parent(cell, parent_res):
    res, col, row = unpack(cell)
    shift = np.asarray(res, dtype=np.int64) - parent_res
    return pack(parent_res, col >> shift, row >> shift)


def k_ring(cell: int, k: int):
    """All cells within Chebyshev distance k (incl. self); lon wraps, lat clamps.

    The H3 ``grid_disk`` analogue used for kNN candidate generation
    (SURVEY.md §2.3 J6)."""
    res, col, row = unpack(np.int64(cell))
    res, col, row = int(res), int(col), int(row)
    n_cols, n_rows, _, _ = res_dims(res)
    out = []
    for dr in range(-k, k + 1):
        rr = row + dr
        if rr < 0 or rr >= n_rows:
            continue
        for dc in range(-k, k + 1):
            out.append(pack(res, (col + dc) % n_cols, rr))
    return np.array(out, dtype=np.int64)


def bbox_cover(ext, res: int = DEFAULT_RES):
    """All cells intersecting bbox ``(minx, miny, maxx, maxy)`` (degrees)."""
    n_cols, n_rows, cw, ch = res_dims(res)
    c0 = int(np.floor((ext[0] + 180.0) / cw))
    c1 = int(np.floor((ext[2] + 180.0) / cw - 1e-12))
    r0 = int(np.floor((90.0 - ext[3]) / ch))
    r1 = int(np.floor((90.0 - ext[1]) / ch - 1e-12))
    c0, c1 = max(0, c0), min(n_cols - 1, max(c0, c1))
    r0, r1 = max(0, r0), min(n_rows - 1, max(r0, r1))
    cols, rows = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
    return pack(res, cols.ravel(), rows.ravel())


def polygon_cover(ring, res: int = DEFAULT_RES):
    """Cells whose bbox intersects the polygon (superset cover: bbox cover
    refined by a cell-bbox x polygon intersection test)."""
    from . import geometry as g
    cand = bbox_cover(g.ring_bbox(ring), res)
    keep = []
    for c in cand:
        bb = cell_to_bbox(c)
        if g.rings_intersect(g.bbox_to_ring((float(bb[0]), float(bb[1]), float(bb[2]), float(bb[3]))), ring):
            keep.append(int(c))
    return np.array(keep, dtype=np.int64)
