"""Rasterize / mask / zonal stats (SURVEY.md §2.6 R1-R3, §2.4 A11).

Pure-NumPy replacement for the reference's GDAL-backed paths
[ref: lib/rasterize_band.py:14-183; mod/geo_raster_ex_c.pyx:1272-1297]:

- ``rasterize``: burn polygons into a 0/1 grid matching a RasterInfo.
  Default = GDAL convention (pixel CENTER inside polygon); ``all_touched``
  additionally marks every cell crossed by a polygon edge (via edge
  sampling at half-cell steps).
- ``mask_band``: nodata-out pixels where mask != 1.
- ``zonal_stats``: mean and range (max - min) of pixels whose centers fall
  inside the polygon — the exact loop of ``read_polygon``.
"""

from __future__ import annotations

import numpy as np

from .. import geometry as g
from ..grid import RasterInfo


def rasterize(rings, info: RasterInfo, all_touched: bool = False):
    """Burn polygons (list of (n,2) rings, already in ``info``'s CRS) into a
    uint8 0/1 grid.  [ref: lib/rasterize_band.py:14-60]"""
    h, w = info.height, info.width
    out = np.zeros((h, w), dtype=np.uint8)
    gt = info.gt

    cols = np.arange(w, dtype=np.float64) + 0.5
    rows = np.arange(h, dtype=np.float64) + 0.5
    xs = gt[0] + gt[1] * cols
    ys = gt[3] + gt[5] * rows

    for ring in rings:
        bb = g.ring_bbox(ring)
        c0 = max(0, int(np.floor((bb[0] - gt[0]) / gt[1])) - 1)
        c1 = min(w, int(np.ceil((bb[2] - gt[0]) / gt[1])) + 1)
        r0 = max(0, int(np.floor((gt[3] - bb[3]) / -gt[5])) - 1)
        r1 = min(h, int(np.ceil((gt[3] - bb[1]) / -gt[5])) + 1)
        if c0 >= c1 or r0 >= r1:
            continue
        gx, gy = np.meshgrid(xs[c0:c1], ys[r0:r1])
        inside = g.points_in_ring(ring, gx.ravel(), gy.ravel()).reshape(gy.shape)
        out[r0:r1, c0:c1] |= inside.astype(np.uint8)

        if all_touched:
            dens = g.segment_ratio(ring, max(8, int(4 / abs(gt[1])) if abs(gt[1]) < 1 else 8))
            ec = np.trunc((dens[:, 0] - gt[0]) / gt[1]).astype(np.int64)
            er = np.trunc((dens[:, 1] - gt[3]) / gt[5]).astype(np.int64)
            keep = (ec >= 0) & (ec < w) & (er >= 0) & (er < h)
            out[er[keep], ec[keep]] = 1
    return out


def mask_band(data, mask, nodata):
    """R2: nodata-out where mask != 1.  [ref: lib/rasterize_band.py:121-144]"""
    return np.where(np.asarray(mask) == 1, data, nodata)


def zonal_stats(data, info: RasterInfo, ring, nodata):
    """A11: (mean, range) of pixels whose centers fall in the polygon.

    [ref: mod/geo_raster_ex_c.pyx:1272-1297] — the reference iterates the
    polygon-envelope grid and reads by location; equivalent center-inside
    gather, vectorized.  Returns (None, 0) when no valid pixel."""
    m = rasterize([ring], info)
    vals = np.asarray(data)[m == 1]
    vals = vals[vals != nodata]
    if len(vals) == 0:
        return None, 0
    return float(vals.mean()), float(vals.max() - vals.min())
