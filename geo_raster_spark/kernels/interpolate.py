"""IDW interpolation (SURVEY.md §2.5 W7 / §2.3 J6 kernel).

[ref: mod/geo_interpolate.pyx:18-104]

Per query location: find the containing source cell; exact pixel-center hit
returns the value directly; otherwise gather pixels in the ``±ceil(dist)``
cell box whose center distance <= ``cell_size * dist``, weight ``1/d^power``.

Documented deviation: the reference never skips nodata pixels (its
``_v != None`` test is always true for a float array) — we honor the band's
nodata sentinel, which is the evident intent.
"""

from __future__ import annotations

import math

import numpy as np

from ..grid import RasterInfo


def idw_at(data, info: RasterInfo, x, y, dist, power, nodata=None):
    """IDW value at one location; None when out of extent / no neighbors."""
    data = np.asarray(data, dtype=np.float64)
    gt = info.gt
    c0 = int((x - gt[0]) / gt[1])
    r0 = int((y - gt[3]) / gt[5])
    if c0 < 0 or r0 < 0 or c0 >= info.width or r0 >= info.height:
        return None

    xc = gt[0] + gt[1] * (c0 + 0.5)
    yc = gt[3] + gt[5] * (r0 + 0.5)
    if x == xc and y == yc:
        v = data[r0, c0]
        return None if (nodata is not None and v == nodata) else float(v)

    d = int(math.ceil(dist))
    r_lo, r_hi = max(0, r0 - d), min(info.height, r0 + d + 1)
    c_lo, c_hi = max(0, c0 - d), min(info.width, c0 + d + 1)
    cc, rr = np.meshgrid(np.arange(c_lo, c_hi), np.arange(r_lo, r_hi))
    px = gt[0] + gt[1] * (cc + 0.5)
    py = gt[3] + gt[5] * (rr + 0.5)
    dd = np.hypot(px - x, py - y)
    vals = data[rr, cc]

    exact = dd <= 0
    if exact.any():
        v = float(vals[exact][0])
        return None if (nodata is not None and v == nodata) else v

    keep = dd <= gt[1] * dist
    if nodata is not None:
        keep &= vals != nodata
    if not keep.any():
        return None
    w = 1.0 / dd[keep] ** power
    return float(np.sum(vals[keep] * w) / np.sum(w))


def band_idw(data, info: RasterInfo, dst_info: RasterInfo, dist, power,
             nodata=-9999.0):
    """W7: IDW-resample a whole band onto ``dst_info``'s grid.

    [ref: mod/geo_interpolate.pyx:18-45] — per target pixel center."""
    from .. import crs as crs_mod

    h, w = dst_info.height, dst_info.width
    out = np.full((h, w), nodata, dtype=np.float64)
    cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
    gt = dst_info.gt
    tx = gt[0] + gt[1] * (cols + 0.5) + gt[2] * (rows + 0.5)
    ty = gt[3] + gt[4] * (cols + 0.5) + gt[5] * (rows + 0.5)
    sx, sy = crs_mod.transform(dst_info.crs, info.crs, tx.ravel(), ty.ravel())
    for i, (x, y) in enumerate(zip(sx, sy)):
        v = idw_at(data, info, float(x), float(y), dist, power, nodata=nodata)
        if v is not None:
            out.flat[i] = v
    return out
