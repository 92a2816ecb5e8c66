"""Cross-CRS warp / resample reads + first-wins mosaic (G9/G10/G11/J7).

The reference's block-warp pipeline [ref: mod/geo_raster_c.pyx:955-1049 and
mod/geo_raster_ex_c.pyx:105-425, 1093-1246] does, per target pixel:

1. target (col,row) -> target-CRS coordinate (pixel center, +0.5);
2. approximate control-grid transform to source CRS
   [ref: mod/geo_base_c.pyx:844-998] — replaced here by the EXACT vectorized
   transform (documented deviation, SURVEY.md §4);
3. source (x,y) -> (col,row) by truncation (``to_cell``);
4. out-of-bounds or source==nodata -> skip; existing non-nodata target
   pixel -> skip (first-wins)  [ref: mod/geo_raster_ex_c.pyx:124-149].

Everything below is whole-array NumPy (meshgrid transform + fancy-index
gather) — no per-pixel Python.
"""

from __future__ import annotations

import numpy as np

from .. import crs as crs_mod
from ..grid import RasterInfo


def warp_band(src_data, src_info: RasterInfo, dst_info: RasterInfo,
              nodata, out=None, v_min=None, v_max=None, dst_window=None):
    """Nearest-neighbor warp of one source block into the target grid.

    ``out`` (optional) is painted first-wins in place and returned; pixels
    already != nodata are never overwritten.

    ``dst_window``: optional (r0, r1, c0, c1) half-open target window —
    index math and the gather run only inside it (the trim win when a
    source touches a small corner of a large tile).  Coordinates are
    computed from GLOBAL pixel indices (``arange(c0, c1)``), so a windowed
    paint is bit-identical to the full-grid paint restricted to the window."""
    h, w = dst_info.height, dst_info.width
    if out is None:
        out = np.full((h, w), nodata, dtype=np.asarray(src_data).dtype)
    r0, r1, c0, c1 = dst_window if dst_window is not None else (0, h, 0, w)
    r0, c0 = max(0, r0), max(0, c0)
    r1, c1 = min(h, r1), min(w, c1)
    if r0 >= r1 or c0 >= c1:
        return out
    wh, ww = r1 - r0, c1 - c0

    gt = dst_info.gt
    sgt = src_info.gt
    src = np.asarray(src_data)
    if (dst_info.crs.upper() == src_info.crs.upper()
            and gt[2] == 0.0 and gt[4] == 0.0):
        # SEPARABLE fast path (the mosaic/tile-cut hot case): with an
        # identity CRS transform and no rotation, the source col depends
        # only on the target col and the source row only on the target row
        # — O(h+w) index math, one O(h*w) gather.  Bit-identical to the
        # general path (same per-element IEEE ops, just not repeated
        # across the other axis).
        txc = gt[0] + gt[1] * (np.arange(c0, c1, dtype=np.float64) + 0.5)
        tyr = gt[3] + gt[5] * (np.arange(r0, r1, dtype=np.float64) + 0.5)
        sc1 = np.trunc((txc - sgt[0]) / sgt[1]).astype(np.int64)
        sr1 = np.trunc((tyr - sgt[3]) / sgt[5]).astype(np.int64)
        okc = (sc1 >= 0) & (sc1 < src_info.width)
        okr = (sr1 >= 0) & (sr1 < src_info.height)
        vals = np.full((wh, ww), nodata, dtype=src.dtype)
        if okr.any() and okc.any():
            vals[np.ix_(okr, okc)] = src[sr1[okr][:, None], sc1[okc][None, :]]
    else:
        cols, rows = np.meshgrid(np.arange(c0, c1, dtype=np.float64),
                                 np.arange(r0, r1, dtype=np.float64))
        tx = gt[0] + gt[1] * (cols + 0.5) + gt[2] * (rows + 0.5)
        ty = gt[3] + gt[4] * (cols + 0.5) + gt[5] * (rows + 0.5)

        sx, sy = crs_mod.transform(dst_info.crs, src_info.crs, tx.ravel(), ty.ravel())

        sc = np.trunc((sx - sgt[0]) / sgt[1]).astype(np.int64)
        sr = np.trunc((sy - sgt[3]) / sgt[5]).astype(np.int64)

        ok = ((sc >= 0) & (sc < src_info.width) & (sr >= 0) & (sr < src_info.height)
              & np.isfinite(sx) & np.isfinite(sy))
        vals = np.full(sc.shape, nodata, dtype=src.dtype)
        vals[ok] = src[sr[ok], sc[ok]]
        vals = vals.reshape(wh, ww)

    # out-of-bounds targets hold nodata in vals, so this one test covers
    # both "no source pixel" and "source pixel is nodata"
    valid = vals != nodata
    if v_min is not None:
        valid &= vals >= v_min
    if v_max is not None:
        valid &= vals <= v_max

    sub = out[r0:r1, c0:c1]
    paint = valid & (sub == nodata)  # first-wins [ref: geo_raster_ex_c.pyx:137-140]
    sub[paint] = vals[paint]
    return out


def window_for_extent(dst_info: RasterInfo, ext, margin: int = 2):
    """(r0, r1, c0, c1) half-open pixel window of ``dst_info`` covering
    ``ext`` (dst-CRS bbox) plus ``margin`` pixels, or None for a rotated
    grid (no axis-aligned window exists)."""
    gt = dst_info.gt
    if gt[2] != 0.0 or gt[4] != 0.0:
        return None
    c0 = int(np.floor((ext[0] - gt[0]) / gt[1])) - margin
    c1 = int(np.ceil((ext[2] - gt[0]) / gt[1])) + margin
    r0 = int(np.floor((ext[3] - gt[3]) / gt[5])) - margin
    r1 = int(np.ceil((ext[1] - gt[3]) / gt[5])) + margin
    return (max(0, r0), min(dst_info.height, r1),
            max(0, c0), min(dst_info.width, c1))


def paint_source(data, info: RasterInfo, dst_info: RasterInfo, nodata, out,
                 v_min=None, v_max=None, footprint_refine: bool = False):
    """Paint ONE source into ``out`` first-wins — the shared per-source body
    of :func:`mosaic`, also used by the salted tile-cut partial phase so
    both paths honor the source CRS and ``footprint_refine`` identically
    (round-4 verdict: the salted path silently dropped them).

    Returns ``out``.  Order of operations is exactly the :func:`mosaic`
    loop body: bbox prefilter → optional densified-footprint clip →
    windowed first-wins :func:`warp_band`."""
    from .. import geometry as g
    de = dst_info.extent()
    # cheap bbox prefilter before any polygon/per-pixel work
    se = crs_mod.transform_extent(info.crs, dst_info.crs, info.extent())
    if se[0] > de[2] or se[2] < de[0] or se[1] > de[3] or se[3] < de[1]:
        return out
    clip_ext = se
    if footprint_refine and info.crs.upper() != dst_info.crs.upper():
        ring = g.segment_ratio(g.bbox_to_ring(info.extent()), 16)
        tx, ty = crs_mod.transform(info.crs, dst_info.crs,
                                   ring[:, 0], ring[:, 1])
        fin = np.isfinite(tx) & np.isfinite(ty)
        try:
            pieces = (g.clip_rings(np.column_stack([tx[fin], ty[fin]]),
                                   g.bbox_to_ring(de))
                      if fin.sum() >= 3 else [])
        except g.TriangulationError:
            # degenerate reprojected ring (duplicate vertices / pinch):
            # a partial triangulation could wrongly SKIP an overlapping
            # source — paint the safe bbox∩bbox window instead
            win = window_for_extent(dst_info, se, margin=2)
            return warp_band(data, info, dst_info, nodata, out=out,
                             v_min=v_min, v_max=v_max, dst_window=win)
        if not pieces:
            return out  # bbox overlapped, true footprint does not
        bbs = [g.ring_bbox(p) for p in pieces]
        clip_ext = (min(b[0] for b in bbs), min(b[1] for b in bbs),
                    max(b[2] for b in bbs), max(b[3] for b in bbs))
    win = window_for_extent(dst_info, clip_ext, margin=2)
    return warp_band(data, info, dst_info, nodata, out=out,
                     v_min=v_min, v_max=v_max, dst_window=win)


def mosaic(sources, dst_info: RasterInfo, nodata, dtype=None,
           v_min=None, v_max=None, footprint_refine: bool = False):
    """G11: first-wins mosaic of ``sources = [(data, RasterInfo), ...]``
    painted in the given (deterministic) order.

    [ref: mod/geo_raster_ex_c.pyx:1205-1246] — the reference paints in
    shapefile feature order; our operators sort candidates by (priority,
    image_id) before calling, fixing the order-dependence (SURVEY.md §4).

    ``sources`` may be a lazy iterable (e.g. a decode generator): with an
    explicit ``dtype`` nothing is buffered — each source is painted and
    released, so peak memory is ONE decoded source + the output, no matter
    how many images hit a hot tile.

    Trim: every source paints only the target window of its footprint ∩
    tile (bit-identical to a full paint — see ``warp_band(dst_window=)``).
    ``footprint_refine=True`` additionally clips the DENSIFIED REPROJECTED
    footprint RING against the tile ring (``geometry.clip_rings``), the
    reference's source_poly ∩ target_poly trim
    [ref: mod/geo_raster_ex_c.pyx:1107-1132]: a rotated/cross-CRS source
    whose bbox overlaps the tile but whose true footprint misses it is
    SKIPPED, and a diagonal sliver paints only its own window, not the
    whole bbox∩bbox."""
    if dtype is None:
        sources = list(sources)
        dtype = np.asarray(sources[0][0]).dtype if sources else np.float64
    out = np.full((dst_info.height, dst_info.width), nodata, dtype=dtype)
    for data, info in sources:
        paint_source(data, info, dst_info, nodata, out,
                     v_min=v_min, v_max=v_max,
                     footprint_refine=footprint_refine)
    return out
