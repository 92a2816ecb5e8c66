"""Distributed zonal statistics over decoded pixels (SURVEY.md §2.4 A11,
§2.6 R1-R3).

The reference computes (mean, max-min) of pixels whose centers fall inside a
polygon, one polygon x one band at a time
[ref: mod/geo_raster_ex_c.pyx:1272-1297].  Scale design: per (image, zone)
candidate pair — produced by the bbox/cell prefilter join — a ``mapInPandas``
kernel decodes the image once, rasterizes the zone over the image grid, and
emits PARTIAL aggregates (sum, count, min, max).  A plain ``groupBy(zone)``
then combines partials; the pixel data never shuffles, only 4 doubles per
pair — the map-side-combine shape that survives 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs, dggs, geometry
from ..dggs import DEFAULT_RES
from ..grid import RasterInfo
from ..kernels import rasterize as rz


def zonal_stats(images: DataFrame, zones_pdf: pd.DataFrame,
                nodata: float = -1.0, res: int = DEFAULT_RES) -> DataFrame:
    """-> (zone_id, mean, rng, n_pixels, n_images) per zone.

    ``images`` needs footprint cols + bytes/fmt (``with_footprint``)."""
    return zonal_combine(zonal_partials(images, zones_pdf, nodata, res))


def zonal_combine(part: DataFrame) -> DataFrame:
    """Partials (zone_id, image_id, psum, pcount, pmin, pmax) -> final
    per-zone stats — a plain ANSI aggregation, re-runnable by the DuckDB
    oracle over a persisted partials artifact."""
    return (part.groupBy("zone_id")
                .agg((F.sum("psum") / F.sum("pcount")).alias("mean"),
                     (F.max("pmax") - F.min("pmin")).alias("rng"),
                     F.sum("pcount").alias("n_pixels"),
                     F.countDistinct("image_id").alias("n_images")))


def zonal_partials(images: DataFrame, zones_pdf: pd.DataFrame,
                   nodata: float = -1.0, res: int = DEFAULT_RES) -> DataFrame:
    """Per-(zone, image, cover-cell) PARTIAL aggregates (the map-side
    decode/rasterize kernel output; 4 doubles per pair — the only thing
    that ever shuffles)."""
    spark = images.sparkSession

    # candidate pairs: zone cover cells vs ALL cells the image footprint
    # touches — joining on the center cell alone drops images whose center
    # lies outside the zone cover but whose footprint crosses into the zone
    # (footprints are up to ~2 cells wide), silently undercounting boundary
    # pixels [ref: mod/geo_raster_ex_c.pyx:1272-1297 — every pixel whose
    # center is in the polygon counts, regardless of where the image center
    # is].  An image spanning k cover cells would match the same zone k
    # times, so dedupe (image, zone) before the decode kernel.
    # No pair-dedup is needed (and none would be shuffle-free): instead the
    # kernel restricts each (image, zone, fcell) row to pixels whose CENTER
    # CELL equals fcell.  An image spanning k cover cells yields k rows with
    # DISJOINT pixel subsets whose union is exactly the image's in-polygon
    # pixels — duplicates become partitioned work, which also spreads a hot
    # image across tasks.  Everything stays map-side: explode + broadcast
    # join, the bytes payload never shuffles.
    from .. import functions as gf
    cover_rows = []
    for _, z in zones_pdf.iterrows():
        ring = geometry.wkb_to_ring(z["geometry"])
        for c in dggs.polygon_cover(ring, res):
            cover_rows.append((int(c), int(z["zone_id"])))
    cover = spark.createDataFrame(
        pd.DataFrame(cover_rows, columns=["fcell", "zone_id"]))
    fp_cells = images.withColumn(
        "fcell", F.explode(gf.geocell_cover(
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res)))
    cand = fp_cells.join(F.broadcast(cover), "fcell")

    # zone rings as PART LISTS: dateline-crossing zones split at ±180°, and
    # near-dateline zones additionally carry ±360°-shifted copies so images
    # whose unwrapped pixel frame extends past ±180° still rasterize them
    rings = {}
    for _, z in zones_pdf.iterrows():
        parts = geometry.split_ring_antimeridian(geometry.wkb_to_ring(z["geometry"]))
        allp = list(parts)
        for p_ in parts:
            bx = geometry.ring_bbox(p_)
            if len(parts) > 1 or bx[0] < -178.0 or bx[2] > 178.0:
                for s in (360.0, -360.0):
                    q = p_.copy()
                    q[:, 0] += s
                    allp.append(q)
        rings[int(z["zone_id"])] = allp
    bc = spark.sparkContext.broadcast(rings)

    return cand.mapInPandas(_partials_kernel(bc, nodata, res),
                            schema=PARTIAL_SCHEMA)


PARTIAL_SCHEMA = ("zone_id int, image_id string, psum double, pcount long, "
                  "pmin double, pmax double")


def _partials_kernel(bc, nodata: float, res: int):
    """Arrow-batch kernel for ``zonal_partials`` (module-level so the
    decode-count test can drive it directly).

    An image spanning k cover cells arrives as k candidate rows; naively
    decoding per row multiplies the decode (and rasterize + cell-grid) cost
    by k (k ≈ 2-4 at res 8).  The explode+broadcast-join upstream keeps an
    image's rows ADJACENT in one partition, so grouping the batch by
    (image_id, zone_id) lets the kernel decode/rasterize ONCE per pair and
    then slice per fcell — emitting exactly the same per-(zone, image,
    fcell) partial rows as the one-row-at-a-time formulation (the fcell
    subsets partition the image's in-polygon pixels)."""
    def partials(batches):
        zr = bc.value if hasattr(bc, "value") else bc
        for pdf in batches:
            out = []
            # group by IMAGE first (round 8): an image paired with several
            # zones decodes and builds its pixel-center cell grid ONCE per
            # batch instead of once per (image, zone) pair — the decode +
            # latlng_to_cell grid were ~2/3 of the pair cost and are
            # zone-independent.  Per-(zone, fcell) slicing is unchanged, so
            # partial rows are identical.
            for img_id, igrp in pdf.groupby("image_id", sort=False):
                r0 = igrp.iloc[0]
                arr = codecs.decode(r0["bytes"], r0["fmt"]).astype(np.float64)
                info = RasterInfo(tuple(r0["gt"]), int(r0["w"]), int(r0["h"]))
                gt = info.gt
                xs = gt[0] + (np.arange(info.width) + 0.5) * gt[1]
                ys = gt[3] + (np.arange(info.height) + 0.5) * gt[5]
                # WRAP pixel lons into [-180, 180) before the cell lookup:
                # cover cells from geocell_cover wrap columns (pmod), but
                # latlng_to_cell CLAMPS — for an unwrapped frame crossing
                # ±180° the far-side pixels would clamp to the last column,
                # never match their wrapped fcell, and silently drop (the
                # ±360°-shifted rings exist precisely to rasterize them)
                X, Y = np.meshgrid(xs, ys)
                pc = dggs.latlng_to_cell(((X + 180.0) % 360.0) - 180.0, Y,
                                         res=res)
                for zid, grp in igrp.groupby("zone_id", sort=False):
                    m = rz.rasterize(zr[int(zid)], info)
                    # restrict each fcell row to pixels whose center cell ==
                    # that join cell: the k rows of an image spanning k cover
                    # cells partition its pixels exactly (see candidate-join
                    # comment above)
                    inpoly = m == 1
                    for fcell in grp["fcell"]:
                        vals = arr[inpoly & (pc == int(fcell))]
                        vals = vals[vals != nodata]
                        if len(vals) == 0:
                            continue
                        out.append((int(zid), img_id, float(vals.sum()),
                                    int(len(vals)), float(vals.min()),
                                    float(vals.max())))
            yield pd.DataFrame(out, columns=["zone_id", "image_id", "psum",
                                             "pcount", "pmin", "pmax"])

    return partials
