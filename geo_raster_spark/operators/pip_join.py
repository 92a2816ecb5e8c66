"""Broadcast point-in-polygon join (SURVEY.md §2.3 J1).

The reference routes each point through a linear scan of catalog footprints
with a one-element memo [ref: mod/geo_raster_ex_c.pyx:995-1066].  Spark-first
design (north star):

1. **cell prefilter** — every zone polygon is covered by DGGS cells
   (driver-side, zones are small); points carry their center cell as a
   column.  The candidate set is a **broadcast hash join** on ``cell`` —
   no shuffle of the billion-row probe side at all.
2. **exact refine** — a vectorized even-odd ray cast inside ``mapInPandas``
   over Arrow batches, zone rings shipped once per executor via a Spark
   broadcast variable (the ``last_band`` memo generalized).

Skew: a hot zone fans out over MANY cells, so its candidates spread across
all partitions of the probe side — no salting needed for the broadcast
plan.  (Salting helpers live in ``tile_assign`` for shuffle-join variants.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import dggs, geometry
from ..dggs import DEFAULT_RES


def zone_cover_df(spark, zones_pdf: pd.DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """(cell, zone_id) covering pairs — driver-side cover of the small build
    side (the reference's per-footprint spatial index role)."""
    rows = []
    for _, z in zones_pdf.iterrows():
        ring = geometry.wkb_to_ring(z["geometry"])
        for c in dggs.polygon_cover(ring, res):
            rows.append((int(c), int(z["zone_id"])))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "zone_id"]))


def pip_join(points: DataFrame, zones_pdf: pd.DataFrame,
             lon_col: str = "lon", lat_col: str = "lat",
             cell_col: str = "cell", res: int = DEFAULT_RES,
             keep_zone_name: bool = True) -> DataFrame:
    """points ⋈ zones where the point lies inside the zone polygon.

    ``points`` must already carry ``cell_col`` (use
    ``operators.footprint.with_footprint``).  Returns the input columns +
    ``zone_id`` (+ ``zone_name``).  A point inside multiple overlapping
    zones yields one row per zone (join semantics)."""
    spark = points.sparkSession
    cover = zone_cover_df(spark, zones_pdf, res)

    cand = points.join(F.broadcast(cover), points[cell_col] == cover["cell"], "inner") \
                 .drop(cover["cell"])

    rings = {int(z["zone_id"]): geometry.wkb_to_ring(z["geometry"])
             for _, z in zones_pdf.iterrows()}
    bc = spark.sparkContext.broadcast(rings)

    out_schema = cand.schema

    def refine(batches):
        zr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lons = pdf[lon_col].to_numpy(np.float64)
            lats = pdf[lat_col].to_numpy(np.float64)
            zids = pdf["zone_id"].to_numpy()
            keep = np.zeros(len(pdf), dtype=bool)
            for zid in np.unique(zids):
                sel = zids == zid
                keep[sel] = geometry.points_in_ring(zr[int(zid)], lons[sel], lats[sel])
            yield pdf[keep]

    refined = cand.mapInPandas(refine, schema=out_schema)

    if keep_zone_name:
        names = spark.createDataFrame(zones_pdf[["zone_id", "name"]]) \
                     .withColumnRenamed("name", "zone_name")
        refined = refined.join(F.broadcast(names), "zone_id", "left")
    return refined


def pip_count_by_zone(points: DataFrame, zones_pdf: pd.DataFrame,
                      res: int = DEFAULT_RES) -> DataFrame:
    """Convenience: images-per-zone counts (the flagship reduce)."""
    j = pip_join(points, zones_pdf, res=res, keep_zone_name=False)
    return j.groupBy("zone_id").agg(F.count("*").alias("n_images"))
