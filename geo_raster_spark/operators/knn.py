"""kNN via DGGS k-ring expansion + windowed refine (SURVEY.md §2.3 J6).

North-star pattern: the query side explodes its cell's k-ring into candidate
cells (pure column math), equi-joins the point table on ``cell`` (sort-merge
or broadcast per Catalyst/AQE), refines with exact haversine column math,
and takes top-k per query with a ranking window — the Spark analogue of the
reference's radius gather [ref: mod/geo_interpolate.pyx:47-104].

Contract: candidates are limited to the k-ring, so results are exact only
for neighbors within ``ring`` cells (~ring x 1.4° at res 7).  Increase
``ring`` (or lower ``res``) for larger search radii — same tradeoff as the
reference's ``dist`` window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import functions as gf
from ..dggs import DEFAULT_RES


def k_ring_cells(lon, lat, ring: int = 1, res: int = DEFAULT_RES):
    """Array column of the k-ring cell ids around the point's cell —
    column twin of ``dggs.k_ring`` (lon wraps, lat clamps)."""
    n_rows = 1 << res
    n_cols = n_rows * 2
    cw, ch = 360.0 / n_cols, 180.0 / n_rows
    col = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(cw)), F.lit(0)),
                  F.lit(n_cols - 1)).cast("long")
    row = F.least(F.greatest(F.floor((F.lit(90.0) - lat) / F.lit(ch)), F.lit(0)),
                  F.lit(n_rows - 1)).cast("long")
    res_base = F.lit(res).cast("long") * F.lit(1 << 58).cast("long")
    rows = F.filter(F.sequence(row - ring, row + ring),
                    lambda r: (r >= 0) & (r < n_rows))
    cols = F.transform(F.sequence(col - ring, col + ring),
                       lambda c: F.pmod(c, F.lit(n_cols)))
    return F.flatten(F.transform(
        cols, lambda c: F.transform(rows, lambda r: res_base + c * F.lit(1 << 29).cast("long") + r)))


def knn_join(queries: DataFrame, points: DataFrame, k: int = 5,
             ring: int = 1, res: int = DEFAULT_RES,
             query_id: str = "query_id", point_id: str = "image_id",
             q_lon: str = "lon", q_lat: str = "lat",
             p_lon: str = "lon", p_lat: str = "lat") -> DataFrame:
    """Top-k nearest points per query: (query cols..., point_id, dist_km, rank)."""
    q = queries.withColumn("cand_cell",
                           F.explode(k_ring_cells(F.col(q_lon), F.col(q_lat), ring, res)))
    p = points.select(
        F.col(point_id).alias("_pid"),
        F.col(p_lon).alias("_plon"),
        F.col(p_lat).alias("_plat"),
        gf.geocell(F.col(p_lon), F.col(p_lat), res).alias("cand_cell"))

    j = q.join(p, "cand_cell")
    j = j.withColumn("dist_km", gf.haversine_km(
        F.col(q_lon), F.col(q_lat), F.col("_plon"), F.col("_plat")))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("_pid").asc())
    return (j.withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k)
             .drop("cand_cell")
             .withColumnRenamed("_pid", point_id + "_nn")
             .drop("_plon", "_plat"))


def idw_at_points(queries: DataFrame, points: DataFrame, value_col: str,
                  power: float = 2.0, ring: int = 1, res: int = DEFAULT_RES,
                  query_id: str = "query_id",
                  q_lon: str = "lon", q_lat: str = "lat",
                  p_lon: str = "lon", p_lat: str = "lat") -> DataFrame:
    """J6/W7 scalar form: IDW-interpolated value per query point from all
    candidates in the k-ring — ``sum(v/d^p)/sum(1/d^p)`` as grouped agg."""
    q = queries.withColumn("cand_cell",
                           F.explode(k_ring_cells(F.col(q_lon), F.col(q_lat), ring, res)))
    p = points.select(
        F.col(value_col).alias("_v"),
        F.col(p_lon).alias("_plon"),
        F.col(p_lat).alias("_plat"),
        gf.geocell(F.col(p_lon), F.col(p_lat), res).alias("cand_cell"))
    j = q.join(p, "cand_cell")
    d = gf.haversine_km(F.col(q_lon), F.col(q_lat), F.col("_plon"), F.col("_plat"))
    wgt = F.lit(1.0) / F.pow(F.greatest(d, F.lit(1e-9)), F.lit(power))
    return (j.groupBy(query_id)
             .agg((F.sum(F.col("_v") * wgt) / F.sum(wgt)).alias("idw_value"),
                  F.count("*").alias("n_neighbors")))
