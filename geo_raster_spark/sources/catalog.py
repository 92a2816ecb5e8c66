"""Footprint catalog construction (SURVEY.md §2.1 S4-S6, §2.6 R4).

The reference builds its catalog from a shapefile with a FILE column or a
path list, probing each file's extent [ref: mod/geo_raster_ex_c.pyx:879-988].
Here the catalog is a DataFrame derived from the images table (footprints
from metadata) or from an explicit manifest; spatial filtering is a bbox
predicate that Catalyst pushes into the scan, and the catalog can be
persisted partitioned by cell prefix for partition-pruned lookups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dggs import DEFAULT_RES
from ..operators.footprint import with_footprint


def catalog_from_images(images: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """S4 role: images table -> footprint catalog
    (image_id, minx, miny, maxx, maxy, cell, gt, w, h)."""
    return with_footprint(images, res=res).select(
        "image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy", "cell", "gt")


def catalog_from_list(spark: SparkSession, entries: list[dict]) -> DataFrame:
    """S5: catalog from an explicit manifest
    [(image_id, minx, miny, maxx, maxy, crs), ...]."""
    return spark.createDataFrame(pd.DataFrame(entries))


def filter_extent(catalog: DataFrame, ext) -> DataFrame:
    """S4's optional spatial filter: bbox predicate (pushed to the scan)."""
    return catalog.where((F.col("minx") <= ext[2]) & (F.col("maxx") >= ext[0])
                         & (F.col("miny") <= ext[3]) & (F.col("maxy") >= ext[1]))


def load(spark: SparkSession, source, ext=None) -> DataFrame:
    """S6: polymorphic loader — DataFrame | parquet path | manifest list,
    with optional extent filter [ref: mod/geo_raster_ex_c.pyx:1348-1383]."""
    if isinstance(source, DataFrame):
        cat = catalog_from_images(source)
    elif isinstance(source, str):
        cat = catalog_from_images(spark.read.parquet(source))
    elif isinstance(source, list):
        cat = catalog_from_list(spark, source)
    else:
        raise TypeError(f"unsupported catalog source: {type(source)}")
    return filter_extent(cat, ext) if ext is not None else cat


def split_dataset_ref(ref: str):
    """``'path#dataset'`` -> ``(path, dataset_or_None)`` — the reference's
    sub-dataset path resolution [ref: mod/geo_raster_ex_c.pyx:939-948]."""
    if "#" in ref:
        path, ds = ref.split("#", 1)
        return path, ds
    return ref, None


def expand_container_rows(images: DataFrame, band_col: str = "band",
                          name_col: str = "dataset") -> DataFrame:
    """S16 container closure: rows whose ``fmt == 'grsc'`` (multi-dataset
    container payloads, ``codecs.encode_container``) expand MAP-SIDE into
    one row per sub-dataset with ``fmt = 'grsc#<name>'`` plus a numeric
    ``band_col`` (index in SORTED dataset-name order — stable regardless
    of writer insertion order) — ready for ``tile_cut(band_col=...)``.
    Non-container rows pass through with band 0.

    The reference's Landsat SR HDF reader does this resolution file-side
    [ref: lib/landsat_dataset.py:115-338]; here it is a column transform:
    explode happens inside the Arrow batch (no shuffle), and the payload
    column is shared by reference within the batch.  At 100 TB you would
    instead store one row per sub-dataset at ingest (container decoded
    once) — this operator is the query-time equivalent."""
    from pyspark.sql import functions as SF
    from pyspark.sql.functions import pandas_udf

    from .. import codecs

    @pandas_udf("array<string>")
    def _names(b: pd.Series) -> pd.Series:
        return b.map(lambda v: sorted(codecs.container_index(bytes(v))))

    cont = images.where(F.col("fmt") == codecs.CONTAINER_FMT)
    plain = images.where(F.col("fmt") != codecs.CONTAINER_FMT) \
                  .withColumn(name_col, SF.lit(None).cast("string")) \
                  .withColumn(band_col, SF.lit(0))
    expanded = (cont.withColumn("_nm", _names(F.col("bytes")))
                    .select("*", SF.posexplode("_nm").alias(band_col, name_col))
                    .drop("_nm")
                    .withColumn("fmt", SF.concat(SF.lit(codecs.CONTAINER_FMT + "#"),
                                                 SF.col(name_col))))
    return expanded.unionByName(plain.select(expanded.columns))


def write_bucketed(df: DataFrame, table: str, path: str,
                   key: str = "cell", buckets: int = 64) -> None:
    """Persist a catalog/table BUCKETED by the spatial cell key.

    The 100 TB story: tables that are repeatedly joined on ``cell``
    (catalog x zone cover, catalog x catalog temporal stacking, kNN
    candidates) pay the hash-partition shuffle ONCE at write; every later
    equi-join on the key is co-located — Spark plans a sort-merge join with
    NO Exchange on either pre-bucketed side (asserted in
    test_bucketed_join_has_no_shuffle).  The Iceberg equivalent is a
    ``bucket(N, cell)`` partition transform."""
    (df.repartition(buckets, F.col(key))
       .write.mode("overwrite")
       .bucketBy(buckets, key).sortBy(key)
       .option("path", path)
       .format("parquet")
       .saveAsTable(table))


def write_catalog(catalog: DataFrame, path: str, cell_prefix_res: int = 4) -> None:
    """Persist partitioned by a coarse cell prefix — Iceberg-style partition
    pruning for spatial lookups (SURVEY.md §4 partition-spec decision)."""
    from .. import functions as gf
    out = catalog.withColumn(
        "cell_prefix",
        gf.geocell((F.col("minx") + F.col("maxx")) / 2,
                   (F.col("miny") + F.col("maxy")) / 2, cell_prefix_res))
    out.write.mode("overwrite").partitionBy("cell_prefix").parquet(path)


def expand_tiff_meta(images: DataFrame, bytes_col: str = "bytes",
                     footprint_crs: str = "EPSG:4326",
                     crs_default: str | None = None) -> DataFrame:
    """GeoTIFF payload rows -> full catalog rows, metadata read FROM THE
    PAYLOAD (dims + geotransform + CRS GeoKeys) — the reference's
    ``geo_raster.open(f)`` role [ref: mod/geo_raster_c.pyx:1149-1174]
    where a file is self-describing and the catalog is derived, not
    hand-carried.

    Adds ``w, h, gt, crs`` from each TIFF's tags plus the
    ``minx/miny/maxx/maxy`` footprint in ``footprint_crs`` (densified
    reprojection of the payload's own extent), so the output feeds
    ``assign_tiles``/``tile_cut(src_crs_col="crs")`` directly.  A payload
    with a geotransform but NO CRS GeoKeys raises unless ``crs_default``
    names the CRS to assume (a silent 4326 default would read a
    meters-gt file as degrees).  Runs
    map-side (mapInPandas over the existing partitions — no shuffle, no
    driver involvement; only the TIFF HEADER/IFD is parsed, pixels stay
    untouched)."""
    import pandas as pd

    from .. import crs as crs_mod
    from .. import tiff

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in images.schema.fields
         if f.name not in ("w", "h", "gt", "crs",
                           "minx", "miny", "maxx", "maxy")]
        + ["w int", "h int", "gt array<double>", "crs string",
           "minx double", "miny double", "maxx double", "maxy double"])
    keep = [f.name for f in images.schema.fields
            if f.name not in ("w", "h", "gt", "crs",
                              "minx", "miny", "maxx", "maxy")]

    def work(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                info = tiff.read_info(bytes(r[bytes_col]),
                                      crs_default=crs_default)
                if info is None:
                    raise ValueError(
                        f"row {r.get('image_id', '?')}: TIFF payload "
                        "carries no geotransform — not a GeoTIFF")
                ext = crs_mod.transform_extent(info.crs, footprint_crs,
                                               info.extent())
                row = {k: r[k] for k in keep}
                row.update({"w": info.width, "h": info.height,
                            "gt": list(info.gt), "crs": info.crs,
                            "minx": ext[0], "miny": ext[1],
                            "maxx": ext[2], "maxy": ext[3]})
                rows.append(row)
            yield (pd.DataFrame(rows) if rows
                   else pd.DataFrame(columns=keep + ["w", "h", "gt", "crs",
                                                     "minx", "miny",
                                                     "maxx", "maxy"]))

    return images.mapInPandas(work, schema=out_schema)
