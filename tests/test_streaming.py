"""Structured Streaming incremental flagship: AvailableNow + file-source
offsets = process only new files on re-run (the engine's ingest resume)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geo_raster_spark import synth
from geo_raster_spark.streaming import incremental


def _write_batch(spark, path, start, n):
    pdf = synth.images_pandas(n, start=start)
    spark.createDataFrame(pdf).write.mode("append").parquet(path)


def test_incremental_flagship_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "images")
    out = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    zones = synth.zones_pandas(8, hot=True)

    _write_batch(spark, src, 0, 120)
    q = incremental.incremental_flagship(spark, src, zones, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out).toPandas()
    assert first["n_images"].sum() > 0
    b0 = set(first["batch_id"])

    # second wave of files -> only the delta is processed
    _write_batch(spark, src, 120, 80)
    q2 = incremental.incremental_flagship(spark, src, zones, out, ckpt)
    q2.awaitTermination(120)
    both = spark.read.parquet(out).toPandas()
    new = both[~both["batch_id"].isin(b0)]
    assert len(new) > 0

    # totals equal a one-shot batch run over all 200 images
    from geo_raster_spark.operators import footprint, pip_join, tile_assign
    imgs = footprint.with_footprint(spark.read.parquet(src))
    j = pip_join.pip_join(imgs, zones, keep_zone_name=False)
    want = tile_assign.assign_tiles(j).count()
    assert int(both["n_images"].sum()) == want


def test_windowed_event_counts(spark, sf_dir):
    df = incremental.windowed_event_counts(spark, f"{sf_dir}/events.parquet")
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert (pdf["w_end"] - pdf["w_start"]).nunique() == 1  # uniform windows
    # totals preserved
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert pdf["n"].sum() == total
