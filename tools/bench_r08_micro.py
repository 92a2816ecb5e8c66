#!/usr/bin/env python
"""Round-8 micro-benchmarks — reproduces the A/B measurements cited in
OPTIMIZATION_r08.md (guide §1.4 noop-sink isolation).  Separate from the
frozen bench.py by design.

Rows:
  warm_vs_cold     first-vs-second run of q1 + tile_cut in one session
                   (what the get_spark warm-up recovers)
  group_overhead   trivial groupBy().applyInPandas vs sorted streaming
                   mapInPandas at ~10k tile groups (what grouped_stream
                   removes)
  tile_cut_4000    the sf1-scale pixel path end to end
  est_ab           zip_with vs flat element_at matching-slot count at
                   ~600k candidate pairs (why zip_with stayed)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    os.environ["GSR_BENCH"] = "1"
    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from geo_raster_spark import synth
    from geo_raster_spark.operators import dedup as dd_op
    from geo_raster_spark.operators import footprint as fp_op
    from geo_raster_spark.operators import mosaic as mz
    from geo_raster_spark.grid import TileGrid
    from geo_raster_spark.operators.tile_assign import assign_tiles
    from geo_raster_spark.partitioning import keyed_repartition
    from geo_raster_spark.session import get_spark

    out: dict = {}
    spark = get_spark(app_name="bench-r08-micro", cores=None)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    # warm vs cold (the session warm-up already ran in get_spark, so this
    # shows the residual per-plan codegen delta, not worker spawn)
    t = []
    for _ in range(2):
        t0 = time.time()
        qs["q1_pricing"](spark, SF_DIR).count()
        t.append(round(time.time() - t0, 3))
    out["q1_first_then_warm"] = t

    g = TileGrid()

    par0 = spark.sparkContext.defaultParallelism

    def imgs(n):
        return fp_op.with_footprint(synth.images_df(spark, n, par0))

    t = []
    for _ in range(2):
        t0 = time.time()
        mz.tile_cut(imgs(400), nodata=0.0).count()
        t.append(round(time.time() - t0, 3))
    out["g5_tile_cut_400_first_then_warm"] = t

    t0 = time.time()
    n = mz.tile_cut(imgs(4000), nodata=0.0).count()
    out["tile_cut_4000"] = {"sec": round(time.time() - t0, 3), "tiles": n}

    # grouped-map framework overhead at sf1 group count
    assigned = assign_tiles(imgs(4000), g.image_size, g.cell_size, g.edge,
                            p=g.p).persist()
    assigned.count()

    def triv(key, pdf):
        return pd.DataFrame([{"tile_tag": key[0], "n": len(pdf)}])

    t0 = time.time()
    (keyed_repartition(assigned, "tile_tag").groupBy("tile_tag")
     .applyInPandas(triv, schema="tile_tag string, n long").count())
    out["trivial_applyInPandas_10k_groups"] = round(time.time() - t0, 3)

    def trivm(batches):
        for pdf in batches:
            gb = pdf.groupby("tile_tag", sort=False).size()
            yield pd.DataFrame({"tile_tag": gb.index, "n": gb.values})

    t0 = time.time()
    (keyed_repartition(assigned, "tile_tag")
     .sortWithinPartitions("tile_tag")
     .mapInPandas(trivm, schema="tile_tag string, n long").count())
    out["trivial_sorted_mapInPandas_10k_groups"] = round(time.time() - t0, 3)
    assigned.unpersist()

    # est A/B on the 10x synthetic corpus's base (60k docs)
    base_words = ["batch", "part", "spark", "line", "column", "order",
                  "small", "sort", "fast", "value", "scan", "hash",
                  "slow", "group", "agg", "filter", "query", "big",
                  "key", "window", "row", "table", "stream", "merge",
                  "data", "join", "cache", "shuffle", "plan", "stage"]
    vocab = [f"{w}{i}" for w in base_words for i in range(10)]
    varr = F.array(*[F.lit(w) for w in vocab])
    words = [F.element_at(
        varr, (F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                      F.lit(len(vocab))) + 1).cast("int")) for j in range(50)]
    corpus = spark.range(60000).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text"))
    par = spark.sparkContext.defaultParallelism
    sig = dd_op.minhash_signatures_np(corpus.repartition(par)).persist()
    bands = dd_op.band_table(sig).persist()
    bands.count()
    hot = (bands.groupBy("band_id", "band_hash").count()
           .where(F.col("count") > 200).select("band_id", "band_hash"))
    bf = bands.join(F.broadcast(hot), ["band_id", "band_hash"], "left_anti")
    ba, bb = bf.alias("ba"), bf.alias("bb")
    pairs = (ba.join(bb, (F.col("ba.band_id") == F.col("bb.band_id"))
                     & (F.col("ba.band_hash") == F.col("bb.band_hash"))
                     & (F.col("ba._id") < F.col("bb._id")))
             .select(F.col("ba._id").alias("id_a"),
                     F.col("bb._id").alias("id_b"))
             .dropDuplicates(["id_a", "id_b"])).persist()
    out["raw_candidate_pairs"] = pairs.count()
    sa = sig.select(F.col("_id").alias("id_a"),
                    F.col("sig").alias("sig_a")).alias("sa")
    sb = sig.select(F.col("_id").alias("id_b"),
                    F.col("sig").alias("sig_b")).alias("sb")
    p2 = pairs.join(sa, "id_a").join(sb, "id_b")
    from functools import reduce
    from operator import add
    est_zip = (F.size(F.filter(
        F.zip_with(F.col("sa.sig_a"), F.col("sb.sig_b"),
                   lambda x, y: x == y), lambda m: m)).cast("double")
        / F.lit(32.0))
    est_el = reduce(add, [
        (F.element_at(F.col("sa.sig_a"), i + 1)
         == F.element_at(F.col("sb.sig_b"), i + 1)).cast("int")
        for i in range(32)]).cast("double") / F.lit(32.0)
    ab = {}
    for name, e in [("zip_with", est_zip), ("element_at", est_el),
                    ("zip_with", est_zip), ("element_at", est_el)]:
        t0 = time.time()
        p2.withColumn("est_jaccard", e) \
            .where(F.col("est_jaccard") >= 0.5).count()
        ab.setdefault(name, []).append(round(time.time() - t0, 3))
    out["est_ab_sec"] = ab
    pairs.unpersist()
    sig.unpersist()
    bands.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
