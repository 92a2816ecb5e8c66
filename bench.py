#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name: sec},
"sf", plus flagship throughput fields}.

The flagship benchmark is the BASELINE.md protocol job: synthetic images
table (metadata only — the PIP/tile stages never read pixels) -> SplitMix64
footprints -> DGGS cell -> broadcast PIP join to 64 zones -> global-grid
tile assignment -> (zone, tile) counts.  ``images/sec`` is reported from it.

Two-cluster-size scaling evidence is produced by ``tools/scaling_run.py``
(separate JVMs at local[8] / local[32]); results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "1000000"))

# j6 now benches the ENGINE k-ring kNN plan (k1_knn_kring) rather than its
# crossJoin oracle twin — the headline number should reflect the scale plan
# (round-3 VERDICT #3); k1 stays hash-checked by the driver.
BENCH_QUERIES = ["q1_pricing", "g2_tile_assign", "j1_pip_rect", "j2_bbox_join",
                 "k1_knn_kring", "a9_value_counts", "a15_regression",
                 "d1_exact_dedup"]


def main():
    # oracle aux-artifact dumps are correctness scaffolding, not engine
    # cost — skip them so the bench times the operators (VERDICT r3 #2)
    os.environ["GSR_BENCH"] = "1"
    import __spark_entry__ as em
    from geo_raster_spark.session import get_spark
    from geo_raster_spark.plans.flagship import run_flagship_synthetic

    spark = get_spark(app_name="geo-raster-spark-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qs = em.queries()
    timings: dict[str, float] = {}

    # warm the JVM/Arrow paths once with a trivial action
    spark.range(1000).count()

    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    # flagship: warm codegen with a small run, then measure
    run_flagship_synthetic(spark, n_images=50_000, n_zones=64,
                           partitions=max(CPUS, 8)).count()
    t0 = time.time()
    flag_rows = run_flagship_synthetic(
        spark, n_images=N_IMAGES, n_zones=64, hot=False,
        partitions=max(CPUS, 8)).count()
    flagship_sec = time.time() - t0
    timings["flagship_pip_tile"] = round(flagship_sec, 3)

    # pixel path: decode -> mosaic -> per-tile PNG (G5) over 400 images
    from geo_raster_spark import synth
    from geo_raster_spark.operators import footprint as fp_op, mosaic as mz
    t0 = time.time()
    imgs = fp_op.with_footprint(synth.images_df(spark, 400, max(CPUS, 8)))
    tile_rows = mz.tile_cut(imgs, nodata=0.0).count()
    timings["g5_tile_cut_400"] = round(time.time() - t0, 3)

    # data-pipeline operators, timed but kept OUT of the headline total so
    # `value` stays comparable round-over-round with the original suite
    extras: dict[str, float] = {}
    for name in ["d2_minhash", "d5_simhash_pairs", "e1_cosine_topk",
                 "t1_token_stats", "w3_stateful_sessions", "m1_image_features"]:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        extras[name] = round(time.time() - t0, 3)

    # sf1 (10x) pixel-path scale point (round-5 verdict #8): per-stage
    # breakdown via nested timed actions — each action re-runs the prior
    # stages, so the DELTAS are the stage costs.  Shows the applyInPandas
    # framework overhead amortizing with scale (SCALE.md): at 400 images
    # the wall is mostly fixed framework cost; at 4000 the kernel share
    # (decode+paint, which is what grows at 100 TB) dominates.
    from geo_raster_spark.grid import TileGrid
    from geo_raster_spark.operators import zonal as z_op
    from geo_raster_spark.operators.tile_assign import assign_tiles
    g = TileGrid()
    sf1: dict = {"n_images": 4000}
    imgs1 = fp_op.with_footprint(synth.images_df(spark, 4000, max(CPUS, 8)))
    t0 = time.time()
    imgs1.count()
    sf1["stage_synth_footprint_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    assign_tiles(imgs1, g.image_size, g.cell_size, g.edge, p=g.p).count()
    sf1["stage_plus_assign_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    sf1["n_tiles"] = mz.tile_cut(imgs1, nodata=0.0).count()
    sf1["full_tile_cut_sec"] = round(time.time() - t0, 3)
    zones1 = synth.zones_pandas(12, hot=True)
    # warm the zonal plan (codegen + Arrow) on a small slice so the staged
    # timings below compare like-for-like, not cold-vs-warm
    z_op.zonal_partials(
        fp_op.with_footprint(synth.images_df(spark, 100, max(CPUS, 8))),
        zones1, nodata=-1.0).count()
    t0 = time.time()
    z_op.zonal_partials(imgs1, zones1, nodata=-1.0).count()
    sf1["stage_zonal_partials_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    z_op.zonal_combine(
        z_op.zonal_partials(imgs1, zones1, nodata=-1.0)).count()
    sf1["full_zonal_sec"] = round(time.time() - t0, 3)

    # dedup PIPELINE row (round-5 verdict #6): minhash_lsh -> connected
    # components over a planted 20%-duplicate corpus — pair count,
    # component count, and rounds-to-convergence guard against a
    # quadratic-join or non-converging regression.
    from pyspark.sql import functions as F

    from geo_raster_spark.operators import components as cc_op
    from geo_raster_spark.operators import dedup as dd_op
    def _planted_corpus(base):
        """base (doc_id, text) -> base + 10% near-copies + 10% exact
        copies at offset ids: the planted-20% dedup protocol."""
        n_base = base.count()
        tenth = max(n_base // 10, 1)
        near = (base.orderBy("doc_id").limit(tenth)
                    .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                            F.concat("text", F.lit(" nearcopy"))
                            .alias("text")))
        exact = (base.orderBy(F.col("doc_id").desc()).limit(tenth)
                     .select((F.col("doc_id") + 20_000_000).alias("doc_id"),
                             "text"))
        return base.unionByName(near).unionByName(exact), n_base + 2 * tenth

    def _dedup_pipeline_row(corpus, n_total) -> dict:
        """pairs -> connected components -> survivors, each stage timed;
        cc_rounds pins the O(log n) convergence against data growth."""
        row: dict = {"n_docs": n_total}
        t0 = time.time()
        pr = dd_op.minhash_lsh(corpus, jaccard_threshold=0.5) \
            .select("id_a", "id_b")
        row["n_pairs"] = pr.count()
        row["pairs_sec"] = round(time.time() - t0, 3)
        cstats: dict = {}
        t0 = time.time()
        comp = cc_op.connected_components(pr, stats=cstats)
        row["n_dup_nodes"] = comp.count()
        row["n_components"] = comp.select("root").distinct().count()
        row["components_sec"] = round(time.time() - t0, 3)
        row["cc_rounds"] = cstats.get("iterations")
        t0 = time.time()
        row["n_survivors"] = cc_op.dedup_corpus(
            corpus, pr, components=comp).count()
        row["survivor_sec"] = round(time.time() - t0, 3)
        pr.unpersist()
        return row

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    n_docs = docs.count()
    corpus, n_total = _planted_corpus(docs)
    dd = _dedup_pipeline_row(corpus, n_total)

    # 10x dedup scale point (round-6 verdict #7): the same planted-20%
    # protocol over a 10x synthetic corpus in the testdata documents'
    # style (fixed vocab, ~50 words/doc, fully JVM-generated) — pins
    # cc_rounds staying O(log n) and pairs_sec scaling ~linearly with
    # corpus size rather than with the quadratic candidate space.
    base_words = ["batch", "part", "spark", "line", "column", "order",
                  "small", "sort", "fast", "value", "scan", "hash",
                  "slow", "group", "agg", "filter", "query", "big",
                  "key", "window", "row", "table", "stream", "merge",
                  "data", "join", "cache", "shuffle", "plan", "stage"]
    # ~300 distinct tokens: wide enough that two RANDOM docs share few
    # 5-char shingles (like the testdata corpus, where cross-pairs are
    # rare) — with the 30-word base alone, random docs minhash-collide
    # and the row stops measuring the planted-dup pipeline
    vocab = [f"{w}{i}" for w in base_words for i in range(10)]
    varr = F.array(*[F.lit(w) for w in vocab])
    words = [F.element_at(
        varr, (F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                      F.lit(len(vocab))) + 1).cast("int"))
        for j in range(50)]
    base10 = spark.range(10 * n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"))
    corpus10, n_total10 = _planted_corpus(base10)
    dd10 = _dedup_pipeline_row(corpus10, n_total10)
    # corpus-size-normalized throughput ratio: ~1.0 = linear scaling
    if dd.get("pairs_sec") and dd10.get("pairs_sec"):
        dd10["pairs_linear_ratio"] = round(
            (dd["pairs_sec"] / dd["n_docs"])
            / (dd10["pairs_sec"] / dd10["n_docs"]), 3)

    # cross-modal dedup row (round-6 verdict #6): one components pass
    # over text-minhash + image-phash edges with namespaced doc:/img:
    # ids — 2,000 docs + 2,000 synthetic images, 10% of captions planted
    # as duplicates of document texts so clusters span modalities.
    cm_docs = docs.orderBy("doc_id").limit(2000) \
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    imgs_cm = synth.images_df(spark, 2000, max(CPUS, 8), with_bytes=False) \
        .select("image_id", "caption", "phash")
    dup_cap = (cm_docs.limit(200)
               .select(F.concat(F.lit("cap"), "doc_id").alias("image_id"),
                       F.col("text").alias("caption"),
                       F.xxhash64("doc_id").alias("phash")))
    imgs_cm = imgs_cm.select(
        F.col("image_id").cast("string").alias("image_id"),
        "caption", "phash").unionByName(dup_cap)
    cm: dict = {"n_docs": 2000, "n_images": 2200}
    t0 = time.time()
    cm["n_survivors"] = cc_op.cross_modal_dedup(
        cm_docs, imgs_cm, jaccard_threshold=0.5).count()
    cm["dedup_sec"] = round(time.time() - t0, 3)

    # seam A/B rows (round-5 verdict #3): the decode-dominated JFIF
    # tile_cut, pure-NumPy decoder vs GSR_FASTJPEG=1 (JVM ImageIO through
    # the unchanged codec seam), one fresh process per variant (the env
    # gate registers per Python worker at import), PSNR-gated in-run.
    # Subprocess JVM startup is excluded — each row times the job only.
    import subprocess
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_native_tilecut.py")

    def _seam_run(fast: bool) -> dict:
        try:
            r = subprocess.run(
                [sys.executable, tool] + (["--fast"] if fast else []),
                capture_output=True, text=True, timeout=600)
            for ln in r.stdout.splitlines():
                if ln.startswith("{"):
                    return json.loads(ln)
            return {"error": r.stderr[-300:], "fast": fast}
        except Exception as exc:  # never let the seam rows sink the bench
            return {"error": str(exc)[:300], "fast": fast}

    seam_pure = _seam_run(False)
    seam_fast = _seam_run(True)
    native = {"tile_cut_jfif_sec": seam_pure.get("sec"),
              "tile_cut_jfif_native_sec": seam_fast.get("sec"),
              "n_images": seam_pure.get("n_images"),
              "psnr_min_db": seam_fast.get("psnr_min_db"),
              # None when either side failed — never fabricate parity
              # from two missing row counts (None == None)
              "rows_equal": (seam_pure.get("rows") == seam_fast.get("rows")
                             if seam_pure.get("rows") is not None
                             and seam_fast.get("rows") is not None
                             else None)}
    if seam_pure.get("sec") and seam_fast.get("sec"):
        native["speedup"] = round(seam_pure["sec"] / seam_fast["sec"], 2)
    for s in (seam_pure, seam_fast):
        if "error" in s:
            native.setdefault("errors", []).append(s["error"])

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query wall time (flagship PIP+tile + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "flagship_images": N_IMAGES,
        "flagship_result_rows": flag_rows,
        "tile_cut_rows": tile_rows,
        "images_per_sec": round(N_IMAGES / flagship_sec, 1),
        "queries_extra": extras,
        "sf1_pixel_path": sf1,
        "dedup_pipeline": dd,
        "dedup_pipeline_10x": dd10,
        "cross_modal_dedup": cm,
        "native_seam": native,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
