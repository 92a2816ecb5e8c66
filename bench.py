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
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
