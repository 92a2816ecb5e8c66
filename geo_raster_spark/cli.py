"""Command-line surface: the engine's equivalents of the reference's
console scripts (SURVEY.md §2.1 util/).

    python -m geo_raster_spark.cli flagship   --images 100000 --zones 64
    python -m geo_raster_spark.cli tile-cut   --images 500 --out /tmp/tiles [--resume]
    python -m geo_raster_spark.cli tile-index --tiles /tmp/tiles
    python -m geo_raster_spark.cli extent-geojson --images 200 --out /tmp/fp.geojson
    python -m geo_raster_spark.cli zonal      --images 300 --zones 12
    python -m geo_raster_spark.cli knn        --points 20000 --lon 10 --lat 20 -k 5
    python -m geo_raster_spark.cli dedup      --docs /data/docs.parquet --out /tmp/unique \
                                              [--keep min_id|max_order --order-col score]
    python -m geo_raster_spark.cli compact    --store /data/minhash_store | --index /data/ivf_index

Reference CLI -> subcommand map:
  split_raster_tiles.py      -> tile-cut   (plan+exec+resume in one job)
  generate_tiles_extent.py   -> tile-index
  raster_extent2shp.py       -> extent-geojson
  retrieve_*_tiles.py        -> flagship (tile assignment + counts)
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    s = get_spark(app_name=f"gsr-cli-{args.cmd}", cores=args.cores)
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_flagship(args):
    from .plans.checkpoint import CheckpointTable
    from .plans.flagship import run_flagship_synthetic

    spark = _spark(args)
    cp = CheckpointTable(args.checkpoint) if args.checkpoint else None
    out = run_flagship_synthetic(spark, n_images=args.images, n_zones=args.zones,
                                 hot=args.hot, partitions=args.cores * 2,
                                 checkpoint=cp)
    n = out.count()
    print(json.dumps({"result_rows": n, "images": args.images, "zones": args.zones}))


def cmd_tile_cut(args):
    from . import synth
    from .operators import footprint, mosaic
    from .plans.checkpoint import CheckpointTable

    spark = _spark(args)
    imgs = footprint.with_footprint(
        synth.images_df(spark, args.images, args.cores, with_bytes=True))
    cp = CheckpointTable(args.checkpoint) if args.checkpoint else None
    tiles = mosaic.tile_cut(imgs, nodata=0.0, checkpoint=cp,
                            agg_to_cell=args.agg_cell,
                            out_fmt=args.out_fmt, out_dtype=args.out_dtype)
    if args.write_files:
        # the reference's on-disk product: data/<h>/<v>/<hv>/<hv>_<t>.tif
        # + .met sidecars with skip-existing resume (tile_store)
        from .sources import tile_store
        res = tile_store.write_tile_files(tiles, args.out, t=args.tag,
                                          fmt=args.out_fmt)
        print(json.dumps({"out": args.out, **res}))
        return
    tiles.write.mode("append" if args.resume else "overwrite").parquet(args.out)
    if cp is not None:
        cp.record_df(spark.read.parquet(args.out), "tile_cut", "tile_tag")
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"tiles_written": n, "out": args.out}))


def cmd_tile_index(args):
    from pyspark.sql import functions as F

    spark = _spark(args)
    t = spark.read.parquet(args.tiles)
    idx = (t.groupBy("tile_tag")
            .agg(F.sum("n_images").alias("n_images"),
                 F.sum("painted").alias("painted"),
                 F.sum(F.length("data")).alias("bytes"))
            .orderBy("tile_tag"))
    rows = idx.collect()
    print(json.dumps({"n_tiles": len(rows),
                      "total_painted": int(sum(r["painted"] for r in rows)),
                      "total_bytes": int(sum(r["bytes"] for r in rows))}))


def cmd_extent_geojson(args):
    from . import synth
    from .operators import footprint
    from .sources.vector import footprints_to_geojson

    spark = _spark(args)
    imgs = footprint.with_footprint(
        synth.images_df(spark, args.images, args.cores, with_bytes=False))
    n = footprints_to_geojson(imgs, args.out)
    print(json.dumps({"features": n, "out": args.out}))


def cmd_zonal(args):
    from . import synth
    from .operators import footprint, zonal

    spark = _spark(args)
    imgs = footprint.with_footprint(
        synth.images_df(spark, args.images, args.cores, with_bytes=True))
    zones = synth.zones_pandas(args.zones, hot=args.hot)
    out = zonal.zonal_stats(imgs, zones, nodata=-1.0).orderBy("zone_id").collect()
    print(json.dumps([{"zone_id": r["zone_id"], "mean": round(r["mean"], 4),
                       "rng": r["rng"], "n_pixels": r["n_pixels"]} for r in out]))


def cmd_knn(args):
    import pandas as pd

    from .operators import footprint, knn
    from .plans.flagship import footprint_input

    spark = _spark(args)
    pts = footprint.with_footprint(footprint_input(spark, args.points, args.cores))
    q = spark.createDataFrame(pd.DataFrame(
        {"query_id": [0], "lon": [args.lon], "lat": [args.lat]}))
    out = knn.knn_join(q, pts.select("image_id", "lon", "lat"),
                       k=args.k, ring=args.ring).orderBy("rank").collect()
    print(json.dumps([{"rank": r["rank"], "image_id": r["image_id_nn"],
                       "dist_km": round(r["dist_km"], 3)} for r in out]))


def cmd_dedup(args):
    """Corpus dedup end-game: docs parquet -> near-dup pairs ->
    connected components -> one survivor per cluster -> survivors
    parquet.  The CLI face of dedup_corpus (SURVEY.md §2.11 D6)."""
    from .operators import components as cc
    from .operators import dedup

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    pairs = dedup.minhash_lsh(docs, text_col=args.text_col,
                              id_col=args.id_col,
                              jaccard_threshold=args.threshold)
    stats: dict = {}
    comp = cc.connected_components(pairs.select("id_a", "id_b"),
                                   stats=stats)
    kept = cc.dedup_corpus(docs, pairs, id_col=args.id_col,
                           keep=args.keep, order_col=args.order_col,
                           components=comp)
    kept.write.mode("overwrite").parquet(args.out)
    n_in, n_out = docs.count(), spark.read.parquet(args.out).count()
    print(json.dumps({"n_docs": n_in, "n_pairs": pairs.count(),
                      "n_pair_edges": stats.get("edges"),
                      "n_dup_nodes": comp.count(),   # same key as bench.py
                      "cc_rounds": stats.get("iterations"),
                      "n_survivors": n_out,
                      "n_dropped": n_in - n_out, "out": args.out}))
    pairs.unpersist()


def cmd_compact(args):
    """Maintenance face of compact_store/compact_index (round-6 verdict
    #2): fold the daily-append small files, drop crash-replay-duplicated
    rows, print the reclaim stats — the knob an operator cron-runs so a
    year of appends doesn't become hundreds of files per partition."""
    spark = _spark(args)
    if args.store:
        from .operators.dedup import compact_store
        print(json.dumps(compact_store(spark, args.store,
                                       n_files=args.n_files)))
    else:
        from .operators.similarity import compact_index
        print(json.dumps(compact_index(spark, args.index,
                                       id_col=args.id_col)))


def main(argv=None):
    p = argparse.ArgumentParser(prog="geo_raster_spark")
    p.add_argument("--cores", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship")
    f.add_argument("--images", type=int, default=100_000)
    f.add_argument("--zones", type=int, default=64)
    f.add_argument("--hot", action="store_true")
    f.add_argument("--checkpoint")

    t = sub.add_parser("tile-cut")
    t.add_argument("--images", type=int, default=500)
    t.add_argument("--out", required=True)
    t.add_argument("--checkpoint")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--agg-cell", type=float, default=None)
    t.add_argument("--out-fmt", default="png", choices=["png", "tif"])
    t.add_argument("--out-dtype", default="uint8",
                   choices=["uint8", "uint16", "float32"])
    t.add_argument("--write-files", action="store_true",
                   help="write the data/h/v tile-file layout + .met "
                        "sidecars instead of parquet")
    t.add_argument("--tag", default="dat",
                   help="tile filename suffix (write-files mode)")

    i = sub.add_parser("tile-index")
    i.add_argument("--tiles", required=True)

    e = sub.add_parser("extent-geojson")
    e.add_argument("--images", type=int, default=200)
    e.add_argument("--out", required=True)

    z = sub.add_parser("zonal")
    z.add_argument("--images", type=int, default=300)
    z.add_argument("--zones", type=int, default=12)
    z.add_argument("--hot", action="store_true")

    k = sub.add_parser("knn")
    k.add_argument("--points", type=int, default=20_000)
    k.add_argument("--lon", type=float, required=True)
    k.add_argument("--lat", type=float, required=True)
    k.add_argument("-k", type=int, default=5)
    k.add_argument("--ring", type=int, default=3)

    d = sub.add_parser("dedup")
    d.add_argument("--docs", required=True, help="input docs parquet")
    d.add_argument("--out", required=True, help="survivors parquet")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--threshold", type=float, default=0.6)
    d.add_argument("--keep", default="min_id",
                   choices=["min_id", "max_order"])
    d.add_argument("--order-col", default=None,
                   help="column to maximize when --keep max_order")

    c = sub.add_parser("compact")
    target = c.add_mutually_exclusive_group(required=True)
    target.add_argument("--store",
                        help="minhash/phash signature store root")
    target.add_argument("--index", help="ANN index root (ivf or lsh)")
    c.add_argument("--n-files", type=int, default=8,
                   help="files per table after store compaction")
    c.add_argument("--id-col", default="vec_id",
                   help="vector id column (index compaction)")

    args = p.parse_args(argv)
    {"flagship": cmd_flagship, "tile-cut": cmd_tile_cut,
     "tile-index": cmd_tile_index, "extent-geojson": cmd_extent_geojson,
     "zonal": cmd_zonal, "knn": cmd_knn,
     "dedup": cmd_dedup, "compact": cmd_compact}[args.cmd](args)


if __name__ == "__main__":
    main()
