#!/usr/bin/env python
"""Measure the focal halo-exchange shuffle payload: strips vs full-tile x9.

Round 1 shipped every tile whole to its 3x3 neighborhood (payload = 9x tile
bytes); round 2 ships the center + 8 halo strips.  This tool measures the
ACTUAL emitted payload (sum of PNG strip bytes that cross the shuffle) for
both designs over the same tiles and prints the ratio.

Usage: python tools/focal_shuffle_bytes.py [n_images]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import pyspark.sql.functions as F

    from geo_raster_spark import synth
    from geo_raster_spark.grid import TileGrid
    from geo_raster_spark.operators import focal_ops, footprint, mosaic
    from geo_raster_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    halo = 2
    spark = get_spark(app_name="focal-shuffle-bytes")
    spark.sparkContext.setLogLevel("ERROR")

    g = TileGrid()
    imgs = footprint.with_footprint(synth.images_df(spark, n, 8, with_bytes=True))
    tiles = mosaic.tile_cut(imgs, nodata=0.0).persist()
    n_tiles, tile_bytes = tiles.agg(
        F.count("*"), F.sum(F.length("data"))).collect()[0]

    emitted = tiles.mapInPandas(
        focal_ops._strip_emitter(g.n_cols, halo + g.edge),
        schema=focal_ops._EMIT_SCHEMA)
    n_rows, strip_bytes = emitted.agg(
        F.count("*"), F.sum(F.length("data"))).collect()[0]

    naive = 9 * tile_bytes
    print(f"tiles={n_tiles}  tile_payload={tile_bytes:,} B")
    print(f"halo-strip emission rows={n_rows}  payload={strip_bytes:,} B")
    print(f"round-1 full-tile x9 payload={naive:,} B")
    print(f"shuffle payload ratio strips/naive = {strip_bytes / naive:.3f}  "
          f"({naive / strip_bytes:.1f}x less data shuffled)")
    tiles.unpersist()


if __name__ == "__main__":
    main()
