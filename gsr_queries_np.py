"""Rows-only queries: operators whose semantics ANSI SQL cannot express
(pixel kernels, LSH pipelines, k-ring ANN).  The driver records a weaker
rows-only check here; exact parity for each is enforced by the NumPy-oracle
pytest suite (tests/test_spark_ops.py, tests/test_kernels_*.py).

Each callable still takes (spark, sf_dir) per the driver contract; pixel
operators synthesize their deterministic images input (BASELINE.json
``input_hint`` schema) since the driver tables carry no imagery.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _aux_enabled() -> bool:
    """Oracle aux-artifact dumps are CORRECTNESS scaffolding, not engine
    cost: bench.py sets GSR_BENCH=1 so the timed queries skip the parquet
    dumps (and the dump->read round-trips) and the bench times the
    operator alone.  The driver's correctness runs leave the flag unset,
    so every oracle always reads a fresh artifact."""
    return os.environ.get("GSR_BENCH") != "1"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _images(spark, n=400):
    from geo_raster_spark import synth
    from geo_raster_spark.operators import footprint
    # 8 generation tasks A/B-measured FASTER than one per core at these
    # row counts (round 8: 200 imgs, p8 1.10 s vs p32 1.45 s — ~6-row
    # Python tasks are pure scheduling overhead); downstream kernels
    # re-partition to full width where it matters
    return footprint.with_footprint(
        synth.images_df(spark, n, 8, with_bytes=True))


def q_g5_tile_cut(spark, sf_dir):
    """G5/G11/J7: decode -> mosaic -> per-tile PNG tiles (pixel pipeline)."""
    from geo_raster_spark.operators import mosaic
    tiles = mosaic.tile_cut(_images(spark), nodata=0.0)
    return tiles.select("tile_tag", "tile_col", "tile_row", "n_images",
                        "painted", F.length("data").alias("png_bytes"))


def q_g5_tile_cut_agg(spark, sf_dir):
    """G5 + A1: tile cut with aggregation to a 4x coarser cell.

    ORACLE-CHECKED via the aux artifact: the UN-aggregated mosaic pixels
    are dumped per tile (PNG encode of integral uint8 values is lossless,
    so the dump equals the pre-agg float plane); DuckDB re-runs the
    area-weighted mean's validity gate — at the ALIGNED 4x scale the
    fractional weights collapse to integers, so ok := n_valid >= 16 *
    min_rate — and must reproduce every tile's painted count and dims."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs
    from geo_raster_spark.operators import mosaic
    from geo_raster_spark.synth import CELL_SIZE

    base = mosaic.tile_cut(_images(spark, 200), nodata=0.0)
    path = f"{AUX_DIR}/g5_pixels"

    def dump(it):  # oracle scaffolding — skipped under GSR_BENCH=1
        for pdf in it:
            outs = []
            for _, r0 in pdf.iterrows():
                a = codecs.decode_png(bytes(r0["data"])).astype(np.float64)
                h, w = a.shape
                rr, cc = np.meshgrid(np.arange(h, dtype=np.int32),
                                     np.arange(w, dtype=np.int32),
                                     indexing="ij")
                outs.append(pd.DataFrame({
                    "tile_tag": r0["tile_tag"],
                    "n_images": np.int32(r0["n_images"]),
                    "r": rr.ravel(), "c": cc.ravel(), "v": a.ravel()}))
            yield (pd.concat(outs) if outs else
                   pd.DataFrame(columns=["tile_tag", "n_images", "r", "c", "v"]))

    if _aux_enabled():
        base.mapInPandas(
            dump,
            schema="tile_tag string, n_images int, r int, c int, v double") \
            .write.mode("overwrite").parquet(path)

    tiles = mosaic.tile_cut(_images(spark, 200), nodata=0.0,
                            agg_to_cell=CELL_SIZE * 4, agg_func="mean")
    return tiles.select("tile_tag", "width", "height", "n_images", "painted")


def q_z1_zonal(spark, sf_dir):
    """A11/R1: distributed zonal statistics over decoded pixels.

    ORACLE-CHECKED via the aux artifact: the map-side PARTIALS (zone_id,
    image_id, psum, pcount, pmin, pmax — the only thing that shuffles)
    are persisted; DuckDB re-runs the combine aggregation.  The decode/
    rasterize kernel itself stays pinned by the NumPy-oracle pytests."""
    from geo_raster_spark import synth
    from geo_raster_spark.operators import zonal
    zones = synth.zones_pandas(12, hot=True)
    part = zonal.zonal_partials(_images(spark), zones, nodata=-1.0)
    if _aux_enabled():
        path = f"{AUX_DIR}/z1_partials"
        part.write.mode("overwrite").parquet(path)
        part = spark.read.parquet(path)
    out = zonal.zonal_combine(part)
    return out.select("zone_id", F.round("mean", 6).alias("mean"),
                      F.round("rng", 6).alias("rng"), "n_pixels", "n_images")


# Orders-derived point cloud shared by the k1/i1 oracles: the identical
# integer-modular lon/lat DuckDB can reproduce (same as __spark_entry__).
_PT_LON = "CAST(((o_orderkey * 7919) % 36000) / 100.0 - 180.0 AS DOUBLE)"
_PT_LAT = "CAST(((o_orderkey * 104729) % 12000) / 100.0 - 60.0 AS DOUBLE)"

_K1_PROBES = [(0, -120.0, 40.0), (1, -60.0, -20.0), (2, 0.0, 10.0),
              (3, 60.0, -40.0), (4, 120.0, 5.0), (5, 30.0, 50.0),
              (6, -30.0, -50.0), (7, 90.0, 0.0)]

_I1_PROBES = [(0, 10.0, 20.0), (1, -100.0, 30.0), (2, 45.0, -10.0),
              (3, -45.0, 40.0), (4, 150.0, -30.0), (5, 0.0, 0.0)]


def _probe_df(spark, probes):
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame(probes, columns=["query_id", "lon", "lat"]))


def _order_points(spark, sf_dir):
    return (_t(spark, sf_dir, "orders")
            .select(F.col("o_orderkey").alias("pid"),
                    F.expr(_PT_LON).alias("lon"),
                    F.expr(_PT_LAT).alias("lat")))


def q_k1_knn_kring(spark, sf_dir):
    """J6: kNN via DGGS k-ring candidate expansion + windowed refine —
    ORACLE-CHECKED: the ring restriction, haversine refine and (dist, id)
    ranking are re-expressed in ANSI SQL over the same orders-derived
    points [ref: mod/geo_interpolate.pyx:47-104 — the radius gather]."""
    from geo_raster_spark.operators import knn
    qs = _probe_df(spark, _K1_PROBES)
    pts = _order_points(spark, sf_dir)
    return (knn.knn_join(qs, pts, k=5, ring=3, point_id="pid")
            .select("query_id", "rank", F.col("pid_nn").alias("nn_id"),
                    F.round("dist_km", 4).alias("dist_km")))


def q_i1_idw(spark, sf_dir):
    """W7/J6: IDW interpolation at query points via k-ring gather —
    ORACLE-CHECKED: sum(v/d^p)/sum(1/d^p) over the same ring candidates
    in ANSI SQL [ref: mod/geo_interpolate.pyx:18-104]."""
    from geo_raster_spark.operators import knn
    qs = _probe_df(spark, _I1_PROBES)
    pts = _order_points(spark, sf_dir).withColumn(
        "value", F.expr("CAST(pid % 1000 AS DOUBLE)"))
    return (knn.idw_at_points(qs, pts, "value", power=2.0, ring=2)
            .select("query_id", F.round("idw_value", 6).alias("idw_value"),
                    "n_neighbors"))


def q_d2_minhash(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs over documents.

    ORACLE-CHECKED via the aux artifact: Spark writes the signature table
    (NumPy KM minhash); the DuckDB oracle re-runs the ENTIRE banded LSH
    downstream from it in ANSI SQL — band split, hot-bucket exclusion,
    self-join, matching-slot estimate, threshold (band buckets by raw
    4-tuple equality ≡ the engine's xxhash64 bucket keys)."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    sig = dedup.minhash_signatures_np(d)
    if _aux_enabled():
        path = f"{AUX_DIR}/d2_sig"
        sig.write.mode("overwrite").parquet(path)
        sig = spark.read.parquet(path)
    return dedup.minhash_pairs_from_sig(sig, jaccard_threshold=0.5)


# Shared artifact dir: aux-write pattern for the d3/d4/d5 oracles — Spark
# persists the non-SQL-expressible intermediate (signatures / candidate
# pairs) as parquet; the DuckDB oracle reads the SAME artifact and
# re-expresses the downstream join/agg in ANSI SQL.  The driver runs the
# Spark query first, then its oracle, so the artifact is always fresh.
AUX_DIR = "/tmp/gsr_oracle_aux"


def q_d3_simhash(spark, sf_dir):
    """SimHash fingerprints: distribution of 16-bit prefixes.

    ORACLE-CHECKED via the aux artifact: Spark writes the signature table;
    both engines compute the prefix distribution from it (the signature
    values themselves are pinned by the scalar-parity pytest)."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents")
    sig = dedup.simhash_signature(d)
    if _aux_enabled():
        path = f"{AUX_DIR}/d3_sig"
        sig.write.mode("overwrite").parquet(path)
        sig = spark.read.parquet(path)
    return (sig.select(F.expr("CAST((simhash >> 48) & 65535 AS BIGINT)")
                        .alias("prefix"))
               .groupBy("prefix").agg(F.count("*").alias("n")))


def q_t4_stack_median(spark, sf_dir):
    """Per-pixel MEDIAN across a 3-epoch tile stack (the reference's
    multi-scene compositing role).  Epochs = three disjoint synthetic image
    slices tiled independently.

    ORACLE-CHECKED via the aux artifact: the per-epoch tile pixels are
    dumped (valid values only + one marker row per (tile, epoch)); DuckDB
    re-runs the per-pixel median combine with ``quantile_cont(v, 0.5)``
    (≡ np.nanmedian's linear interpolation) and must reproduce every
    tile's epoch count, painted count AND the float sum of the median
    plane (epoch medians of uint8 inputs are multiples of 0.5, so the
    sum is binary-exact in both engines)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as SF

    from geo_raster_spark import codecs, synth
    from geo_raster_spark.operators import footprint, mosaic as mz, stack as stk

    epochs = []
    for e in range(3):
        imgs = footprint.with_footprint(
            synth.images_df(spark, 150, 8, with_bytes=True, start=e * 150))
        epochs.append(mz.tile_cut(imgs, nodata=0.0)
                      .withColumn("epoch", SF.lit(e)))
    tiles = epochs[0].unionByName(epochs[1]).unionByName(epochs[2])

    if _aux_enabled():
        def dump(it):
            for pdf in it:
                outs = []
                for _, r0 in pdf.iterrows():
                    a = codecs.decode_png(bytes(r0["data"])).astype(np.float64)
                    rr, cc = np.nonzero(a != 0.0)
                    outs.append(pd.DataFrame({
                        "tile_tag": r0["tile_tag"],
                        "epoch": np.int32(r0["epoch"]),
                        # marker row (r = -1) keeps fully-nodata epochs in
                        # the per-tile epoch count
                        "r": np.concatenate([[-1], rr]).astype(np.int32),
                        "c": np.concatenate([[-1], cc]).astype(np.int32),
                        "v": np.concatenate([[0.0], a[rr, cc]])}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame(columns=["tile_tag", "epoch", "r", "c", "v"]))

        tiles.select("tile_tag", "epoch", "data").mapInPandas(
            dump, schema="tile_tag string, epoch int, r int, c int, v double") \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/t4_pixels")

    out = stk.pixel_stack_stats(tiles, stat="median", nodata=0.0)
    return out.select("tile_tag", "n_epochs", "painted",
                      F.round("val_sum", 4).alias("val_sum"))


def q_g12_overviews(spark, sf_dir):
    """Tile pyramid: 2 overview levels above the base tile cut (4 children
    -> 1 parent per level, area-weighted 2x mean).

    ORACLE-CHECKED via the aux artifact: the LEVEL-0 core pixels are
    dumped once (valid values + one marker row per child tile); DuckDB
    re-runs BOTH pyramid levels from them in SQL — quadrant placement,
    2x nodata-aware mean, the half-to-even uint8 rounding between levels
    (np.round emulated exactly) — and must reproduce each level's tile
    count, child count, painted count and stored-pixel value sum."""
    import numpy as np
    import pandas as pd

    from geo_raster_spark import codecs
    from geo_raster_spark.grid import TileGrid
    from geo_raster_spark.operators import mosaic as mz, overviews as ov

    tiles = mz.tile_cut(_images(spark, 400), nodata=0.0)
    size = TileGrid().image_size

    if _aux_enabled():
        def dump(it):
            for pdf in it:
                outs = []
                for _, r0 in pdf.iterrows():
                    a = codecs.decode_png(bytes(r0["data"])) \
                        .astype(np.float64)[:size, :size]   # edge halo dropped
                    rr, cc = np.nonzero(a != 0.0)
                    outs.append(pd.DataFrame({
                        "tile_col": np.int32(r0["tile_col"]),
                        "tile_row": np.int32(r0["tile_row"]),
                        "r": np.concatenate([[-1], rr]).astype(np.int32),
                        "c": np.concatenate([[-1], cc]).astype(np.int32),
                        "v": np.concatenate([[0.0], a[rr, cc]])}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame(columns=["tile_col", "tile_row",
                                             "r", "c", "v"]))

        tiles.select("tile_col", "tile_row", "data").mapInPandas(
            dump, schema="tile_col int, tile_row int, r int, c int, v double") \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/g12_pixels")

    out = ov.build_overviews(tiles, levels=2, nodata=0.0)

    def pix_sum(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["val_sum"] = [int(codecs.decode_png(bytes(d)).sum())
                              for d in pdf["data"]]
            yield pdf[["level", "n_children", "painted", "val_sum"]]

    per_tile = out.mapInPandas(
        pix_sum, schema="level int, n_children int, painted long, val_sum long")
    return (per_tile.groupBy("level")
                    .agg(F.count("*").alias("n_tiles"),
                         F.sum("n_children").alias("children"),
                         F.sum("painted").alias("painted"),
                         F.sum("val_sum").alias("val_sum")))


def q_g11_composite(spark, sf_dir):
    """G11/J7 priority composite: freshest-pixel mosaic — candidates paint
    in ascending (priority, image_id); per-tile stats.

    ORACLE-CHECKED via the aux artifact: every candidate's SINGLE-SOURCE
    paint (tile pixel -> its value, before any compositing) is dumped plus
    one marker row per (tile, image); DuckDB re-picks each pixel's winner
    by min(priority, image_id) — the first-wins order
    [ref: mod/geo_raster_ex_c.pyx:1241-1243, order fixed per SURVEY.md §4]
    — and must reproduce every tile's candidate count, painted count and
    painted-pixel value sum."""
    import numpy as np
    import pandas as pd

    from geo_raster_spark import codecs
    from geo_raster_spark.grid import RasterInfo, TileGrid
    from geo_raster_spark.kernels import warp as warp_k
    from geo_raster_spark.operators import mosaic as mz
    from geo_raster_spark.operators.tile_assign import assign_tiles

    imgs = _images(spark, 400).withColumn(
        "prio", F.pmod(F.xxhash64("image_id"), F.lit(7)).cast("double"))

    if _aux_enabled():
        g = TileGrid()
        assigned = assign_tiles(imgs, g.image_size, g.cell_size, g.edge,
                                p=g.p)

        def dump(it):
            for pdf in it:
                outs = []
                for _, r0 in pdf.iterrows():
                    info = g.tile_info(int(r0["tile_col"]),
                                       int(r0["tile_row"]))
                    arr = codecs.decode(bytes(r0["bytes"]), r0["fmt"]) \
                        .astype(np.float64)
                    src = RasterInfo(tuple(r0["gt"]), int(r0["w"]),
                                     int(r0["h"]))
                    single = warp_k.warp_band(arr, src, info, 0.0)
                    rr, cc = np.nonzero(single != 0.0)
                    outs.append(pd.DataFrame({
                        "tile_tag": r0["tile_tag"],
                        "prio": float(r0["prio"]),
                        "image_id": r0["image_id"],
                        "r": np.concatenate([[-1], rr]).astype(np.int32),
                        "c": np.concatenate([[-1], cc]).astype(np.int32),
                        "v": np.concatenate([[0.0], single[rr, cc]])}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame(columns=["tile_tag", "prio", "image_id",
                                             "r", "c", "v"]))

        assigned.mapInPandas(
            dump, schema=("tile_tag string, prio double, image_id string, "
                          "r int, c int, v double")) \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/g11_pixels")

    t = mz.tile_cut(imgs, nodata=0.0, priority_col="prio")

    def pix_sum(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["val_sum"] = [int(codecs.decode_png(bytes(d)).sum())
                              for d in pdf["data"]]
            yield pdf[["tile_tag", "n_images", "painted", "val_sum"]]

    return t.mapInPandas(
        pix_sum,
        schema="tile_tag string, n_images int, painted long, val_sum long")


def q_m1_image_features(spark, sf_dir):
    """Multimodal feature-extract: per-image pixel statistics (moments,
    percentiles, gradient energy, entropy) over decoded payloads, grouped
    by fmt for a stable small result.

    ORACLE-CHECKED via the aux artifact: decoded pixels are dumped as an
    (image_id, fmt, r, c, v) table ON EXECUTORS; DuckDB recomputes ALL
    FIVE features from it in SQL (stddev_pop, quantile_cont = NumPy's
    linear-interpolated percentile, np.gradient-convention central/
    one-sided differences via window lag/lead, 8-bit histogram entropy)
    and must match the Arrow-kernel features after the fmt rollup."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs
    from geo_raster_spark.operators import multimodal as mm

    imgs = _images(spark, 200)
    path = f"{AUX_DIR}/m1_pixels"

    def dump(it):
        for pdf in it:
            outs = []
            for _, r0 in pdf.iterrows():
                a = codecs.decode(bytes(r0["bytes"]), r0["fmt"]) \
                    .astype(np.float64)
                h, w = a.shape
                rr, cc = np.meshgrid(np.arange(h, dtype=np.int32),
                                     np.arange(w, dtype=np.int32),
                                     indexing="ij")
                outs.append(pd.DataFrame({
                    "image_id": r0["image_id"], "fmt": r0["fmt"],
                    "r": rr.ravel(), "c": cc.ravel(), "v": a.ravel()}))
            yield (pd.concat(outs) if outs else
                   pd.DataFrame(columns=["image_id", "fmt", "r", "c", "v"]))

    if _aux_enabled():
        imgs.mapInPandas(
            dump,
            schema="image_id string, fmt string, r int, c int, v double") \
            .write.mode("overwrite").parquet(path)

    feats = mm.image_features(_images(spark, 200))
    # metadata-only twin for the rollup join: image_id/fmt don't depend on
    # the payload, so skip the 200 extra payload encodes a bytes-bearing
    # generator would pay (round 8)
    from geo_raster_spark import synth as _synth
    meta = _synth.images_df(spark, 200, 8, with_bytes=False) \
        .select("image_id", "fmt")
    return (feats.join(meta, "image_id")
                 .groupBy("fmt")
                 .agg(F.count("*").alias("n"),
                      F.round(F.avg("mean"), 6).alias("avg_mean"),
                      F.round(F.avg("std"), 6).alias("avg_std"),
                      F.round(F.avg("p90"), 6).alias("avg_p90"),
                      F.round(F.avg("edge_energy"), 6).alias("avg_edge"),
                      F.round(F.avg("entropy"), 6).alias("avg_entropy")))


def q_m2_frame_sample(spark, sf_dir):
    """Multimodal frame-sample: REAL MJPEG videos (concatenated baseline
    JFIF frames, gray and 4:4:4 color alternating) -> sampled frames via
    structural split + in-repo DCT/Huffman decode.

    ORACLE-CHECKED via the aux artifact (verdict r4 #4): executors dump
    the FULL per-video frame-boundary table (structural MJPEG walk) plus
    every frame's decoded-PNG length; DuckDB re-derives the every-n
    selection and the t_sec math from the boundary table alone (frame_idx
    % 12 = 0, frame_idx / fps) and joins the decode-bound PNG lengths.
    The decode itself stays pytest-pinned (exact frame bytes,
    tests/test_multimodal.py::test_frame_sample_real_mjpeg)."""
    import pandas as pd
    from geo_raster_spark import synth
    from geo_raster_spark.operators import multimodal as mm
    rows = []
    for i in range(40):
        n = 12 + (i * 7) % 36
        if i % 2 == 0:
            frames = [synth.image_pixels(j, 32, 24, i * 1000 + j)
                      for j in range(n)]
        else:
            frames = [synth.image_pixels_rgb(j, 16, 12, i * 1000 + j)
                      for j in range(n)]
        rows.append((f"v{i:04d}", bytearray(mm.mjpeg_encode(frames, 90))))
    vids = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "bytes"]))

    if _aux_enabled():
        from geo_raster_spark import codecs as _codecs
        from geo_raster_spark import jpeg as _jpeg

        def dump(it):
            for pdf in it:
                out = []
                for _, r in pdf.iterrows():
                    payload = bytes(r["bytes"])
                    for fi, (s, e) in enumerate(mm.mjpeg_offsets(payload)):
                        png_len = len(_codecs.encode_png(
                            _jpeg.decode(payload[s:e])))
                        out.append((r["video_id"], fi, s, e, png_len))
                yield pd.DataFrame(out, columns=["video_id", "frame_idx",
                                                 "s", "e", "png_len"])

        vids.mapInPandas(
            dump, schema=("video_id string, frame_idx int, s long, e long, "
                          "png_len long")) \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/m2_frames")

    frames = mm.frame_sample(vids, every_n=12)
    return (frames.groupBy("video_id")
                  .agg(F.count("*").alias("n_frames_sampled"),
                       F.round(F.max("t_sec"), 4).alias("last_t"),
                       F.sum(F.length("frame")).alias("bytes_total")))


def q_d5_simhash_pairs(spark, sf_dir):
    """SimHash Hamming near-dup pairs via pigeonhole block buckets.

    Plants 5 deterministic near-dups (doc_id + 10M, one token appended —
    a handful of flipped signature bits) so a working operator returns
    >= 5 rows and a broken one returns 0 (non-vacuous rows check).

    ORACLE-CHECKED via the aux artifact: Spark writes the signature table;
    the DuckDB oracle re-runs the ENTIRE pigeonhole pair join from it
    (block split, hot-bucket exclusion, self-join, bit_count(xor) verify)."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (d.orderBy("doc_id").limit(5)
                .select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" almostidentical"))
                        .alias("text")))
    both = d.unionByName(planted)
    sig = dedup.simhash_signature(both)
    if _aux_enabled():
        path = f"{AUX_DIR}/d5_sig"
        sig.write.mode("overwrite").parquet(path)
        sig = spark.read.parquet(path)
    return dedup.simhash_pairs_from_sig(
        sig.withColumnRenamed("doc_id", "_id"), max_hamming=6)


def q_d6_dedup_corpus(spark, sf_dir):
    """Corpus dedup END-GAME: pairs -> distributed connected components
    (alternating large-star/small-star) -> min-id survivor anti-join.

    Plants a 3-link near-dup CHAIN per seed (A -> A+10M -> A+20M, one
    token appended each step) so TRANSITIVITY is exercised: both copies
    must collapse into A even when the chain ends never pair directly —
    the semantics pair lists alone cannot express.

    ORACLE-CHECKED via the aux artifact: Spark writes the candidate PAIRS
    (minhash_lsh output); the DuckDB oracle re-derives the transitive
    closure with a recursive CTE and the same min-id survivor rule over
    the same planted corpus.  The result is invariant to WHICH candidate
    pairs LSH emitted (both engines consume the identical artifact)."""
    from geo_raster_spark.operators import components as cc
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.orderBy("doc_id").limit(5)
    b = seeds.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                     F.concat("text", F.lit(" nearcopy")).alias("text"))
    c = b.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                 F.concat("text", F.lit(" again")).alias("text"))
    corpus = d.unionByName(b).unionByName(c)
    pairs = dedup.minhash_lsh(corpus, jaccard_threshold=0.5) \
        .select("id_a", "id_b")
    if _aux_enabled():
        path = f"{AUX_DIR}/d6_pairs"
        pairs.write.mode("overwrite").parquet(path)
        pairs = spark.read.parquet(path)
    kept = cc.dedup_corpus(corpus, pairs, id_col="doc_id", keep="min_id")
    return kept.select("doc_id", F.length("text").alias("text_len"))


def q_d7_phash_pairs(spark, sf_dir):
    """Image near-dup pairs over the input_hint's ``phash:int64`` column
    (pigeonhole Hamming buckets — the simhash machinery, hash-agnostic).

    Plants 5 near-dups (3 flipped bits, image_id + '_dup') so a working
    operator returns >= 5 rows with exact hamming values; random
    splitmix64 phashes land within hamming<=3 with probability ~2^-48
    per pair, so the planted pairs dominate.

    ORACLE-CHECKED via the aux artifact: Spark writes (image_id, phash);
    the DuckDB oracle re-runs block split + hot-bucket exclusion + pair
    join + bit_count(xor) verify from it."""
    from geo_raster_spark import synth
    from geo_raster_spark.operators import dedup
    imgs = synth.images_df(spark, 400, 8, with_bytes=False) \
        .select("image_id", "phash")
    planted = (imgs.orderBy("image_id").limit(5)
                   .select(F.concat("image_id", F.lit("_dup"))
                            .alias("image_id"),
                           F.col("phash").bitwiseXOR(F.lit(73))
                            .alias("phash")))   # 73 = 0b1001001: 3 bits
    both = imgs.unionByName(planted)
    if _aux_enabled():
        path = f"{AUX_DIR}/d7_phash"
        both.write.mode("overwrite").parquet(path)
        both = spark.read.parquet(path)
    return dedup.phash_pairs(both, max_hamming=3)


def q_d4_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard on LSH candidate pairs.

    ORACLE-CHECKED via the aux artifact: Spark writes the LSH candidate
    pairs; the DuckDB oracle recomputes the exact 5-gram Jaccard for every
    pair from the raw documents table with list functions."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh(d, jaccard_threshold=0.3).select("id_a", "id_b")
    if _aux_enabled():
        path = f"{AUX_DIR}/d4_pairs"
        cand.write.mode("overwrite").parquet(path)
        cand = spark.read.parquet(path)
    return dedup.ngram_jaccard(d, cand)


def q_e2_lsh_topk(spark, sf_dir):
    """ANN top-k via a PERSISTED random-hyperplane LSH index: build once
    (bucket-partitioned assignments + stats sidecar), then the probe reads
    only its candidate bucket partitions — no per-query full-table pass
    (the round-2 scale defect).  Values identical to in-session lsh_topk
    (pinned by test_lsh_index_persisted_pruned_and_equal).

    ORACLE-CHECKED via aux artifacts: the probe's candidate-bucket set is
    also written; DuckDB re-runs the bucket filter + cosine scoring +
    (cosine DESC, id ASC) top-k from the SAME assignments parquet."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark.operators import similarity
    import gsr_queries
    emb = _t(spark, sf_dir, "embeddings")
    path = f"{AUX_DIR}/e2_lsh"
    mu = similarity.build_lsh_index(emb, 64, path, n_planes=6)
    probe = np.asarray(gsr_queries._probe_vec(), dtype=np.float64)
    planes = similarity.random_planes(64, 6)
    b0 = similarity._bucket_of(probe, planes, mu)
    cand = sorted(similarity._multiprobe_buckets(b0, 6, 1))
    if _aux_enabled():
        spark.createDataFrame(
            pd.DataFrame({"bucket": [int(b) for b in cand]})) \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/e2_probe")
    return (similarity.lsh_topk_indexed(spark, path, probe,
                                        k=10, multiprobe_bits=1)
            .select("vec_id", "rank", F.round("cosine", 4).alias("cosine")))


def q_e4_ivf_topk(spark, sf_dir):
    """IVF ANN top-k over the PERSISTED index (partition-pruned inverted
    lists + in-list brute force).

    ORACLE-CHECKED via aux artifacts: the probed list ids are written
    alongside; DuckDB re-runs list filter + cosine + top-k from the SAME
    assignments parquet."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark.operators import similarity
    import gsr_queries
    emb = _t(spark, sf_dir, "embeddings")
    path = f"{AUX_DIR}/e4_ivf"
    C = similarity.build_ivf_index(emb, 64, path, n_centroids=16)
    probe = np.asarray(gsr_queries._probe_vec(), dtype=np.float64)
    order = np.argsort(((C - probe) ** 2).sum(1))[:4]
    if _aux_enabled():
        spark.createDataFrame(
            pd.DataFrame({"ivf": [int(i) for i in order]})) \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/e4_probe")
    return (similarity.ivf_topk_indexed(spark, path, probe, k=10, nprobe=4)
            .select("vec_id", "rank", F.round("cosine", 4).alias("cosine")))


def q_e3_embedding_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs within LSH buckets.

    The raw embeddings table has NO pair above cosine ~0.51 at small SF
    (verified by brute force), which made the 0-row result vacuous as a
    check — so the query plants 5 deterministic near-dups (vec_id + 10M,
    each component nudged by 1e-6) that the operator must recover:
    a working operator returns >= 5 rows, a broken one returns 0."""
    from geo_raster_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = emb.orderBy("vec_id").limit(5)
    planted = seeds.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x + F.lit(1e-6)).alias("embedding"))
    both = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("embedding")).unionByName(planted)
    # ORACLE-CHECKED: DuckDB brute-forces ALL pairs >= threshold over the
    # same (base + planted) table — also a 100%-recall check on the LSH
    # bucketing at this scale (no qualifying pair may be missed).
    return (similarity.knn_pairs_exact(both, dim=64, n_planes=8,
                                       threshold=0.95)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))


def q_g10_warp(spark, sf_dir):
    """G10: cross-CRS warp — tiles re-gridded from geographic to sinusoidal
    meters per batch (exact vectorized transform, NN gather, first-wins).

    ORACLE-CHECKED via the aux artifact (verdict r4 #3): executors dump
    (a) each tile's nonzero SOURCE pixels and (b) the per-destination-
    pixel GATHER indices (dst cell -> src r,c, same trunc math as
    ``warp_band``'s general path); DuckDB re-runs the paint as a JOIN
    (gather index -> source value, nodata dropped) and re-aggregates
    painted + val_sum per tile.  The trig transform itself stays
    kernel-side (independent quadrature oracles in pytest); if the dumped
    indices ever disagreed with the engine's actual gather, the
    painted/val_sum hashes would mismatch."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs, crs
    from geo_raster_spark.grid import RasterInfo
    from geo_raster_spark.kernels import warp as warp_k
    from geo_raster_spark.operators import mosaic as mz

    tiles = mz.tile_cut(_images(spark, 200), nodata=0.0)

    def _dst_grid(info):
        # target: same area in sinusoidal meters at ~1.1km cells
        se = crs.transform_extent("EPSG:4326", "SINU", info.extent())
        cell_m = 1113.0
        w = max(int((se[2] - se[0]) / cell_m), 1)
        h = max(int((se[3] - se[1]) / cell_m), 1)
        return RasterInfo((se[0], cell_m, 0.0, se[3], 0.0, -cell_m),
                          w, h, "SINU")

    if _aux_enabled():
        def dump(it):
            cols_ = ["tile_tag", "kind", "w", "h", "r", "c", "v"]
            for pdf in it:
                outs = []
                for _, r0 in pdf.iterrows():
                    arr = codecs.decode_png(bytes(r0["data"])) \
                        .astype(np.float64)
                    info = RasterInfo(tuple(r0["gt"]), int(r0["width"]),
                                      int(r0["height"]))
                    dst = _dst_grid(info)
                    rr, cc = np.nonzero(arr != 0.0)
                    outs.append(pd.DataFrame({
                        "tile_tag": r0["tile_tag"], "kind": "s",
                        "w": 0, "h": 0, "r": rr.astype(np.int32),
                        "c": cc.astype(np.int32),
                        "v": arr[rr, cc].astype(np.int64)}))
                    # gather indices: the same pixel-center + trunc math
                    # as warp_band's general (cross-CRS) path
                    cols, rows_g = np.meshgrid(
                        np.arange(dst.width, dtype=np.float64),
                        np.arange(dst.height, dtype=np.float64))
                    tx = dst.gt[0] + dst.gt[1] * (cols + 0.5)
                    ty = dst.gt[3] + dst.gt[5] * (rows_g + 0.5)
                    sx, sy = crs.transform("SINU", "EPSG:4326",
                                           tx.ravel(), ty.ravel())
                    sc = np.trunc((sx - info.gt[0]) / info.gt[1]) \
                        .astype(np.int64)
                    sr = np.trunc((sy - info.gt[3]) / info.gt[5]) \
                        .astype(np.int64)
                    ok = ((sc >= 0) & (sc < info.width) & (sr >= 0)
                          & (sr < info.height)
                          & np.isfinite(sx) & np.isfinite(sy))
                    outs.append(pd.DataFrame({
                        "tile_tag": r0["tile_tag"], "kind": "g",
                        "w": dst.width, "h": dst.height,
                        "r": np.concatenate([[-1], sr[ok]]).astype(np.int32),
                        "c": np.concatenate([[-1], sc[ok]]).astype(np.int32),
                        "v": np.int64(0)}))
                yield (pd.concat(outs) if outs
                       else pd.DataFrame(columns=cols_))

        tiles.mapInPandas(
            dump, schema=("tile_tag string, kind string, w int, h int, "
                          "r int, c int, v long")) \
            .write.mode("overwrite").parquet(f"{AUX_DIR}/g10_gather")

    def do_warp(it):
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                arr = codecs.decode_png(bytes(r["data"])).astype(np.float64)
                info = RasterInfo(tuple(r["gt"]), int(r["width"]), int(r["height"]))
                dst = _dst_grid(info)
                wrp = warp_k.warp_band(arr, info, dst, nodata=0.0)
                out.append((r["tile_tag"], dst.width, dst.height,
                            int((wrp != 0).sum()), int(wrp.sum())))
            yield pd.DataFrame(out, columns=["tile_tag", "w", "h", "painted", "val_sum"])

    return tiles.mapInPandas(
        do_warp, schema="tile_tag string, w int, h int, painted long, val_sum long")


def q_x3_parity(spark, sf_dir):
    """Per-row invariants (input_hint): decoded pixels vs driver-side truth
    (exact for lossless fmt, PSNR>=40dB for lossy) + caption byte-equality,
    checked ON EXECUTORS over the Spark-distributed images table."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs, synth

    imgs = _images(spark, 300)

    # the stub-lossy third of the table is re-encoded as REAL baseline JFIF
    # (geo_raster_spark.jpeg) on executors, so the PSNR gate below runs on
    # genuinely DCT+Huffman-coded bytes, not the JPGQ quantize stub
    schema_str = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in imgs.schema.fields)

    def to_jfif(it):
        for pdf in it:
            out = pdf.copy()
            for idx, r in pdf.iterrows():
                if r["fmt"] == "jpeg":
                    i = int(r["image_id"][3:])
                    truth = synth.image_pixels(
                        i, int(r["w"]), int(r["h"]),
                        int(np.uint64(np.int64(r["phash"]).astype(np.uint64))))
                    out.at[idx, "bytes"] = codecs.encode(truth, "jpg")
                    out.at[idx, "fmt"] = "jpg"
            yield out

    imgs = imgs.mapInPandas(to_jfif, schema=schema_str)

    def check(it):
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                i = int(r["image_id"][3:])
                truth = synth.image_pixels(i, int(r["w"]), int(r["h"]),
                                           int(np.uint64(np.int64(r["phash"]).astype(np.uint64))))
                dec = codecs.decode(r["bytes"], r["fmt"])
                ps = codecs.psnr(truth, dec)
                exact = bool(np.array_equal(truth, dec))
                cap_ok = bool(r["caption"] == synth.images_pandas(1, start=i, with_bytes=False)["caption"].iloc[0])
                out.append((r["fmt"], exact, ps >= 40.0 or exact, cap_ok))
            yield pd.DataFrame(out, columns=["fmt", "exact", "psnr_ok", "caption_ok"])

    res = imgs.mapInPandas(
        check, schema="fmt string, exact boolean, psnr_ok boolean, caption_ok boolean")

    # RGB payload rows (round 3): the same per-row invariant on 3-band
    # payloads — PNG color type 2 must roundtrip EXACTLY; true color JFIF
    # (4:4:4 YCbCr DCT+Huffman) must clear the 40 dB PSNR gate.  Encode and
    # decode both run ON EXECUTORS over the distributed metadata table.
    meta = pd.DataFrame({
        "image_id": [f"rgb{i:04d}" for i in range(60)],
        "w": [40] * 60, "h": [28] * 60,
        "fmt": [["png", "jpg", "tif"][i % 3] for i in range(60)]})
    rgb = spark.createDataFrame(meta)

    def check_rgb(it):
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                i = int(r["image_id"][3:])
                truth = synth.image_pixels_rgb(i, int(r["w"]), int(r["h"]),
                                               (i * 2654435761) % 2 ** 64)
                # color JFIF at quality 97: the Annex-K CHROMA table is
                # aggressive, so 4:4:4 color needs a higher quality than
                # grayscale (95) to clear the same 40 dB gate
                enc = (codecs.encode_jfif(truth, quality=97)
                       if r["fmt"] == "jpg" else codecs.encode(truth, r["fmt"]))
                dec = codecs.decode(enc, r["fmt"])
                ps = codecs.psnr(truth, dec)
                exact = bool(np.array_equal(truth, dec))
                # captions live on the images table, not these payload rows
                out.append((r["fmt"] + "_rgb", exact, ps >= 40.0 or exact,
                            True))
            yield pd.DataFrame(out, columns=["fmt", "exact", "psnr_ok",
                                             "caption_ok"])

    res = res.unionByName(rgb.mapInPandas(
        check_rgb,
        schema="fmt string, exact boolean, psnr_ok boolean, caption_ok boolean"))
    return (res.groupBy("fmt")
               .agg(F.count("*").alias("n"),
                    F.sum(F.col("exact").cast("int")).alias("n_exact"),
                    F.sum(F.col("psnr_ok").cast("int")).alias("n_psnr_ok"),
                    F.sum(F.col("caption_ok").cast("int")).alias("n_caption_ok")))


def q_w1_focal_pipeline(spark, sf_dir):
    """W1-W5: per-tile focal ops (median/expand/variety) over decoded tiles."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs
    from geo_raster_spark.kernels import focal
    from geo_raster_spark.operators import mosaic as mz

    tiles = mz.tile_cut(_images(spark, 200), nodata=0.0)

    def run_focal(it):
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                arr = codecs.decode_png(bytes(r["data"]))
                med, changed = focal.focal_median(arr, 1, 0)
                var = focal.variety(arr[:32, :32], 2)
                out.append((r["tile_tag"], int(changed), float(med.mean()),
                            int(var.max())))
            yield pd.DataFrame(out, columns=["tile_tag", "n_changed",
                                             "mean_after", "max_variety"])

    return tiles.mapInPandas(
        run_focal,
        schema="tile_tag string, n_changed long, mean_after double, max_variety long") \
        .withColumn("mean_after", F.round("mean_after", 6))


def q_f3_colorize(spark, sf_dir):
    """F1/F3: linear stretch + palette lookup per tile (visualization path)."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs
    from geo_raster_spark.operators import mosaic as mz

    tiles = mz.tile_cut(_images(spark, 200), nodata=0.0)

    def colorize(it):
        palette = np.arange(256, dtype=np.uint8)[::-1]  # inverted ramp
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                arr = codecs.decode_png(bytes(r["data"]))
                valid = arr[arr != 0]
                if len(valid) == 0:
                    continue
                lo, hi = np.percentile(valid, [2, 98])
                stretched = np.clip((arr.astype(np.float64) - lo)
                                    / max(hi - lo, 1e-9) * 255, 0, 255).astype(np.uint8)
                colored = palette[stretched]
                out.append((r["tile_tag"], float(lo), float(hi),
                            int(colored.sum())))
            yield pd.DataFrame(out, columns=["tile_tag", "lo", "hi", "checksum"])

    return tiles.mapInPandas(
        colorize, schema="tile_tag string, lo double, hi double, checksum long") \
        .select("tile_tag", F.round("lo", 4).alias("lo"),
                F.round("hi", 4).alias("hi"), "checksum")


# ---------------------------------------------------------------------------
# DuckDB oracles for the SQL-expressible subset (merged by __spark_entry__).
# The k1/i1 oracles re-express the DGGS ring restriction as clamped
# col/row math (res 8: 512 x 256 cells of 0.703125°, an exact binary cell
# size so FLOOR math agrees bit-for-bit across engines).
# ---------------------------------------------------------------------------

def _sql_probe_values(probes):
    return ", ".join(f"({q}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE))"
                     for q, x, y in probes)


_CELL = "0.703125"  # 360/512 == 180/256, exactly representable

_HAVERSINE = ("2*6371.0088*ASIN(SQRT(POWER(SIN(RADIANS(plat - qlat)/2), 2) "
              "+ COS(RADIANS(qlat))*COS(RADIANS(plat))"
              "*POWER(SIN(RADIANS(plon - qlon)/2), 2)))")


def _sql_ring_join(probes, ring):
    """Probes x orders-points candidate join restricted to the k-ring:
    |row delta| <= ring (rows clamp at poles), column delta <= ring modulo
    the 512-column wrap — the exact SQL twin of knn.k_ring_cells."""
    return f"""
q(query_id, qlon, qlat) AS (VALUES {_sql_probe_values(probes)}),
pts AS (
  SELECT o_orderkey AS pid,
         {_PT_LON} AS plon, {_PT_LAT} AS plat
  FROM orders
), qc AS (
  SELECT query_id, qlon, qlat,
         CAST(LEAST(GREATEST(FLOOR((qlon + 180.0) / {_CELL}), 0), 511) AS BIGINT) AS qcol,
         CAST(LEAST(GREATEST(FLOOR((90.0 - qlat) / {_CELL}), 0), 255) AS BIGINT) AS qrow
  FROM q
), pc AS (
  SELECT pid, plon, plat,
         CAST(LEAST(GREATEST(FLOOR((plon + 180.0) / {_CELL}), 0), 511) AS BIGINT) AS pcol,
         CAST(LEAST(GREATEST(FLOOR((90.0 - plat) / {_CELL}), 0), 255) AS BIGINT) AS prow
  FROM pts
), j AS (
  SELECT qc.query_id, qc.qlon, qc.qlat, pc.pid, pc.plon, pc.plat
  FROM qc JOIN pc
    ON pc.prow BETWEEN qc.qrow - {ring} AND qc.qrow + {ring}
   AND (((pc.pcol - qc.qcol) % 512 + 512) % 512 <= {ring}
        OR ((pc.pcol - qc.qcol) % 512 + 512) % 512 >= {512 - ring})
)"""


SQL_K1 = f"""
WITH {_sql_ring_join(_K1_PROBES, 3)}
, d AS (
  SELECT query_id, pid, {_HAVERSINE} AS dist_km FROM j
), r AS (
  SELECT query_id, pid, dist_km,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist_km ASC, pid ASC) AS rank
  FROM d
)
SELECT query_id, CAST(rank AS INT) AS rank, pid AS nn_id,
       ROUND(dist_km, 4) AS dist_km
FROM r WHERE rank <= 5
"""


SQL_I1 = f"""
WITH {_sql_ring_join(_I1_PROBES, 2)}
, d AS (
  SELECT query_id, CAST(pid % 1000 AS DOUBLE) AS v,
         1.0 / POWER(GREATEST({_HAVERSINE}, 1e-9), 2.0) AS wgt
  FROM j
)
SELECT query_id,
       ROUND(SUM(v * wgt) / SUM(wgt), 6) AS idw_value,
       COUNT(*) AS n_neighbors
FROM d GROUP BY 1
"""


SQL_D3 = f"""
SELECT CAST((simhash >> 48) & 65535 AS BIGINT) AS prefix, COUNT(*) AS n
FROM read_parquet('{AUX_DIR}/d3_sig/*.parquet')
GROUP BY 1
"""


def _sql_d5(max_hamming=6, max_bucket=200):
    from geo_raster_spark.operators.dedup import simhash_blocks
    widths, offs = simhash_blocks(max_hamming)
    blocks = "\n  UNION ALL ".join(
        f"SELECT _id, simhash, {b} AS block_id, "
        f"(simhash >> {offs[b]}) & {(1 << widths[b]) - 1} AS block_val FROM s"
        for b in range(len(widths)))
    return f"""
WITH s AS (
  SELECT doc_id AS _id, simhash FROM read_parquet('{AUX_DIR}/d5_sig/*.parquet')
), b AS (
  {blocks}
), hot AS (
  SELECT block_id, block_val FROM b GROUP BY 1, 2 HAVING COUNT(*) > {max_bucket}
), bf AS (
  SELECT b.* FROM b ANTI JOIN hot USING (block_id, block_val)
)
SELECT DISTINCT ba._id AS id_a, bb._id AS id_b,
       CAST(bit_count(xor(ba.simhash, bb.simhash)) AS INT) AS hamming
FROM bf ba JOIN bf bb
  ON ba.block_id = bb.block_id AND ba.block_val = bb.block_val
 AND ba._id < bb._id
WHERE bit_count(xor(ba.simhash, bb.simhash)) <= {max_hamming}
"""


SQL_D6 = f"""
WITH RECURSIVE
seeds AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 5),
planted AS (
  SELECT doc_id + 10000000 AS doc_id, text || ' nearcopy' AS text FROM seeds
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text || ' nearcopy again' AS text
  FROM seeds
),
corpus AS (
  SELECT doc_id, text FROM documents UNION ALL SELECT * FROM planted
),
pairs AS (
  SELECT id_a, id_b FROM read_parquet('{AUX_DIR}/d6_pairs/*.parquet')
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
),
roots AS (SELECT node, MIN(r) AS root FROM reach GROUP BY node),
losers AS (SELECT node AS doc_id FROM roots WHERE node <> root)
SELECT c.doc_id, CAST(LENGTH(c.text) AS INT) AS text_len
FROM corpus c ANTI JOIN losers l USING (doc_id)
"""


def _sql_d7(max_hamming=3, max_bucket=200):
    """Pigeonhole pair join re-expressed in SQL over the (image_id, phash)
    artifact — the _sql_d5 pattern with string ids (same block math; the
    >> / & extraction is sign-fill-proof because the mask keeps only bits
    below the block width)."""
    from geo_raster_spark.operators.dedup import simhash_blocks
    widths, offs = simhash_blocks(max_hamming)
    blocks = "\n  UNION ALL ".join(
        f"SELECT _id, simhash, {b} AS block_id, "
        f"(simhash >> {offs[b]}) & {(1 << widths[b]) - 1} AS block_val FROM s"
        for b in range(len(widths)))
    return f"""
WITH s AS (
  SELECT image_id AS _id, phash AS simhash
  FROM read_parquet('{AUX_DIR}/d7_phash/*.parquet')
), b AS (
  {blocks}
), hot AS (
  SELECT block_id, block_val FROM b GROUP BY 1, 2 HAVING COUNT(*) > {max_bucket}
), bf AS (
  SELECT b.* FROM b ANTI JOIN hot USING (block_id, block_val)
)
SELECT DISTINCT ba._id AS id_a, bb._id AS id_b,
       CAST(bit_count(xor(ba.simhash, bb.simhash)) AS INT) AS hamming
FROM bf ba JOIN bf bb
  ON ba.block_id = bb.block_id AND ba.block_val = bb.block_val
 AND ba._id < bb._id
WHERE bit_count(xor(ba.simhash, bb.simhash)) <= {max_hamming}
"""


_SQL_SHINGLES = ("list_distinct(list_transform("
                 "range(1, greatest(length(lower(text)) - 4, 1) + 1), "
                 "i -> substr(lower(text), CAST(i AS INT), 5)))")

SQL_D4 = f"""
WITH pairs AS (
  SELECT id_a, id_b FROM read_parquet('{AUX_DIR}/d4_pairs/*.parquet')
), sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents
)
SELECT p.id_a, p.id_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE),
             6) AS jaccard
FROM pairs p
JOIN sh a ON p.id_a = a.doc_id
JOIN sh b ON p.id_b = b.doc_id
"""


SQL_E3 = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), seeds AS (
  SELECT vec_id, emb FROM base ORDER BY vec_id LIMIT 5
), planted AS (
  SELECT vec_id + 10000000 AS vec_id,
         list_transform(emb, x -> x + 1e-6) AS emb
  FROM seeds
), allv AS (
  SELECT * FROM base UNION ALL SELECT * FROM planted
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1] * x[2]))
         / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
            * sqrt(list_sum(list_transform(b.emb, x -> x * x))) + 1e-30)
         AS cosine
  FROM allv a JOIN allv b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
FROM p WHERE ROUND(cosine, 8) >= 0.95
"""


def _sql_d2(n_hashes=32, bands=8, threshold=0.5, max_bucket=200):
    r = n_hashes // bands
    cols = ", ".join(f"s{j + 1}" for j in range(r))
    band_sel = "\n  UNION ALL ".join(
        "SELECT _id, {b} AS band_id, {vals} FROM s".format(
            b=b, vals=", ".join(f"sig[{b * r + j + 1}] AS s{j + 1}"
                                for j in range(r)))
        for b in range(bands))
    on = " AND ".join(f"ba.s{j + 1} = bb.s{j + 1}" for j in range(r))
    return f"""
WITH s AS (
  SELECT _id, sig FROM read_parquet('{AUX_DIR}/d2_sig/*.parquet')
), b AS (
  {band_sel}
), hot AS (
  SELECT band_id, {cols} FROM b GROUP BY ALL HAVING COUNT(*) > {max_bucket}
), bf AS (
  SELECT b.* FROM b ANTI JOIN hot USING (band_id, {cols})
), p AS (
  SELECT DISTINCT ba._id AS id_a, bb._id AS id_b
  FROM bf ba JOIN bf bb
    ON ba.band_id = bb.band_id AND {on} AND ba._id < bb._id
), e AS (
  SELECT p.id_a, p.id_b,
         CAST(len(list_filter(list_zip(sa.sig, sb.sig), x -> x[1] = x[2]))
              AS DOUBLE) / {float(n_hashes)!r} AS est
  FROM p JOIN s sa ON p.id_a = sa._id JOIN s sb ON p.id_b = sb._id
)
SELECT id_a, id_b, ROUND(est, 6) AS est_jaccard
FROM e WHERE est >= {threshold!r}
"""


def _sql_ann_topk(assign_glob: str, probe_glob: str, key_col: str,
                  k: int = 10) -> str:
    """Bucket/list filter + cosine + (cosine DESC, id ASC) top-k over the
    engine-written assignments artifact — shared by the e2/e4 oracles
    (same cosine expression tree as the hash-green e1)."""
    import gsr_queries
    probe = gsr_queries._probe_vec()
    arr = "[" + ",".join(f"{float(v)!r}" for v in probe) + "]"
    pn = sum(v * v for v in probe) ** 0.5
    return f"""
WITH cand AS (
  SELECT a.vec_id, a.embedding
  FROM read_parquet('{assign_glob}', hive_partitioning = 1) a
  JOIN read_parquet('{probe_glob}') p ON a.{key_col} = p.{key_col}
), s AS (
  SELECT vec_id,
         ROUND(list_sum(list_transform(list_zip(embedding, CAST({arr} AS DOUBLE[])),
                x -> CAST(x[1] AS DOUBLE) * x[2]))
         / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * {pn!r} + 1e-30), 8)
         AS cosine
  FROM cand
), r AS (
  SELECT vec_id, cosine,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM s
)
SELECT vec_id, CAST(rank AS INT) AS rank, ROUND(cosine, 4) AS cosine
FROM r WHERE rank <= {k}
"""


SQL_M1 = f"""
WITH px AS (
  SELECT * FROM read_parquet('{AUX_DIR}/m1_pixels/*.parquet')
), g AS (
  SELECT image_id, fmt, v,
    CASE WHEN lag(v) OVER wc IS NULL AND lead(v) OVER wc IS NULL THEN 0.0
         WHEN lag(v) OVER wc IS NULL THEN lead(v) OVER wc - v
         WHEN lead(v) OVER wc IS NULL THEN v - lag(v) OVER wc
         ELSE (lead(v) OVER wc - lag(v) OVER wc) / 2.0 END AS gx,
    CASE WHEN lag(v) OVER wr IS NULL AND lead(v) OVER wr IS NULL THEN 0.0
         WHEN lag(v) OVER wr IS NULL THEN lead(v) OVER wr - v
         WHEN lead(v) OVER wr IS NULL THEN v - lag(v) OVER wr
         ELSE (lead(v) OVER wr - lag(v) OVER wr) / 2.0 END AS gy
  FROM px
  WINDOW wc AS (PARTITION BY image_id, r ORDER BY c),
         wr AS (PARTITION BY image_id, c ORDER BY r)
), stats AS (
  SELECT image_id, fmt,
         AVG(v) AS mean, stddev_pop(v) AS std,
         quantile_cont(v, 0.9) AS p90,
         AVG(gx * gx + gy * gy) AS edge_energy
  FROM g GROUP BY 1, 2
), hist AS (
  SELECT image_id, CAST(v AS INT) AS b, COUNT(*) AS cnt FROM px GROUP BY 1, 2
), ent AS (
  SELECT image_id,
         -SUM((CAST(cnt AS DOUBLE) / total) * log2(CAST(cnt AS DOUBLE) / total))
         AS entropy
  FROM (SELECT image_id, cnt,
               SUM(cnt) OVER (PARTITION BY image_id) AS total FROM hist)
  GROUP BY 1
)
SELECT s.fmt, COUNT(*) AS n,
       ROUND(AVG(s.mean), 6) AS avg_mean,
       ROUND(AVG(s.std), 6) AS avg_std,
       ROUND(AVG(s.p90), 6) AS avg_p90,
       ROUND(AVG(s.edge_energy), 6) AS avg_edge,
       ROUND(AVG(e.entropy), 6) AS avg_entropy
FROM stats s JOIN ent e USING (image_id)
GROUP BY 1
"""


SQL_G5_AGG = f"""
WITH px AS (
  SELECT * FROM read_parquet('{AUX_DIR}/g5_pixels/*.parquet')
), dims AS (
  -- scale() floors the output dims, so trailing source rows/cols beyond
  -- 4*floor(n/4) (the edge-halo remainder) are NOT covered by any cell
  SELECT tile_tag,
         4 * CAST(FLOOR((MAX(r) + 1) / 4) AS INT) AS rmax,
         4 * CAST(FLOOR((MAX(c) + 1) / 4) AS INT) AS cmax
  FROM px GROUP BY 1
), cells AS (
  SELECT px.tile_tag, n_images, rmax, cmax,
         CAST(FLOOR(r / 4) AS INT) AS R, CAST(FLOOR(c / 4) AS INT) AS C,
         COUNT(*) AS total,
         COUNT(*) FILTER (WHERE v != 0.0) AS nv
  FROM px JOIN dims USING (tile_tag)
  WHERE r < rmax AND c < cmax
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT tile_tag,
       CAST(cmax / 4 AS INT) AS width,
       CAST(rmax / 4 AS INT) AS height,
       n_images,
       COUNT(*) FILTER (WHERE nv > 0
                        AND CAST(nv AS DOUBLE) >= total * 0.1) AS painted
FROM cells GROUP BY tile_tag, n_images, rmax, cmax
"""


SQL_Z1 = f"""
SELECT zone_id,
       ROUND(SUM(psum) / SUM(pcount), 6) AS mean,
       ROUND(MAX(pmax) - MIN(pmin), 6) AS rng,
       CAST(SUM(pcount) AS BIGINT) AS n_pixels,
       COUNT(DISTINCT image_id) AS n_images
FROM read_parquet('{AUX_DIR}/z1_partials/*.parquet')
GROUP BY 1
"""


SQL_G11 = f"""
WITH px AS (
  SELECT * FROM read_parquet('{AUX_DIR}/g11_pixels/*.parquet')
), w AS (
  -- first-wins == the candidate with MIN (priority, image_id) per pixel
  SELECT tile_tag, r, c, v,
         ROW_NUMBER() OVER (PARTITION BY tile_tag, r, c
                            ORDER BY prio, image_id) AS rn
  FROM px WHERE r >= 0
), t AS (
  SELECT tile_tag, CAST(COUNT(DISTINCT image_id) AS INT) AS n_images
  FROM px GROUP BY 1
), p AS (
  SELECT tile_tag, COUNT(*) AS painted, CAST(SUM(v) AS BIGINT) AS val_sum
  FROM w WHERE rn = 1 GROUP BY 1
)
SELECT t.tile_tag, t.n_images,
       CAST(COALESCE(p.painted, 0) AS BIGINT) AS painted,
       CAST(COALESCE(p.val_sum, 0) AS BIGINT) AS val_sum
FROM t LEFT JOIN p USING (tile_tag)
"""


SQL_T4 = f"""
WITH px AS (
  SELECT * FROM read_parquet('{AUX_DIR}/t4_pixels/*.parquet')
), med AS (
  -- quantile_cont(0.5) == np.nanmedian's linear interpolation
  SELECT tile_tag, r, c, quantile_cont(v, 0.5) AS m
  FROM px WHERE r >= 0 GROUP BY 1, 2, 3
), t AS (
  SELECT tile_tag, CAST(COUNT(DISTINCT epoch) AS INT) AS n_epochs
  FROM px GROUP BY 1
), p AS (
  SELECT tile_tag, COUNT(*) AS painted, SUM(m) AS val_sum
  FROM med WHERE m != 0.0 GROUP BY 1
)
SELECT t.tile_tag, t.n_epochs,
       CAST(COALESCE(p.painted, 0) AS BIGINT) AS painted,
       ROUND(CAST(COALESCE(p.val_sum, 0.0) AS DOUBLE), 4) AS val_sum
FROM t LEFT JOIN p USING (tile_tag)
"""


def _sql_g12(size: int) -> str:
    half = size // 2
    # np.round emulation (half-to-even): FLOOR(m+0.5), minus 1 when the
    # fraction is exactly .5 and that lands on an odd integer
    rnd = ("CASE WHEN {m} - FLOOR({m}) = 0.5 "
           "AND CAST(FLOOR({m} + 0.5) AS BIGINT) % 2 = 1 "
           "THEN CAST(FLOOR({m} + 0.5) AS BIGINT) - 1 "
           "ELSE CAST(FLOOR({m} + 0.5) AS BIGINT) END")
    return f"""
WITH px AS (
  SELECT * FROM read_parquet('{AUX_DIR}/g12_pixels/*.parquet')
), l1 AS (
  -- level-1 cells: quadrant placement + nodata-aware 2x mean (valid rows
  -- only reach the dump, so COUNT(*) == n_valid and min_rate = 0 holds)
  SELECT CAST(FLOOR(tile_col / 2) AS INT) AS pcol,
         CAST(FLOOR(tile_row / 2) AS INT) AS prow,
         (tile_row - 2 * CAST(FLOOR(tile_row / 2) AS INT)) * {half}
           + CAST(FLOOR(r / 2) AS INT) AS R,
         (tile_col - 2 * CAST(FLOOR(tile_col / 2) AS INT)) * {half}
           + CAST(FLOOR(c / 2) AS INT) AS C,
         SUM(v) / COUNT(*) AS m
  FROM px WHERE r >= 0
  GROUP BY 1, 2, 3, 4
), ch1 AS (
  SELECT CAST(SUM(nch) AS BIGINT) AS children FROM (
    SELECT COUNT(DISTINCT tile_col * 100000 + tile_row) AS nch
    FROM px GROUP BY CAST(FLOOR(tile_col / 2) AS INT),
                     CAST(FLOOR(tile_row / 2) AS INT))
), u1 AS (
  SELECT pcol, prow, R, C, {rnd.format(m='m')} AS u FROM l1
), l2 AS (
  -- level 2 reads the ROUNDED level-1 pixels; u = 0 is nodata there
  SELECT CAST(FLOOR(pcol / 2) AS INT) AS p2col,
         CAST(FLOOR(prow / 2) AS INT) AS p2row,
         (prow - 2 * CAST(FLOOR(prow / 2) AS INT)) * {half}
           + CAST(FLOOR(R / 2) AS INT) AS R2,
         (pcol - 2 * CAST(FLOOR(pcol / 2) AS INT)) * {half}
           + CAST(FLOOR(C / 2) AS INT) AS C2,
         SUM(u) * 1.0 / COUNT(*) AS m2
  FROM u1 WHERE u > 0
  GROUP BY 1, 2, 3, 4
)
SELECT 1 AS level,
       -- tile counts come from the MARKER-inclusive px rows: a parent
       -- whose children are all-nodata still yields a (painted = 0) tile
       CAST((SELECT COUNT(DISTINCT CAST(FLOOR(tile_col / 2) AS INT) * 100000
                          + CAST(FLOOR(tile_row / 2) AS INT)) FROM px)
            AS BIGINT) AS n_tiles,
       (SELECT children FROM ch1) AS children,
       CAST((SELECT COUNT(*) FROM u1) AS BIGINT) AS painted,
       CAST((SELECT SUM(u) FROM u1) AS BIGINT) AS val_sum
UNION ALL
SELECT 2 AS level,
       CAST((SELECT COUNT(DISTINCT CAST(FLOOR(tile_col / 4) AS INT) * 100000
                          + CAST(FLOOR(tile_row / 4) AS INT)) FROM px)
            AS BIGINT) AS n_tiles,
       CAST((SELECT COUNT(DISTINCT CAST(FLOOR(tile_col / 2) AS INT) * 100000
                          + CAST(FLOOR(tile_row / 2) AS INT)) FROM px)
            AS BIGINT) AS children,
       CAST((SELECT COUNT(*) FROM l2) AS BIGINT) AS painted,
       CAST((SELECT SUM({rnd.format(m='m2')}) FROM l2) AS BIGINT) AS val_sum
"""


SQL_G10 = f"""
WITH a AS (
  SELECT * FROM read_parquet('{AUX_DIR}/g10_gather/*.parquet')
), src AS (
  SELECT tile_tag, r, c, v FROM a WHERE kind = 's'
), gat AS (
  SELECT tile_tag, w, h, r, c FROM a WHERE kind = 'g'
), tiles AS (
  SELECT DISTINCT tile_tag, w, h FROM gat
), p AS (
  -- re-run the paint: gather index -> source value (nodata==0 rows were
  -- never dumped, so the join drops them exactly like the kernel does)
  SELECT g.tile_tag, COUNT(*) AS painted, SUM(s.v) AS val_sum
  FROM gat g
  JOIN src s ON s.tile_tag = g.tile_tag AND s.r = g.r AND s.c = g.c
  WHERE g.r >= 0
  GROUP BY 1
)
SELECT t.tile_tag, t.w, t.h,
       CAST(COALESCE(p.painted, 0) AS BIGINT) AS painted,
       CAST(COALESCE(p.val_sum, 0) AS BIGINT) AS val_sum
FROM tiles t LEFT JOIN p USING (tile_tag)
"""


SQL_M2 = f"""
WITH fr AS (
  SELECT * FROM read_parquet('{AUX_DIR}/m2_frames/*.parquet')
), sampled AS (
  -- re-derive the every-n selection + timestamp math from the boundary
  -- table alone (frame_sample: every 12th frame, t = frame_idx / 30 fps)
  SELECT video_id, frame_idx, png_len
  FROM fr WHERE frame_idx % 12 = 0
)
SELECT video_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
       ROUND(MAX(CAST(frame_idx AS DOUBLE) / 30.0), 4) AS last_t,
       CAST(SUM(png_len) AS BIGINT) AS bytes_total
FROM sampled GROUP BY 1
"""


ORACLES = {
    "d2_minhash": _sql_d2(),
    "g5_tile_cut_agg": SQL_G5_AGG,
    "z1_zonal": SQL_Z1,
    "m1_image_features": SQL_M1,
    # ** glob: the assignments layout is batch_id=<id>/bucket|ivf=<v>/
    # since round 7 (idempotent per-batch appends) — recursive match keeps
    # the oracle independent of the partition depth
    "e2_lsh_topk": _sql_ann_topk(f"{AUX_DIR}/e2_lsh/assignments/**/*.parquet",
                                 f"{AUX_DIR}/e2_probe/*.parquet", "bucket"),
    "e4_ivf_topk": _sql_ann_topk(f"{AUX_DIR}/e4_ivf/assignments/**/*.parquet",
                                 f"{AUX_DIR}/e4_probe/*.parquet", "ivf"),
    "k1_knn_kring": SQL_K1,
    "i1_idw": SQL_I1,
    "d6_dedup_corpus": SQL_D6,
    "d7_phash_pairs": _sql_d7(),
    "d4_ngram_jaccard": SQL_D4,
    "d5_simhash_pairs": _sql_d5(),
    "e3_embedding_dups": SQL_E3,
    "g11_composite": SQL_G11,
    "t4_stack_median": SQL_T4,
    "g10_warp": SQL_G10,
    "m2_frame_sample": SQL_M2,
}


def _late_oracles():
    """Oracles needing runtime constants (TileGrid size)."""
    from geo_raster_spark.grid import TileGrid
    return {"g12_overviews": _sql_g12(TileGrid().image_size)}


ORACLES.update(_late_oracles())


QUERIES = {
    "g5_tile_cut": q_g5_tile_cut,
    "g5_tile_cut_agg": q_g5_tile_cut_agg,
    "z1_zonal": q_z1_zonal,
    "k1_knn_kring": q_k1_knn_kring,
    "i1_idw": q_i1_idw,
    "d2_minhash": q_d2_minhash,
    "d6_dedup_corpus": q_d6_dedup_corpus,
    "d7_phash_pairs": q_d7_phash_pairs,
    "d4_ngram_jaccard": q_d4_ngram_jaccard,
    "d5_simhash_pairs": q_d5_simhash_pairs,
    "m1_image_features": q_m1_image_features,
    "m2_frame_sample": q_m2_frame_sample,
    "g11_composite": q_g11_composite,
    "t4_stack_median": q_t4_stack_median,
    "g12_overviews": q_g12_overviews,
    "e2_lsh_topk": q_e2_lsh_topk,
    "e4_ivf_topk": q_e4_ivf_topk,
    "e3_embedding_dups": q_e3_embedding_dups,
    "w1_focal_pipeline": q_w1_focal_pipeline,
    "g10_warp": q_g10_warp,
    "x3_parity": q_x3_parity,
    "f3_colorize": q_f3_colorize,
}
