"""Rows-only queries: operators whose semantics ANSI SQL cannot express
(pixel kernels, LSH pipelines, k-ring ANN).  The driver records a weaker
rows-only check here; exact parity for each is enforced by the NumPy-oracle
pytest suite (tests/test_spark_ops.py, tests/test_kernels_*.py).

Each callable still takes (spark, sf_dir) per the driver contract; pixel
operators synthesize their deterministic images input (BASELINE.json
``input_hint`` schema) since the driver tables carry no imagery.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _images(spark, n=400):
    from geo_raster_spark import synth
    from geo_raster_spark.operators import footprint
    return footprint.with_footprint(synth.images_df(spark, n, 8, with_bytes=True))


def q_g5_tile_cut(spark, sf_dir):
    """G5/G11/J7: decode -> mosaic -> per-tile PNG tiles (pixel pipeline)."""
    from geo_raster_spark.operators import mosaic
    tiles = mosaic.tile_cut(_images(spark), nodata=0.0)
    return tiles.select("tile_tag", "tile_col", "tile_row", "n_images",
                        "painted", F.length("data").alias("png_bytes"))


def q_g5_tile_cut_agg(spark, sf_dir):
    """G5 + A1: tile cut with aggregation to a 4x coarser cell."""
    from geo_raster_spark.operators import mosaic
    from geo_raster_spark.synth import CELL_SIZE
    tiles = mosaic.tile_cut(_images(spark, 200), nodata=0.0,
                            agg_to_cell=CELL_SIZE * 4, agg_func="mean")
    return tiles.select("tile_tag", "width", "height", "n_images", "painted")


def q_z1_zonal(spark, sf_dir):
    """A11/R1: distributed zonal statistics over decoded pixels."""
    from geo_raster_spark import synth
    from geo_raster_spark.operators import zonal
    zones = synth.zones_pandas(12, hot=True)
    out = zonal.zonal_stats(_images(spark), zones, nodata=-1.0)
    return out.select("zone_id", F.round("mean", 6).alias("mean"),
                      F.round("rng", 6).alias("rng"), "n_pixels", "n_images")


def q_k1_knn_kring(spark, sf_dir):
    """J6: kNN via DGGS k-ring candidate expansion + windowed refine."""
    import pandas as pd
    from geo_raster_spark.operators import knn
    from geo_raster_spark.plans.flagship import footprint_input
    from geo_raster_spark.operators import footprint
    qs = spark.createDataFrame(pd.DataFrame({
        "query_id": list(range(8)),
        "lon": [-120.0, -60.0, 0.0, 60.0, 120.0, 30.0, -30.0, 90.0],
        "lat": [40.0, -20.0, 10.0, -40.0, 5.0, 50.0, -50.0, 0.0]}))
    pts = footprint.with_footprint(footprint_input(spark, 20000, 16))
    return (knn.knn_join(qs, pts.select("image_id", "lon", "lat"), k=5, ring=3)
            .select("query_id", "rank", "image_id_nn",
                    F.round("dist_km", 4).alias("dist_km")))


def q_i1_idw(spark, sf_dir):
    """W7/J6: IDW interpolation at query points via k-ring gather."""
    import pandas as pd
    from geo_raster_spark.operators import knn
    from geo_raster_spark.operators import footprint
    from geo_raster_spark.plans.flagship import footprint_input
    qs = spark.createDataFrame(pd.DataFrame({
        "query_id": list(range(6)),
        "lon": [10.0, -100.0, 45.0, -45.0, 150.0, 0.0],
        "lat": [20.0, 30.0, -10.0, 40.0, -30.0, 0.0]}))
    pts = (footprint.with_footprint(footprint_input(spark, 20000, 16))
           .withColumn("value", (F.col("phash") % 1000).cast("double")))
    return (knn.idw_at_points(qs, pts, "value", power=2.0, ring=2)
            .select("query_id", F.round("idw_value", 6).alias("idw_value"),
                    "n_neighbors"))


def q_d2_minhash(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs over documents (JVM-side pipeline)."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh(d, jaccard_threshold=0.5)


def q_d3_simhash(spark, sf_dir):
    """SimHash fingerprints: distribution of 16-bit prefixes (stable agg)."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents")
    sig = dedup.simhash_signature(d)
    return (sig.withColumn("prefix", F.shiftrightunsigned("simhash", 48))
               .groupBy("prefix").agg(F.count("*").alias("n")))


def q_t4_stack_median(spark, sf_dir):
    """Per-pixel MEDIAN across a 3-epoch tile stack (the reference's
    multi-scene compositing role).  Epochs = three disjoint synthetic image
    slices tiled independently; rows-only (pixel semantics pinned by
    test_pixel_stack_stats_matches_numpy)."""
    from pyspark.sql import functions as SF

    from geo_raster_spark import synth
    from geo_raster_spark.operators import footprint, mosaic as mz, stack as stk

    epochs = []
    for e in range(3):
        imgs = footprint.with_footprint(
            synth.images_df(spark, 150, 8, with_bytes=True, start=e * 150))
        epochs.append(mz.tile_cut(imgs, nodata=0.0)
                      .withColumn("epoch", SF.lit(e)))
    tiles = epochs[0].unionByName(epochs[1]).unionByName(epochs[2])
    out = stk.pixel_stack_stats(tiles, stat="median", nodata=0.0)
    return out.select("tile_tag", "n_epochs", "painted",
                      F.length("data").alias("nbytes"))


def q_g12_overviews(spark, sf_dir):
    """Tile pyramid: 2 overview levels above the base tile cut (4 children
    -> 1 parent per level, area-weighted 2x mean).  Rows-only (quadrant/
    downsample semantics pinned by test_build_overviews_two_levels)."""
    from geo_raster_spark.operators import mosaic as mz, overviews as ov
    tiles = mz.tile_cut(_images(spark, 400), nodata=0.0)
    out = ov.build_overviews(tiles, levels=2, nodata=0.0)
    return (out.groupBy("level")
               .agg(F.count("*").alias("n_tiles"),
                    F.sum("n_children").alias("children"),
                    F.sum("painted").alias("painted")))


def q_g11_composite(spark, sf_dir):
    """G11/J7 priority composite: freshest-pixel mosaic — candidates paint
    in ascending (priority, image_id); per-tile stats.  Rows-only (pixel
    semantics pinned by test_tile_cut_priority_composite)."""
    from geo_raster_spark.operators import mosaic as mz
    imgs = _images(spark, 400).withColumn(
        "prio", F.pmod(F.xxhash64("image_id"), F.lit(7)).cast("double"))
    t = mz.tile_cut(imgs, nodata=0.0, priority_col="prio")
    return t.select("tile_tag", "n_images", "painted", F.length("data").alias("nbytes"))


def q_m1_image_features(spark, sf_dir):
    """Multimodal feature-extract: per-image pixel statistics (moments,
    percentiles, gradient energy, entropy) over decoded payloads, grouped
    by fmt for a stable small result.  Pixel decode is not SQL-expressible
    -> rows-only; the per-image values are pinned by
    tests/test_multimodal.py::test_image_features_match_local."""
    from geo_raster_spark.operators import multimodal as mm
    feats = mm.image_features(_images(spark, 200))
    imgs = _images(spark, 200).select("image_id", "fmt")
    return (feats.join(imgs, "image_id")
                 .groupBy("fmt")
                 .agg(F.count("*").alias("n"),
                      F.round(F.avg("mean"), 6).alias("avg_mean"),
                      F.round(F.avg("std"), 6).alias("avg_std"),
                      F.round(F.avg("entropy"), 6).alias("avg_entropy")))


def q_m2_frame_sample(spark, sf_dir):
    """Multimodal frame-sample plumbing: synthetic video rows -> sampled
    frames (stubbed decoder, real Spark shape).  Rows-only."""
    import pandas as pd
    from geo_raster_spark.operators import multimodal as mm
    vids = spark.createDataFrame(pd.DataFrame({
        "video_id": [f"v{i:04d}" for i in range(40)],
        "bytes": [bytearray(f"payload-{i}".encode()) for i in range(40)],
        "n_frames": [30 + (i * 13) % 240 for i in range(40)],
        "w": [32] * 40, "h": [24] * 40}))
    frames = mm.frame_sample(vids, every_n=12)
    return (frames.groupBy("video_id")
                  .agg(F.count("*").alias("n_frames_sampled"),
                       F.round(F.max("t_sec"), 4).alias("last_t"),
                       F.sum(F.length("frame")).alias("bytes_total")))


def q_d5_simhash_pairs(spark, sf_dir):
    """SimHash Hamming near-dup pairs via pigeonhole block buckets.

    Plants 5 deterministic near-dups (doc_id + 10M, one token appended —
    a handful of flipped signature bits) so a working operator returns
    >= 5 rows and a broken one returns 0 (non-vacuous rows check)."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (d.orderBy("doc_id").limit(5)
                .select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" almostidentical"))
                        .alias("text")))
    both = d.unionByName(planted)
    return dedup.simhash_pairs(both, max_hamming=6)


def q_d4_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard on LSH candidate pairs."""
    from geo_raster_spark.operators import dedup
    d = _t(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh(d, jaccard_threshold=0.3)
    return dedup.ngram_jaccard(d, cand.select("id_a", "id_b"))


def q_e2_lsh_topk(spark, sf_dir):
    """ANN top-k via random-hyperplane LSH bucket probing."""
    from geo_raster_spark.operators import similarity
    import gsr_queries
    emb = _t(spark, sf_dir, "embeddings")
    return (similarity.lsh_topk(emb, gsr_queries._probe_vec(), k=10,
                                n_planes=6, multiprobe_bits=1)
            .select("vec_id", "rank", F.round("cosine", 4).alias("cosine")))


def q_e4_ivf_topk(spark, sf_dir):
    """IVF ANN top-k (coarse-quantized inverted lists + in-list brute force)."""
    from geo_raster_spark.operators import similarity
    import gsr_queries
    emb = _t(spark, sf_dir, "embeddings")
    return (similarity.ivf_topk(emb, gsr_queries._probe_vec(), k=10,
                                n_centroids=16, nprobe=4)
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
    return similarity.knn_pairs_exact(both, dim=64, n_planes=8, threshold=0.95)


def q_g10_warp(spark, sf_dir):
    """G10: cross-CRS warp — tiles re-gridded from geographic to sinusoidal
    meters per batch (exact vectorized transform, NN gather, first-wins)."""
    import numpy as np
    import pandas as pd
    from geo_raster_spark import codecs, crs
    from geo_raster_spark.grid import RasterInfo
    from geo_raster_spark.kernels import warp as warp_k
    from geo_raster_spark.operators import mosaic as mz

    tiles = mz.tile_cut(_images(spark, 200), nodata=0.0)

    def do_warp(it):
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                arr = codecs.decode_png(bytes(r["data"])).astype(np.float64)
                info = RasterInfo(tuple(r["gt"]), int(r["width"]), int(r["height"]))
                # target: same area in sinusoidal meters at ~1.1km cells
                se = crs.transform_extent("EPSG:4326", "SINU", info.extent())
                cell_m = 1113.0
                w = max(int((se[2] - se[0]) / cell_m), 1)
                h = max(int((se[3] - se[1]) / cell_m), 1)
                dst = RasterInfo((se[0], cell_m, 0.0, se[3], 0.0, -cell_m), w, h, "SINU")
                wrp = warp_k.warp_band(arr, info, dst, nodata=0.0)
                out.append((r["tile_tag"], w, h, int((wrp != 0).sum()),
                            float(wrp[wrp != 0].mean()) if (wrp != 0).any() else 0.0))
            yield pd.DataFrame(out, columns=["tile_tag", "w", "h", "painted", "mean_val"])

    return tiles.mapInPandas(
        do_warp, schema="tile_tag string, w int, h int, painted long, mean_val double") \
        .withColumn("mean_val", F.round("mean_val", 6))


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


QUERIES = {
    "g5_tile_cut": q_g5_tile_cut,
    "g5_tile_cut_agg": q_g5_tile_cut_agg,
    "z1_zonal": q_z1_zonal,
    "k1_knn_kring": q_k1_knn_kring,
    "i1_idw": q_i1_idw,
    "d2_minhash": q_d2_minhash,
    "d3_simhash": q_d3_simhash,
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
