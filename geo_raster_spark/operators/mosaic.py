"""Tile-cut / mosaic pipeline (SURVEY.md §2.7 G5, §2.3 J7, §2.7 G11) —
the reference's flagship CLI ``split_raster_tiles.py`` re-expressed as one
DataFrame job.

Reference lifecycle [ref: util/split_raster_tiles.py:12-141]: enumerate
tiles ∩ region, per tile mosaic-read every intersecting source, optionally
aggregate to a coarser cell, save tile + ``.met``.  Spark-first:

    images(footprint cols) --assign_tiles--> (image, tile) pairs
      --repartition(tile_tag)--> applyInPandas(assemble) --> tile rows

Determinism: candidates within a tile sort by ``image_id`` before the
first-wins paint (fixing the reference's shapefile-order dependence,
SURVEY.md §4).  Resume: ``CheckpointTable.filter_pending`` anti-join before
the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs
from ..grid import RasterInfo, TileGrid
from ..kernels import agg as agg_k
from ..kernels import warp as warp_k
from ..partitioning import grouped_stream, keyed_repartition
from .tile_assign import assign_tiles

TILE_SCHEMA = ("tile_tag string, tile_col int, tile_row int, "
               "width int, height int, gt array<double>, "
               "n_images int, painted bigint, data binary")


def _encode_tile(out, out_info, grid_crs: str, out_fmt: str,
                 out_dtype: str = "uint8", tif_opts: dict | None = None) -> bytes:
    """Tile payload encode: PNG (pipeline default, what overviews/stack
    consume) or GeoTIFF with the reference's creation options AND the
    tile's own geotransform + grid CRS embedded — the reference's actual
    tile product (save tile + georeferencing,
    util/split_raster_tiles.py:117-127 via geo_band_cache.save).

    ``out_dtype``: the stored pixel type — uint8 (byte products), uint16
    (DEM/thermal, 16-bit PNG or TIFF), float32 (TIFF only; PNG has no
    float sample type), matching the reference's wider GDAL pixel types
    [ref: mod/geo_raster_c.pyx:33-70]."""
    if out_dtype == "uint8":
        band = np.clip(out, 0, 255).astype(np.uint8)
    elif out_dtype == "uint16":
        band = np.clip(out, 0, 65535).astype(np.uint16)
    elif out_dtype == "float32":
        band = out.astype(np.float32)
    else:
        raise ValueError(f"tile_cut out_dtype must be uint8/uint16/"
                         f"float32, got {out_dtype!r}")
    if out_fmt == "tif":
        from .. import tiff
        return tiff.encode_tiff(band, gt=out_info.gt, crs=grid_crs,
                                **(tif_opts or {}))
    if band.dtype == np.float32:
        raise ValueError("PNG has no float sample type — use "
                         "out_fmt='tif' for float32 tiles")
    return codecs.encode_png(band)


def tile_cut(images: DataFrame, grid: TileGrid | None = None,
             nodata: float = 0.0, agg_to_cell: float | None = None,
             agg_func: str = "mean", min_rate: float = 0.1,
             checkpoint=None, stage: str = "tile_cut",
             salt_buckets: int | None = None,
             salt_threshold: int | None = None,
             priority_col: str | None = None,
             band_col: str | None = None,
             src_crs_col: str | None = None,
             footprint_refine: bool = False,
             out_fmt: str = "png", out_dtype: str = "uint8",
             tif_opts: dict | None = None) -> DataFrame:
    """images (with footprint cols + bytes/fmt) -> one row per output tile.

    ``src_crs_col``: optional column naming each source's CRS (default:
    sources share the grid CRS).  ``footprint_refine``: for cross-CRS
    sources, polygon-clip the densified reprojected footprint against the
    tile before painting (``kernels.warp.mosaic`` semantics) — skips
    bbox-only overlaps and trims diagonal slivers; a no-op for same-CRS
    sources.

    ``agg_to_cell``: optional coarser output cell size (A1/A2 aggregation
    after the mosaic, like the reference's --cell-size).
    Output ``data`` is a PNG-encoded uint8 band, or with
    ``out_fmt="tif"`` a GeoTIFF (tiled+lzw+predictor2, the reference's
    creation options) carrying the tile's geotransform + grid CRS — the
    reference's self-describing tile product.

    ``priority_col``: optional NUMERIC compositing order — candidates paint
    in ascending (priority, image_id), so the lowest priority value wins
    each pixel (e.g. days-since-acquisition for a freshest-pixel composite;
    the reference composites in file-list order, util/split_raster_tiles.py).

    ``band_col``: multi-band/RGB stacks — one input row per (image, band)
    with the band's payload in ``bytes``; tiles group by (tile_tag, band)
    and the output carries the band id.  The reference's N-band stack
    [ref: mod/geo_raster_c.pyx:338-355] re-expressed as extra key columns:
    bands parallelize as independent tasks and never co-shuffle.

    ``salt_buckets``: hot-tile skew handling (north rule) — images split
    into ``pmod(xxhash64(image_id), k)`` sub-groups per tile; partial
    mosaics build in parallel, then a second first-wins merge combines the
    k partials per tile.  Identical output to the unsalted path because the
    global paint order is preserved: within a salt group candidates sort by
    (priority, image_id), and the merge phase re-sorts partials so pixel
    precedence is decided by the MINIMUM (priority, image_id) that painted
    each pixel — asserted equal in tests.

    ``salt_threshold``: ADAPTIVE salting — only tiles with more than this
    many candidate images take the two-phase salted path; every other tile
    keeps the cheaper single-phase assemble.  Uniform salting makes EVERY
    tile pay the partial-mosaic round-trip (an extra shuffle of float64
    partial planes) to parallelize the few hot ones; with a threshold the
    cold majority skips it.  Cost: one extra metadata-only aggregation
    over the candidate keys plus a semi/anti split of the candidate scan
    (at 100 TB, persist the candidate table or accept the re-scan — the
    per-tile counts never touch the ``bytes`` payload).  Output is
    byte-identical either way (asserted in tests)."""
    if out_fmt not in ("png", "tif"):
        raise ValueError(f"tile_cut out_fmt must be 'png' or 'tif', "
                         f"got {out_fmt!r}")
    if out_dtype not in ("uint8", "uint16", "float32"):
        raise ValueError(f"tile_cut out_dtype must be uint8/uint16/"
                         f"float32, got {out_dtype!r}")
    if out_dtype == "float32" and out_fmt != "tif":
        raise ValueError("float32 tiles need out_fmt='tif' "
                         "(PNG has no float sample type)")
    grid = grid or TileGrid()
    assigned = assign_tiles(images, grid.image_size, grid.cell_size, grid.edge,
                            p=grid.p)
    if checkpoint is not None:
        assigned = checkpoint.filter_pending(assigned, stage, "tile_tag")

    g = grid
    sort_cols = ([priority_col, "image_id"] if priority_col else ["image_id"])
    group_cols = ["tile_tag"] + ([band_col] if band_col else [])
    schema = TILE_SCHEMA + (f", {band_col} int" if band_col else "")

    # project to exactly what the assemble kernel reads BEFORE the shuffle
    # (guide §4.1: pandas kernels are opaque to column pruning, so without
    # this the exchange ships caption/lon/lat/footprint/phash per candidate
    # row for nothing — only the payload and the paint metadata are needed)
    need = ["tile_tag", "tile_col", "tile_row", "image_id", "bytes", "fmt",
            "gt", "w", "h"]
    for extra in (band_col, priority_col, src_crs_col):
        if extra:
            need.append(extra)
    assigned = assigned.select(*need)

    def assemble(key, pdf: pd.DataFrame):
        tag = key[0]
        tcol = int(pdf["tile_col"].iloc[0])
        trow = int(pdf["tile_row"].iloc[0])
        info = g.tile_info(tcol, trow)
        pdf = pdf.sort_values(sort_cols, kind="stable")  # deterministic first-wins

        def decoded():
            # stream: decode-and-paint one source at a time so a hot tile
            # with 10^4 candidates holds ONE decoded array, not all of them
            for _, r in pdf.iterrows():
                arr = codecs.decode(r["bytes"], r["fmt"]).astype(np.float64)
                crs_ = r[src_crs_col] if src_crs_col else g.crs
                yield arr, RasterInfo(tuple(r["gt"]), int(r["w"]),
                                      int(r["h"]), crs_)

        out = warp_k.mosaic(decoded(), info, nodata=nodata, dtype=np.float64,
                            footprint_refine=footprint_refine)
        out_info = info
        if agg_to_cell is not None:
            scaled = info.scale(cell_size=agg_to_cell)
            off_y = (scaled.gt[3] - info.gt[3]) / info.gt[5]
            off_x = (scaled.gt[0] - info.gt[0]) / info.gt[1]
            sc = scaled.gt[1] / info.gt[1]
            fn = agg_k.mean if agg_func == "mean" else agg_k.median
            kwargs = {"min_rate": min_rate} if agg_func == "mean" else {}
            out = fn(out, off_y, off_x, sc, nodata, scaled.height, scaled.width,
                     **kwargs)
            out_info = scaled
        painted = int((out != nodata).sum())
        row = {
            "tile_tag": tag, "tile_col": tcol, "tile_row": trow,
            "width": out_info.width, "height": out_info.height,
            "gt": list(out_info.gt), "n_images": len(pdf),
            "painted": painted,
            "data": _encode_tile(out, out_info, g.crs, out_fmt, out_dtype,
                                 tif_opts),
        }
        if band_col:
            row[band_col] = int(key[1])
        return pd.DataFrame([row])

    def plain(df: DataFrame) -> DataFrame:
        # streamed grouped map at pinned width: batch-level Arrow instead of
        # one JVM round-trip per tile group, and no AQE byte-coalescing of
        # the decode-heavy stage (see partitioning.grouped_stream)
        return grouped_stream(df, group_cols, assemble, schema)

    if salt_buckets is not None and salt_buckets > 1:
        if salt_threshold is None:
            return _tile_cut_salted(assigned, grid, nodata, salt_buckets,
                                    agg_to_cell, agg_func, min_rate,
                                    priority_col, band_col,
                                    src_crs_col, footprint_refine,
                                    out_fmt, out_dtype, tif_opts)
        # adaptive: split on a metadata-only per-tile candidate count
        hot_keys = (assigned.select(*group_cols)
                            .groupBy(*group_cols)
                            .agg(F.count("*").alias("_n"))
                            .where(F.col("_n") > salt_threshold)
                            .drop("_n"))
        hot = assigned.join(F.broadcast(hot_keys), group_cols, "left_semi")
        cold = assigned.join(F.broadcast(hot_keys), group_cols, "left_anti")
        return _tile_cut_salted(hot, grid, nodata, salt_buckets,
                                agg_to_cell, agg_func, min_rate,
                                priority_col, band_col,
                                src_crs_col, footprint_refine,
                                out_fmt, out_dtype, tif_opts) \
            .unionByName(plain(cold))

    return plain(assigned)


_PARTIAL_SCHEMA = ("tile_tag string, tile_col int, tile_row int, "
                   "n_images int, data binary, winner binary, "
                   "ids array<string>, prios array<double>")


def _tile_cut_salted(assigned: DataFrame, g: TileGrid, nodata: float,
                     k: int, agg_to_cell, agg_func, min_rate,
                     priority_col: str | None = None,
                     band_col: str | None = None,
                     src_crs_col: str | None = None,
                     footprint_refine: bool = False,
                     out_fmt: str = "png",
                     out_dtype: str = "uint8",
                     tif_opts: dict | None = None) -> DataFrame:
    """Two-phase hot-tile mosaic: per-(tile, salt) partials carry a
    per-pixel WINNER plane so the merge reproduces the global
    min-(priority, image_id) first-wins order exactly.

    The winner plane stores the LOCAL index into the salt group's sorted
    key list (shipped alongside: one (priority, id) pair per image); the
    merge factorizes the union of key lists into global lexicographic
    ranks and compares those — works for arbitrary image_id strings, and
    precedence is exactly the unsalted path's (priority, image_id) sort.

    ``src_crs_col``/``footprint_refine`` behave exactly as on the plain
    path: each partial paints through :func:`kernels.warp.paint_source`
    (the same per-source body ``mosaic`` uses), so cross-CRS sources are
    reprojected to the grid CRS regardless of salting
    [ref: mod/geo_raster_ex_c.pyx:1093-1203 — every source is projected
    to the target CRS on every code path]."""
    salted = assigned.withColumn(
        "salt", F.pmod(F.xxhash64("image_id"), F.lit(k)).cast("int"))
    sort_cols = ([priority_col, "image_id"] if priority_col else ["image_id"])
    part_keys = ["tile_tag"] + ([band_col] if band_col else []) + ["salt"]
    merge_keys = ["tile_tag"] + ([band_col] if band_col else [])
    part_schema = _PARTIAL_SCHEMA + (f", {band_col} int" if band_col else "")
    out_schema = TILE_SCHEMA + (f", {band_col} int" if band_col else "")

    def assemble_partial(key, pdf: pd.DataFrame):
        tag = key[0]
        tcol = int(pdf["tile_col"].iloc[0])
        trow = int(pdf["tile_row"].iloc[0])
        info = g.tile_info(tcol, trow)
        pdf = pdf.sort_values(sort_cols, kind="stable")
        out = np.full((info.height, info.width), nodata, dtype=np.float64)
        winner = np.full(out.shape, -1, dtype=np.int32)   # -1 = unpainted
        for j, (_, r) in enumerate(pdf.iterrows()):
            arr = codecs.decode(r["bytes"], r["fmt"]).astype(np.float64)
            crs_ = r[src_crs_col] if src_crs_col else g.crs
            src = RasterInfo(tuple(r["gt"]), int(r["w"]), int(r["h"]), crs_)
            empty_before = out == nodata
            warp_k.paint_source(arr, src, info, nodata, out,
                                footprint_refine=footprint_refine)
            newly = empty_before & (out != nodata)
            winner[newly] = j
        prios = (pdf[priority_col].astype(float).tolist() if priority_col
                 else [0.0] * len(pdf))
        row = {
            "tile_tag": tag, "tile_col": tcol, "tile_row": trow,
            "n_images": len(pdf),
            "data": codecs.encode_npy(out.astype(np.float64)),
            "winner": codecs.encode_npy(winner),
            "ids": list(pdf["image_id"]),
            "prios": prios,
        }
        if band_col:
            row[band_col] = int(key[1])
        return pd.DataFrame([row])

    partials = grouped_stream(salted, part_keys, assemble_partial,
                              part_schema)

    def merge(key, pdf: pd.DataFrame):
        tag = key[0]
        tcol = int(pdf["tile_col"].iloc[0])
        trow = int(pdf["tile_row"].iloc[0])
        info = g.tile_info(tcol, trow)
        out = np.full((info.height, info.width), nodata, dtype=np.float64)
        win = np.full(out.shape, np.iinfo(np.int64).max, dtype=np.int64)
        rank = {ps: i for i, ps in enumerate(sorted(
            set((float(p), s) for _, r in pdf.iterrows()
                for p, s in zip(r["prios"], r["ids"]))))}
        for _, r in pdf.iterrows():
            d = codecs.decode_npy(r["data"])
            wloc = codecs.decode_npy(r["winner"])
            ranks = np.array(
                [rank[(float(p), s)] for p, s in zip(r["prios"], r["ids"])]
                or [0], dtype=np.int64)
            w = np.where(wloc >= 0, ranks[np.clip(wloc, 0, None)],
                         np.iinfo(np.int64).max)
            take = w < win  # global min-(priority, id) precedence per pixel
            out[take] = d[take]
            win[take] = w[take]
        out_info = info
        if agg_to_cell is not None:
            scaled = info.scale(cell_size=agg_to_cell)
            off_y = (scaled.gt[3] - info.gt[3]) / info.gt[5]
            off_x = (scaled.gt[0] - info.gt[0]) / info.gt[1]
            sc = scaled.gt[1] / info.gt[1]
            fn = agg_k.mean if agg_func == "mean" else agg_k.median
            kwargs = {"min_rate": min_rate} if agg_func == "mean" else {}
            out = fn(out, off_y, off_x, sc, nodata, scaled.height, scaled.width,
                     **kwargs)
            out_info = scaled
        painted = int((out != nodata).sum())
        row = {
            "tile_tag": tag, "tile_col": tcol, "tile_row": trow,
            "width": out_info.width, "height": out_info.height,
            "gt": list(out_info.gt), "n_images": int(pdf["n_images"].sum()),
            "painted": painted,
            "data": _encode_tile(out, out_info, g.crs, out_fmt, out_dtype,
                                 tif_opts),
        }
        if band_col:
            row[band_col] = int(key[1])
        return pd.DataFrame([row])

    return grouped_stream(partials, merge_keys, merge, out_schema)


RGB_TILE_SCHEMA = ("tile_tag string, tile_col int, tile_row int, "
                   "width int, height int, gt array<double>, "
                   "n_images int, painted bigint, data binary")


def combine_bands(tiles: DataFrame, bands=(0, 1, 2), band_col: str = "band",
                  out_fmt: str = "png",
                  grid: TileGrid | None = None) -> DataFrame:
    """Per-band tile rows (``tile_cut(band_col=)`` output) -> ONE multi-band
    (RGB) row per tile — the reference's N-band stacked save
    [ref: mod/geo_raster_c.pyx:338-355 geo_band_stack / :424-433 save].

    ``bands`` orders the three band ids into the R, G, B planes.  Payload
    is channels-last RGB PNG or GeoTIFF (geotransform + grid CRS
    embedded).  One narrow shuffle on tile_tag; each group decodes its 3
    band planes (any lossless tile fmt — sniffed) and stacks.

    ``out_fmt='tif'`` REQUIRES ``grid``: the grid's CRS is stamped into a
    self-describing product, and defaulting it to ``TileGrid()`` would
    silently georeference tiles cut on any other grid (e.g. sinusoidal
    meters) as EPSG:4326 — wrong metadata with no error.  ``tile_cut``
    never has this problem because it closes over its actual grid."""
    if out_fmt not in ("png", "tif"):
        raise ValueError(f"combine_bands out_fmt must be 'png' or 'tif', "
                         f"got {out_fmt!r}")
    if out_fmt == "tif" and grid is None:
        raise ValueError(
            "combine_bands(out_fmt='tif') requires grid= — the grid CRS is "
            "embedded in the GeoTIFF and cannot be defaulted (pass the "
            "TileGrid the tiles were cut on)")
    g = grid or TileGrid()
    bands = tuple(int(b) for b in bands)

    def combine(key, pdf: pd.DataFrame):
        tag = key[0]
        have = {int(r[band_col]): r for _, r in pdf.iterrows()}
        missing = [b for b in bands if b not in have]
        if missing:
            raise ValueError(f"tile {tag}: missing band(s) {missing} "
                             f"(have {sorted(have)})")
        first = have[bands[0]]
        planes = [codecs.decode_auto(bytes(have[b]["data"])) for b in bands]
        bad = [b for b, pl in zip(bands, planes) if pl.dtype != np.uint8]
        if bad:
            # a silent uint8 cast would wrap uint16/float planes mod 256
            # (same contract as codecs.encode_png's wide-dtype refusal)
            raise ValueError(
                f"tile {tag}: band(s) {bad} are not uint8 "
                f"({[str(pl.dtype) for pl in planes]}) — RGB composites "
                "take byte band planes; rescale first (kernels.viz.stretch "
                "-> uint8), or keep wide bands as SEPARATE single-band "
                "products (tile_cut out_dtype='uint16'/'float32' with "
                "out_fmt='tif', or 16-bit grayscale PNG via "
                "codecs.encode_band_like)")
        rgb = np.stack(planes, axis=-1)
        if out_fmt == "tif":
            from .. import tiff
            data = tiff.encode_tiff(rgb, gt=tuple(first["gt"]), crs=g.crs)
        else:
            data = codecs.encode_png(rgb, planes_first=False)
        return pd.DataFrame([{
            "tile_tag": tag,
            "tile_col": int(first["tile_col"]),
            "tile_row": int(first["tile_row"]),
            "width": int(first["width"]), "height": int(first["height"]),
            "gt": list(first["gt"]),
            "n_images": int(pdf["n_images"].sum()),
            "painted": int((rgb != 0).any(axis=-1).sum()),
            "data": data,
        }])

    return grouped_stream(tiles, ["tile_tag"], combine, RGB_TILE_SCHEMA)
