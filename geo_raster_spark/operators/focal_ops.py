"""Distributed focal ops with halo exchange (SURVEY.md §2.5 W1-W6).

The reference pre-materializes halos via the tile grid's ``edge`` parameter
[ref: lib/global_task.py:120-121] so window ops near tile borders see their
neighbors.  Spark-first shape:

1. every tile row emits itself to its 3x3 neighborhood
   (``explode`` over neighbor tags — map-side, x9 amplification of tile
   METADATA+pixels, bounded by halo width);
2. ``groupBy(center_tag).applyInPandas`` assembles the padded array
   (center tile + ``halo`` pixels from each neighbor), runs the NumPy focal
   kernel, and crops back to the tile core;
3. result is a new tiles DataFrame — same schema, so focal ops compose.

Correctness bound (SURVEY.md §7.3.4): for iterated kernels the halo must be
>= dist x iterations; callers pass ``halo`` accordingly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs
from ..grid import TileGrid
from ..kernels import focal as focal_k

TILE_SCHEMA = ("tile_tag string, tile_col int, tile_row int, "
               "width int, height int, gt array<double>, "
               "n_images int, painted bigint, data binary")


def _focal_fn(kind: str, **kw):
    if kind == "median":
        return lambda a: focal_k.focal_median(a, kw.get("dist", 1), kw.get("nodata", 0))[0]
    if kind == "expand":
        return lambda a: focal_k.expand(a, np.ones_like(a), kw["val"], kw["non"],
                                        kw.get("dist", 1), kw.get("min_num", 3))[0]
    if kind == "clean":
        return lambda a: focal_k.clean(a, kw.get("dist", 2), kw.get("min_num", 3),
                                       kw.get("nodata", 0))[0]
    if kind == "mmu":
        return lambda a: focal_k.mmu(a, kw.get("dist", 1), kw.get("min_num", 2),
                                     kw.get("nodata", 0))
    raise ValueError(f"unknown focal kind {kind}")


def focal_tiles(tiles: DataFrame, kind: str, halo: int = 2,
                grid: TileGrid | None = None, **kernel_kwargs) -> DataFrame:
    """Apply a focal kernel to every tile with ``halo``-pixel neighbor
    context.  ``tiles`` is the output of ``mosaic.tile_cut`` (PNG payloads).
    """
    grid = grid or TileGrid()
    n_cols = grid.n_cols

    # neighbor fan-out: each tile contributes to its 3x3 block's assembly
    neigh = tiles.withColumn(
        "dst", F.explode(F.array(*[
            F.struct((F.pmod(F.col("tile_col") + dc, F.lit(n_cols))).alias("c"),
                     (F.col("tile_row") + dr).alias("r"))
            for dr in (-1, 0, 1) for dc in (-1, 0, 1)])))
    neigh = (neigh
             .withColumn("dst_tag", F.format_string("h%03dv%03d", "dst.c", "dst.r"))
             .drop("dst"))

    kernel = _focal_fn(kind, **kernel_kwargs)
    g = grid
    h = halo

    def assemble(key, pdf: pd.DataFrame):
        tag = key[0]
        center = pdf[pdf["tile_tag"] == tag]
        if len(center) == 0:
            return pd.DataFrame([], columns=["tile_tag", "tile_col", "tile_row",
                                             "width", "height", "gt", "n_images",
                                             "painted", "data"])
        c = center.iloc[0]
        W, H = int(c["width"]), int(c["height"])
        pad = np.zeros((H + 2 * h, W + 2 * h), dtype=np.uint8)
        ccol, crow = int(c["tile_col"]), int(c["tile_row"])
        size = g.image_size  # un-haloed tile step in pixels
        for _, r in pdf.iterrows():
            arr = codecs.decode_png(bytes(r["data"]))
            dc = int(r["tile_col"]) - ccol
            dr = int(r["tile_row"]) - crow
            if dc > 1:
                dc -= g.n_cols  # antimeridian wrap
            if dc < -1:
                dc += g.n_cols
            # placement of neighbor tile origin relative to padded center
            y0 = h + dr * size
            x0 = h + dc * size
            ys, xs = slice(max(0, y0), min(pad.shape[0], y0 + arr.shape[0])), \
                     slice(max(0, x0), min(pad.shape[1], x0 + arr.shape[1]))
            if ys.start < ys.stop and xs.start < xs.stop:
                sub = arr[ys.start - y0:ys.stop - y0, xs.start - x0:xs.stop - x0]
                if int(r["tile_tag"] == tag):
                    pad[ys, xs] = sub
                else:
                    # neighbors only fill pixels the center left empty
                    dst = pad[ys, xs]
                    pad[ys, xs] = np.where(dst == 0, sub, dst)
        out = kernel(pad)[h:h + H, h:h + W]
        return pd.DataFrame([{
            "tile_tag": tag, "tile_col": ccol, "tile_row": crow,
            "width": W, "height": H, "gt": list(c["gt"]),
            "n_images": int(c["n_images"]), "painted": int((out != 0).sum()),
            "data": codecs.encode_png(out.astype(np.uint8)),
        }])

    return (neigh.repartition("dst_tag")
                 .groupBy("dst_tag")
                 .applyInPandas(assemble, schema=TILE_SCHEMA))
