"""Tile pyramid / overviews: recursive 2x-downsampled tile levels (the
gdaladdo role; the reference emits coarser-cell outputs per tile via its
aggregation kernels [ref: util/split_raster_tiles.py --cell-size +
mod/agg_band.pyx area-weighted mean] — here each pyramid level is ONE
shuffle on the parent tag, and the downsample reuses the reference-exact
``kernels.agg.mean`` semantics).

Scale shape per level: 4 children -> 1 parent, rows shrink 4x each level;
``groupBy(parent_tag)`` moves each child tile payload once; the quadrant
paint + 2x area-weighted mean is bounded by tile pixels.  A full pyramid
is sum(levels) shuffles over geometrically-shrinking data (~1.33x the base
level's bytes in total).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs
from ..grid import TileGrid
from ..partitioning import grouped_stream
from ..kernels import agg as agg_k

LEVEL_SCHEMA = ("level int, tile_tag string, tile_col int, tile_row int, "
                "width int, height int, gt array<double>, "
                "n_children int, painted bigint, data binary")


def build_overviews(tiles: DataFrame, levels: int = 2, nodata: float = 0.0,
                    grid: TileGrid | None = None,
                    min_rate: float = 0.0) -> DataFrame:
    """tiles (mosaic.tile_cut output, level 0) -> union of pyramid levels
    1..``levels``: at each level 4 children merge into one parent tile of
    the SAME pixel dimensions covering 2x the extent (2x coarser cells),
    downsampled with the area-weighted mean kernel (nodata-aware;
    ``min_rate`` = required valid-coverage fraction per output pixel)."""
    grid = grid or TileGrid()
    size = grid.image_size
    half = size // 2
    if size % 2:
        raise ValueError("image_size must be even for 2x overviews")

    def combine(level: int):
        ts = grid.tile_size * (2 ** level)          # parent tile map units

        def fn(key, pdf: pd.DataFrame):
            pcol, prow = int(key[0]), int(key[1])
            out = np.full((size, size), nodata, dtype=np.float64)
            src_dts = set()
            for _, r in pdf.iterrows():
                raw = codecs.decode_auto(bytes(r["data"]))
                src_dts.add(raw.dtype)
                child = raw.astype(np.float64)
                core = child[:size, :size]          # drop the edge overlap
                down = agg_k.mean(core, 0.0, 0.0, 2.0, nodata, half, half,
                                  min_rate=min_rate)
                qr = (int(r["tile_row"]) - 2 * prow) * half
                qc = (int(r["tile_col"]) - 2 * pcol) * half
                out[qr:qr + half, qc:qc + half] = down
            if len(src_dts) > 1:
                # a mixed-dtype group would re-encode at whichever child
                # decoded last — arbitrary output width, silent precision
                # loss.  Fail loudly; callers normalize dtypes upstream.
                raise ValueError(
                    f"overview parent h{pcol:03d}v{prow:03d} level {level}: "
                    f"children have mixed dtypes "
                    f"{sorted(str(d) for d in src_dts)} — re-cut tiles with "
                    "one out_dtype before building overviews")
            src_dt = src_dts.pop() if src_dts else np.dtype(np.uint8)
            gt = [-grid.p + pcol * ts, ts / size, 0.0,
                  grid.p / 2 - prow * ts, 0.0, -ts / size]
            return pd.DataFrame([{
                "level": level, "tile_tag": "h%03dv%03d" % (pcol, prow),
                "tile_col": pcol, "tile_row": prow,
                "width": size, "height": size, "gt": gt,
                "n_children": len(pdf),
                "painted": int((out != nodata).sum()),
                "data": codecs.encode_band_like(out, src_dt),
            }])

        return fn

    levels_out = []
    cur = tiles.select("tile_tag", "tile_col", "tile_row", "data")
    for lv in range(1, levels + 1):
        parent = (cur
                  .withColumn("pcol", (F.col("tile_col") / 2).cast("int"))
                  .withColumn("prow", (F.col("tile_row") / 2).cast("int")))
        nxt = grouped_stream(parent, ["pcol", "prow"], combine(lv),
                             LEVEL_SCHEMA)
        levels_out.append(nxt)
        cur = nxt.select("tile_tag", "tile_col", "tile_row", "data")

    out = levels_out[0]
    for nxt in levels_out[1:]:
        out = out.unionByName(nxt)
    return out
