"""Distributed focal ops with halo exchange (SURVEY.md §2.5 W1-W6).

The reference pre-materializes halos via the tile grid's ``edge`` parameter
[ref: lib/global_task.py:120-121] so window ops near tile borders see their
neighbors.  Spark-first shape:

1. a map-side ``mapInPandas`` decodes each tile ONCE and emits its center
   plus 8 HALO STRIPS (depth ``halo + grid.edge``) addressed to the 3x3
   neighborhood — shuffle volume ~(1 + 8*(halo+edge)/size) x tile bytes
   instead of the naive 9x full-tile fan-out;
2. ``groupBy(center_tag).applyInPandas`` assembles the padded array
   (center tile + neighbor strips), runs the NumPy focal kernel, and crops
   back to the tile core;
3. result is a new tiles DataFrame — same schema, so focal ops compose.

Correctness bound (SURVEY.md §7.3.4): for iterated kernels the halo must be
>= dist x iterations; callers pass ``halo`` accordingly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..grid import TileGrid
from ..partitioning import grouped_stream
from ..kernels import focal as focal_k

TILE_SCHEMA = ("tile_tag string, tile_col int, tile_row int, "
               "width int, height int, gt array<double>, "
               "n_images int, painted bigint, data binary")

_TILE_COLS = ["tile_tag", "tile_col", "tile_row", "width", "height", "gt",
              "n_images", "painted", "data"]

_EMIT_SCHEMA = ("dst_tag string, tile_tag string, tile_col int, tile_row int, "
                "width int, height int, gt array<double>, n_images int, "
                "painted bigint, rel_dr int, rel_dc int, r_off int, c_off int, "
                "data binary")

_EMIT_COLS = ["dst_tag", "tile_tag", "tile_col", "tile_row", "width", "height",
              "gt", "n_images", "painted", "rel_dr", "rel_dc", "r_off",
              "c_off", "data"]


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


def _strip_emitter(n_cols: int, d: int):
    """mapInPandas fn: tile rows -> center row + 8 halo strips (depth ``d``)
    addressed to the 3x3 neighborhood.  Exposed for shuffle-volume
    measurement (tools/focal_shuffle_bytes.py) as well as ``focal_tiles``."""

    def emit(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = {
                    "tile_tag": r["tile_tag"], "tile_col": int(r["tile_col"]),
                    "tile_row": int(r["tile_row"]), "width": int(r["width"]),
                    "height": int(r["height"]), "gt": list(r["gt"]),
                    "n_images": int(r["n_images"]), "painted": int(r["painted"]),
                }
                arr = None
                for dr_e in (-1, 0, 1):
                    for dc_e in (-1, 0, 1):
                        dst_c = (meta["tile_col"] + dc_e) % n_cols  # ±180° wrap
                        dst_r = meta["tile_row"] + dr_e
                        dst_tag = "h%03dv%03d" % (dst_c, dst_r)
                        rel_dr, rel_dc = -dr_e, -dc_e  # our offset in dst's frame
                        if (dr_e, dc_e) == (0, 0):
                            rows.append({**meta, "dst_tag": dst_tag,
                                         "rel_dr": 0, "rel_dc": 0,
                                         "r_off": 0, "c_off": 0,
                                         "data": r["data"]})
                            continue
                        if arr is None:
                            arr = codecs.decode_auto(bytes(r["data"]))
                        ht, wt = arr.shape
                        rs = (slice(0, ht) if rel_dr == 0
                              else slice(max(0, ht - d), ht) if rel_dr == -1
                              else slice(0, min(d, ht)))
                        cs = (slice(0, wt) if rel_dc == 0
                              else slice(max(0, wt - d), wt) if rel_dc == -1
                              else slice(0, min(d, wt)))
                        sub = arr[rs, cs]
                        if sub.size == 0:
                            continue
                        rows.append({**meta, "dst_tag": dst_tag,
                                     "rel_dr": rel_dr, "rel_dc": rel_dc,
                                     "r_off": rs.start, "c_off": cs.start,
                                     "data": codecs.encode_png(
                                         np.ascontiguousarray(sub))})
            yield pd.DataFrame(rows, columns=_EMIT_COLS)

    return emit


def focal_tiles(tiles: DataFrame, kind: str, halo: int = 2,
                grid: TileGrid | None = None, **kernel_kwargs) -> DataFrame:
    """Apply a focal kernel to every tile with ``halo``-pixel neighbor
    context.  ``tiles`` is the output of ``mosaic.tile_cut`` (PNG payloads).
    """
    grid = grid or TileGrid()
    n_cols = grid.n_cols
    kernel = _focal_fn(kind, **kernel_kwargs)
    # the kernel's nodata doubles as the "empty pad pixel" sentinel —
    # hardcoding 0 here would make nodata != 0 halos never fill
    nod = kernel_kwargs.get("nodata", 0)
    g = grid
    h = halo
    # strip depth: the neighbor pixels visible in the padded frame are the
    # halo ring PLUS the grid's tile-overlap band (tiles are
    # (size+edge)^2 px on a size-px step)
    d = halo + grid.edge

    neigh = tiles.mapInPandas(_strip_emitter(n_cols, d), schema=_EMIT_SCHEMA)

    def assemble(key, pdf: pd.DataFrame):
        tag = key[0]
        center = pdf[(pdf["rel_dr"] == 0) & (pdf["rel_dc"] == 0)]
        if len(center) == 0:
            return pd.DataFrame([], columns=_TILE_COLS)
        c = center.iloc[0]
        W, H = int(c["width"]), int(c["height"])
        size = g.image_size  # un-haloed tile step in pixels
        carr = codecs.decode_auto(bytes(c["data"]))
        # halo frame takes the TILE's dtype (uint16/float32 products
        # would silently wrap modulo 256 in a hard-coded uint8 frame)
        pad = np.full((H + 2 * h, W + 2 * h), nod, dtype=carr.dtype)
        pad[h:h + carr.shape[0], h:h + carr.shape[1]] = carr
        strips = pdf[(pdf["rel_dr"] != 0) | (pdf["rel_dc"] != 0)] \
            .sort_values(["rel_dr", "rel_dc", "tile_tag"], kind="stable")
        for _, r in strips.iterrows():
            sub = codecs.decode_auto(bytes(r["data"]))
            y0 = h + int(r["rel_dr"]) * size + int(r["r_off"])
            x0 = h + int(r["rel_dc"]) * size + int(r["c_off"])
            ys = slice(max(0, y0), min(pad.shape[0], y0 + sub.shape[0]))
            xs = slice(max(0, x0), min(pad.shape[1], x0 + sub.shape[1]))
            if ys.start < ys.stop and xs.start < xs.stop:
                s = sub[ys.start - y0:ys.stop - y0, xs.start - x0:xs.stop - x0]
                dst = pad[ys, xs]
                # neighbors only fill pixels still empty (== kernel nodata);
                # overlap-band values are identical across tiles (same
                # deterministic mosaic), so fill order cannot change bytes
                pad[ys, xs] = np.where(dst == nod, s, dst)
        out = kernel(pad)[h:h + H, h:h + W]
        return pd.DataFrame([{
            "tile_tag": tag, "tile_col": int(c["tile_col"]),
            "tile_row": int(c["tile_row"]),
            "width": W, "height": H, "gt": list(c["gt"]),
            "n_images": int(c["n_images"]), "painted": int((out != 0).sum()),
            "data": codecs.encode_band_like(out, carr.dtype),
        }])

    return grouped_stream(neigh, ["dst_tag"], assemble, TILE_SCHEMA)
