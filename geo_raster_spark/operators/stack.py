"""Per-pixel statistics across a temporal stack of tiles (SURVEY.md §2.4's
A1-A4 semantics applied ACROSS epochs — the reference computes per-pixel
means/medians over scene stacks with its agg/band kernels
[ref: mod/agg_band.pyx per-pixel loops]; here the stack for one tile
co-locates via one shuffle on ``tile_tag`` and reduces in a single NumPy
pass).

Scale shape: rows are (tile_tag, epoch, data); ``groupBy(tile_tag)`` is the
only shuffle (tile payloads move once); the per-pixel reduction is a
vectorized nan-aware NumPy op over the (n_epochs, H, W) stack — bounded by
epochs x tile pixels, independent of image count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..partitioning import grouped_stream

STACK_SCHEMA = ("tile_tag string, n_epochs int, width int, height int, "
                "gt array<double>, painted bigint, val_sum double, "
                "data binary")

_STATS = {
    "mean": np.nanmean,
    "median": np.nanmedian,
    "min": np.nanmin,
    "max": np.nanmax,
    "std": np.nanstd,
}


def pixel_stack_stats(tiles: DataFrame, stat: str = "median",
                      nodata: float = 0.0,
                      band_col: str | None = None) -> DataFrame:
    """tiles(tile_tag, width, height, gt, data[, epoch]) -> one row per
    tile: the per-pixel ``stat`` across all epochs of that tile.

    nodata pixels are excluded per position (a pixel observed in 3 of 5
    epochs reduces over those 3); positions never observed stay nodata.

    ``band_col``: multi-band stacks (tiles from ``tile_cut(band_col=...)``)
    reduce per (tile, band) — epochs of one band never mix with another's.
    """
    if stat.startswith("p") and stat[1:].replace(".", "", 1).isdigit():
        # arbitrary per-pixel percentile across epochs, e.g. "p25" / "p97.5"
        # (np.nanpercentile linear interpolation — "p50" ≡ "median")
        q = float(stat[1:])
        if not 0.0 <= q <= 100.0:
            raise ValueError(f"percentile out of range: {stat}")

        def fn(a, axis=0):
            return np.nanpercentile(a, q, axis=axis)
    elif stat in _STATS:
        fn = _STATS[stat]
    else:
        raise ValueError(
            f"stat must be one of {sorted(_STATS)} or 'p<0-100>'")
    group_cols = ["tile_tag"] + ([band_col] if band_col else [])
    schema = STACK_SCHEMA + (f", {band_col} int" if band_col else "")

    def combine(key, pdf: pd.DataFrame):
        tag = key[0]
        first = pdf.iloc[0]
        h, w = int(first["height"]), int(first["width"])
        stack = np.full((len(pdf), h, w), np.nan, dtype=np.float64)
        src_dts = set()
        for i, (_, r) in enumerate(pdf.iterrows()):
            raw = codecs.decode_auto(bytes(r["data"]))
            src_dts.add(raw.dtype)
            a = raw.astype(np.float64)
            a[a == nodata] = np.nan
            stack[i, :a.shape[0], :a.shape[1]] = a
        if len(src_dts) > 1:
            # last-epoch-wins dtype would make the re-encode width depend
            # on group iteration order — fail loudly (see overviews.py)
            raise ValueError(
                f"stack group {tag}: epochs have mixed dtypes "
                f"{sorted(str(d) for d in src_dts)} — normalize out_dtype "
                "before stacking")
        src_dt = src_dts.pop() if src_dts else np.dtype(np.uint8)
        with np.errstate(all="ignore"):
            out = fn(stack, axis=0)
        out = np.where(np.isnan(out), nodata, out)
        row = {
            "tile_tag": tag, "n_epochs": len(pdf), "width": w, "height": h,
            "gt": list(first["gt"]),
            "painted": int((out != nodata).sum()),
            # float sum of the reduced plane over painted positions that
            # the DuckDB oracle re-derives per pixel.  For median/p50 of
            # uint8 inputs the values are multiples of 0.5, so the sum is
            # binary-exact regardless of order; arbitrary pXX percentiles
            # interpolate to non-dyadic values — an oracle comparing a
            # pXX val_sum must round/tolerance-compare (advice r4)
            "val_sum": float(out[out != nodata].sum()),
            "data": codecs.encode_band_like(out, src_dt),
        }
        if band_col:
            row[band_col] = int(key[1])
        return pd.DataFrame([row])

    return grouped_stream(tiles, group_cols, combine, schema)
