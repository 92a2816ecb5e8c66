"""Tile-file sink: the reference's on-disk output contract.

``split_raster_tiles._task`` [ref: util/split_raster_tiles.py:100-141]
writes each tile as ``<out>/data/<h>/<v>/<hv>/<hv>_<t>.tif`` plus a JSON
``.met`` sidecar (``lib/metadata.py:66-70`` — a plain JSON dict), and
SKIPS a tile whose ``.met`` already exists (crash-safe resume: the
``.met`` is written LAST, so a run killed mid-``.tif`` leaves no marker
and the tile is redone).  This sink reproduces that contract from a
tile_cut DataFrame, executing ON EXECUTORS (each partition writes its own
tiles — no driver collect; on a cluster ``d_out`` would be a shared/
object store mount, the same deployment assumption the reference's
NFS/S3 output paths make).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..grid import tile_output_path


def write_tile_files(tiles: DataFrame, d_out: str, t: str = "dat",
                     fmt: str = "tif", use_data_path: bool = True,
                     skip_existing: bool = True,
                     band_col: str | None = None) -> dict:
    """Write tile rows (``tile_cut`` output) as files + ``.met`` sidecars.

    ``fmt`` names the payload's actual encoding (use
    ``tile_cut(out_fmt="tif")`` for self-describing GeoTIFF products).
    Multi-band output (``tile_cut(band_col=)`` rows) REQUIRES ``band_col``
    so each band gets its own ``_<t>_b<band>`` file — without it the
    per-band rows would collide on one path and silently drop bands
    (round-5 review), so the presence of the column is checked.
    Returns ``{"written": n, "skipped": n}``.  Sidecar fields mirror the
    reference's metadata object (tile tag + provenance counters); the
    write order (payload first, ``.met`` last) IS the resume invariant."""
    import pandas as pd

    cols = ["tile_tag", "tile_col", "tile_row", "width", "height",
            "gt", "n_images", "painted", "data"]
    if band_col is not None:
        cols.append(band_col)
    elif any(f.name == "band" for f in tiles.schema.fields):
        raise ValueError(
            "tiles carry a 'band' column — pass band_col='band' so "
            "per-band rows do not collide on one output path")

    def work(it):
        for pdf in it:
            written = skipped = 0
            for _, r in pdf.iterrows():
                suffix = (f"{t}_b{int(r[band_col])}" if band_col else t)
                base = tile_output_path(d_out, int(r["tile_col"]),
                                        int(r["tile_row"]), suffix,
                                        use_data_path=use_data_path)
                f_out = f"{base}.{fmt}"
                f_met = f"{base}.met"
                if skip_existing and os.path.exists(f_met):
                    skipped += 1
                    continue
                os.makedirs(os.path.dirname(f_out), exist_ok=True)
                with open(f_out, "wb") as f:
                    f.write(bytes(r["data"]))
                met = {
                    "tile": r["tile_tag"],
                    **({"band": int(r[band_col])} if band_col else {}),
                    "width": int(r["width"]), "height": int(r["height"]),
                    "gt": [float(v) for v in r["gt"]],
                    "n_images": int(r["n_images"]),
                    "painted": int(r["painted"]),
                    "output": os.path.basename(f_out),
                }
                with open(f_met, "w") as f:
                    json.dump(met, f, indent=4)   # [ref: metadata.py:66-70]
                written += 1
            yield pd.DataFrame({"written": [written], "skipped": [skipped]})

    res = (tiles.select(*cols)
                .mapInPandas(work, schema="written long, skipped long")
                .groupBy().sum().collect()[0])
    return {"written": int(res[0] or 0), "skipped": int(res[1] or 0)}


def read_tile_files(spark, d_out: str, t: str = "dat", fmt: str = "tif"):
    """Inverse scan: ``.met`` sidecars + payloads back into a DataFrame
    (binaryFile source over the layout + a JSON-sidecar join) — the
    ``tiles.list``-style re-ingest of a previous run's output
    [ref: lib/global_task.py:102-137]."""
    import pandas as pd

    bf = (spark.read.format("binaryFile")
          .option("pathGlobFilter", f"*.{fmt}")
          .option("recursiveFileLookup", "true")
          .load(d_out))

    def attach(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                path = r["path"]
                if path.startswith("file:"):
                    from urllib.parse import urlparse
                    local = urlparse(path).path
                else:
                    local = path
                met_path = os.path.splitext(local)[0] + ".met"
                with open(met_path) as f:
                    met = json.load(f)
                rows.append({
                    "tile_tag": met["tile"], "width": met["width"],
                    "height": met["height"], "gt": met["gt"],
                    "band": int(met.get("band", -1)),
                    "n_images": met["n_images"], "painted": met["painted"],
                    "data": bytearray(r["content"]),
                })
            yield (pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["tile_tag", "width", "height", "gt", "band",
                         "n_images", "painted", "data"]))

    # band = -1 for single-band products (sidecars without a band field)
    return bf.mapInPandas(
        attach, schema=("tile_tag string, width int, height int, "
                        "gt array<double>, band int, "
                        "n_images int, painted long, data binary"))
