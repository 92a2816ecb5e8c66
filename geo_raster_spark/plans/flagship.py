"""The flagship job (BASELINE.md protocol): H3-style cell assignment →
broadcast PIP join → global-grid tile assignment → per-(zone, tile) counts,
with checkpoint-table lineage.

This is the end-to-end slice of SURVEY.md §7.1.3 and the benchmark subject:
``images/sec`` for the full pipeline at two parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import synth
from ..grid import TileGrid
from ..operators import footprint, pip_join, tile_assign


def flagship(images: DataFrame, zones_pdf, grid: TileGrid | None = None,
             checkpoint=None) -> DataFrame:
    """-> (zone_id, tile_tag, n_images) counts."""
    grid = grid or TileGrid()
    fp = footprint.with_footprint(images)
    joined = pip_join.pip_join(fp, zones_pdf, keep_zone_name=False)
    tiled = tile_assign.assign_tiles(
        joined, grid.image_size, grid.cell_size, grid.edge, p=grid.p)
    counts = (tiled.groupBy("zone_id", "tile_tag")
                   .agg(F.count("*").alias("n_images")))
    if checkpoint is not None:
        checkpoint.record_df(counts, stage="flagship", key_col="tile_tag")
    return counts


def run_flagship_synthetic(spark, n_images: int = 100_000, n_zones: int = 64,
                           hot: bool = False, partitions: int = 64,
                           checkpoint=None) -> DataFrame:
    images = footprint_input(spark, n_images, partitions)
    zones = synth.zones_pandas(n_zones, hot=hot)
    return flagship(images, zones, checkpoint=checkpoint)


def footprint_input(spark, n_images: int, partitions: int = 64) -> DataFrame:
    """Metadata-only images table (the PIP/tile flagship never touches
    pixels, so generation skips payloads — column pruning made explicit)."""
    return synth.images_df(spark, n_images, partitions, with_bytes=False)
