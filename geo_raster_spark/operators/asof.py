"""As-of (most-recent-prior) join — the time-series lookup the task brief
lists among custom operators Spark lacks natively.

Scalable formulation (no range cross-product): UNION the two sides with a
source tag, sort each ``by``-partition by (time, source), and carry the
right side's values forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window — each left row then holds the latest right row
with ``r.time <= l.time`` (inclusive; right sorts before left on ties).
One shuffle on ``by``; partitions are bounded by per-key row counts, the
same profile as any sessionization."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, time_col: str = "ts",
              by: str = "user_id", value_cols: list | None = None) -> DataFrame:
    """For each left row: append the ``value_cols`` of the most recent right
    row with the same ``by`` key and ``right.time <= left.time`` (null when
    no prior right row exists — LEFT as-of semantics).

    Right rows should be unique per (by, time) — pre-aggregate otherwise
    (ties would resolve by window order, not a defined rule).

    Raises if any value column already exists on ``left``: unionByName would
    merge the columns and ``last(ignorenulls)`` would silently carry the
    LEFT rows' own values forward, corrupting as-of semantics."""
    value_cols = value_cols or [c for c in right.columns
                                if c not in (time_col, by)]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: value column(s) {sorted(clash)} already exist on the "
            f"left side — rename them on one side (the union+carry-forward "
            f"window cannot distinguish left and right values of one name)")
    l = left.withColumn("_src", F.lit(1))
    r = right.select(by, time_col, *value_cols).withColumn("_src", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(by).orderBy(time_col, "_src")
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("_src") == 1).drop("_src")
