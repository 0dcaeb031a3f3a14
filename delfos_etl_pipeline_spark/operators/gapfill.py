"""Time-series gap filling — densify a bucketed series and forward-fill.

The reference's sensor domain (1-minute readings, 10-minute rollups —
/root/reference/etl/etl_process.py:86-96) assumes a dense grid; real
feeds drop readings. This operator materializes the missing buckets per
key (grid = sequence(min, max, step) exploded — no driver-side loop) and
carries the last observation forward with an ignore-nulls window.

Scale posture: the grid explode is narrow (one sequence per key, built
from a tiny per-key bounds aggregate); the fill is ONE window pass
partitioned by key and ordered by bucket — state is a single carried
row per key, and the shuffle is the same (key)-partitioning the
downstream per-key consumers want anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify(
    bucketed: DataFrame,
    key_col: str,
    bucket_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """All (key, bucket) slots between each key's first and last observed
    bucket — observed columns NULL on the synthesized rows."""
    bounds = bucketed.groupBy(key_col).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )
    return grid.join(bucketed, [key_col, bucket_col], "left")


def forward_fill(
    dense: DataFrame, key_col: str, bucket_col: str, value_col: str
) -> DataFrame:
    """Carry the last non-null observation forward within each key (the
    leading run before the first observation stays NULL)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.withColumn(
        f"{value_col}_filled", F.last(value_col, ignorenulls=True).over(w)
    )
