"""Bucketed co-located joins — pre-shuffle once at write time, join free
forever after.

At 100 TB the recurring cost of a fact⋈fact join is the exchange of both
sides on the join key, every query. Bucketing moves that shuffle to WRITE
time: both tables are persisted pre-hashed into the same number of
buckets on the join key, and every subsequent join between them plans
with NO Exchange on either side (asserted in tests/test_bucketing.py) —
the standard layout for a fact table joined on the same key by many
queries (lineitem⋈orders on the order key here).

Bucket-count choice at scale: buckets ≈ target parallelism × small
multiple; both tables MUST use the same count or Spark re-shuffles the
mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist pre-hashed into ``num_buckets`` on ``bucket_cols`` (and
    optionally sorted within buckets, which lets sort-merge joins skip
    the per-task sort too)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
