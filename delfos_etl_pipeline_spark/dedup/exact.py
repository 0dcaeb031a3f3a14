"""Exact deduplication — hash-groupBy.

Training-data-pipeline extension (SURVEY.md §7 M5): not in the reference,
which only append-duplicates (T4). Scale posture: one shuffle keyed on the
content hash; at 100 TB hash the content (md5/xxhash64) instead of
shuffling multi-KB text values as the key — the hash is computed map-side
and the shuffle carries 16 bytes per row instead of the document body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    hash_key: bool = True,
) -> DataFrame:
    """Keep exactly one row per distinct ``key_cols`` value — the one with
    the smallest ``order_col`` (deterministic, unlike ``dropDuplicates``).

    ``hash_key=True`` shuffles on md5 of the concatenated keys rather than
    the raw values: essential when keys are long documents.
    """
    if hash_key:
        key = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in key_cols]))
    else:
        key = F.concat_ws("\x1f", *[F.col(c) for c in key_cols])
    w = Window.partitionBy(key).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_summary(
    df: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """Per duplicate-group summary: surviving id (min) + multiplicity.
    Pure groupBy-agg — map-side partial aggregation, single shuffle."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )
