"""Reporting/introspection analytics — the reference's Dagster assets
``alvo_database_summary`` and ``alvo_database_structure``
(/root/reference/dagster/assets.py:189-394) as reusable plans over the
engine's long fact + signal dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_signal_summary(fact: DataFrame, dim: DataFrame) -> DataFrame:
    """A5/J3/O3 — per-signal COUNT/AVG/MIN/MAX/STDDEV ordered by
    dimension id (assets.py:201-210; STDDEV variant :327-340 — sample
    stddev, like Postgres STDDEV; O3 stable report ordering :209)."""
    joined = fact.join(F.broadcast(dim), fact.signal_id == dim.id, "inner")
    return (
        joined.groupBy("id", "name")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.stddev_samp("value").alias("stddev_value"),
        )
        .orderBy("id")
    )


def per_signal_summary_with_empty(fact: DataFrame, dim: DataFrame) -> DataFrame:
    """J4 variant — LEFT join keeps signals with zero fact rows
    (assets.py:337)."""
    joined = dim.join(fact, fact.signal_id == dim.id, "left")
    return (
        joined.groupBy("id", "name")
        .agg(
            F.count("value").alias("n_records"),
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.stddev_samp("value").alias("stddev_value"),
        )
        .orderBy("id")
    )


def daily_counts(fact: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """A6 — per-day record counts (assets.py:216-221)."""
    return (
        fact.groupBy(F.to_date(ts_col).alias("date"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy("date")
    )


def latest_sample(fact: DataFrame, dim: DataFrame, k: int = 10) -> DataFrame:
    """O2 — latest-k joined sample rows (assets.py:311-322) —
    TakeOrderedAndProject, never a global sort."""
    joined = fact.join(F.broadcast(dim), fact.signal_id == dim.id, "inner")
    return (
        joined.select("timestamp", "signal_id", "name", "value")
        .orderBy(F.desc("timestamp"), "signal_id")
        .limit(k)
    )
