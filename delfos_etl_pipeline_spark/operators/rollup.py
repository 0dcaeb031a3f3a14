"""Hypertable-style multi-resolution rollup (continuous aggregates).

Time-series stores (TimescaleDB hypertables, Druid rollup segments)
maintain the same aggregate at several grains — 10 minutes for dashboards,
1 hour for alerting, 1 day for retention. The naive Spark translation
scans the raw table once per grain; this operator scans it ONCE at the
finest grain and derives every coarser grain from the finer *partials*:

    raw → 10-min (n, sum, min, max) → 1-hour (re-agg of partials) → 1-day

count/sum/min/max re-aggregate exactly (they are algebraic); mean is
derived sum/count at read time. At 100 TB the raw scan dominates — the
coarser rollups cost |finest windows| rows each, effectively free, and the
same cascade works incrementally: append a day's raw data, recompute only
that day's fine windows, re-roll the coarser grains from partials.

Sums accumulate in DECIMAL so re-aggregating partials is bit-identical to
aggregating raw rows directly (double sums are accumulation-order-
dependent; decimal sums are exact).

Resolutions must nest: each coarser grain a whole multiple of the finer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: (label, window duration) — finest first; each must divide the next.
DEFAULT_RESOLUTIONS: tuple[tuple[str, str], ...] = (
    ("10m", "10 minutes"),
    ("1h", "1 hour"),
    ("1d", "1 day"),
)


def multi_resolution_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    resolutions: tuple[tuple[str, str], ...] = DEFAULT_RESOLUTIONS,
) -> DataFrame:
    """One raw scan → stacked rollups at every resolution.

    Output: (resolution, window_start, n_rows, total, vmin, vmax,
    value_mean) with total rounded to 4 and mean to 6 decimals.
    """
    label0, dur0 = resolutions[0]
    dec = F.col(value_col).cast("decimal(18,6)")
    fine = df.groupBy(F.window(ts_col, dur0).start.alias("window_start")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec).alias("_total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )

    levels = {label0: fine}
    prev = fine
    for label, dur in resolutions[1:]:
        # persist each level feeding two consumers (its output branch +
        # the next coarser grain) — otherwise the union recomputes the
        # whole finer cascade per branch and the one-scan claim is void
        prev.persist()
        prev = prev.groupBy(
            F.window("window_start", dur).start.alias("window_start")
        ).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("_total").alias("_total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        levels[label] = prev

    from delfos_etl_pipeline_spark.functions.stable import round_half_up

    stacked = None
    for label, level in levels.items():
        part = level.select(
            F.lit(label).alias("resolution"),
            "window_start",
            "n_rows",
            # explicit half-up (functions/stable.py): the exact decimal
            # total makes x.xxxx5 ties COMMON, and engine round() tie
            # rules differ (Spark half-up vs DuckDB binary-value)
            round_half_up(F.col("_total").cast("double"), 4).alias("total"),
            "vmin",
            "vmax",
            # mean from the EXACT decimal total, divided in double space —
            # decimal/decimal division scale rules differ across engines
            round_half_up(
                F.col("_total").cast("double") / F.col("n_rows"), 6
            ).alias("value_mean"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    bucket: str = "1 day",
    tiebreak: str | None = None,
) -> DataFrame:
    """Time-weighted average per (group, bucket) for irregularly sampled
    series (TimescaleDB's time_weight('LOCF')): each sample's value holds
    until the next sample in the same group+bucket, weighted by that hold
    duration; the bucket's last sample carries no weight (its hold extends
    past the bucket edge).

    Hash-stable math: hold durations are exact integer microseconds
    (unix_micros of a lead() window), value is cast to DECIMAL(18,6), and
    the value·µs products are summed in decimal — so the final
    double-division is one IEEE op with bit-identical inputs on any
    engine. One shuffle on (group, bucket); per-row state is one lead.
    """
    from delfos_etl_pipeline_spark.functions.stable import round_half_up

    b = F.window(ts_col, bucket).start.alias("bucket_start")
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(group_col, "bucket_start").orderBy(*order)
    dt_us = F.lead(F.unix_micros(F.col(ts_col))).over(w) - F.unix_micros(
        F.col(ts_col)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    keep = [group_col, b, F.col(ts_col), dec.alias("_v")]
    if tiebreak is not None:
        keep.append(F.col(tiebreak))
    return (
        df.select(*keep)
        .withColumn("_dt_us", dt_us)
        .filter(F.col("_dt_us").isNotNull())
        .groupBy(group_col, "bucket_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.col("_v") * F.col("_dt_us")).alias("_wsum"),
            F.sum("_dt_us").alias("_tsum"),
        )
        .select(
            group_col,
            "bucket_start",
            "n_spans",
            round_half_up(
                F.col("_wsum").cast("double") / F.col("_tsum").cast("double"), 6
            ).alias("twa"),
        )
    )


def fine_partials(
    df: DataFrame, ts_col: str, value_col: str, duration: str = "10 minutes"
) -> DataFrame:
    """Algebraic partial state (n, exact decimal sum, min, max) per finest
    window — the stored representation of a continuous aggregate. Every
    component re-aggregates exactly, so partials from disjoint raw slices
    merge into the same state a full recompute would produce."""
    dec = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(
        F.window(ts_col, duration).start.alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec).alias("_total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )


def merge_partials(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental continuous-aggregate maintenance: fold a new slice's
    partials into the stored ones. Append a day of raw data → compute
    partials for that day only → merge; windows touched by both sides
    combine exactly (decimal sums are order-independent), untouched
    windows pass through. At 100 TB this turns rollup maintenance from a
    full-table rescan into a job sized by the appended slice."""
    return (
        existing.unionByName(delta)
        .groupBy("window_start")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("_total").alias("_total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
