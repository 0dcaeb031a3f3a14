"""Ordered-funnel and cohort-retention analytics over event streams.

Product-analytics engines (Amplitude, Mixpanel, ClickHouse's
windowFunnel/retention) answer two stock questions a plain GROUP BY
can't: "how many users completed step1 → step2 → … IN ORDER" and "of the
users who first appeared in week W, how many came back k weeks later".

Both are expressed here as single-shuffle window/aggregate plans:

- ``funnel_stages``: stacked running-max flags over one (user, ts) sort —
  flag_i(row) = 1 iff steps 1..i-1 were all seen before a step_i event at
  or before this row. One exchange + one sort per user partition; each
  additional funnel step is another window expression over the SAME sort
  order (Catalyst collapses them into one Window node chain, no extra
  shuffle), then a two-level count aggregation.
- ``retention_cohorts``: cohort week = min(event week) per user via an
  unbounded window (keeps rows — avoids the agg+rejoin double shuffle),
  then distinct (user, offset) → per-cohort distinct-user counts.

Scale posture (100 TB): state per user is O(steps) running flags, not the
event list; no collect, no cross join; the user-id shuffle is the single
irreducible exchange, and both plans survive skewed power users (flags
and distinct both reduce per-row state to constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: tuple[str, ...],
    order_tiebreak: str,
) -> DataFrame:
    """Strictly-ordered funnel completion counts.

    Returns one row: ``n_users`` plus ``n_step_i`` (users whose history
    contains step1 ≤ step2 ≤ … ≤ step_i in event order — later steps must
    occur at-or-after the row where the previous flag first became 1).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events
    prev_flag = None
    flag_cols: list[str] = []
    for i, step in enumerate(steps, start=1):
        hit = F.col(type_col) == F.lit(step)
        if prev_flag is not None:
            hit = hit & (F.col(prev_flag) == 1)
        flag = f"_seen_{i}"
        df = df.withColumn(
            flag, F.max(F.when(hit, 1).otherwise(0)).over(w)
        )
        flag_cols.append(flag)
        prev_flag = flag
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in flag_cols]
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[
            F.sum(c).cast("bigint").alias(f"n_step_{i}")
            for i, c in enumerate(flag_cols, start=1)
        ],
    )


def retention_cohorts(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_active).

    cohort_week = Monday-truncated week of the user's first event;
    week_offset = whole weeks between that and each active week;
    n_active = distinct users from the cohort active at that offset.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    with_cohort = events.select(
        F.col(user_col).alias("user"),
        wk.alias("_wk"),
    ).withColumn("cohort_week", F.min("_wk").over(Window.partitionBy("user")))
    offs = (
        (F.unix_timestamp("_wk") - F.unix_timestamp("cohort_week"))
        / F.lit(604800)
    ).cast("bigint")
    return (
        with_cohort.select("user", "cohort_week", offs.alias("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
