"""As-of joins, backward and forward (SURVEY §2.3 extension).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.queries._registry import _t, query

# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.3 extension)
# ---------------------------------------------------------------------------


@query(
    "asof_join_events",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value, r.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """Backward as-of join: each purchase gets the latest error value at or
    before it per user — union-and-carry-forward pattern, ONE shuffle
    (operators/asof.py), vs DuckDB's native ASOF JOIN as oracle."""
    from delfos_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    return asof_join(left, right, on="ts", by=["user_id"], value_cols=["value"])


@query(
    "asof_join_forward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value, r.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND r.ts >= l.ts
    """,
)
def asof_join_forward(spark, sf_dir):
    """FORWARD as-of join (the direction QuestDB/ClickHouse expose beside
    backward): each purchase gets the nearest error value AT OR AFTER it
    per user — same union-and-carry single-shuffle plan scanned in
    descending event time (operators/asof.py direction='forward'), vs
    DuckDB's native ASOF JOIN with the flipped inequality as oracle."""
    from delfos_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    return asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value"],
        direction="forward",
    )


@query(
    "asof_join_tolerance",
    oracle="""
    WITH j AS (
      SELECT l.event_id, l.user_id, l.ts, l.value,
             r.value AS rv, r.ts AS rts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND r.ts <= l.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN rts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(rts) <= 21600000000
                THEN rv END AS value_asof,
           CAST(CASE WHEN rts IS NOT NULL
                      AND epoch_us(ts) - epoch_us(rts) <= 21600000000
                     THEN epoch_us(ts) - epoch_us(rts) END
                AS BIGINT) AS staleness_us_asof
    FROM j
    """,
)
def asof_join_tolerance(spark, sf_dir):
    """Tolerance-bounded backward as-of join (pandas merge_asof's
    ``tolerance``, QuestDB's bounded ASOF): each purchase gets the
    latest error value per user ONLY if it is at most 6 hours stale —
    older context is worse than none for feature engineering, and the
    emitted staleness_us lets the consumer threshold further without
    re-joining. Same single-shuffle union-and-carry plan as
    asof_join_events (the matched row's timestamp rides inside the
    carried struct); staleness compares exact integer epoch
    microseconds on both sides — never interval or hour-boundary date
    math (DuckDB's datediff counts boundary CROSSINGS, not elapsed
    time)."""
    from delfos_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        left,
        right,
        on="ts",
        by=["user_id"],
        value_cols=["value"],
        tolerance_us=6 * 3600 * 1_000_000,
    )


@query(
    "asof_join_nearest",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'error'
    ), bwd AS (
      SELECT l.event_id, r.value AS bv, r.ts AS bts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND r.ts <= l.ts
    ), fwd AS (
      SELECT l.event_id, r.value AS fv, r.ts AS fts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND r.ts >= l.ts
    )
    SELECT l.event_id, l.user_id, l.ts, l.value,
           CASE WHEN f.fts IS NULL
                  OR (b.bts IS NOT NULL
                      AND epoch_us(l.ts) - epoch_us(b.bts)
                          <= epoch_us(f.fts) - epoch_us(l.ts))
                THEN b.bv ELSE f.fv END AS value_asof,
           CAST(CASE WHEN f.fts IS NULL
                       OR (b.bts IS NOT NULL
                           AND epoch_us(l.ts) - epoch_us(b.bts)
                               <= epoch_us(f.fts) - epoch_us(l.ts))
                     THEN epoch_us(l.ts) - epoch_us(b.bts)
                     ELSE epoch_us(f.fts) - epoch_us(l.ts) END
                AS BIGINT) AS staleness_us
    FROM l LEFT JOIN bwd b USING (event_id)
    LEFT JOIN fwd f USING (event_id)
    """,
)
def asof_join_nearest(spark, sf_dir):
    """NEAREST-direction as-of join (pandas merge_asof
    direction='nearest'): each purchase gets the error value closest in
    time on EITHER side — the sensor-alignment semantics when context
    just after the fact is as good as context just before. Composed
    from the two directional single-shuffle passes (each the
    union-and-carry plan, with the matched timestamp carried so
    distance is data), then one per-row pick: backward wins ties
    (documented — pandas leaves the tie unspecified; a defined rule is
    what makes re-runs and the oracle deterministic). Distances are
    exact integer epoch microseconds (never interval math). Cost: two
    keyed window passes + one equi-join on the left key — still no
    range nested loop anywhere."""
    from delfos_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    huge = 10**15  # effectively unbounded; we only want the staleness col
    bwd = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value"],
        tolerance_us=huge,
    ).select(
        "event_id",
        F.col("value_asof").alias("bv"),
        F.col("staleness_us_asof").alias("bs"),
    )
    fwd = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value"],
        direction="forward", tolerance_us=huge,
    ).select(
        "event_id",
        F.col("value_asof").alias("fv"),
        F.col("staleness_us_asof").alias("fs"),
    )
    take_bwd = F.col("fs").isNull() | (
        F.col("bs").isNotNull() & (F.col("bs") <= F.col("fs"))
    )
    return (
        left.join(bwd, "event_id", "left")
        .join(fwd, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.when(take_bwd, F.col("bv")).otherwise(F.col("fv")).alias(
                "value_asof"
            ),
            F.when(take_bwd, F.col("bs"))
            .otherwise(F.col("fs"))
            .cast("bigint")
            .alias("staleness_us"),
        )
    )
