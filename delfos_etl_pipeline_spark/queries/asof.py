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
