"""As-of join semantics on constructed frames."""

import datetime as dt

from delfos_etl_pipeline_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "u"), (2, _ts(12), "u"), (3, _ts(9), "v")],
        "event_id long, ts timestamp, user_id string",
    )
    right = spark.createDataFrame(
        [(_ts(9, 30), "u", 100.0), (_ts(11), "u", 200.0), (_ts(12), "u", 300.0)],
        "ts timestamp, user_id string, value double",
    )
    out = {
        r.event_id: r.value_asof
        for r in asof_join(left, right, on="ts", by=["user_id"]).collect()
    }
    assert out[1] == 100.0  # latest right ≤ 10:00
    assert out[2] == 300.0  # tie at 12:00 — inclusive, right row wins
    assert out[3] is None  # other key, no earlier right row


def test_asof_left_outer_keeps_all_left_rows(spark, sf_dir):
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(left, right, on="ts", by=["user_id"], value_cols=["value"])
    assert out.count() == left.count()


def test_asof_null_field_of_matched_row_stays_null(spark):
    """pandas merge_asof parity: the match is a ROW, not per-column — a NULL
    value in the most recent right row must NOT be papered over with an
    older non-null value (ADVICE r1, operators/asof.py)."""
    left = spark.createDataFrame(
        [(1, _ts(12), "u")], "event_id long, ts timestamp, user_id string"
    )
    right = spark.createDataFrame(
        [(_ts(10), "u", 100.0, "old"), (_ts(11), "u", None, "new")],
        "ts timestamp, user_id string, value double, tag string",
    )
    row = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value", "tag"]
    ).collect()[0]
    assert row.tag_asof == "new"
    assert row.value_asof is None  # NOT 100.0 carried from the older row
