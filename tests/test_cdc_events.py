"""CDC maintenance + event-analytics operators (operators/cdc.py,
operators/funnel.py, operators/rollup.py:time_weighted_avg).

Semantics are pinned on tiny hand-computed inputs (the sf oracles cover
the full-table differential); plan posture is asserted where it is the
point of the design (single exchange, no collect)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_latest_change_wins(spark):
    from delfos_etl_pipeline_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [Row(k=1, v=10.0, ts=_ts(1)), Row(k=2, v=20.0, ts=_ts(1)),
         Row(k=3, v=30.0, ts=_ts(1))]
    )
    chg = spark.createDataFrame(
        [
            # k=1: update then delete — delete wins (later ts)
            Row(k=1, v=11.0, ts=_ts(2), sid=1, op="U"),
            Row(k=1, v=0.0, ts=_ts(3), sid=2, op="D"),
            # k=2: delete then update — update wins
            Row(k=2, v=22.0, ts=_ts(3), sid=3, op="U"),
            Row(k=2, v=0.0, ts=_ts(2), sid=4, op="D"),
            # k=4: brand-new key inserted
            Row(k=4, v=40.0, ts=_ts(2), sid=5, op="U"),
        ]
    )
    out = {
        r["k"]: r
        for r in merge_upsert(base, chg, "k", "op", ("ts", "sid")).collect()
    }
    assert set(out) == {2, 3, 4}          # k=1 deleted
    assert out[2]["v"] == 22.0 and out[2]["was_updated"] == 1
    assert out[3]["v"] == 30.0 and out[3]["was_updated"] == 0
    assert out[4]["v"] == 40.0 and out[4]["was_updated"] == 1


def test_merge_upsert_tie_breaks_on_sequence(spark):
    from delfos_etl_pipeline_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame([Row(k=1, v=1.0, ts=_ts(1))])
    chg = spark.createDataFrame(
        [Row(k=1, v=5.0, ts=_ts(2), sid=1, op="U"),
         Row(k=1, v=7.0, ts=_ts(2), sid=2, op="U")]  # same ts, higher sid
    )
    (row,) = merge_upsert(base, chg, "k", "op", ("ts", "sid")).collect()
    assert row["v"] == 7.0


# ---------------------------------------------------------------------------
# scd2_from_changes
# ---------------------------------------------------------------------------


def test_scd2_intervals_chain_and_flag_current(spark):
    from delfos_etl_pipeline_spark.operators.cdc import scd2_from_changes

    chg = spark.createDataFrame(
        [Row(k=1, v=1.0, ts=_ts(1), sid=1),
         Row(k=1, v=2.0, ts=_ts(5), sid=2),
         Row(k=2, v=9.0, ts=_ts(3), sid=3)]
    )
    rows = sorted(
        scd2_from_changes(chg, "k", "ts", ("ts", "sid"), ("v",)).collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    assert [r["is_current"] for r in rows] == [0, 1, 1]
    assert rows[0]["valid_to"] == _ts(5)      # closed by next change
    assert rows[1]["valid_to"] is None        # open interval
    # intervals tile: no gap/overlap between consecutive versions
    assert rows[0]["valid_to"] == rows[1]["valid_from"]


# ---------------------------------------------------------------------------
# funnel_stages
# ---------------------------------------------------------------------------


def test_funnel_requires_order(spark):
    from delfos_etl_pipeline_spark.operators.funnel import funnel_stages

    ev = spark.createDataFrame(
        [
            # user 1 completes a→b in order
            Row(u=1, ts=_ts(1), t="a", sid=1),
            Row(u=1, ts=_ts(2), t="b", sid=2),
            # user 2 has b BEFORE a — step 2 must not count
            Row(u=2, ts=_ts(1), t="b", sid=3),
            Row(u=2, ts=_ts(2), t="a", sid=4),
            # user 3 only a
            Row(u=3, ts=_ts(1), t="a", sid=5),
        ]
    )
    (row,) = funnel_stages(ev, "u", "ts", "t", ("a", "b"), "sid").collect()
    assert row["n_users"] == 3
    assert row["n_step_1"] == 3
    assert row["n_step_2"] == 1


def test_funnel_single_exchange(spark, sf_dir):
    """All four stacked windows + both aggregates ride ONE hash exchange
    on user_id (the funnel's scale contract)."""
    from delfos_etl_pipeline_spark.operators.funnel import funnel_stages
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    df = funnel_stages(
        ev, "user_id", "ts", "event_type",
        ("signup", "view", "click", "purchase"), "event_id",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # hashpartitioning exchanges only (ignore the final single-partition
    # gather for the global one-row aggregate)
    n_hash = len(re.findall(r"hashpartitioning\(user_id", plan))
    assert n_hash == 1, plan


# ---------------------------------------------------------------------------
# retention_cohorts
# ---------------------------------------------------------------------------


def test_retention_offsets(spark):
    from delfos_etl_pipeline_spark.operators.funnel import retention_cohorts

    ev = spark.createDataFrame(
        [
            Row(u=1, ts=dt.datetime(2024, 1, 1)),    # Mon wk0
            Row(u=1, ts=dt.datetime(2024, 1, 10)),   # wk1
            Row(u=1, ts=dt.datetime(2024, 1, 12)),   # wk1 (same week, once)
            Row(u=2, ts=dt.datetime(2024, 1, 2)),    # wk0 only
        ]
    )
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in retention_cohorts(ev, "u", "ts").collect()
    }
    wk0 = dt.datetime(2024, 1, 1)
    assert out[(wk0, 0)] == 2
    assert out[(wk0, 1)] == 1
    assert len(out) == 2


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------


def test_twa_weights_by_hold_duration(spark):
    from delfos_etl_pipeline_spark.operators.rollup import time_weighted_avg

    # value 0 held for 3h, value 10 held for 1h → TWA = 2.5; the final
    # sample (24.0) opens no span and must carry no weight
    ev = spark.createDataFrame(
        [Row(g="a", ts=_ts(1, 0), v=0.0),
         Row(g="a", ts=_ts(1, 3), v=10.0),
         Row(g="a", ts=_ts(1, 4), v=24.0)]
    )
    (row,) = time_weighted_avg(ev, "ts", "v", "g", bucket="1 day").collect()
    assert row["n_spans"] == 2
    assert row["twa"] == pytest.approx(2.5)


def test_twa_resets_per_bucket(spark):
    from delfos_etl_pipeline_spark.operators.rollup import time_weighted_avg

    # two days: the cross-midnight hold must NOT leak into day 2
    ev = spark.createDataFrame(
        [Row(g="a", ts=_ts(1, 10), v=1.0),
         Row(g="a", ts=_ts(1, 12), v=3.0),
         Row(g="a", ts=_ts(2, 1), v=100.0),
         Row(g="a", ts=_ts(2, 2), v=200.0)]
    )
    out = {r["bucket_start"]: r for r in
           time_weighted_avg(ev, "ts", "v", "g", bucket="1 day").collect()}
    assert out[_ts(1)]["twa"] == pytest.approx(1.0)   # only the 10→12 span
    assert out[_ts(2)]["twa"] == pytest.approx(100.0)


def test_ewma_first_row_equals_value(spark, sf_dir):
    """With a single observation in frame, the normalized weighted mean
    is the observation itself (up to the 6-dp rounding contract)."""
    from delfos_etl_pipeline_spark.queries import QUERIES

    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    first = (
        ev.groupBy("event_type")
        .agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
             F.min_by("value", F.struct("ts", "event_id")).alias("value"))
        .collect()
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in QUERIES["w8_ewma"](spark, sf_dir).collect()
    }
    for r in first:
        assert abs(got[r["event_id"]] - round(r["value"], 6)) < 2e-6


def test_cusum_returns_to_zero(spark, sf_dir):
    """CUSUM of deviations from the series' own mean must end near zero
    (exactly zero up to the 12-dp deviation rounding x n_days)."""
    from delfos_etl_pipeline_spark.queries import QUERIES

    rows = QUERIES["cusum_changepoint"](spark, sf_dir).collect()
    last = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        last[r["event_type"]] = r["cusum"]
    for t, c in last.items():
        assert abs(c) < 1e-4, (t, c)
