"""Interval-containment join: bucketed prefilter equals the naive theta join."""

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.operators.rangejoin import interval_join
from delfos_etl_pipeline_spark.sources.parquet import load_table


def test_interval_join_matches_theta_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = (
        ev.where(F.col("event_id") % 503 == 0)
        .select(
            F.col("event_id").alias("iv_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("w_end"),
        )
    )
    got = interval_join(ev, iv, "ts", "w_start", "w_end", grain_seconds=600)
    want = ev.join(
        iv, (ev.ts >= iv.w_start) & (ev.ts <= iv.w_end)
    )
    got_rows = sorted((r.event_id, r.iv_id) for r in got.collect())
    want_rows = sorted((r.event_id, r.iv_id) for r in want.collect())
    assert got_rows == want_rows
    assert len(got_rows) > 0


def test_interval_join_no_duplicate_pairs(spark):
    # interval spanning many buckets must still yield each pair once
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 11:59:00")],
        "pid long, ts_s string",
    ).select("pid", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 12:00:00")],
        "iv_id long, s string, e string",
    ).select(
        "iv_id", F.to_timestamp("s").alias("w_start"), F.to_timestamp("e").alias("w_end")
    )
    got = interval_join(pts, iv, "ts", "w_start", "w_end", grain_seconds=600)
    assert sorted((r.pid, r.iv_id) for r in got.collect()) == [(1, 10), (2, 10)]
