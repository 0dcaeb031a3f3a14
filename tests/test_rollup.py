"""Multi-resolution rollup: partial re-aggregation exactness + one raw scan."""

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.operators.rollup import multi_resolution_rollup
from delfos_etl_pipeline_spark.sources.parquet import load_table


def test_rollup_matches_direct_grouping(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = multi_resolution_rollup(ev, "ts", "value")
    day = {r.window_start: r for r in out.where(F.col("resolution") == "1d").collect()}
    want = {
        r.window_start: r
        for r in ev.groupBy(F.window("ts", "1 day").start.alias("window_start"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert set(day) == set(want)
    for k, w in want.items():
        g = day[k]
        assert g.n_rows == w.n_rows and g.vmin == w.vmin and g.vmax == w.vmax
    # sanity: hourly rows n_rows sum to daily
    hours = out.where(F.col("resolution") == "1h").agg(F.sum("n_rows")).first()[0]
    days = out.where(F.col("resolution") == "1d").agg(F.sum("n_rows")).first()[0]
    assert hours == days


def test_rollup_reuses_cached_levels(spark, sf_dir):
    """The coarser grains and output branches read the persisted finer
    levels (InMemoryRelation), not fresh raw scans. (A raw string count of
    'Scan parquet' misleads: InMemoryRelation nodes print the file scan
    they cached.)"""
    ev = load_table(spark, sf_dir, "events")
    out = multi_resolution_rollup(ev, "ts", "value")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # 5 cache reads: 10m level feeds (its branch + 1h build + 1h's two
    # consumers transitively) — anything >= 4 proves the cascade reuses
    assert plan.count("InMemoryRelation") >= 4, plan


def test_gap_fill_densify_and_forward_fill(spark):
    """Missing buckets materialize with NULL observations; forward fill
    carries the last value; leading gap stays NULL."""
    import datetime as dt

    from delfos_etl_pipeline_spark.operators.gapfill import densify, forward_fill

    h = lambda i: dt.datetime(2024, 1, 1, i)
    bucketed = spark.createDataFrame(
        [("a", h(1), 10.0), ("a", h(4), 40.0), ("b", h(2), 2.0)],
        "k string, h timestamp, v double",
    )
    dense = densify(bucketed, "k", "h", "1 hour")
    assert dense.count() == 4 + 1  # a: hours 1..4, b: hour 2
    filled = forward_fill(dense, "k", "h", "v")
    got = {(r.k, r.h.hour): (r.v, r.v_filled) for r in filled.collect()}
    assert got[("a", 1)] == (10.0, 10.0)
    assert got[("a", 2)] == (None, 10.0)  # gap forward-filled
    assert got[("a", 3)] == (None, 10.0)
    assert got[("a", 4)] == (40.0, 40.0)
    assert got[("b", 2)] == (2.0, 2.0)


def test_incremental_partials_match_full_recompute(spark, sf_dir):
    """Continuous-aggregate maintenance: partials(first 20 days) merged
    with partials(rest) equal partials(all) EXACTLY — counts, decimal
    sums, min/max — so incremental daily maintenance loses nothing vs a
    full rescan."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.operators.rollup import (
        fine_partials,
        merge_partials,
    )
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    full = fine_partials(ev, "ts", "value")
    merged = merge_partials(
        fine_partials(ev.filter(F.col("ts") < cut), "ts", "value"),
        fine_partials(ev.filter(F.col("ts") >= cut), "ts", "value"),
    )
    f = {r["window_start"]: r for r in full.collect()}
    m = {r["window_start"]: r for r in merged.collect()}
    assert set(f) == set(m)
    for k in f:
        assert f[k]["n_rows"] == m[k]["n_rows"]
        assert f[k]["_total"] == m[k]["_total"]       # exact decimal
        assert f[k]["vmin"] == m[k]["vmin"] and f[k]["vmax"] == m[k]["vmax"]


def test_approx_percentile_within_bound_of_exact_twin(spark, sf_dir):
    """The *_approx percentile queries embed the sketch's rank-error
    guarantee as ok-flags; assert every flag holds and the approx values
    track the exact twins (VERDICT r3 item 5)."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.queries import QUERIES

    rows = QUERIES["a_percentiles_approx"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.p50_ok and r.p90_ok and r.p99_ok for r in rows)

    daily = QUERIES["percentiles_daily_approx"](spark, sf_dir)
    bad = daily.where(
        ~F.col("p50_ok") | ~F.col("p95_ok") | ~F.col("p99_ok")
    ).count()
    assert bad == 0
    # group structure matches the exact twin exactly: same (type, day)
    # keys, same group sizes (value comparison between nearest-rank and
    # interpolated percentiles is order-statistics noise on the tiny
    # sf0.001 groups; the rank-bound ok-flags above are the value claim)
    exact = {
        (r.event_type, r.day): r.n
        for r in QUERIES["percentiles_daily"](spark, sf_dir).collect()
    }
    approx = {(r.event_type, r.day): r.n for r in daily.collect()}
    assert approx == exact


def test_rolling_median_pandas_equals_declarative(spark, sf_dir):
    """The O(n log frame) applyInPandas rolling median must agree with the
    oracle-certified declarative window-percentile form on every row
    (both interpolate the even-frame midpoint)."""
    from delfos_etl_pipeline_spark.operators.rolling import rolling_median_pandas
    from delfos_etl_pipeline_spark.queries import QUERIES
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    declarative = {
        (r.event_id): r.rolling_median
        for r in QUERIES["w6_rolling_median"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    fast = rolling_median_pandas(
        ev, "event_type", ("ts", "event_id"), "value", frame=100
    ).collect()
    assert len(fast) == len(declarative)
    for r in fast:
        assert declarative[r.event_id] == pytest.approx(
            r.rolling_median, abs=1e-6
        ), r.event_id
