"""Flagship pipeline invariants (SURVEY.md §5 strategy 3)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.plans.pipeline import (
    default_signal_dim,
    extract_range,
    map_signals,
    run_day,
    sensor_pipeline,
    signal_names,
    to_long,
    windowed_stats,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_windowed_stats_invariants(events):
    wide = windowed_stats(events, "ts", ("value",)).cache()
    # min <= mean <= max on every window
    bad = wide.where(
        (F.col("value_min") > F.col("value_mean"))
        | (F.col("value_mean") > F.col("value_max"))
    ).count()
    assert bad == 0
    # std is NULL iff the bin has exactly one row (sample std, ddof=1)
    counts = (
        events.groupBy(F.window("ts", "10 minutes").start.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = wide.join(counts, "window_start")
    assert joined.where((F.col("n") == 1) & F.col("value_std").isNotNull()).count() == 0
    assert joined.where((F.col("n") > 1) & F.col("value_std").isNull()).count() == 0


def test_window_starts_aligned(events):
    wide = windowed_stats(events, "ts", ("value",))
    misaligned = wide.where(
        (F.minute("window_start") % 10 != 0) | (F.second("window_start") != 0)
    ).count()
    assert misaligned == 0


def test_unpivot_null_pruning(events):
    wide = windowed_stats(events, "ts", ("value",))
    kept = to_long(wide, ["window_start"], signal_names(("value",)))
    raw = to_long(
        wide, ["window_start"], signal_names(("value",)), drop_null_values=False
    )
    n_windows = wide.count()
    assert raw.count() == n_windows * 4  # unpivot keeps NULLs like pd.melt
    assert kept.count() == raw.count() - raw.where(F.col("value").isNull()).count()
    assert kept.where(F.col("value").isNull()).count() == 0


def test_map_signals_unmapped_warning(spark, events):
    wide = windowed_stats(events, "ts", ("value",))
    long_df = to_long(wide, ["window_start"], signal_names(("value",)))
    # dimension missing 'value_std' and carrying an unreferenced extra row
    # (FIXTURES.md §2 variant) — unmapped names must be reported and dropped
    dim = spark.createDataFrame(
        [(1, "value_mean", None), (2, "value_min", None), (3, "value_max", None),
         (9, "never_used", None)],
        "id long, name string, description string",
    )
    seen = []
    mapped = map_signals(long_df, dim, log_unmapped=seen.append)
    assert seen == [["value_std"]]
    assert mapped.select("signal_id").distinct().count() == 3


def test_sensor_pipeline_schema(spark, events):
    dim = default_signal_dim(spark, ("value",))
    out = sensor_pipeline(events, dim, ts_col="ts", measures=("value",))
    assert [f.name for f in out.schema.fields] == ["timestamp", "signal_id", "value"]
    assert out.count() > 0


def test_extract_range_validation(events):
    with pytest.raises(ValueError, match="unknown columns"):
        extract_range(events, "ts", None, None, columns=["ts", "bogus"])


def test_extract_range_bounds(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 5, 0, 0),), (dt.datetime(2024, 1, 5, 12, 0),),
         (dt.datetime(2024, 1, 6, 0, 0),)],
        "timestamp timestamp",
    )
    s, e = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 6)
    # reference-compat inclusive end picks up the midnight boundary row
    # (SURVEY.md §2.10(1)); engine default half-open does not
    assert extract_range(df, "timestamp", s, e, inclusive_end=True).count() == 3
    assert extract_range(df, "timestamp", s, e, inclusive_end=False).count() == 2


def test_run_day_statuses(spark, events):
    dim = default_signal_dim(spark, ("value",))
    ok = run_day(events, dim, "2024-01-05", ts_col="ts", measures=("value",))
    assert ok.status == "success"
    assert ok.rows_loaded > 0
    empty = run_day(events, dim, "2030-01-01", ts_col="ts", measures=("value",))
    assert empty.status == "no_data"


def test_cli_end_to_end(spark, capsys):
    """§3.2 entry-point parity: one partition run over the deterministic
    seed prints the reference's documented numbers (1440 extracted rows,
    144 windows x 8 signals = 1152 loaded) and exits 0; an empty partition
    reports no_data, also exit 0."""
    import json

    from delfos_etl_pipeline_spark.cli import main

    assert main(["2025-08-11"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec == {
        "partition": "2025-08-11", "status": "success",
        "rows_extracted": 1440, "rows_loaded": 1152, "error": None,
    }
    assert main(["2030-01-01"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["status"] == "no_data"


def test_run_day_sink_executes_plan_once(spark, events):
    """VERDICT r1 #3: the sink path must run ONE job — the loaded-row count
    rides the sink action via Observation, not a second count() that
    re-executes the whole pipeline."""
    dim = default_signal_dim(spark, ("value",))
    acc = spark.sparkContext.accumulator(0)

    def bump(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    # mapInPandas blocks filter pushdown, so EVERY source row flows through
    # bump once per action over the input: extract count + sink = 2 reads
    # per row; the old post-sink recount made it 3.
    src = events.mapInPandas(bump, events.schema)
    n = events.count()
    res = run_day(
        src, dim, "2024-01-05", ts_col="ts", measures=("value",),
        sink=lambda df: df.write.format("noop").mode("overwrite").save(),
    )
    assert res.status == "success"
    assert res.rows_loaded > 0
    assert acc.value == 2 * n, f"source read {acc.value / n:.1f}x, want 2x"
