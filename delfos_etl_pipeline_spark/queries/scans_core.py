"""Scans, projections, range predicates, aggregations, and the streaming topologies (SURVEY §2.1, §2.2, §2.4, §2.9).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.functions.stable import (
    round_half_up,
    sql_mean,
    sql_std,
)
from delfos_etl_pipeline_spark.plans.pipeline import (
    default_signal_dim,
    signal_names,
    to_long,
    windowed_stats,
)
from delfos_etl_pipeline_spark.queries._registry import _t, query
from delfos_etl_pipeline_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# S/P — scans, projections, range predicates (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


@query(
    "s1_scan_project_filter",
    oracle="""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def s1_scan_project_filter(spark, sf_dir):
    """S1+P1+P3 — projected scan with inclusive timestamp-range predicate,
    the API's dynamic SELECT (/root/reference/api/app/database.py:41-64).
    Both the projection and the range filter reach the parquet scan
    (PushedFilters / ReadSchema in .explain)."""
    from delfos_etl_pipeline_spark.sources.parquet import load_table_range

    ev = load_table_range(
        spark, sf_dir, "events", "ts",
        "2024-01-10 00:00:00", "2024-01-20 00:00:00", inclusive_end=True,
    )
    return ev.select("event_id", "ts", "event_type", "value")


# ---------------------------------------------------------------------------
# A — aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "a1_tumbling_window_agg",
    oracle=f"""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           {sql_mean("value")}          AS value_mean,
           min(value)                   AS value_min,
           max(value)                   AS value_max,
           {sql_std("value")}           AS value_std
    FROM events
    GROUP BY 1
    """,
)
def a1_tumbling_window_agg(spark, sf_dir):
    """A1 — the flagship tumbling 10-minute multi-aggregate
    (pandas resample('10T').agg(mean/min/max/std),
    /root/reference/etl/etl_process.py:86-96). stddev is SAMPLE std
    (ddof=1) — SURVEY §2.10(2). stable=True: mean/std from exact decimal
    sums with explicit half-up rounding, so the hash can't drift on
    accumulation order or round() tie semantics (functions/stable.py)."""
    ev = _t(spark, sf_dir, "events")
    return windowed_stats(ev, "ts", ("value",), "10 minutes", stable=True)


@query(
    "a1_pipeline_long",
    oracle=f"""
    WITH wide AS (
      SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
             {sql_mean("value")}          AS value_mean,
             min(value)                   AS value_min,
             max(value)                   AS value_max,
             {sql_std("value")}           AS value_std
      FROM events GROUP BY 1
    ), long AS (
      SELECT window_start, 'value_mean' AS signal_name, value_mean AS value FROM wide
      UNION ALL SELECT window_start, 'value_min',  value_min  FROM wide
      UNION ALL SELECT window_start, 'value_max',  value_max  FROM wide
      UNION ALL SELECT window_start, 'value_std',  value_std  FROM wide
    ), dim(id, name) AS (
      VALUES (1, 'value_mean'), (2, 'value_min'), (3, 'value_max'), (4, 'value_std')
    )
    SELECT l.window_start AS timestamp, CAST(d.id AS BIGINT) AS signal_id,
           l.value AS value
    FROM long l JOIN dim d ON l.signal_name = d.name
    WHERE l.value IS NOT NULL
    """,
)
def a1_pipeline_long(spark, sf_dir):
    """The full flagship pipeline e2e: A1 window agg → R1 unpivot → A2 null
    pruning → J1/J2 broadcast dim join → P4 projection — the entire
    reference transform+load (/root/reference/dagster/assets.py:75-126)
    as one declarative plan."""
    ev = _t(spark, sf_dir, "events")
    dim = default_signal_dim(spark, ("value",))
    wide = windowed_stats(ev, "ts", ("value",), "10 minutes", stable=True)
    from delfos_etl_pipeline_spark.plans.pipeline import map_signals

    long_df = to_long(wide, ["window_start"], signal_names(("value",)))
    mapped = map_signals(long_df, dim)
    return mapped.select(
        F.col("window_start").alias("timestamp"), "signal_id", "value"
    )


@query(
    "a5_group_multi_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)      AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6)      AS avg_disc,
           count(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a5_group_multi_agg(spark, sf_dir):
    """A5 — grouped multi-aggregate (TPC-H Q1 shape), the per-signal
    summary report (/root/reference/dagster/assets.py:201-210) scaled to a
    real fact table. Partial (map-side) aggregation + single shuffle on the
    group keys; survives 100× scale because group cardinality is tiny."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a6_daily_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def a6_daily_rollup(spark, sf_dir):
    """A6 — grouped count by computed day key
    (/root/reference/dagster/assets.py:216-221)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "a4_minmax_scalar",
    oracle="""
    SELECT min(ts) AS ts_min, max(ts) AS ts_max, count(*) AS n_rows
    FROM events
    """,
)
def a4_minmax_scalar(spark, sf_dir):
    """A3/A4 — whole-table scalar aggregates (date-range + cardinality,
    /root/reference/api/app/database.py:66-74). With parquet aggregate
    pushdown these come straight from footer stats — no data scan."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "a7_column_stats",
    oracle="""
    SELECT count(*)                    AS n_rows,
           round(avg(value), 6)        AS value_mean,
           min(value)                  AS value_min,
           max(value)                  AS value_max,
           round(stddev_samp(value), 6) AS value_std
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-11 00:00:00'
    """,
)
def a7_column_stats(spark, sf_dir):
    """A7 — ungrouped whole-column statistics over one day's raw slice
    (the run-metadata stats, /root/reference/dagster/assets.py:155-166);
    sample stddev per §2.10-2. One partial-agg pass, range filter pushed
    to the scan."""
    from delfos_etl_pipeline_spark.sources.parquet import load_table_range

    ev = load_table_range(
        spark, sf_dir, "events", "ts",
        "2024-01-10 00:00:00", "2024-01-11 00:00:00", inclusive_end=False,
    )
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("value"), 6).alias("value_mean"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.round(F.stddev_samp("value"), 6).alias("value_std"),
    )


@query(
    "a8_distinct_values",
    oracle="SELECT DISTINCT event_type FROM events",
)
def a8_distinct_values(spark, sf_dir):
    """A8 — distinct-value collection (unmapped-signal introspection,
    /root/reference/etl/etl_process.py:145)."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()


@query(
    "agg_rollup_hierarchy",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date, count(*) AS n_events
    FROM events
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
    """,
)
def agg_rollup_hierarchy(spark, sf_dir):
    """ROLLUP grouping-sets — beyond the reference's surface (SURVEY §2.4
    notes Spark provides these free); subtotal + grand-total rows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.to_date("ts").alias("event_date"))
        .rollup("event_type", "event_date")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "a1_sliding_window_agg",
    oracle=f"""
    WITH b AS (
      SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
             value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 10 MINUTE, ts, INTERVAL 5 MINUTE) AS window_start,
             value FROM events
    )
    SELECT window_start,
           count(*) AS n_events,
           {sql_mean("value")} AS value_mean
    FROM b GROUP BY 1
    """,
)
def a1_sliding_window_agg(spark, sf_dir):
    """Sliding (hopping) window: 10-minute windows every 5 minutes — each
    event lands in exactly 2 windows. Beyond the reference's tumbling-only
    surface; same single-shuffle group-by plan. Mean via the hash-stable
    decimal formula (functions/stable.py)."""
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec).alias("_s"),
            F.count("value").alias("_n"),
        )
        .select(
            "window_start",
            "n_events",
            round_half_up(F.col("_s").cast("double") / F.col("_n"), 6).alias(
                "value_mean"
            ),
        )
    )


_SESSIONS_ORACLE = """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sess GROUP BY user_id, session_no
    """


@query("session_windows", oracle=_SESSIONS_ORACLE)
def session_windows(spark, sf_dir):
    """Session windows (30-minute inactivity gap) per user via Spark's
    native session_window — stateful sessionization as ONE group-by (the
    oracle re-derives sessions with lag+cumsum, proving semantics match)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "streaming_window_agg",
    oracle=f"""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           {sql_mean("value")}          AS value_mean,
           min(value)                   AS value_min,
           max(value)                   AS value_max,
           {sql_std("value")}           AS value_std
    FROM events
    GROUP BY 1
    """,
)
def streaming_window_agg(spark, sf_dir):
    """A1 under Structured Streaming: file-source stream over the events
    parquet, watermarked tumbling windows, availableNow drain to a memory
    sink — and the result STILL hash-matches the batch oracle (batch/
    stream parity by construction, streaming/runner.py)."""
    import os as _os
    import tempfile

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
        streaming_windowed_stats,
    )

    # stream the ns-normalized events as a fresh parquet dir (the file
    # source needs a directory it can treat as an append log)
    src = _os.path.join(tempfile.mkdtemp(prefix="delfos_stream_"), "events")
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    ev.write.parquet(src)

    stream = read_parquet_stream(spark, src, ev.schema)
    result = streaming_windowed_stats(
        stream, "ts", ("value",), "10 minutes", watermark="1 hour", stable=True
    )
    q = run_available_now(
        result,
        _os.path.join(tempfile.mkdtemp(prefix="delfos_ckpt_"), "ckpt"),
        "streaming_window_agg_sink",
        output_mode="complete",
    )
    q.awaitTermination(300)
    return spark.table("streaming_window_agg_sink")


@query(
    "streaming_stream_join",
    oracle="""
    SELECT a.user_id, a.ts AS view_ts, b.ts AS purchase_ts,
           round(b.value, 4) AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def streaming_stream_join(spark, sf_dir):
    """Stream-stream inner join (view→purchase attribution within 30
    minutes): both sides are watermarked file-source streams, the
    event-time band bounds the join state Spark must hold (each side's
    buffer expires once the other side's watermark passes the band), and
    the availableNow drain must reproduce the batch self-join oracle
    exactly."""
    import os as _os
    import tempfile

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
    )

    src = _os.path.join(tempfile.mkdtemp(prefix="delfos_ssj_"), "events")
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "value")
    ev.write.parquet(src)

    views = (
        read_parquet_stream(spark, src, ev.schema)
        .where(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("a_user"), F.col("ts").alias("view_ts"))
    )
    purchases = (
        read_parquet_stream(spark, src, ev.schema)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("a_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        F.round("value", 4).alias("purchase_value"),
    )
    q = run_available_now(
        joined,
        _os.path.join(tempfile.mkdtemp(prefix="delfos_ssj_ckpt_"), "ckpt"),
        "streaming_stream_join_sink",
        output_mode="append",
    )
    q.awaitTermination(300)
    return spark.table("streaming_stream_join_sink")


@query(
    "streaming_stateful_totals",
    oracle="""
    SELECT user_id,
           count(value)          AS n,
           round(sum(value), 4)  AS total,
           min(value)            AS vmin,
           max(value)            AS vmax
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) drained over the
    events stream: per-user running totals held in the checkpointed state
    store across micro-batches. The memory sink keeps every update; the
    LAST emitted row per key is the final state — which must equal the
    batch groupBy (the oracle)."""
    import os as _os
    import tempfile

    from pyspark.sql import Window as W

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
        stateful_running_totals,
    )

    src = _os.path.join(tempfile.mkdtemp(prefix="delfos_state_"), "events")
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    ev.write.parquet(src)

    stream = read_parquet_stream(spark, src, ev.schema, max_files_per_trigger=8)
    result = stateful_running_totals(stream, "user_id", "value")
    q = run_available_now(
        result,
        _os.path.join(tempfile.mkdtemp(prefix="delfos_state_ckpt_"), "ckpt"),
        "streaming_stateful_sink",
        output_mode="update",
    )
    q.awaitTermination(300)
    sink = spark.table("streaming_stateful_sink")
    # last update per key = final running state (n is monotone per key)
    w = W.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        sink.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "n",
            F.round("total", 4).alias("total"),
            "vmin",
            "vmax",
        )
    )


@query(
    "streaming_late_drop",
    oracle="""
    WITH p AS (
      SELECT max(ts) - INTERVAL 119 MINUTE AS split,
             max(ts) - INTERVAL 59 MINUTE  AS wm
      FROM events
    ),
    agg AS (
      SELECT time_bucket(INTERVAL 10 MINUTE, e.ts) AS window_start,
             CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(e.value), 4)   AS value_sum
      FROM events e, p
      WHERE e.ts >= p.split
      GROUP BY 1
    )
    SELECT a.window_start, a.n_rows, a.value_sum
    FROM agg a, p
    WHERE a.window_start + INTERVAL 10 MINUTE <= p.wm
    """,
)
def streaming_late_drop(spark, sf_dir):
    """Watermark LATE-DATA-DROP semantics, oracle-pinned (T4): the events
    table is replayed as three micro-batches in controlled arrival order —
    the bulk of the rows with ts >= max(ts)-119min ("on time", includes
    the stream head so the watermark advances to max(ts)-59min), then the
    oldest on-time row(s), then everything older than the split ("late").
    Every late row's 10-minute window closed more than 49 minutes before
    the watermark and MUST be dropped; in append mode the sink then holds
    exactly the windows that (a) aggregate on-time rows only and (b)
    finalized (window end <= watermark). The oracle encodes that surviving
    set in SQL. If Spark failed to drop the late rows, dozens of pre-split
    windows would appear in the sink and blow the row-count match.
    Offsets are 59/119 (not 60/120) minutes so no window boundary can
    coincide with the watermark.

    The late cohort arrives as the THIRD batch because Spark evaluates the
    late-event filter with a one-batch-lagged watermark (the eviction
    watermark is current, the late filter trails — measured on 4.1: a late
    row in batch N is judged against the watermark known before batch N-1
    committed). Arrival order is forced by writing each cohort as one file
    with strictly increasing mtimes + maxFilesPerTrigger=1 (the file
    source processes oldest-first by default)."""
    import os as _os
    import shutil
    import tempfile
    from datetime import timedelta

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
    )

    base = tempfile.mkdtemp(prefix="delfos_late_")
    src = _os.path.join(base, "src")
    _os.makedirs(src)
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    t_max = ev.agg(F.max("ts")).first()[0]
    split = t_max - timedelta(minutes=119)
    on_time = ev.where(F.col("ts") >= F.lit(split))
    t_min_on = on_time.agg(F.min("ts")).first()[0]
    cohorts = (
        on_time.where(F.col("ts") > F.lit(t_min_on)),  # batch 1: bulk, has head
        on_time.where(F.col("ts") == F.lit(t_min_on)),  # batch 2: on-time tail
        ev.where(F.col("ts") < F.lit(split)),  # batch 3: late, all dropped
    )
    for i, cohort in enumerate(cohorts):
        tmp = _os.path.join(base, f"w{i}")
        cohort.coalesce(1).write.parquet(tmp)
        part = next(f for f in _os.listdir(tmp) if f.startswith("part-"))
        dst = _os.path.join(src, f"{i:02d}-{part}")
        shutil.move(_os.path.join(tmp, part), dst)
        _os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream = read_parquet_stream(spark, src, ev.schema, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "59 minutes")
        .groupBy(F.window(F.col("ts"), "10 minutes"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(F.col("window.start").alias("window_start"), "n_rows", "value_sum")
    )
    q = run_available_now(
        agg,
        _os.path.join(base, "ckpt"),
        "streaming_late_drop_sink",
        output_mode="append",
    )
    q.awaitTermination(300)
    return spark.table("streaming_late_drop_sink")


@query("streaming_session_windows", oracle=_SESSIONS_ORACLE)
def streaming_session_windows(spark, sf_dir):
    """Sessionization under Structured Streaming: the same 30-minute-gap
    session_window aggregation as the batch `session_windows` query, run
    as a watermarked stream and drained availableNow — against the
    IDENTICAL lag+cumsum oracle, certifying batch/stream session parity.

    Output-mode choice is load-bearing: update mode is rejected outright
    for streaming session windows (sessions merge, so a "changed rows
    only" contract can't be kept — Spark 4.1 raises
    STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION), and append mode only
    releases sessions already finalized below the watermark — sessions
    near the stream head would be withheld and the row counts could
    never match the batch oracle. Complete mode re-emits the full
    session state each trigger, so after the availableNow drain the
    memory sink holds exactly the final session set. At 100 TB the
    deployment shape is append mode + a lagged watermark (finalized
    sessions flow out incrementally, state stays bounded); complete
    against a memory sink is the equivalence-proof harness."""
    import os as _os
    import tempfile

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
    )

    src = _os.path.join(tempfile.mkdtemp(prefix="delfos_sess_"), "events")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    ev.write.parquet(src)

    stream = read_parquet_stream(spark, src, ev.schema)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
    q = run_available_now(
        agg,
        _os.path.join(tempfile.mkdtemp(prefix="delfos_sess_ckpt_"), "ckpt"),
        "streaming_session_windows_sink",
        output_mode="complete",
    )
    q.awaitTermination(300)
    return spark.table("streaming_session_windows_sink")


@query(
    "streaming_stream_join_outer",
    oracle="""
    WITH v AS (SELECT user_id, ts AS view_ts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT user_id, ts AS purchase_ts, value FROM events
          WHERE event_type = 'purchase'),
    wm AS (
      SELECT least((SELECT max(view_ts) FROM v),
                   (SELECT max(purchase_ts) FROM p))
             - INTERVAL 59 MINUTE AS w
    ),
    matched AS (
      SELECT v.user_id, v.view_ts, p.purchase_ts,
             round(p.value, 4) AS purchase_value
      FROM v JOIN p
        ON v.user_id = p.user_id
       AND p.purchase_ts > v.view_ts
       AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
    )
    SELECT * FROM matched
    UNION ALL
    SELECT v.user_id, v.view_ts, NULL AS purchase_ts,
           NULL AS purchase_value
    FROM v, wm
    WHERE NOT EXISTS (SELECT 1 FROM matched m
                      WHERE m.user_id = v.user_id AND m.view_ts = v.view_ts)
      AND v.view_ts + INTERVAL 30 MINUTE < wm.w
    """,
)
def streaming_stream_join_outer(spark, sf_dir):
    """Stream-stream LEFT OUTER join — the attribution shape that also
    reports views that converted to NOTHING. Outer results are where
    streaming join semantics earn their keep: a NULL row may only be
    emitted once the view PROVABLY cannot match (the global watermark
    passed its 30-minute band), and eviction runs a batch behind the
    data, so the drain feeds two batches (all events, then an empty
    flush file — mtime-ordered, maxFilesPerTrigger=1) and the final
    sink holds matches plus NULLs exactly for unmatched views whose
    band closed below the GLOBAL watermark — and the global watermark
    is the MINIMUM of the two sides' watermarks, each computed on its
    own filtered stream (measured: using the overall max(ts) over-
    approximates it and predicts one extra NULL). The oracle encodes
    least(max view ts, max purchase ts) - 59min exactly (the
    streaming_late_drop discipline: 59 not 60 minutes, so no band
    boundary can coincide with the watermark); unmatched
    views inside the un-expired head correctly emit NOTHING. At scale
    the band bounds both sides' join state; the watermark bounds the
    NULL lag."""
    import os as _os
    import shutil
    import tempfile

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
    )

    base = tempfile.mkdtemp(prefix="delfos_ssjo_")
    src = _os.path.join(base, "src")
    _os.makedirs(src)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    for i, batch in enumerate((ev, ev.limit(0))):
        tmp = _os.path.join(base, f"w{i}")
        batch.coalesce(1).write.parquet(tmp)
        part = next(f for f in _os.listdir(tmp) if f.startswith("part-"))
        dst = _os.path.join(src, f"{i:02d}-{part}")
        shutil.move(_os.path.join(tmp, part), dst)
        _os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    views = (
        read_parquet_stream(spark, src, ev.schema, max_files_per_trigger=1)
        .where(F.col("event_type") == "view")
        .withWatermark("ts", "59 minutes")
        .select(F.col("user_id").alias("a_user"), F.col("ts").alias("view_ts"))
    )
    purchases = (
        read_parquet_stream(spark, src, ev.schema, max_files_per_trigger=1)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "59 minutes")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        F.col("a_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        F.round("value", 4).alias("purchase_value"),
    )
    q = run_available_now(
        joined,
        _os.path.join(base, "ckpt"),
        "streaming_stream_join_outer_sink",
        output_mode="append",
    )
    q.awaitTermination(300)
    return spark.table("streaming_stream_join_outer_sink")


@query(
    "json_props_extract",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             value
      FROM events
    )
    SELECT event_type,
           CAST(k // 10 AS BIGINT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(k) AS k_min,
           max(k) AS k_max,
           floor((CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                  / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
    FROM e
    WHERE k IS NOT NULL
    GROUP BY event_type, CAST(k // 10 AS BIGINT)
    """,
)
def json_props_extract(spark, sf_dir):
    """Semi-structured extraction (S-family): the ``props`` column is a
    JSON string; parse it with a DECLARED schema via ``from_json`` (stays
    JVM-side, inside whole-stage codegen — no Python in the loop; the
    schema-on-read analog of the reference's typed API payloads,
    api/app/main.py:80-164) and aggregate over the extracted field.
    ``from_json`` with an explicit schema beats ``get_json_object`` at
    scale: one parse per row regardless of how many fields are pulled,
    and malformed payloads become NULL structs instead of job failures
    (filtered here, counted nowhere — the DQ expectations suite is the
    place that asserts parse rates). Bucketing k to deciles keeps the
    output |types|×10 — agg is map-side-combinable, scan-bound.

    Round 16: spread_scan was TRIED here (guide §2.5, VERDICT r15
    item 3) and reverted on measurement — the exchange ships the raw
    props JSON (the whole payload) to buy parallelism for a parse
    cheaper than the shuffle: execute 0.90 s → 1.07 s. The declared
    schema's one-field parse is already near scan throughput."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    dec = F.col("value").cast("decimal(18,6)")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .where(F.col("k").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("k") / 10).cast("bigint").alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            round_half_up(
                F.sum(dec).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_value"),
        )
    )


@query(
    "f_datetime_suite",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER)      AS y,
           CAST(quarter(ts) AS INTEGER)   AS q,
           CAST(month(ts) AS INTEGER)     AS mo,
           CAST(day(ts) AS INTEGER)       AS d,
           CAST(hour(ts) AS INTEGER)      AS h,
           CAST(minute(ts) AS INTEGER)    AS mi,
           CAST(isodow(ts) AS INTEGER)    AS iso_dow,
           CAST(dayofyear(ts) AS INTEGER) AS doy,
           CAST(weekofyear(ts) AS INTEGER) AS iso_week,
           last_day(CAST(ts AS DATE))     AS month_end,
           CAST(date_trunc('month', ts) + INTERVAL 1 MONTH AS DATE)
                                          AS next_month_start,
           CAST(ts AS DATE) + 90          AS plus_90d
    FROM events
    """,
)
def f_datetime_suite(spark, sf_dir):
    """Datetime scalar-function suite (the calendar half of the F-family;
    f_scalar_suite covers numerics): field extraction (year → minute),
    calendar navigation (ISO day-of-week, day/week-of-year, month end,
    next month start, +90 days) — the expressions every date-dimension
    build and partition-pruning predicate is made of, certified for
    cross-engine agreement. The one semantic trap is day-of-week
    numbering: Spark's dayofweek() is 1=Sunday while DuckDB's isodow()
    is 1=Monday — normalized here to ISO on the Spark side with
    (dow+5)%7+1 rather than silently shipping engine-native numbering
    (the memory-documented hazard). Pure narrow projection: zero
    exchanges, scan-bound at any scale."""
    ev = _t(spark, sf_dir, "events")
    iso_dow = (F.dayofweek("ts") + 5) % 7 + 1
    return ev.select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.quarter("ts").cast("int").alias("q"),
        F.month("ts").cast("int").alias("mo"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.minute("ts").cast("int").alias("mi"),
        iso_dow.cast("int").alias("iso_dow"),
        F.dayofyear("ts").cast("int").alias("doy"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
        F.last_day("ts").alias("month_end"),
        F.add_months(F.trunc("ts", "month"), 1).alias("next_month_start"),
        F.date_add(F.col("ts").cast("date"), 90).alias("plus_90d"),
    )


@query(
    "streaming_hopping_window_agg",
    oracle=f"""
    WITH starts AS (
      SELECT ts, value,
             unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                     time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])
               AS window_start
      FROM events
    ), w AS (
      SELECT window_start, value FROM starts
      WHERE ts >= window_start
        AND ts < window_start + INTERVAL 10 MINUTE
    )
    SELECT window_start,
           {sql_mean("value")} AS value_mean,
           min(value)          AS value_min,
           max(value)          AS value_max,
           {sql_std("value")}  AS value_std
    FROM w GROUP BY window_start
    """,
)
def streaming_hopping_window_agg(spark, sf_dir):
    """HOPPING (sliding) event-time windows under Structured Streaming:
    10-minute windows every 5 minutes — each event contributes to 2
    overlapping windows, the smoothing dashboards want when tumbling
    edges chop a burst in half. Same watermarked availableNow drain and
    batch/stream parity contract as streaming_window_agg; the oracle
    reproduces the hop by exploding each event into its window/slide
    candidate starts (the identity Spark's window() applies
    internally). State economics at 100 TB: rows-in-state multiply by
    window/slide (2 here) and the watermark still expires them — the
    slide ratio, not the data rate, is the state-size lever."""
    import os as _os
    import tempfile

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.streaming.runner import (
        read_parquet_stream,
        run_available_now,
        streaming_windowed_stats,
    )

    src = _os.path.join(tempfile.mkdtemp(prefix="delfos_stream_"), "events")
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    ev.write.parquet(src)

    stream = read_parquet_stream(spark, src, ev.schema)
    result = streaming_windowed_stats(
        stream, "ts", ("value",), "10 minutes", watermark="1 hour",
        stable=True, slide="5 minutes",
    )
    q = run_available_now(
        result,
        _os.path.join(tempfile.mkdtemp(prefix="delfos_ckpt_"), "ckpt"),
        "streaming_hopping_window_agg_sink",
        output_mode="complete",
    )
    q.awaitTermination(300)
    return spark.table("streaming_hopping_window_agg_sink")
