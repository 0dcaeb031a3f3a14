"""Joins, reshaping (pivot/unpivot), sorts/top-k, and the scalar function suite (SURVEY §2.3, §2.5, §2.6, §2.7).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.functions.stable import (
    sql_mean,
    sql_std,
)
from delfos_etl_pipeline_spark.plans.pipeline import (
    signal_names,
    to_long,
    windowed_stats,
)
from delfos_etl_pipeline_spark.queries._registry import _t, query

# ---------------------------------------------------------------------------
# J — joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@query(
    "j1_broadcast_dim_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           round(avg(c.c_acctbal), 6) AS avg_acctbal,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def j1_broadcast_dim_join(spark, sf_dir):
    """J1/J3 — fact→dim snowflake join with explicit broadcast of the small
    dimensions (the reference's dict-map lookup, SURVEY §2.3 J1). At 100 TB
    the fact side never shuffles for these joins — both dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "j2_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def j2_anti_join(spark, sf_dir):
    """J2 — unmatched-key elimination as LEFT ANTI join (the reference's
    isna-drop + warning, /root/reference/etl/etl_process.py:145-148):
    customers with no recent orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j3_fact_dim_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j3_fact_dim_join(spark, sf_dir):
    """J3 — fact–dimension INNER equi-join + grouped rollup
    (/root/reference/dagster/assets.py:207, exports/export_alvo_db.py:49-51)."""
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@query(
    "j4_left_join_stats",
    oracle="""
    SELECT n.n_name,
           count(c.c_custkey) AS n_customers,
           round(avg(c.c_acctbal), 6) AS avg_acctbal,
           min(c.c_acctbal) AS min_acctbal,
           max(c.c_acctbal) AS max_acctbal
    FROM nation n
    LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def j4_left_join_stats(spark, sf_dir):
    """J4 — LEFT OUTER join keeping empty dimensions in per-dim stats
    (/root/reference/dagster/assets.py:327-340)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
    )


@query(
    "j5_outer_window_align",
    oracle="""
    WITH p AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
             round(sum(value), 4) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), e AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
             count(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT window_start, purchase_value, n_errors
    FROM p FULL JOIN e USING (window_start)
    """,
)
def j5_outer_window_align(spark, sf_dir):
    """J5 — column-wise concat on a shared time index ≡ FULL OUTER join on
    the window key (pandas pd.concat(axis=1),
    /root/reference/etl/etl_process.py:96)."""
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"))
        .agg(F.round(F.sum("value"), 4).alias("purchase_value"))
    )
    e = (
        ev.where(F.col("event_type") == "error")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return p.join(e, "window_start", "full_outer").select(
        "window_start", "purchase_value", "n_errors"
    )


# ---------------------------------------------------------------------------
# R — reshaping (SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "r1_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
             {sql_mean("value")}          AS value_mean,
             min(value)                   AS value_min,
             max(value)                   AS value_max,
             {sql_std("value")}           AS value_std
      FROM events GROUP BY 1
    )
    SELECT window_start, signal_name, value FROM (
      SELECT window_start, 'value_mean' AS signal_name, value_mean AS value FROM wide
      UNION ALL SELECT window_start, 'value_min',  value_min  FROM wide
      UNION ALL SELECT window_start, 'value_max',  value_max  FROM wide
      UNION ALL SELECT window_start, 'value_std',  value_std  FROM wide
    ) WHERE value IS NOT NULL
    """,
)
def r1_unpivot(spark, sf_dir):
    """R1 — unpivot/melt wide→long with explicit NULL pruning
    (pd.melt + dropna, /root/reference/etl/etl_process.py:104-112)."""
    ev = _t(spark, sf_dir, "events")
    wide = windowed_stats(ev, "ts", ("value",), "10 minutes", stable=True)
    return to_long(wide, ["window_start"], signal_names(("value",)))


@query(
    "r4_pivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    """,
)
def r4_pivot(spark, sf_dir):
    """R4 — pivot long→wide, the inverse of R1 (SURVEY §2.5). The pivot
    value list is supplied explicitly so Spark skips the extra
    distinct-values job — mandatory at scale."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # Spark pivot yields NULL for absent (day, type) combos; DuckDB's
    # FILTER count yields 0 — align on 0.
    return wide.na.fill(0, subset=types)


# ---------------------------------------------------------------------------
# O — sorts / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@query(
    "o2_topk",
    oracle="""
    SELECT event_id, ts, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 10
    """,
)
def o2_topk(spark, sf_dir):
    """O2 — ORDER BY ... DESC LIMIT k: Spark plans TakeOrderedAndProject
    (true distributed top-k, no global sort) — the latest-sample report
    (/root/reference/dagster/assets.py:311-322)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(10)
    )


@query(
    "o4_topk_per_group",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, c.c_custkey,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_custkey
    )
    SELECT nation, c_custkey, round(revenue, 2) AS revenue,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY nation ORDER BY revenue DESC, c_custkey ASC) AS rk
      FROM rev
    ) WHERE rk <= 3
    """,
)
def o4_topk_per_group(spark, sf_dir):
    """Grouped top-k: the 3 highest-revenue customers per nation — the
    per-group counterpart of O2's global TakeOrderedAndProject. Plan: the
    nation dimension broadcasts into the fact join, revenue aggregates
    with map-side combine keyed (nation, custkey), and the ranking
    window re-keys on nation only — at 100 TB the window's input is the
    aggregated customer table, not fact rows, and k<<group size means
    the rank filter drops almost everything before the final exchange.
    Revenue accumulates in DECIMAL(18,2) (o_totalprice carries 2dp) so
    the sum is order-independent and both engines rank identical
    doubles; ties break on custkey for a total order."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    )
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "nation",
            "c_custkey",
            F.round("revenue", 2).alias("revenue"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# F — scalar function suite (SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "f_scalar_suite",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts)                      AS day_start,
           ts + INTERVAL 1 DAY                        AS next_day,
           strftime(ts, '%Y-%m-%dT%H:%M:%S')          AS iso_ts,
           CAST(ts AS DATE)                           AS event_date,
           least(greatest(value, 10.0), 100.0)        AS clipped,
           CASE WHEN value < 50 THEN 0.0
                WHEN value > 150 THEN 2000.0
                ELSE round(value * value * 0.08, 6) END AS piecewise,
           CAST(floor(value / 8) AS BIGINT)           AS bucket8,
           round(sin(value), 6)                       AS sin_val,
           round(pow(value, 2), 4)                    AS squared,
           CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                WHEN 'purchase' THEN 3 ELSE -1 END    AS type_code
    FROM events
    """,
)
def f_scalar_suite(spark, sf_dir):
    """F1-F12 — scalar function battery: timestamp trunc + day arithmetic
    (F3), format (F2), date extract (F4), clip via least/greatest (F7),
    piecewise power-curve (F8/F10), integer bucketing (F12), sinusoid
    (F9), literal-map recode via create_map+getItem (F11, the engine form
    of the reference's dict .map() — /root/reference/etl/etl_process.py:143)
    — all JVM-side expressions inside whole-stage codegen, zero Python
    UDFs (SURVEY §2.11 goal)."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    recode = F.create_map(
        F.lit("click"), F.lit(1), F.lit("view"), F.lit(2), F.lit("purchase"), F.lit(3)
    )
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
        F.to_date("ts").alias("event_date"),
        F.least(F.greatest(v, F.lit(10.0)), F.lit(100.0)).alias("clipped"),
        F.when(v < 50, F.lit(0.0))
        .when(v > 150, F.lit(2000.0))
        .otherwise(F.round(v * v * 0.08, 6))
        .alias("piecewise"),
        F.floor(v / 8).alias("bucket8"),
        F.round(F.sin(v), 6).alias("sin_val"),
        F.round(F.pow(v, 2), 4).alias("squared"),
        F.coalesce(recode[F.col("event_type")], F.lit(-1)).alias("type_code"),
    )


@query(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT user_id, 'seg_' || CAST(user_id % 5 AS VARCHAR) AS segment
      FROM events
    )
    SELECT e.event_id, e.user_id, d.segment
    FROM events e JOIN dim d USING (user_id)
    """,
)
def join_salted_skew(spark, sf_dir):
    """Skew-safe fact⋈fact equi-join, driver-certified: the fact side
    joins a derived user-segment dim through operators/skew.salted_join —
    dim rows replicated across 8 salts, fact rows hash-salted, join on
    (key, salt) — so one hot user's rows spread over 8 reduce tasks
    instead of stalling one. The oracle is the PLAIN join (salting is
    plan surgery, not semantics), making the equivalence a driver-checked
    contract rather than only the pytest property. Complements
    agg_salted_skew: that was the aggregation half of the skew story,
    this is the join half. Use when the dim can't broadcast AND a key is
    hot; with a broadcastable dim, j1's broadcast join needs no salt."""
    from delfos_etl_pipeline_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().select(
        "user_id",
        F.concat(F.lit("seg_"), (F.col("user_id") % 5).cast("string")).alias(
            "segment"
        ),
    )
    return salted_join(
        ev.select("event_id", "user_id"), dim, "user_id", n_salts=8
    ).select("event_id", "user_id", "segment")


@query(
    "j_bloom_semi_join",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 4000)
    GROUP BY 1
    """,
)
def j_bloom_semi_join(spark, sf_dir):
    """Monthly revenue from lineitems of high-balance suppliers, executed
    as a BLOOM-FILTER pre-filtered semi-join (operators/bloomjoin.py).

    The oracle is the plain ``IN``-subquery semi-join — the hash match
    proves the bloom pass is a pure exchange-volume optimization with
    exact final semantics (false positives removed by the real semi-join
    on the survivors). 100 TB posture: the dim ships as a
    ``num_bits/8``-byte bitmap (constant in key count, here 8 KiB; 8 MiB
    covers ~50 M keys at ~1% FP), the fact side drops non-members BEFORE
    any shuffle inside whole-stage codegen, and only survivors reach the
    exact semi-join — the standard answer when the dim is too big to
    broadcast as rows but the fact shuffle is the bottleneck. Revenue in
    scaled-integer cents·basis-points (the tpch_q9 contract) so the
    monthly sums are accumulation-order-proof.
    """
    from delfos_etl_pipeline_spark.operators.bloomjoin import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 4000)
    filtered = bloom_semi_join(
        li, sup, "l_suppkey", "s_suppkey", num_bits=1 << 16, num_hashes=3
    )
    rev_c4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        filtered.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev_c4).cast("double") / F.lit(10000.0)).alias("revenue"),
        )
    )


@query(
    "a_string_agg",
    oracle="""
    SELECT r.r_name,
           count(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def a_string_agg(spark, sf_dir):
    """Ordered string aggregation (SQL LISTAGG / string_agg ... ORDER BY)
    — the report-formatting aggregate BI layers lean on. Spark has no
    ordered listagg, so the exact rewrite is collect_list → array_sort →
    array_join, which reproduces the deterministic ordered concatenation
    on any partitioning (collect_list order is nondeterministic, the
    sort normalizes it — this composition IS the documented Spark
    idiom). Group-by shuffle only; the per-group buffer is the group's
    member list, fine for dimension-sized groups — for corpus-sized
    groups cap with slice() after the sort."""
    n = _t(spark, sf_dir, "nation")
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
        )
    )
