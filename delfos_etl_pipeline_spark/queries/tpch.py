"""TPC-H query shapes over the driver testdata (join/agg coverage at benchmark complexity).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.functions.stable import round_half_up
from delfos_etl_pipeline_spark.queries._registry import _t, query

@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical wide scan-aggregate — 8 aggregates
    over a near-full lineitem scan, grouped on a 4-ish-value key. The
    whole reduction happens map-side (partial HashAggregate); the exchange
    moves only |groups|×|partitions| rows. The plan every columnar engine
    is judged on: filter pushed to parquet, all expressions in codegen."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join (orders
    with ≥1 lineitem shipped after the order date — the testdata has no
    commit/receipt dates, so shipdate stands in), then grouped counts.
    The semi-join shuffles on the order key and never materializes the
    multiplicity of matching lineitems."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q12_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12_priority_by_status(spark, sf_dir):
    """TPC-H Q12 shape: join then conditional aggregation — CASE inside
    sum() splits counts by priority class in ONE pass (no per-class
    scans/unions)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(14,2)))
                          ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: broadcast part dim, one-pass conditional-revenue
    ratio. Revenue in DECIMAL for order-independent sums."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        1 - F.col("l_discount").cast("decimal(14,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(14,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join (two broadcastable dims), quarter
    filter + returnflag filter pushed to the scans, grouped revenue,
    top-20. lineitem⋈orders shuffles on the order key; customer and
    nation broadcast. Revenue accumulates in DECIMAL: double sums are
    accumulation-order-dependent and this group count sits on a 2-decimal
    rounding boundary — decimal arithmetic is exact on both engines."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice").cast("decimal(14,2)") * (
        1 - F.col("l_discount").cast("decimal(14,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-derived semi-join (orders whose total
    quantity clears a threshold) feeding a 3-way join + regroup. The
    HAVING subquery is a left-semi join against a pre-aggregated lineitem
    — both sides shuffle on the order key, so AQE can reuse the exchange."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → two joins → grouped revenue
    → top-10. Customer side broadcasts; lineitem⋈orders shuffles on the
    order key; filters push to all three scans."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-table snowflake join. region/nation/supplier
    broadcast; the lineitem⋈orders shuffle is the only large exchange —
    the plan a 1000-executor cluster wants."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.04 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    (shipdate year, discount band, quantity cap) reaches the parquet scan
    as PushedFilters, so at 100 TB this is an embarrassingly parallel
    single-stage map with row-group min/max skipping and no shuffle at
    all (one-row final agg). Revenue accumulates in DECIMAL so the hash
    can't drift on partial-agg order."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * F.col(
        "l_discount"
    ).cast("decimal(14,2)")
    return li.agg(F.sum(rev).cast("double").alias("revenue"))


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE),
                 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year. The nation dim is pre-filtered to the two nations BEFORE
    joining, so the supplier/customer broadcast sides shrink to the
    participating keys and the disjunctive pair predicate applies to
    already-tiny broadcast join output — lineitem⋈orders stays the only
    large shuffle."""
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = _t(spark, sf_dir, "nation").where(pair).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").where(pair).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        1 - F.col("l_discount").cast("decimal(14,2)")
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1 - CAST(l.l_discount AS DECIMAL(14,2))) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) t
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 8-table snowflake computing one nation's share of
    regional order volume per year. Every dim (part pre-filtered to the
    type, supplier+nation, customer+nation+region pre-filtered to the
    region) broadcasts; the share is a conditional-sum ratio in ONE
    aggregation pass — no second scan for the numerator. DECIMAL
    accumulation; the division happens once per year row in double."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    n1 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key")
    )
    vol = F.col("l_extendedprice").cast("decimal(14,2)") * (
        1 - F.col("l_discount").cast("decimal(14,2)")
    )
    target = F.when(F.col("nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q13_cust_order_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_cust_order_dist(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join with a non-key residual predicate (so zero-order customers
    survive with count 0), double aggregation. count(col) skips NULLs
    from unmatched left rows in both engines. The second groupBy is over
    ≤ a few hundred distinct counts — trivially small shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l_discount AS DECIMAL(14,2)))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(CAST(r.rev AS DOUBLE), 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev = (SELECT max(rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: argmax over a derived aggregate (the view +
    scalar-subquery form decorrelates to: aggregate once, broadcast the
    1-row max back). Revenue stays DECIMAL through the equality test so
    max-comparison can't be flipped by a double ulp; cast to double only
    in the projection."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(14,2)")
            * (1 - F.col("l_discount").cast("decimal(14,2)"))
        ).alias("rev")
    )
    mx = rev.agg(F.max("rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.rev == mx.mx)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size <= 10
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a pre-aggregated broadcast join — the
    oracle keeps the correlated form to prove the rewrite is equivalent.
    avg(l_quantity) is deterministic across engines because quantities
    are whole numbers (exact double sums in any order). One lineitem
    scan feeds both the threshold aggregate and the probe side; at
    100 TB the per-part avg is |part|-sized — broadcastable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-branch predicate spanning both
    join sides. The brand membership (the part-only implication of the
    OR) is pre-applied to the broadcast side so the hash table holds
    only candidate parts; the full disjunction evaluates post-join in
    one codegen stage. Catalyst derives the l_quantity range [1,30] as a
    scan-level filter from the OR branches."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        1 - F.col("l_discount").cast("decimal(14,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (adapted: the testdata has no commit/receipt
    dates, so "late" = shipped >90 days after the order date). The
    EXISTS / NOT EXISTS pair decorrelates to per-order supplier counts:
    EXISTS(other supplier) ⇔ distinct suppliers ≥ 2, NOT EXISTS(other
    late supplier) ⇔ distinct LATE suppliers = 1 — two aggregates over
    the same order-key partitioning (AQE reuses the exchange) feeding
    left-semi joins, instead of two correlated per-row probes."""
    li = _t(spark, sf_dir, "lineitem")
    o_f = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    li_f = li.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
    # BOTH existence tests fold into one conditional aggregation over the
    # same joined subtree: distinct suppliers overall (EXISTS other
    # supplier ⇔ ≥2) and distinct LATE suppliers (NOT EXISTS other late
    # ⇔ =1) — one shuffle on the order key instead of two aggregates and
    # two semi-join probes; the identical li⋈o_f subtree on the pair-
    # producing side becomes a ReusedExchange.
    qual = (
        li_f.groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(
                F.when(is_late, F.col("l_suppkey"))
            ).alias("n_late"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .select("l_orderkey")
    )
    late = li_f.where(is_late).select("l_orderkey", "l_suppkey")
    s = _t(spark, sf_dir, "supplier")
    return (
        late.join(qual, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT cntrycode, count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM (
      SELECT CAST(c.c_custkey % 10 AS INTEGER) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_custkey % 10 IN (1,2,3,4,5)
        AND c.c_acctbal > (
          SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*)
          FROM customer c2
          WHERE c2.c_acctbal > 0 AND c2.c_custkey % 10 IN (1,2,3,4,5))
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    ) t
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (adapted: the testdata has no phone column, so
    "country code" = custkey mod 10; every customer has orders, so
    "never ordered" = no orders since 2000-01-01). Three classic
    decorrelations in one query: the scalar avg-balance subquery becomes
    a broadcast 1-row cross join; NOT EXISTS becomes a left-anti join
    against the date-filtered orders; the mean is computed as exact
    DECIMAL sum / count with a single double division so the comparison
    threshold is bit-identical across engines."""
    code = (F.col("c_custkey") % 10).cast("int")
    c = _t(spark, sf_dir, "customer").where(code.isin(1, 2, 3, 4, 5))
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double"), 2
            ).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --- TPC-H shapes over a SYNTHESIZED partsupp -------------------------------
# The testdata has no partsupp table, so Q2/Q9/Q11/Q16/Q20 derive one
# deterministically from lineitem: availqty = total quantity ever shipped
# for the (part, supplier) pair (exact — whole-number doubles), supplycost
# = cheapest extended price for the pair, as DECIMAL(14,2) straight from
# the 2-decimal parquet value. No division and no double→decimal casts
# anywhere: the engines' binary-double→decimal conversions disagree at the
# last digit (measured: a per-pair 1e-10 cast difference amplified through
# value sums to flip a .005 rounding boundary in Q11), while min over
# exact decimals is bit-identical.

_PARTSUPP_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(sum(l_quantity) AS BIGINT) AS ps_availqty,
             min(CAST(l_extendedprice AS DECIMAL(14,2))) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp relation (see _PARTSUPP_SQL)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum("l_quantity").cast("bigint").alias("ps_availqty"),
        F.min(F.col("l_extendedprice").cast("decimal(14,2)")).alias(
            "ps_supplycost"
        ),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_name, CAST(ps.ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s  ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part argmin over a correlated scalar subquery,
    decorrelated into a grouped-min + equality join. The region-filtered
    (part → min cost) aggregate is computed ONCE and broadcast — the
    correlated form would re-run the region join per probe row. min cost
    compares exactly (min of raw doubles, no rounding before the test)."""
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s_eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    ps_eu = ps.join(
        F.broadcast(s_eu.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )
    min_cost = ps_eu.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("mc_cost")
    )
    return (
        ps_eu.join(
            F.broadcast(min_cost),
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("mc_cost")),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT nation, o_year,
           CAST(sum(amount_c4) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               - CAST(ps.ps_supplycost * 100 AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) * 100 AS amount_c4
      FROM part p
      JOIN lineitem l  ON p.p_partkey = l.l_partkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                      AND ps.ps_suppkey = l.l_suppkey
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN nation n    ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) t
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit (revenue minus supply cost) per nation per
    year for a part-name pattern. The partsupp side shares lineitem's
    (partkey, suppkey) grouping.

    Profit accumulates in SCALED-INTEGER (BIGINT) arithmetic: prices and
    discounts are exact cents in the data (verified: max |x*100 -
    round(x*100)| < 1e-9), so amount×10^4 is an exact int64 and the sum is
    order-independent — no Decimal128 arithmetic (the round-2 DECIMAL
    pinning cost ~37% of q9's runtime) and no float-accumulation drift.
    The final division by 10^4 is one exact double op per output row.
    Overflow bound: per-group Σ|amount×10^4| stays < 2^63 up to ~sf 10^4
    (≈10 TB of lineitem per group); beyond that, widen the sum to
    DECIMAL(38,0) — the per-row arithmetic stays int64 either way."""
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    ) - (F.col("ps_supplycost") * 100).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint") * 100
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (F.sum(amount).cast("double") / F.lit(10000.0)).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    ps_n AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost * ps.ps_availqty AS value
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(round(sum(value), 2) AS DOUBLE) AS part_value
    FROM ps_n
    GROUP BY ps_partkey
    HAVING CAST(sum(value) AS DOUBLE) > (
      SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM ps_n)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: stock-value concentration — per-part value vs a
    scalar fraction of the nation's total. The nation-filtered partsupp
    subtree feeds BOTH the per-part aggregate and the grand total; the
    total is a broadcast 1-row cross join. Value accumulates in DECIMAL
    and is ROUNDED AS DECIMAL (exact half-up) before the double cast —
    rounding after the cast hit a .xx5 boundary where the engines'
    double-round tie rules diverge."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    ps_n = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", value.alias("value"))
    )
    per_part = ps_n.groupBy("ps_partkey").agg(F.sum("value").alias("_v"))
    total = ps_n.agg((F.sum("value").cast("double") * 0.001).alias("_thresh"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_v").cast("double") > F.col("_thresh"))
        .select(
            "ps_partkey",
            F.round(F.col("_v"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part descriptor with
    a NOT IN exclusion (suppliers in deficit stand in for the reference's
    complaint-comment filter). NOT IN over a non-nullable key decorrelates
    to a left-anti join; the count_distinct shuffles on the descriptor."""
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_promotable_suppliers",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey FROM partsupp ps
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps.ps_availqty > (
            SELECT 0.5 * sum(l.l_quantity) FROM lineitem l
            WHERE l.l_partkey = ps.ps_partkey
              AND l.l_suppkey = ps.ps_suppkey
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_promotable_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested IN + correlated aggregate subquery. The
    correlated half-of-shipped threshold decorrelates to a grouped sum
    over the date-sliced lineitem joined back on the pair key (inner join
    = the NULL-excluding semantics of the correlated comparison); the
    part-name IN filters via a broadcast semi-join; the final IN is a
    semi-join onto the nation-filtered suppliers."""
    ps = _partsupp(spark, sf_dir)
    red = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
        )
        .groupBy(
            F.col("l_partkey").alias("sh_partkey"),
            F.col("l_suppkey").alias("sh_suppkey"),
        )
        .agg((0.5 * F.sum("l_quantity")).alias("half_shipped"))
    )
    qualifying = (
        ps.join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"),
                "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("sh_partkey"))
            & (F.col("ps_suppkey") == F.col("sh_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("half_shipped"))
        .select("ps_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


@query(
    "promo_uplift_did",
    oracle="""
    WITH cells AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo,
             CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS is_post,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), m AS (
      SELECT is_promo, is_post,
             floor((rev_cents * 1.0 / 100.0 / n_lines) * 1000000.0 + 0.5)
               / 1000000.0 AS mean_rev
      FROM cells
    ), w AS (
      SELECT max(CASE WHEN is_promo = 1 AND is_post = 1 THEN mean_rev END)
               AS promo_post,
             max(CASE WHEN is_promo = 1 AND is_post = 0 THEN mean_rev END)
               AS promo_pre,
             max(CASE WHEN is_promo = 0 AND is_post = 1 THEN mean_rev END)
               AS ctrl_post,
             max(CASE WHEN is_promo = 0 AND is_post = 0 THEN mean_rev END)
               AS ctrl_pre
      FROM m
    )
    SELECT promo_pre, promo_post, ctrl_pre, ctrl_post,
           floor(((promo_post - promo_pre) - (ctrl_post - ctrl_pre))
                 * 1000000.0 + 0.5) / 1000000.0 AS did_uplift
    FROM w
    """,
)
def promo_uplift_did(spark, sf_dir):
    """Difference-in-differences uplift estimate for promo parts: the
    change in mean per-line revenue across the 1998 boundary for
    promo-typed parts MINUS the same change for everything else — the
    causal-inference workhorse that separates 'promo lines earn more
    after the change' from 'all lines earned more after the change'
    (a plain before/after on the treated group confounds the two).

    Scale shape: one fact-dim equi-join (part is the broadcast side at
    any realistic scale), then a FOUR-cell aggregation with map-side
    combine — the whole query reduces 100 TB to 4 rows in one pass.
    Exactness: revenue pins to integer cents per line (floor half-up —
    order-free BIGINT sums, the micro-unit contract), the four cell
    means round half-up at 6 dp, and the DiD combination of four
    identical rounded doubles is a single identical IEEE expression."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("bigint")
    cells = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.when(F.col("p_type").like("PROMO%"), 1)
            .otherwise(0)
            .alias("is_promo"),
            F.when(
                F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("is_post"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(cents).cast("bigint").alias("rev_cents"),
        )
    )
    mean_rev = round_half_up(
        F.col("rev_cents") * 1.0 / F.lit(100.0) / F.col("n_lines"), 6
    )
    m = cells.select("is_promo", "is_post", mean_rev.alias("mean_rev"))
    w = m.agg(
        F.max(
            F.when((F.col("is_promo") == 1) & (F.col("is_post") == 1),
                   F.col("mean_rev"))
        ).alias("promo_post"),
        F.max(
            F.when((F.col("is_promo") == 1) & (F.col("is_post") == 0),
                   F.col("mean_rev"))
        ).alias("promo_pre"),
        F.max(
            F.when((F.col("is_promo") == 0) & (F.col("is_post") == 1),
                   F.col("mean_rev"))
        ).alias("ctrl_post"),
        F.max(
            F.when((F.col("is_promo") == 0) & (F.col("is_post") == 0),
                   F.col("mean_rev"))
        ).alias("ctrl_pre"),
    )
    return w.select(
        "promo_pre",
        "promo_post",
        "ctrl_pre",
        "ctrl_post",
        round_half_up(
            (F.col("promo_post") - F.col("promo_pre"))
            - (F.col("ctrl_post") - F.col("ctrl_pre")),
            6,
        ).alias("did_uplift"),
    )


@query(
    "revenue_waterfall",
    oracle="""
    WITH l AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS gross_c,
             CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5)
                  AS BIGINT) AS disc_c,
             CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100.0
                        + 0.5) AS BIGINT) AS tax_c,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS net_c
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor((sum(gross_c) * 1.0 / 100.0) * 100.0 + 0.5) / 100.0
             AS gross_revenue,
           floor((sum(disc_c) * 1.0 / 100.0) * 100.0 + 0.5) / 100.0
             AS discount_given,
           floor((sum(net_c) * 1.0 / 100.0) * 100.0 + 0.5) / 100.0
             AS net_revenue,
           floor((sum(tax_c) * 1.0 / 100.0) * 100.0 + 0.5) / 100.0
             AS tax_collected,
           floor(((sum(net_c) + sum(tax_c)) * 1.0 / 100.0) * 100.0 + 0.5)
             / 100.0 AS charged_total
    FROM l GROUP BY l_returnflag
    """,
)
def revenue_waterfall(spark, sf_dir):
    """Finance revenue waterfall by return flag: gross -> discount ->
    net -> tax -> charged, each step an exact money column — the
    reconciliation report whose columns must ADD UP row by row (audit
    requirement), which is why every per-line term pins to integer
    cents half-up BEFORE summation: BIGINT cent sums are order-free and
    the waterfall identity gross - discount = net holds to the cent by
    construction, where independent float sums would drift apart in
    the last digits. One scan, one small-key aggregation with map-side
    combine — the TPC-H q1 shape with the money-integrity contract
    made explicit."""
    l = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(c * 100.0 + 0.5).cast("bigint")  # noqa: E731
    base = l.select(
        "l_returnflag",
        cents(F.col("l_extendedprice")).alias("gross_c"),
        cents(F.col("l_extendedprice") * F.col("l_discount")).alias("disc_c"),
        cents(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * F.col("l_tax")
        ).alias("tax_c"),
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_c"
        ),
    )
    money = lambda c: round_half_up(c * 1.0 / F.lit(100.0), 2)  # noqa: E731
    return base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        money(F.sum("gross_c")).alias("gross_revenue"),
        money(F.sum("disc_c")).alias("discount_given"),
        money(F.sum("net_c")).alias("net_revenue"),
        money(F.sum("tax_c")).alias("tax_collected"),
        money(F.sum("net_c") + F.sum("tax_c")).alias("charged_total"),
    )


@query(
    "orders_ship_latency_percentiles",
    oracle="""
    WITH firstship AS (
      SELECT l_orderkey,
             min(CAST(l_shipdate AS DATE)) AS first_ship
      FROM lineitem GROUP BY l_orderkey
    ), lat AS (
      SELECT o.o_orderpriority,
             CAST(datediff('day', CAST(o.o_orderdate AS DATE), f.first_ship)
                  AS BIGINT) AS lat_days
      FROM orders o JOIN firstship f ON o.o_orderkey = f.l_orderkey
    ), r AS (
      SELECT o_orderpriority, lat_days,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY lat_days) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS c
      FROM lat
    )
    SELECT o_orderpriority,
           CAST(max(c) AS BIGINT) AS n_orders,
           (max(CASE WHEN rn = (c + 1) // 2 THEN lat_days END) * 1.0
            + max(CASE WHEN rn = (c + 2) // 2 THEN lat_days END)) / 2.0
             AS p50_days,
           CAST(max(CASE WHEN rn = c - (c // 10) THEN lat_days END)
                AS BIGINT) AS p90_days,
           CAST(max(lat_days) AS BIGINT) AS max_days
    FROM r GROUP BY o_orderpriority
    """,
)
def orders_ship_latency_percentiles(spark, sf_dir):
    """Order-to-first-shipment latency percentiles by order priority —
    the fulfillment SLA report ('do URGENT orders actually ship
    faster?'), read as rank-pinned p50/p90 over exact integer day lags
    so there is no interpolation expression to diverge between engines
    (the orders_median_gap_days contract; p90 = the element at rank
    c - floor(c/10), a nearest-rank pick).

    Scale shape: the per-order first-ship date is a map-side-combinable
    MIN over lineitem keyed by orderkey; the join to orders is the
    co-keyed fact-fact equi-join (both sides shuffle on o_orderkey —
    bucketed layouts co-locate it at scale); the ranking windows key on
    the 5-value priority BUT over the already-reduced |orders| relation
    — and unlike w6's per-row frame rebuild this is a single streaming
    rank pass, so the key-count ceiling bounds only the final cheap
    stage (the halo-block rewrite exists if that ever dominates)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    firstship = l.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    lat = o.join(
        firstship, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        "o_orderpriority",
        F.datediff("first_ship", F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("lat_days"),
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("lat_days")
    wc = Window.partitionBy("o_orderpriority")
    r = lat.select(
        "o_orderpriority",
        "lat_days",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("c"),
    )
    lo = F.max(
        F.when(F.col("rn") == F.floor((F.col("c") + 1) / 2), F.col("lat_days"))
    )
    hi = F.max(
        F.when(F.col("rn") == F.floor((F.col("c") + 2) / 2), F.col("lat_days"))
    )
    p90 = F.max(
        F.when(
            F.col("rn") == F.col("c") - F.floor(F.col("c") / 10),
            F.col("lat_days"),
        )
    )
    return r.groupBy("o_orderpriority").agg(
        F.max("c").cast("bigint").alias("n_orders"),
        ((lo * 1.0 + hi) / 2.0).alias("p50_days"),
        p90.cast("bigint").alias("p90_days"),
        F.max("lat_days").cast("bigint").alias("max_days"),
    )
