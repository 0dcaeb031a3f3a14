"""Bucketed co-location: the write-time shuffle eliminates the join-time
exchange on BOTH sides, and results match the plain join."""

import re

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", ["l_orderkey"], 8, ["l_orderkey"],
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["l_orderkey"])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = joined._jdf.queryExecution().explainString(mode)
    assert not re.search(r"^\(\d+\) Exchange", plan, flags=re.M), plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, ["l_orderkey"]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
    ).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
    ).collect()[0]
    assert (got.n, got.q) == (want.n, want.q)
