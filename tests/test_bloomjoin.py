"""Bloom-filter semi-join: exactness, no-false-negative guarantee, and
the pre-shuffle row reduction that is its whole reason to exist."""

import pytest
from pyspark.sql import Row, functions as F

from delfos_etl_pipeline_spark.operators.bloomjoin import (
    bloom_semi_join,
    build_bloom_bitmap,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


def _ids(df, col):
    return sorted(r[0] for r in df.select(col).collect())


def test_exact_mode_equals_plain_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 4000)
    got = bloom_semi_join(li, sup, "l_suppkey", "s_suppkey", num_bits=1 << 12)
    want = li.join(
        sup.select("s_suppkey"),
        on=li.l_suppkey == F.col("s_suppkey"),
        how="left_semi",
    )
    assert want.count() > 0, "fixture degenerate: no matching suppliers"
    assert got.count() == want.count()
    assert _ids(got, "l_orderkey") == _ids(want, "l_orderkey")


def test_bloom_only_mode_is_superset_with_no_false_negatives(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 4000)
    approx = bloom_semi_join(
        li, sup, "l_suppkey", "s_suppkey", num_bits=1 << 12, exact=False
    )
    exact = bloom_semi_join(li, sup, "l_suppkey", "s_suppkey", num_bits=1 << 12)
    approx_keys = set(_ids(approx.select("l_suppkey").distinct(), "l_suppkey"))
    exact_keys = set(_ids(exact.select("l_suppkey").distinct(), "l_suppkey"))
    assert exact_keys <= approx_keys  # a bloom filter never false-negatives


def test_prefilter_reduces_rows_before_shuffle(spark, sf_dir):
    """With a selective dim, the bloom-only pass must already drop most of
    the fact side — that reduction IS the operator's value (the exact
    semi-join afterward only removes residual false positives)."""
    li = load_table(spark, sf_dir, "lineitem")
    one = load_table(spark, sf_dir, "supplier").orderBy("s_suppkey").limit(1)
    survivors = bloom_semi_join(
        li, one, "l_suppkey", "s_suppkey", num_bits=1 << 16, exact=False
    ).count()
    total = li.count()
    assert survivors < total * 0.5, (survivors, total)


def test_null_fact_keys_never_match(spark):
    fact = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=None, v="b"), Row(k=2, v="c")]
    )
    dim = spark.createDataFrame([Row(d=1), Row(d=None)])
    got = bloom_semi_join(fact, dim, "k", "d", num_bits=1 << 10)
    assert _ids(got, "v") == ["a"]


def test_bitmap_is_one_row_constant_size(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    bm = build_bloom_bitmap(sup, "s_suppkey", num_bits=1 << 12)
    rows = bm.collect()
    assert len(rows) == 1
    assert len(rows[0]["_bloom_words"]) == (1 << 12) // 64


def test_bad_num_bits_rejected(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    with pytest.raises(ValueError):
        build_bloom_bitmap(sup, "s_suppkey", num_bits=100)
