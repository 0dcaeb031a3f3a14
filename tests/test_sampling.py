"""Deterministic hash-sampling invariants: reproducibility, partition
stability, stratum rates, split disjointness."""

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.operators.sampling import (
    bernoulli_sample,
    hash_bucket,
    stratified_sample,
    train_test_split,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_sample_reproducible_and_partition_stable(docs):
    """Same rows on every run AND under any repartitioning — the property
    seeded df.sample() lacks."""
    a = {r.doc_id for r in bernoulli_sample(docs, "doc_id", 0.2).collect()}
    b = {r.doc_id for r in bernoulli_sample(docs, "doc_id", 0.2).collect()}
    c = {
        r.doc_id
        for r in bernoulli_sample(docs.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b == c
    assert 0 < len(a) < docs.count()


def test_sample_fraction_nesting(docs):
    """A 10% sample is a subset of a 20% sample (thresholded buckets nest
    — useful for growing eval sets without resampling)."""
    small = {r.doc_id for r in bernoulli_sample(docs, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in bernoulli_sample(docs, "doc_id", 0.2).collect()}
    assert small <= big


def test_stratified_rates(docs):
    """Per-stratum sampling hits the requested rate within hash noise and
    drops unlisted strata."""
    frac = {"en": 0.5}
    got = stratified_sample(docs, "doc_id", "lang", frac)
    by_lang = {r.lang: r.n for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_lang) == {"en"}
    n_en = docs.where(F.col("lang") == "en").count()
    assert abs(by_lang["en"] / n_en - 0.5) < 0.2


def test_train_test_split_partitions(docs):
    """Every row labeled, splits disjoint, test fraction ≈ requested."""
    labeled = train_test_split(docs, "doc_id", 0.25)
    counts = {r.split: r.n for r in labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("test", 0) + counts.get("train", 0) == docs.count()
    assert abs(counts["test"] / docs.count() - 0.25) < 0.15


def test_hash_bucket_range(docs):
    stats = docs.select(hash_bucket(F.col("doc_id")).alias("b")).agg(
        F.min("b"), F.max("b")).collect()[0]
    assert 0 <= stats[0] and stats[1] < 1000


def test_domain_cap_counts(spark, sf_dir):
    """Per source: kept = min(n_docs, 15), kept + dropped = n_docs, and
    kept_chars never exceeds the source's total chars."""
    from delfos_etl_pipeline_spark.queries import queries

    out = queries()["sample_domain_cap"](spark, sf_dir)
    totals = {
        r.source: (r["count"], r["chars"])
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    rows = out.collect()
    assert {r.source for r in rows} == set(totals)
    for r in rows:
        n, chars = totals[r.source]
        assert r.n_docs == n
        assert r.n_kept == min(n, 15)
        assert r.n_kept + r.n_dropped == n
        assert 0 < r.kept_chars <= chars


def test_domain_temperature_allocation_properties(spark, sf_dir):
    """Temperature allocation: targets sum to <= budget, each target is
    capped by the domain size, and flattening holds — a domain with 4x
    the docs of another gets at most ~2x its target (alpha = 0.5)."""
    from delfos_etl_pipeline_spark.queries import queries

    rows = queries()["sample_domain_temperature"](spark, sf_dir).collect()
    assert sum(r.target_docs for r in rows) <= 1000
    for r in rows:
        assert r.target_kept == min(r.target_docs, r.n_docs)
        assert 0 <= r.keep_rate_ppm <= 1000000
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs >= 4 * small.n_docs and small.target_docs > 0:
        assert big.target_docs <= 2 * small.target_docs + 1
