"""Deterministic hash-based sampling: bernoulli, stratified, train/test split (SURVEY §7 M5).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations


from delfos_etl_pipeline_spark.queries._registry import _t, query

# ---------------------------------------------------------------------------
# Sampling — deterministic hash-based corpus subsetting (SURVEY §7 M5)
# ---------------------------------------------------------------------------

#: DuckDB twin of operators/sampling.hash_bucket.
_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 1000"
)


@query(
    "sample_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_BUCKET_SQL} < 100
    """,
)
def sample_bernoulli(spark, sf_dir):
    """Deterministic 10% Bernoulli sample keyed on doc_id — a pure
    function of the data (md5 bucket), so the same rows are selected on
    any engine, partitioning, or cluster size; seeded df.sample() is not
    (Spark draws per-partition). Scan-bound, no shuffle
    (operators/sampling.py)."""
    from delfos_etl_pipeline_spark.operators.sampling import bernoulli_sample

    docs = _t(spark, sf_dir, "documents")
    return bernoulli_sample(docs, "doc_id", 0.10).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_BUCKET_SQL} < CASE lang
        WHEN 'en' THEN 100 WHEN 'de' THEN 500 WHEN 'es' THEN 500
        WHEN 'fr' THEN 500 WHEN 'zh' THEN 500 ELSE 0 END
    """,
)
def sample_stratified(spark, sf_dir):
    """Stratified rates per language — rebalance an English-dominant
    corpus (10% en, 50% tail languages) in ONE scan with no shuffle: the
    stratum picks the threshold the key bucket compares against."""
    from delfos_etl_pipeline_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.10, "de": 0.50, "es": 0.50, "fr": 0.50, "zh": 0.50},
    ).select("doc_id", "lang")


@query(
    "sample_train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET_SQL} < 50 THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def sample_train_test_split(spark, sf_dir):
    """Leakage-safe 95/5 train/test labeling: membership is a pure
    function of doc_id, so a document can never migrate between splits as
    the corpus grows or the job repartitions."""
    from delfos_etl_pipeline_spark.operators.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents")
    return train_test_split(docs, "doc_id", 0.05).select("doc_id", "split")
