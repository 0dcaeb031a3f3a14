"""Text analysis: quality stats, language heuristic, fingerprints."""

import pytest

from delfos_etl_pipeline_spark.sources.parquet import load_table
from delfos_etl_pipeline_spark.text.analysis import (
    document_fingerprint,
    language_id,
    text_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_quality_score_bounds(docs):
    rows = text_stats(docs, "doc_id", "text").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.n_distinct_words <= r.n_words
        assert 0.0 <= r.stopword_ratio <= 1.0


def test_fingerprint_order_invariance(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in document_fingerprint(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2]  # word order must not matter
    assert fp[1] != fp[3]


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house in town"),
            (2, "der hund und die katze das ist gut"),
            (3, "le chat et la maison les arbres des champs"),
            (4, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_guess for r in language_id(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "unk"}


def test_token_counts_granularities(spark):
    from delfos_etl_pipeline_spark.text.analysis import token_counts

    df = spark.createDataFrame(
        [(1, "Hello, world! GPT-4 costs $0.03 per 1k tokens.")],
        "doc_id long, text string",
    )
    r = token_counts(df, "doc_id", "text").first()
    assert r.n_ws_tokens == 8
    # Hello world GPT costs per k tokens
    assert r.n_word_tokens == 7
    # letter runs (7) + digit runs (4 0 03 1) + marks (, ! - $ . .) = 17
    assert r.n_bpe_ish_tokens == 17
