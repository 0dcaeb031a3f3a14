"""Repetition/quality filtering signals — Gopher-style corpus hygiene
(SURVEY.md §7 M5 extension family; public method: Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 repetition filters).

Per-document signals a pretraining cleaning pass thresholds on:

- ``top_word_frac``: occurrences of the most frequent word / word count
  (degenerate docs repeat one token).
- ``top_bigram_char_frac``: characters covered by the most frequent word
  2-gram / total characters (the Gopher "fraction of characters in the
  most common n-gram" signal; covered-chars := count * bigram length, a
  max over products so no tie-break is ever needed).
- ``dup_word_frac``: 1 - distinct/total words (vocabulary collapse).
- ``symbol_word_ratio``: non-alphanumeric marks per word (boilerplate,
  markup residue).
- ``mean_word_len``: separators excluded; prose sits in roughly [3, 10].
- ``quality_pass``: 0/1 conjunction of the threshold set.

Scale posture: token-level counts need per-(doc, token) frequencies — an
explode + two-level aggregation, NOT a per-row quadratic
``transform(distinct, w -> count_in_array)`` expression (O(distinct·n)
per document blows up on long documents). Every shuffle here is keyed by
``doc_id`` (+token), so the plan is embarrassingly parallel at corpus
scale; map-side partial aggregation absorbs the token fan-out before the
exchange. Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default thresholds. Tuned to be meaningful for prose; the synthetic
#: word-salad driver corpus mostly fails top_word_frac — which is the
#: point of the filter, and the oracle checks the flag either way.
THRESHOLDS = {
    "max_top_word_frac": 0.20,
    "max_top_bigram_char_frac": 0.18,
    "max_dup_word_frac": 0.60,
    "max_symbol_word_ratio": 0.10,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
}


def _base(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = F.col(text_col)
    # Materialize the split ONCE in its own projection. Referencing the
    # split expression directly inside a higher-order-function lambda
    # inlines it per element — each bigram re-splits the whole document,
    # O(n²) per doc (measured 16 s → 0.7 s at sf0.1 for the bigram
    # branch). CollapseProject keeps the boundary because the alias is
    # referenced multiple times by non-cheap consumers.
    pre = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("bigint").alias("n_chars"),
        F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")).cast("bigint").alias("n_symbols"),
        F.split(F.lower(t), r"\s+").alias("_words"),
    )
    words = F.col("_words")
    n_words = F.size(words)
    # adjacent-pair zip of two slices — linear, no per-index element_at
    # (slice end-index n-1 is invalid when n = 1 — guard short docs).
    bigrams = F.when(
        n_words >= 2,
        F.zip_with(
            F.slice(words, 1, n_words - 1),
            F.slice(words, 2, n_words - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return pre.select(
        "doc_id",
        "n_chars",
        n_words.cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_words"),
        "n_symbols",
        words.alias("_words"),
        bigrams.alias("_bigrams"),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_words, top_word_cnt, top_bigram_chars) via
    explode → (doc, token) count → per-doc max. Linear in corpus tokens."""
    # base (the tokenize pass: split + bigram arrays) feeds THREE
    # consumers — persist it so the regex tokenization runs once, not 3x
    # (measured ~40% of text_quality_gopher at sf0.1). MEMORY_AND_DISK:
    # spills for token-heavy corpora, LRU-evicted.
    base = _base(df, id_col, text_col).persist()
    stats = base.drop("_words", "_bigrams")

    top_word = (
        base.select("doc_id", F.explode("_words").alias("w"))
        .groupBy("doc_id", "w")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").cast("bigint").alias("top_word_cnt"))
    )
    # covered chars = occurrences * bigram length sans the joining space;
    # max over the product is deterministic without any tie-break.
    top_bigram = (
        base.select("doc_id", F.explode("_bigrams").alias("b"))
        .groupBy("doc_id", "b")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max(F.col("count") * (F.length("b") - 1))
            .cast("bigint")
            .alias("top_bigram_chars")
        )
    )
    return (
        stats.join(top_word, "doc_id", "left")
        .join(top_bigram, "doc_id", "left")
        .na.fill({"top_word_cnt": 0, "top_bigram_chars": 0})
    )


def quality_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict | None = None,
) -> DataFrame:
    """Full signal frame + 0/1 ``quality_pass`` under ``thresholds``."""
    th = {**THRESHOLDS, **(thresholds or {})}
    rep = repetition_signals(df, id_col, text_col)
    top_word_frac = F.round(F.col("top_word_cnt") / F.col("n_words"), 6)
    top_bigram_char_frac = F.round(F.col("top_bigram_chars") / F.col("n_chars"), 6)
    dup_word_frac = F.round(1 - F.col("n_distinct_words") / F.col("n_words"), 6)
    symbol_word_ratio = F.round(F.col("n_symbols") / F.col("n_words"), 6)
    mean_word_len = F.round(
        (F.col("n_chars") - (F.col("n_words") - 1)) / F.col("n_words"), 6
    )
    out = rep.select(
        "doc_id",
        "n_chars",
        "n_words",
        top_word_frac.alias("top_word_frac"),
        top_bigram_char_frac.alias("top_bigram_char_frac"),
        dup_word_frac.alias("dup_word_frac"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        mean_word_len.alias("mean_word_len"),
    )
    passes = (
        (F.col("top_word_frac") <= th["max_top_word_frac"])
        & (F.col("top_bigram_char_frac") <= th["max_top_bigram_char_frac"])
        & (F.col("dup_word_frac") <= th["max_dup_word_frac"])
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("mean_word_len") >= th["min_mean_word_len"])
        & (F.col("mean_word_len") <= th["max_mean_word_len"])
    )
    return out.withColumn("quality_pass", passes.cast("int"))


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict | None = None,
) -> DataFrame:
    """Surviving rows of ``df`` under the quality thresholds (semi-join on
    the passing flag — the corpus side never widens)."""
    passing = (
        quality_signals(df, id_col, text_col, thresholds)
        .where(F.col("quality_pass") == 1)
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(passing, id_col, "left_semi")
