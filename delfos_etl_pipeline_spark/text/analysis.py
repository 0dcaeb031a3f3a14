"""Text analysis for training-data pipelines (SURVEY.md §7 M5).

Language-ID (stopword-marker heuristic), quality scoring (length/
punctuation/stopword ratios), token counting (whitespace + regex word
tokens), and document fingerprinting (normalized bag-of-words md5). All
expression-level Spark SQL — columnar, codegen-friendly, no Python in the
hot path — so throughput at 100 TB is bounded by the scan, not the UDF
serialization boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Stopword markers per language for the n-gram-free heuristic. Ordered —
#: first match wins ties so the output is deterministic.
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "a", "in")),
    ("de", ("der", "die", "und", "das", "ist")),
    ("fr", ("le", "la", "et", "les", "des")),
    ("es", ("el", "los", "y", "que", "una")),
]

_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def _words(text_col: Column) -> Column:
    return F.split(F.lower(text_col), r"\s+")


def _marker_hits(words: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality statistics:

    n_chars, n_words, n_distinct_words, avg_word_len, stopword_ratio,
    alpha_token_count (regex word tokens), quality_score — a deterministic
    [0,1] blend of length/diversity/stopword signals usable as a filter
    threshold in data-cleaning pipelines.
    """
    t = F.col(text_col)
    words = _words(t)
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    avg_word_len = F.round(
        (F.length(t) - (n_words - 1)) / n_words, 6
    )  # total chars minus separators, over word count
    stop_ratio = F.round(n_stop / n_words, 6)
    diversity = F.round(n_distinct / n_words, 6)
    quality = F.round(
        F.least(n_words / 100.0, F.lit(1.0)) * 0.4
        + diversity * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2,
        6,
    )
    # Count columns cast to BIGINT: Spark length()/size()/regexp_count()
    # are INT, DuckDB length()/len() are BIGINT, and the driver's
    # canonicalizer compares dtype width. The float blends above consume
    # the pre-cast INT columns — int32→double and int64→double are the
    # same double, so the compared ratios are unchanged.
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        F.regexp_count(t, F.lit("[a-zA-Z]+")).cast("long").alias("alpha_token_count"),
        diversity.alias("diversity"),
        quality.alias("quality_score"),
    )


#: BPE-ish pre-tokenizer pattern (GPT-2-style, ASCII-simplified): letter
#: runs, digit runs, and single non-alphanumeric marks each count as one
#: token — the standard approximation for "how many tokens will the
#: tokenizer produce" without shipping a tokenizer. Kept to ASCII classes
#: so Java regex (Spark) and RE2 (DuckDB oracle) agree exactly.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token counts at three granularities:

    n_ws_tokens (whitespace split), n_word_tokens (letter runs), and
    n_bpe_ish_tokens (BPE-style pre-tokenization: letter runs + digit runs
    + individual punctuation marks) — the cheap proxy for LLM token budget
    accounting over a corpus. All regexp_count, zero UDFs."""
    t = F.col(text_col)
    # BIGINT casts: DuckDB len()/regexp count twins are BIGINT and the
    # driver compares dtype width.
    return df.select(
        F.col(id_col),
        F.size(_words(t)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit("[A-Za-z]+")).cast("long").alias("n_word_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).cast("long").alias("n_bpe_ish_tokens"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-stopword language heuristic: count marker hits per language,
    argmax with deterministic first-wins tie-break. Returns
    (id, lang_guess, marker columns)."""
    words = _words(F.col(text_col))
    hits = {lang: _marker_hits(words, m) for lang, m in LANG_MARKERS}
    best = F.greatest(*hits.values())
    guess = F.lit("unk")
    # reversed: earlier languages override later ones on ties
    for lang, _ in reversed(LANG_MARKERS):
        guess = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            guess
        )
    cols = [F.col(id_col)] + [
        # BIGINT, not INT: Spark size() is INT but DuckDB len() is
        # BIGINT, and the driver's canonicalizer compares dtype width.
        hits[lang].cast("long").alias(f"hits_{lang}") for lang, _ in LANG_MARKERS
    ]
    return df.select(*cols, guess.alias("lang_guess"))


def document_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized content fingerprint: md5 over the sorted distinct word
    bag — invariant to word order and duplication, so reordered copies of
    a document collide (a cheap canonical-form dedup key)."""
    words = _words(F.col(text_col))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(words)))
    return df.select(
        F.col(id_col),
        F.md5(canon).alias("fingerprint"),
    )
