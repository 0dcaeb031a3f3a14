"""BPE tokenizer training — byte-pair-encoding merges learned on-corpus.

Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016): repeatedly merge the most frequent adjacent symbol
pair. The production structure (what SentencePiece/HF tokenizers do) is
exactly what Spark wants at 100 TB:

  1. ONE corpus scan builds the word histogram (word → count) — after
     that, training never touches raw text again;
  2. each merge round is an aggregation over the histogram (pair counts
     weighted by word count, map-side combinable) + an argmax + a narrow
     rewrite. The histogram is |distinct words| rows — millions at
     web scale, a perfectly ordinary DataFrame — and the driver holds
     only the merge list (num_merges pairs).

Symbol sequences are carried as strings of the form ``' ' + ' '.join(
tokens)`` (words contain no whitespace, so the separator is safe), which
makes the merge step a plain ``replace(s, ' a b', ' ab')``: leftmost
non-overlapping replacement IS greedy left-to-right BPE merging, and the
leading separator anchors token boundaries (pattern ``' a b'`` cannot
match inside a token ending in ``a``). Because both Spark and DuckDB
define ``replace`` identically, the ENTIRE training loop — pair counts,
argmax with (count DESC, left, right) tie-break, rewrite — unrolls into
an exact SQL oracle (text_bpe_train), a bit-for-bit certification of
real tokenizer training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercase whitespace-split words — the one
    corpus-scan input to BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _sym_col(word) -> F.Column:
    """' a b c' symbol-string form of a word (char-level start)."""
    return F.concat(F.lit(" "), F.array_join(F.split(word, ""), " "))


def _pair_counts(hist: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("s")), " ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )
    return (
        hist.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def train_bpe(
    hist: DataFrame, num_merges: int, checkpoint_every: int = 5
) -> list[tuple[str, str, int]]:
    """[(left, right, pair_count), ...] — the learned merge list, in
    order. ``hist`` is a (word, cnt) histogram; ties on pair count break
    lexicographically on (left, right), so training is deterministic.
    Each round: one pair-count aggregation over the histogram, one
    2-row-ish argmax collect, one narrow ``replace`` rewrite; lineage is
    truncated every ``checkpoint_every`` rounds."""
    h = hist.select("cnt", _sym_col(F.col("word")).alias("s")).persist()
    merges: list[tuple[str, str, int]] = []
    for i in range(num_merges):
        best = (
            _pair_counts(h)
            .orderBy(F.desc("c"), "x", "y")
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, c = best[0].x, best[0].y, best[0].c
        merges.append((x, y, int(c)))
        nxt = h.select(
            "cnt",
            F.replace(
                F.col("s"), F.lit(f" {x} {y}"), F.lit(f" {x}{y}")
            ).alias("s"),
        )
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()
        else:
            nxt = nxt.persist()
        h.unpersist()
        h = nxt
    h.unpersist()
    return merges


def bpe_encode_words(hist: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(word, cnt, tokens): apply the learned merges to a word histogram
    — the lookup table a corpus-wide encode joins against (broadcast or
    shuffle join on word; raw text is never re-tokenized per document)."""
    s = _sym_col(F.col("word"))
    for x, y, _ in merges:
        s = F.replace(s, F.lit(f" {x} {y}"), F.lit(f" {x}{y}"))
    return hist.select(
        "word", "cnt", F.split(F.trim(s), " ").alias("tokens")
    )


class HistogramTooLargeError(ValueError):
    """The word histogram exceeds the driver BPE-training guard."""


def train_bpe_driver(
    hist: DataFrame, num_merges: int, max_words: int = 5_000_000
) -> list[tuple[str, str, int]]:
    """Same merge list as :func:`train_bpe`, computed by an in-memory
    loop over the COLLECTED word histogram — the shape every production
    tokenizer trainer uses (HF/SentencePiece train on word counts in
    memory), valid whenever |distinct words| fits the driver. Guarded:
    collects at most ``max_words + 1`` rows (5 M words ≈ a few hundred
    MB with counts — conservative) and raises
    :class:`HistogramTooLargeError` for the distributed fallback.

    Bit-exactness with the distributed trainer (equality-tested): pair
    counts are exact integers, the argmax tie-break is (count DESC,
    left, right) where Python's code-point string order equals Spark's
    UTF-8 binary order (UTF-8 preserves code-point order), and
    ``str.replace`` performs the same leftmost non-overlapping rewrite
    as the engines' ``replace``. Caveat: characters outside the BMP
    split differently (Java UTF-16 units vs Python code points) — the
    distributed path is authoritative there.
    """
    rows = hist.select("word", "cnt").limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise HistogramTooLargeError(
            f"histogram exceeds max_words={max_words}; use train_bpe "
            "(distributed rounds) or raise the guard"
        )
    items = [(" " + " ".join(list(r["word"])), int(r["cnt"])) for r in rows]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict = {}
        for s, cnt in items:
            toks = s.strip().split(" ")
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + cnt
        if not counts:
            break
        (x, y), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((x, y, int(c)))
        pat, rep = f" {x} {y}", f" {x}{y}"
        items = [(s.replace(pat, rep), cnt) for s, cnt in items]
    return merges


def train_bpe_auto(
    hist: DataFrame, num_merges: int, max_words: int = 5_000_000
) -> list[tuple[str, str, int]]:
    """Driver loop when the histogram fits the guard, distributed rounds
    beyond it — the dedup/clusters.py three-tier pattern applied to
    tokenizer training."""
    try:
        return train_bpe_driver(hist, num_merges, max_words)
    except HistogramTooLargeError:
        return train_bpe(hist, num_merges)
