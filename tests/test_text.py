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


def _ref_bpe(words: dict[str, int], k: int):
    """Pure-Python reference BPE (Sennrich et al. pseudocode) with the
    (count DESC, left, right) tie-break."""
    hist = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, c in hist.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (x, y), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y, c))
        out = {}
        for syms, cnt in hist.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    merged.append(x + y)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + cnt
        hist = out
    return merges, hist


def test_bpe_train_matches_reference(spark):
    """Spark BPE training must reproduce the reference implementation's
    merge list exactly (including count ties broken lexicographically),
    and bpe_encode_words must yield the reference's final segmentation."""
    from delfos_etl_pipeline_spark.text.bpe import (
        bpe_encode_words,
        train_bpe,
        word_histogram,
    )

    corpus = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    hist = word_histogram(docs)
    words = {r.word: r.cnt for r in hist.collect()}
    k = 8
    got = train_bpe(hist, num_merges=k)
    want, ref_hist = _ref_bpe(words, k)
    assert got == want, f"\nspark: {got}\nref:   {want}"

    enc = {
        tuple(r.tokens): 0 for r in bpe_encode_words(hist, got).collect()
    }
    for syms in enc:
        assert tuple(syms) in ref_hist, syms


def test_bpe_merge_is_boundary_anchored(spark):
    """The ' a b' replace pattern must not match inside a token that
    merely ENDS with 'a' — the regression the leading separator guards."""
    from delfos_etl_pipeline_spark.text.bpe import bpe_encode_words

    hist = spark.createDataFrame([("xab", 1), ("ab", 1)], "word string, cnt long")
    out = {r.word: r.tokens for r in bpe_encode_words(hist, [("a", "b", 0)]).collect()}
    assert out["ab"] == ["ab"]
    # 'xab' splits to x,a,b: the a+b pair IS at a token boundary here and
    # must merge; the guarded failure mode is 'xa','b' (no ' a' boundary)
    assert out["xab"] == ["x", "ab"]
    hist2 = spark.createDataFrame([("xa b".replace(" ", ""), 1)], "word string, cnt long")
    out2 = {r.word: r.tokens for r in bpe_encode_words(hist2, [("xa", "b", 0)]).collect()}
    assert out2["xab"] == ["x", "a", "b"]  # no 'xa' token exists at char level


def test_bpe_driver_matches_distributed(spark, sf_dir):
    """The guarded driver trainer must produce the bit-identical merge
    list as the distributed rounds."""
    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.text.bpe import (
        train_bpe,
        train_bpe_driver,
        word_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")
    hist = word_histogram(docs).persist()
    assert train_bpe_driver(hist, 12) == train_bpe(hist, 12)


def test_bpe_driver_guard_raises(spark, sf_dir):
    import pytest as _pytest

    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.text.bpe import (
        HistogramTooLargeError,
        train_bpe_driver,
        word_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(HistogramTooLargeError):
        train_bpe_driver(word_histogram(docs), 5, max_words=2)
