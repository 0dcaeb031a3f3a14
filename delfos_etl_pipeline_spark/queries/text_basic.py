"""Text analysis: stats, language id, fingerprinting, token counting (SURVEY §7 M5).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.functions.stable import round_half_up
from delfos_etl_pipeline_spark.queries._registry import _t, query

# ---------------------------------------------------------------------------
# Text analysis (SURVEY §7 M5)
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle="""
    WITH w AS (
      SELECT doc_id, text, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    )
    SELECT doc_id,
           length(text) AS n_chars,
           len(words) AS n_words,
           len(list_distinct(words)) AS n_distinct_words,
           round((length(text) - (len(words) - 1)) * 1.0 / len(words), 6) AS avg_word_len,
           round(len(list_filter(words, x -> x IN ('the','a','of','and','in','to','is')))
                 * 1.0 / len(words), 6) AS stopword_ratio,
           len(regexp_extract_all(text, '[a-zA-Z]+')) AS alpha_token_count,
           round(len(list_distinct(words)) * 1.0 / len(words), 6) AS diversity,
           round(least(len(words) / 100.0, 1.0) * 0.4
                 + round(len(list_distinct(words)) * 1.0 / len(words), 6) * 0.4
                 + least(round(len(list_filter(words, x -> x IN ('the','a','of','and','in','to','is')))
                               * 1.0 / len(words), 6) * 5.0, 1.0) * 0.2, 6) AS quality_score
    FROM w
    """,
)
def text_stats_q(spark, sf_dir):
    """Quality scoring: length/diversity/stopword statistics + a blended
    [0,1] quality score — all codegen expressions."""
    from delfos_etl_pipeline_spark.text.analysis import text_stats

    return text_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_langid",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ), h AS (
      SELECT doc_id,
             len(list_filter(words, x -> x IN ('the','and','of','a','in')))   AS hits_en,
             len(list_filter(words, x -> x IN ('der','die','und','das','ist'))) AS hits_de,
             len(list_filter(words, x -> x IN ('le','la','et','les','des')))  AS hits_fr,
             len(list_filter(words, x -> x IN ('el','los','y','que','una')))  AS hits_es
      FROM w
    )
    SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
           CASE
             WHEN hits_en > 0 AND hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
             WHEN hits_de > 0 AND hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
             WHEN hits_fr > 0 AND hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
             WHEN hits_es > 0 AND hits_es = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'es'
             ELSE 'unk'
           END AS lang_guess
    FROM h
    """,
)
def text_langid(spark, sf_dir):
    """Stopword-marker language heuristic with deterministic argmax."""
    from delfos_etl_pipeline_spark.text.analysis import language_id

    return language_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(
             list_sort(list_distinct(regexp_split_to_array(lower(text), '\\s+'))),
             ' ')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Canonical-form document fingerprint: md5 of the sorted distinct
    word bag — order/duplication-invariant dedup key."""
    from delfos_etl_pipeline_spark.text.analysis import document_fingerprint

    return document_fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(lower(text), '\\s+'))      AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+'))           AS n_word_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                                                                AS n_bpe_ish_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Token counting at three granularities — whitespace, letter-run
    words, and BPE-style pre-tokenization (letter runs + digit runs +
    single punctuation marks): the cheap LLM-token-budget proxy. The
    pattern sticks to ASCII classes so Java regex and the DuckDB RE2
    oracle count identically."""
    from delfos_etl_pipeline_spark.text.analysis import token_counts

    return token_counts(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ),
    w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w2 GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w2 GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n * 1.0 / df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term,
           floor((score) * 1000000.0 + 0.5) / 1000000.0 AS tfidf,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document — the classic corpus-statistics
    keyword extractor. Three key-partitioned exchanges, all linear in
    corpus tokens: term-frequency agg keyed (doc, term), document-
    frequency agg keyed term (map-side combine on both), a term-keyed
    join of the two (the |vocab|-row DF side is dictionary-sized —
    broadcastable at need), and a per-doc ranking window. The corpus size
    N rides along as a broadcast 1-row cross join, so nothing collects.
    The displayed score uses the repo-wide round_half_up contract (plain
    round() diverges between engines on '…5' ties for transcendental
    scores — the sample_weighted_ares lesson); ranking compares the
    unrounded score in both engines."""
    docs = _t(spark, sf_dir, "documents")
    w2 = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = w2.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = w2.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            round_half_up(F.col("score"), 6).alias("tfidf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@query(
    "text_inverted_index",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ),
    w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
             CAST(floor(doc_id / 1024) AS BIGINT) AS block_id
      FROM w2 GROUP BY term, doc_id
    ),
    g AS (
      SELECT term, block_id, doc_id, tf,
             doc_id - lag(doc_id, 1, 0) OVER (
               PARTITION BY term, block_id ORDER BY doc_id) AS gap
      FROM tf
    ),
    blocks AS (
      SELECT term, block_id,
             CAST(count(*) AS BIGINT) AS n_docs_block,
             CAST(sum(tf) AS BIGINT) AS cf_block,
             string_agg(CAST(gap AS VARCHAR), ',' ORDER BY doc_id) AS doc_gaps,
             string_agg(CAST(tf AS VARCHAR), ',' ORDER BY doc_id) AS tfs
      FROM g GROUP BY term, block_id
    )
    SELECT term, block_id,
           CAST(sum(n_docs_block) OVER (PARTITION BY term) AS BIGINT) AS df_docs,
           n_docs_block, cf_block, doc_gaps, tfs
    FROM blocks
    """,
)
def text_inverted_index(spark, sf_dir):
    """Distributed inverted-index BUILD: term -> delta-encoded posting
    blocks with term frequencies — the index-construction half of the
    lexical-retrieval story whose query half is text_bm25_search. Each
    output row is one (term, 1024-doc-id block) posting block: doc-id
    GAPS (first gap is the absolute doc_id, so every block decodes
    independently — the property a distributed serving tier needs),
    aligned per-doc tf, block counts, and the term's total document
    frequency.

    Why this survives 100 TB where the naive build doesn't: the naive
    `groupBy(term).collect_list(doc_id)` holds one UNBOUNDED list per
    term — a stopword's posting list is O(corpus docs) and OOMs the
    executor. Blocking by doc-id range puts a hard cap (1024 entries) on
    every aggregation buffer, turns the hot stopword key into
    |docs|/1024 independent keys (built-in skew relief, no salting
    needed), and the per-term df is recovered with a window over the
    already-tiny (term x block) table. Exchanges: one keyed (term,
    doc_id) tf agg with map-side combine, one keyed (term, block) agg,
    one term-keyed window — all linear in corpus tokens. Delta encoding
    is exact integer math in both engines; lists are aggregated in
    explicit doc_id order and serialized as comma-joined integer-string
    signatures, so the postings hash-match bitwise."""
    docs = _t(spark, sf_dir, "documents")
    block = 1024
    w2 = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = (
        w2.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn("block_id", F.floor(F.col("doc_id") / block).cast("bigint"))
    )
    lagw = Window.partitionBy("term", "block_id").orderBy("doc_id")
    g = tf.withColumn("gap", F.col("doc_id") - F.lag("doc_id", 1, 0).over(lagw))
    # Posting lists are serialized as comma-joined integer strings (not
    # arrays): the driver's pandas canonicalizer cannot hash array cells
    # (the r4 RED-row class), and bigint->string formatting is identical
    # across engines where double->string is not (mm_byte_histogram
    # `counts`-contract precedent).
    blocks = g.groupBy("term", "block_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_block"),
        F.sum("tf").cast("bigint").alias("cf_block"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("doc_id", "gap"))),
                lambda s: s["gap"].cast("string"),
            ),
            ",",
        ).alias("doc_gaps"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: s["tf"].cast("string"),
            ),
            ",",
        ).alias("tfs"),
    )
    dfw = Window.partitionBy("term")
    return blocks.select(
        "term",
        "block_id",
        F.sum("n_docs_block").over(dfw).cast("bigint").alias("df_docs"),
        "n_docs_block",
        "cf_block",
        "doc_gaps",
        "tfs",
    )


@query(
    "text_bm25_search",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ),
    w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM w2 GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM w2 WHERE term IN ('data', 'model', 'training') GROUP BY 1, 2
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id,
           floor((score) * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
)
def text_bm25_search(spark, sf_dir):
    """Top-20 BM25 retrieval for the query {data, model, training}
    (k1=1.2, b=0.75) — the lexical-search scorer a corpus-curation
    pipeline uses for eval-set mining and quality probes. Shape: the
    query-term TF table is tiny (terms × matching docs), doc lengths are
    one narrow agg, corpus stats (N, avgdl) ride as a broadcast 1-row
    cross join, and the final score is a per-doc sum — every exchange
    keyed by doc or term, top-k via TakeOrderedAndProject (no global
    sort). IDF uses the standard ln(1 + (N - df + .5)/(df + .5)) form;
    the displayed score follows the round_half_up contract while ORDER
    uses the unrounded value in both engines."""
    docs = _t(spark, sf_dir, "documents")
    terms = ["data", "model", "training"]
    k1, b = 1.2, 0.75
    w2 = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    dl = w2.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        w2.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log(
        1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", round_half_up(F.col("score"), 6).alias("bm25"))
    )


@query(
    "text_collocations_pmi",
    oracle="""
    WITH base AS (
      SELECT regexp_split_to_array(lower(text), '\\s+') AS wa FROM documents
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cu
      FROM (SELECT unnest(wa) AS w FROM base) GROUP BY w
    ), tot AS (
      SELECT CAST(sum(cu) AS BIGINT) AS nu FROM uni
    ), bg AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS cb
      FROM (SELECT wa[i] AS x, wa[i+1] AS y
            FROM base, unnest(generate_series(1, greatest(len(wa)-1, 0)))
                 AS t(i))
      GROUP BY x, y
    ), nb AS (
      SELECT CAST(sum(cb) AS BIGINT) AS nb FROM bg
    ), cand AS (
      SELECT bg.x, bg.y, bg.cb,
             (bg.cb * 1.0 / nb.nb) /
             ((ux.cu * 1.0 / tot.nu) * (uy.cu * 1.0 / tot.nu)) AS r
      FROM bg, nb, tot
      JOIN uni ux ON bg.x = ux.w
      JOIN uni uy ON bg.y = uy.w
      WHERE bg.cb >= 5
      ORDER BY r DESC, bg.x, bg.y
      LIMIT 20
    )
    SELECT x, y, cb,
           floor(ln(r) * 1000000.0 + 0.5) / 1000000.0 AS pmi
    FROM cand
    """,
)
def text_collocations_pmi(spark, sf_dir):
    """Collocation mining: top-20 word bigrams by pointwise mutual
    information (min count 5) — the lexical-association measure that
    separates real multiword expressions from merely frequent pairs
    (top_ngrams ranks raw counts; PMI normalizes away unigram
    popularity). One tokenize pass feeds both the unigram and bigram
    histograms (persisted); totals ride as 1-row broadcasts; the top-k
    is TakeOrderedAndProject. Libm discipline (ADVICE r4): ln is
    IMPLEMENTATION-defined (JVM Math.log vs host libm can differ by an
    ulp, flipping a 6-dp half-up tie), but ln is monotone — so ranking
    uses the raw ratio r = (cb/nb)/((cux/nu)(cuy/nu)), a pure ×/÷
    IEEE expression on identical integers that is bit-identical in any
    engine, and the ln itself is evaluated once, driver-side in Python
    (host libm, same as DuckDB's — the dq_benford_digits pinned-libm
    pattern) over the 20 surviving rows only. Corpus-scale: both
    histograms are vocabulary-sized, the only corpus-scan work is the
    explode+count with map-side combine; the driver touches 20 rows."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.split(F.lower(F.col("text")), r"\s+").alias("wa")
    ).persist()
    uni = (
        base.select(F.explode("wa").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
        .persist()
    )
    words = F.col("wa")
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
    )
    bg = (
        base.select(F.explode(pairs).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
        .persist()
    )
    tot = uni.agg(F.sum("cu").cast("bigint").alias("nu"))
    nb = bg.agg(F.sum("cb").cast("bigint").alias("nb"))
    ux = uni.select(F.col("w").alias("x"), F.col("cu").alias("cux"))
    uy = uni.select(F.col("w").alias("y"), F.col("cu").alias("cuy"))
    r = (F.col("cb") * 1.0 / F.col("nb")) / (
        (F.col("cux") * 1.0 / F.col("nu"))
        * (F.col("cuy") * 1.0 / F.col("nu"))
    )
    top = (
        bg.where(F.col("cb") >= 5)
        # plain equi-joins on the word key: the unigram table is
        # vocabulary-sized (can exceed broadcast at web scale) — let
        # AQE pick broadcast when it actually fits
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb))
        .select("x", "y", "cb", r.alias("r"))
        .orderBy(F.desc("r"), "x", "y")
        .limit(20)
        .collect()
    )
    import math

    rows = [
        (
            t["x"],
            t["y"],
            t["cb"],
            math.floor(math.log(t["r"]) * 1e6 + 0.5) / 1e6,
        )
        for t in top
    ]
    return spark.createDataFrame(
        rows, "x string, y string, cb bigint, pmi double"
    )


@query(
    "text_langid_confusion",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ), h AS (
      SELECT doc_id, lang,
             len(list_filter(words, x -> x IN ('the','and','of','a','in')))   AS hits_en,
             len(list_filter(words, x -> x IN ('der','die','und','das','ist'))) AS hits_de,
             len(list_filter(words, x -> x IN ('le','la','et','les','des')))  AS hits_fr,
             len(list_filter(words, x -> x IN ('el','los','y','que','una')))  AS hits_es
      FROM w
    ), p AS (
      SELECT lang AS lang_actual,
             CASE
               WHEN hits_en > 0 AND hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
               WHEN hits_de > 0 AND hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
               WHEN hits_fr > 0 AND hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
               WHEN hits_es > 0 AND hits_es = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'es'
               ELSE 'unk'
             END AS lang_pred
      FROM h
    ), c AS (
      SELECT lang_actual, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY lang_actual, lang_pred
    )
    SELECT lang_actual, lang_pred, n,
           floor(n * 1.0 / (CAST(sum(n) OVER (PARTITION BY lang_actual)
                                 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
             AS row_rate
    FROM c
    """,
)
def text_langid_confusion(spark, sf_dir):
    """Classifier-evaluation harness over the language-ID heuristic: the
    confusion matrix of predicted vs LABELED language (documents.lang is
    ground truth in the testdata), with per-actual-language row rates —
    the diagonal is recall. Reuses the registered text_langid expression
    chain (same stopword-marker argmax, one pass, no UDFs) with the
    label carried through the scan; the matrix is |langs|² rows, the
    row-normalizer a broadcastable window over it. This is the
    eval-during-curation shape: quality-gate a heuristic against a
    labeled sample before unleashing it on the unlabeled 100 TB."""
    from delfos_etl_pipeline_spark.text.analysis import language_id

    docs = _t(spark, sf_dir, "documents")
    pred = language_id(docs, "doc_id", "text").select("doc_id", "lang_guess")
    c = (
        docs.select("doc_id", F.col("lang").alias("lang_actual"))
        .join(pred, "doc_id")
        .groupBy("lang_actual", F.col("lang_guess").alias("lang_pred"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wrow = Window.partitionBy("lang_actual")
    return c.select(
        "lang_actual",
        "lang_pred",
        "n",
        round_half_up(
            F.col("n") * F.lit(1.0) / F.sum("n").over(wrow).cast("double"), 6
        ).alias("row_rate"),
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ), uni AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cu
      FROM w WHERE term <> '' GROUP BY term
    ), top AS (
      SELECT cu,
             CAST(row_number() OVER (ORDER BY cu DESC, term) AS BIGINT)
               AS rank
      FROM uni ORDER BY cu DESC, term LIMIT 200
    ), t AS (
      SELECT CAST(floor(ln(rank) * 1000000000000.0 + 0.5) AS BIGINT) AS xi,
             CAST(floor(ln(cu) * 1000000000000.0 + 0.5) AS BIGINT) AS yi
      FROM top
    ), t2 AS (
      SELECT xi, yi,
             CAST(floor((xi / 1000000000000.0) * (yi / 1000000000000.0)
                        * 1000000000000.0 + 0.5) AS BIGINT) AS xyi,
             CAST(floor((xi / 1000000000000.0) * (xi / 1000000000000.0)
                        * 1000000000000.0 + 0.5) AS BIGINT) AS x2i
      FROM t
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(xi) AS sxi, sum(yi) AS syi,
             sum(xyi) AS sxyi, sum(x2i) AS sx2i
      FROM t2
    )
    SELECT n AS n_terms,
           floor(((n * (sxyi / 1000000000000.0)
                   - (sxi / 1000000000000.0) * (syi / 1000000000000.0))
                  / (n * (sx2i / 1000000000000.0)
                     - (sxi / 1000000000000.0) * (sxi / 1000000000000.0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
           floor((((syi / 1000000000000.0)
                   - ((n * (sxyi / 1000000000000.0)
                       - (sxi / 1000000000000.0) * (syi / 1000000000000.0))
                      / (n * (sx2i / 1000000000000.0)
                         - (sxi / 1000000000000.0)
                           * (sxi / 1000000000000.0)))
                     * (sxi / 1000000000000.0)) / n)
                 * 1000000.0 + 0.5) / 1000000.0 AS zipf_intercept
    FROM s
    """,
)
def text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus frequency spectrum: OLS slope of
    ln(frequency) on ln(rank) over the top-200 terms — natural text
    lands near -1; machine-generated or heavily-boilerplated corpora
    bend the line (too flat = vocabulary stuffing, too steep =
    template spam), making the slope a one-number corpus-health gate
    alongside text_simpson_diversity.

    Scale shape: the corpus scan reduces to the vocabulary histogram
    (map-side combined), the top-200 is TakeOrderedAndProject (never a
    global sort), and the 200 (rank, freq) pairs collect driver-side —
    a model table by construction. Libm discipline: both ln terms are
    evaluated OUTSIDE the JVM (Python host libm = DuckDB's libm, the
    dq_benford/pmi contract), pinned to integer pico-units, summed
    exactly as integers (order-free), and the slope/intercept are each
    ONE identical IEEE expression over those integer sums."""
    import math

    docs = _t(spark, sf_dir, "documents")
    uni = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    top = uni.orderBy(F.desc("cu"), F.asc("term")).limit(200).collect()
    n = len(top)
    sxi = syi = sxyi = sx2i = 0
    for rank, row in enumerate(top, start=1):
        xi = math.floor(math.log(rank) * 1e12 + 0.5)
        yi = math.floor(math.log(row["cu"]) * 1e12 + 0.5)
        sxi += xi
        syi += yi
        sxyi += math.floor((xi / 1e12) * (yi / 1e12) * 1e12 + 0.5)
        sx2i += math.floor((xi / 1e12) * (xi / 1e12) * 1e12 + 0.5)
    sx, sy = sxi / 1e12, syi / 1e12
    sxy, sx2 = sxyi / 1e12, sx2i / 1e12
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    intercept = (sy - slope * sx) / n
    return spark.createDataFrame(
        [
            (
                n,
                math.floor(slope * 1e6 + 0.5) / 1e6,
                math.floor(intercept * 1e6 + 0.5) / 1e6,
            )
        ],
        "n_terms bigint, zipf_slope double, zipf_intercept double",
    )


@query(
    "text_novelty_fraction",
    oracle="""
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      FROM words, unnest(generate_series(1, greatest(len(w)-2, 0))) AS t(i)
    ), first_seen AS (
      SELECT shingle, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           floor((sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                  * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0
             AS novelty
    FROM sh s JOIN first_seen f USING (shingle)
    GROUP BY s.doc_id
    """,
)
def text_novelty_fraction(spark, sf_dir):
    """Per-document novelty: the fraction of a document's distinct
    3-gram shingles appearing for the FIRST time in corpus (doc_id)
    order — the curation signal that separates fresh content from
    recombinations of already-seen text, used to prioritize genuinely
    new data in a training mix (dedup answers 'is this a copy of ONE
    document'; novelty answers 'is any of this new at all', catching
    mosaic plagiarism that pairwise Jaccard misses).

    Scale shape: one shingle explode (the dedup family's corpus pass),
    a shingle-keyed MIN aggregation (map-side combinable — the
    first-occurrence table is vocabulary-sized), a shingle-keyed join
    back, and a doc-keyed count — all linear in corpus shingles, no
    self-join, no all-pairs anything. Integer counts; one pinned 6-dp
    ratio."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    # Guard the degenerate case BEFORE sequence(): for a <3-word doc the
    # bound is 0 and Spark's sequence(1, 0) auto-steps DOWN to [1, 0]
    # (the mm_chunk_sample empty-payload class) — slice(w, 0, 3) would
    # then error at runtime. The where() keeps only docs with >= 1
    # shingle, matching the oracle's empty generate_series(1, 0).
    n3 = F.size("w") - 2
    sh = (
        words.where(n3 >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n3),
                    lambda i: F.array_join(F.slice("w", i, 3), " "),
                )
            ).alias("shingle"),
        )
        .distinct()
        # consumed by BOTH the first-occurrence agg and the join back:
        # persist, or the shingle explode runs twice (2-4x, the repo's
        # shared-subtree contract; verified 2 scans in the plan before).
        .persist()
    )
    first_seen = sh.groupBy("shingle").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            round_half_up(novel * 1.0 / F.count(F.lit(1)), 6).alias(
                "novelty"
            ),
        )
    )
