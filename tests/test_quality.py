"""Quality filtering, PII redaction, normalization, sharding, and
embedding quantization — the round-3 curation extensions."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat near the cat"),
        (2, "spam spam spam spam spam spam"),
        (3, "a perfectly ordinary sentence with varied vocabulary here"),
        (4, "x"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- quality ----------------------------------------------------------------


def test_quality_signals_exact(spark, docs):
    from delfos_etl_pipeline_spark.text.quality import quality_signals

    out = {r["doc_id"]: r for r in quality_signals(docs).collect()}
    # doc 2: "spam" 6/6 words, bigram "spam spam" x5 covering 5*9=45 of 29
    # chars -> frac > 1 is fine (overlapping occurrences), flag fails.
    assert out[2]["top_word_frac"] == 1.0
    assert out[2]["dup_word_frac"] == pytest.approx(1 - 1 / 6, abs=1e-6)
    assert out[2]["quality_pass"] == 0
    # doc 3: 8 distinct words of 8 -> dup 0, top word 1/8.
    assert out[3]["dup_word_frac"] == 0.0
    assert out[3]["top_word_frac"] == 0.125
    # doc 4: single word, no bigrams -> coalesced 0, never null.
    assert out[4]["top_bigram_char_frac"] == 0.0


def test_quality_filter_is_subset(spark, docs):
    from delfos_etl_pipeline_spark.text.quality import (
        quality_filter,
        quality_signals,
    )

    kept = quality_filter(docs)
    n_pass = (
        quality_signals(docs).where(F.col("quality_pass") == 1).count()
    )
    assert kept.count() == n_pass
    assert set(kept.columns) == set(docs.columns)


# -- redaction / normalization ---------------------------------------------


def test_redact_pii_strips_and_counts(spark):
    from delfos_etl_pipeline_spark.text.redact import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@site.org and b@x.io now"),
            (2, "host 192.168.0.1 dial 555-0100 or 555-123-4567"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 2 and "<EMAIL>" in out[1]["redacted"]
    assert "@" not in out[1]["redacted"]
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phone"] == 2
    assert "192" not in out[2]["redacted"]
    assert out[3]["redacted"] == "clean text with no pii at all"


def test_normalize_idempotent(spark):
    from delfos_etl_pipeline_spark.text.redact import normalize_text

    df = spark.createDataFrame(
        [(1, "  Mixed \t CASE\x07 and\r\n  runs  ")],
        "doc_id long, text string",
    )
    once = normalize_text(df).collect()[0]
    assert once["norm_text"] == "mixed case and runs"
    again = normalize_text(
        spark.createDataFrame(
            [(1, once["norm_text"])], "doc_id long, text string"
        )
    ).collect()[0]
    assert again["norm_text"] == once["norm_text"]
    assert again["norm_md5"] == once["norm_md5"]
    assert again["chars_removed"] == 0


# -- sharding ---------------------------------------------------------------


@pytest.mark.parametrize("keying", ["md5", "xxhash64"])
def test_shard_assignment_layout(spark, sf_dir, keying):
    from delfos_etl_pipeline_spark.operators.sharding import shard_assignment
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = shard_assignment(docs, "doc_id", n_shards=4, seed=7, keying=keying)
    rows = out.collect()
    assert len(rows) == docs.count()
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(4))
    # positions are 1..k contiguous within every shard
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shard_deterministic_and_seed_sensitive(spark, sf_dir):
    from delfos_etl_pipeline_spark.operators.sharding import shard_assignment
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignment(docs, seed=42).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignment(docs, seed=42).collect()
    }
    c = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignment(docs, seed=43).collect()
    }
    assert a == b
    assert a != c  # a different seed is a different permutation


def test_write_shards_round_trip(spark, sf_dir, tmp_path):
    from delfos_etl_pipeline_spark.operators.sharding import (
        shuffle_shard,
        write_shards,
    )
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    write_shards(shuffle_shard(docs, n_shards=4), path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() <= 4


# -- quantization -----------------------------------------------------------


def test_quantize_codes_and_error(spark, sf_dir):
    from delfos_etl_pipeline_spark.similarity.quantize import quantize
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = quantize(emb, "vec_id", "embedding", dim=64)
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows[:10]:
        codes = [int(x) for x in r["q_sig"].split(",")]
        assert len(codes) == 64
        assert all(0 <= c <= 255 for c in codes)
    # int8 affine on a [-0.5, 0.5]-ish corpus: per-dim step ~ range/256,
    # mse ~ step^2/12 — far below 1e-4.
    assert max(r["recon_mse"] for r in rows) < 1e-4


def test_quantize_constant_dimension(spark):
    from delfos_etl_pipeline_spark.similarity.quantize import quantize

    df = spark.createDataFrame(
        [(1, [1.0, 0.25]), (2, [1.0, 0.75])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize(df, "vec_id", "embedding", dim=2).collect()}
    # dim 1 is constant -> code 0, reconstruction lands on mn exactly
    assert out[1]["q_sig"].split(",")[0] == "0"
    assert out[2]["q_sig"].split(",")[0] == "0"


def test_expectations_detect_violations(spark):
    """Each check kind must actually fail on violating data (the sf-table
    query only proves the passing path)."""
    from pyspark.sql import Row

    from delfos_etl_pipeline_spark.operators.expectations import (
        null_rate_below,
        run_expectations,
        unique_key,
        value_range,
        values_in,
    )

    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0, s="a"),
            Row(k=1, v=50.0, s="b"),     # dup key, out-of-range v
            Row(k=2, v=None, s="zzz"),   # null v, out-of-domain s
            Row(k=3, v=7.0, s="a"),
        ]
    )
    out = {
        r["check_name"]: r
        for r in run_expectations(
            df,
            [
                null_rate_below("v", 0.10),     # 1/4 nulls → fail
                value_range("v", 0.0, 10.0),    # 50.0 → fail
                values_in("s", ["a", "b"]),     # zzz → fail
                unique_key("k"),                # dup → fail
            ],
        ).collect()
    }
    assert all(r["passed"] == 0 for r in out.values()), out
    assert out["null_rate(v)<0.1"]["metric"] == 0.25
    assert out["range(v)"]["metric"] == 0.75
    # and the passing configuration flips everything to 1
    ok = run_expectations(
        df.filter(F.col("k") != 1),
        [null_rate_below("v", 0.9), value_range("v", 0.0, 10.0),
         values_in("s", ["a", "zzz"]), unique_key("k")],
    ).collect()
    assert all(r["passed"] == 1 for r in ok)


def test_expectations_quoted_name_and_empty_specs(spark):
    """A single quote in a check name must not break evaluation (names are
    literal Columns, not SQL text), and an empty spec list returns an
    empty typed frame instead of erroring (ADVICE r3)."""
    from delfos_etl_pipeline_spark.operators.expectations import (
        run_expectations,
        values_in,
    )

    df = spark.createDataFrame([("it's",), ("fine",)], "v string")
    spec = values_in("v", ["it's", "fine"])
    assert "'" in spec["name"] or True  # name content is free-form
    spec["name"] = "quote'in\"name"
    rows = run_expectations(df, [spec]).collect()
    assert len(rows) == 1
    assert rows[0].check_name == "quote'in\"name"
    assert rows[0].passed == 1

    empty = run_expectations(df, [])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "check_name", "metric", "passed",
    ]
