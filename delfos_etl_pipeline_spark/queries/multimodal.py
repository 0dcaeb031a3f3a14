"""Multimodal binary payload columns: metadata projection and Arrow-batched byte-histogram features (SURVEY §7 M5).

Split from the monolithic queries.py registry (round 4); behavior
unchanged — importing this module registers its queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.queries._registry import _t, query

# ---------------------------------------------------------------------------
# Multimodal binary columns (SURVEY §7 M5)
# ---------------------------------------------------------------------------


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def mm_binary_meta(spark, sf_dir):
    """Binary payload column + typed metadata struct — metadata-only reads
    prune the payload column entirely (columnar win at 100 TB)."""
    from delfos_etl_pipeline_spark.multimodal.binary import attach_binary_payload

    docs = _t(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs, "doc_id", "text")
    return bin_df.select("doc_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.mime").alias("mime"))


@query(
    "mm_byte_histogram",
    oracle="""
    WITH b AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
             list_transform(range(1, length(text) + 1),
               i -> unicode(substr(text, i, 1)) // 16) AS bins
      FROM documents
    ),
    h AS (
      SELECT doc_id, n_bytes,
             list_transform(range(0, 16),
               k -> CAST(len(list_filter(bins, x -> x = k)) AS BIGINT)) AS counts
      FROM b
    )
    SELECT doc_id, n_bytes,
           round(-list_sum(list_transform(
             list_filter(list_transform(counts, c -> c * 1.0 / n_bytes),
                         x -> x > 0),
             x -> x * log2(x))), 6) AS entropy,
           array_to_string(counts, ',') AS feature_sig
    FROM h
    """,
)
def mm_byte_histogram(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction (16-bin byte histogram
    + entropy) over binary payloads — the real-decoder batch contract.

    Compared contract is scalar-only (driver canonicalizers cannot sort
    array columns): the histogram is emitted as ``feature_sig``, a
    comma-joined string of the 16 exact integer bin counts — no float
    rounding in the compared feature at all. The normalized
    ``array<double>`` form stays available from
    ``byte_histogram_features`` for downstream model consumers.

    Oracle-validity guard: the payload is UTF-8 text and the driver corpus
    is pure ASCII (one byte per codepoint), so the DuckDB oracle mirrors
    the byte stream via ``unicode(substr(...))``. Non-ASCII text would
    break that mirror — the oracle is valid only for ASCII corpora (the
    generator's documents table is; see TESTDATA.md)."""
    from delfos_etl_pipeline_spark.multimodal.binary import (
        attach_binary_payload,
        byte_histogram_features,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = byte_histogram_features(attach_binary_payload(docs, "doc_id", "text"))
    return feats.select(
        "doc_id",
        "n_bytes",
        "entropy",
        F.array_join(F.col("counts").cast("array<string>"), ",").alias("feature_sig"),
    )


@query(
    "mm_audio_features",
    oracle="""
    WITH a AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
             list_transform(range(1, length(text) + 1),
               i -> unicode(substr(text, i, 1)) - 128) AS amp
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id,
           16000 AS sample_rate,
           1 AS n_channels,
           n AS n_samples,
           floor((n * 1.0 / 16000) * 1000000.0 + 0.5) / 1000000.0
             AS duration_sec,
           floor(sqrt(list_sum(list_transform(amp,
                 x -> CAST(x * x AS BIGINT))) * 1.0 / n)
                 * 1000000.0 + 0.5) / 1000000.0 AS rms,
           CAST(list_max(list_transform(amp, x -> abs(x))) AS INT) AS peak
    FROM a
    """,
)
def mm_audio_features(spark, sf_dir):
    """REAL audio decode end-to-end: each document's ASCII bytes become
    8-bit PCM amplitudes serialized into a genuine RIFF/WAVE payload
    (multimodal/binary.py::encode_wav_pcm), which the chunk-walking WAV
    parser (decode_wav) decodes back before feature extraction
    (audio_features_batch: duration, exact-integer-sum RMS, peak). The
    oracle recomputes the features straight from the text's codepoints —
    8-bit WAV stores byte+128 biased samples, so text byte b is amplitude
    b-128 — proving the encode→decode round trip bit-exact through two
    Arrow-batched mapInPandas stages. ASCII-corpus caveat as
    mm_byte_histogram. At 100 TB both stages are narrow (zero exchange),
    payload bytes never shuffle."""
    import numpy as np
    import pandas as pd

    from delfos_etl_pipeline_spark.multimodal.binary import (
        audio_features_batch,
        encode_wav_pcm,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select("doc_id", "text")
    )

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_wav_pcm(
                            np.frombuffer(
                                t.encode("ascii"), dtype=np.uint8
                            ).astype(np.int32)
                            - 128,
                            16000,
                            bits=8,
                        )
                        for t in pdf["text"]
                    ],
                }
            )

    wav = docs.mapInPandas(synth, "doc_id long, payload binary")
    return audio_features_batch(wav)


@query(
    "mm_chunk_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(length(substr(text, i * 32 + 1, 32)) AS BIGINT) AS chunk_bytes,
           md5(substr(text, i * 32 + 1, 32)) AS chunk_md5
    FROM b, unnest(generate_series(0, CAST(ceil(n / 32.0) AS BIGINT) - 1))
         AS t(i)
    WHERE i % 4 = 0
    """,
)
def mm_chunk_sample(spark, sf_dir):
    """Strided chunk sampling over opaque binary payloads — the video
    keyframe-sampling access pattern (every 4th 32-byte chunk,
    identified by content md5) executed as decode-free byte seeks in
    pure Catalyst expressions (multimodal/binary.py sample_chunks).
    ASCII-corpus oracle guard as mm_byte_histogram: payload bytes ==
    text codepoints, so DuckDB mirrors the chunks via substr on the
    text. At 100 TB only the sampled slices survive the projection."""
    from delfos_etl_pipeline_spark.multimodal.binary import (
        attach_binary_payload,
        sample_chunks,
    )

    docs = _t(spark, sf_dir, "documents")
    return sample_chunks(
        attach_binary_payload(docs, "doc_id", "text"), chunk_size=32, stride=4
    )
