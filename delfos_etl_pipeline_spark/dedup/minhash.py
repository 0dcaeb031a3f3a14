"""MinHash + LSH banding — the scale path for near-dup detection.

Replaces ngram.py's exact shingle self-join (O(f²) per shingle) with a
fixed-cost sketch: k minhash values per document, banded into b groups of
r; documents sharing any band bucket become candidates, then candidates
are verified with exact Jaccard. For threshold t, recall follows
1-(1-t^r)^b — with k=64, b=16, r=4: ≈97% at t=0.6, >99.9% at t=0.8.

The sketch is computed ARRAY-SIDE from each document's shingle array
(ngram.shingle_arrays): sig[i] = min over shingles of xxhash64(i, shingle)
as one nested higher-order expression, and each band bucket is a hash of a
signature slice. That makes signatures + banding a pure narrow projection —
no groupBy shuffle, and none of the k-wide aggregate codegen whose
cold-start compile time dominated the grouped formulation (measured: the
64-column agg plan cost ~10s of first-run codegen at any data size). The
only shuffles left are the bucket self-join and the candidate-bounded
exact-verify join. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.dedup.ngram import (
    explode_shingles,
    jaccard_pairs,
    shingle_arrays,
)


def minhash_signatures(
    shingle_arrs: DataFrame, num_hashes: int = 64, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, sig: array<long|string>) — k min-hash values per document.

    Input is ngram.shingle_arrays output (one array row per doc). The k
    "permutations" are xxhash64 seeded with the hash index; with hashed
    (long) shingles each is constant-cost on 8-byte input. Documents with
    no shingles (< n words) are dropped — an empty set has no sketch, and
    keeping them would make every empty doc band-collide with every other.

    ``hash_fn="md5"`` keys the permutations on ``md5(i || '|' || shingle)``
    over STRING shingles and takes the lexicographic min of the hex
    digests — bit-identical in DuckDB (``min(md5(...))``), so the whole
    LSH pipeline gets an exact SQL oracle. xxhash64 stays the production
    default (8-byte keys, no hex-string materialization).
    """
    if hash_fn == "md5":
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(
                    F.col("shingles"),
                    lambda s: F.md5(F.concat_ws("|", i.cast("string"), s)),
                )
            ),
        )
    else:
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(i, s))
            ),
        )
    return shingle_arrs.where(F.size("shingles") > 0).select(
        "doc_id", sig.alias("sig")
    )


def _band_bucket_rows(
    signatures: DataFrame,
    num_hashes: int,
    bands: int,
    hash_fn: str,
) -> DataFrame:
    """(doc_id, band, bucket) — one row per (document, band); narrow
    projection + explode, no shuffle."""
    rows = num_hashes // bands
    if hash_fn == "md5":
        bucket_of = lambda j: F.md5(  # noqa: E731
            F.concat_ws("|", F.slice(F.col("sig"), j * rows + 1, rows))
        )
    else:
        bucket_of = lambda j: F.xxhash64(  # noqa: E731
            F.slice(F.col("sig"), j * rows + 1, rows)
        )
    bb = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.struct(j.alias("band"), bucket_of(j).alias("bucket")),
    )
    # explode_outer: plain explode's inferred size()>0 filter would inline
    # the whole signature+banding chain below this projection and evaluate
    # it twice per row (see ngram.explode_shingles). The band array is
    # never empty, so no NULL rows can appear.
    return signatures.select("doc_id", F.explode_outer(bb).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidates(
    signatures: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing ≥1 LSH band bucket.

    ``max_bucket`` caps bucket skew the same way the embedding LSH does
    (dedup/embedding.py): boilerplate-heavy corpora put thousands of
    near-identical documents in ONE band bucket, whose pair count is
    quadratic in occupancy. A bucket of m > max_bucket rows splits into
    ceil(m/max_bucket) deterministic salt groups (xxhash64 of the id),
    bounding it to ~m·max_bucket pairs while every member still pairs
    with ~max_bucket neighbors — connected components still glues the
    cluster. ``None`` (default) keeps the exact-oracle semantics."""
    buckets = _band_bucket_rows(signatures, num_hashes, bands, hash_fn).persist()
    join_keys = ["band", "bucket"]
    if max_bucket is not None:
        occ = buckets.groupBy("band", "bucket").agg(F.count("*").alias("occ"))
        n_salt = F.greatest(
            F.lit(1), F.ceil(F.col("occ") / F.lit(max_bucket)).cast("long")
        )
        # occupancy rows ≤ distinct buckets actually hit — a partial-agg
        # exchange over (band, bucket) keys, joined back broadcast (the
        # hot buckets the cap targets concentrate rows, so the distinct
        # bucket count stays small relative to the corpus).
        buckets = buckets.join(F.broadcast(occ), join_keys).select(
            "doc_id",
            "band",
            "bucket",
            F.pmod(F.xxhash64(F.col("doc_id")), n_salt).alias("salt"),
        )
        join_keys = ["band", "bucket", "salt"]
    a = buckets.select(F.col("doc_id").alias("doc_a"), *join_keys)
    b = buckets.select(F.col("doc_id").alias("doc_b"), *join_keys)
    return (
        a.join(b, join_keys)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidates_between(
    sig_new: DataFrame,
    sig_old: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_new, doc_old) candidates ACROSS two corpora sharing ≥1 band
    bucket — the incremental-ingest shape: no new×new or old×old pairs,
    and the old side's buckets are a function of the old corpus only, so
    a production pipeline persists them once per corpus version and each
    batch probe is one bucket-keyed join."""
    a = _band_bucket_rows(sig_new, num_hashes, bands, hash_fn).select(
        F.col("doc_id").alias("doc_new"), "band", "bucket"
    )
    b = _band_bucket_rows(sig_old, num_hashes, bands, hash_fn).select(
        F.col("doc_id").alias("doc_old"), "band", "bucket"
    )
    return a.join(b, ["band", "bucket"]).select("doc_new", "doc_old").distinct()


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    hash_fn: str = "xxhash64",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, jaccard ≥ threshold) via MinHash-LSH
    candidates verified with exact Jaccard — same output contract as
    ngram.jaccard_pairs but with LSH-bounded candidate generation.

    The verify step computes exact Jaccard only for candidate pairs
    (semi-join pruning of the shingle arrays BEFORE exploding them), so its
    cost is proportional to the number of candidates, not corpus².

    ``hash_fn="md5"`` selects the DuckDB-reproducible signature keying
    (see minhash_signatures) — exact-oracle mode for differential testing.
    ``max_bucket`` enables the salted occupancy cap (see lsh_candidates)
    for boilerplate-skewed corpora.
    """
    # The per-doc shingle arrays feed BOTH the signature pass and the
    # exact-verify pass — persist to scan/tokenize the corpus once.
    arrs = shingle_arrays(df, id_col, text_col, n, hashed=hash_fn != "md5").persist()
    # cands is referenced three times below (two cand_docs branches + the
    # final semi-join); without persist the signature+banding subtree would
    # execute once per reference.
    cands = lsh_candidates(
        minhash_signatures(arrs, num_hashes, hash_fn),
        num_hashes,
        bands,
        hash_fn,
        max_bucket,
    ).persist()
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select("doc_b"))
        .distinct()
    )
    pruned = explode_shingles(
        arrs.join(cand_docs, "doc_id", "left_semi"), with_size=True
    )
    exact = jaccard_pairs(pruned, threshold)
    return exact.join(cands, ["doc_a", "doc_b"], "left_semi")


def minhash_lsh_pairs_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_new, doc_old, jaccard ≥ threshold) — near-dups of NEW batch
    documents against an EXISTING corpus: the nightly-ingest path. Only
    batch×corpus band-bucket collisions become candidates (never
    corpus×corpus), so per-batch cost follows batch size; dedupe the
    batch against itself separately with minhash_lsh_pairs.

    Verify joins the candidate pairs back to both sides' shingle arrays
    and computes exact Jaccard via array_intersect — candidate-bounded,
    and only candidate documents' arrays move (semi-join pruning).

    At scale, signatures/buckets of the corpus side are a pure function
    of the corpus — persist them once per corpus version (parquet,
    bucketed by (band, bucket)) and this function's corpus subtree is a
    scan, not a recompute."""
    hashed = hash_fn != "md5"
    arrs_b = shingle_arrays(batch, id_col, text_col, n, hashed=hashed).persist()
    arrs_c = shingle_arrays(corpus, id_col, text_col, n, hashed=hashed).persist()
    cands = lsh_candidates_between(
        minhash_signatures(arrs_b, num_hashes, hash_fn),
        minhash_signatures(arrs_c, num_hashes, hash_fn),
        num_hashes,
        bands,
        hash_fn,
    )
    sh_new = arrs_b.select(
        F.col("doc_id").alias("doc_new"), F.col("shingles").alias("_sa")
    )
    sh_old = arrs_c.select(
        F.col("doc_id").alias("doc_old"), F.col("shingles").alias("_sb")
    )
    shared = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union_sz = F.size("_sa") + F.size("_sb") - shared
    jac = F.round(shared / union_sz, 6)
    return (
        cands.join(sh_new, "doc_new")
        .join(sh_old, "doc_old")
        .select("doc_new", "doc_old", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    **kwargs,
) -> DataFrame:
    """End-to-end near-dedup: drop the higher-id member of every near-dup
    pair (connected via the pair list) and return surviving rows."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kwargs)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def write_minhash_index(
    corpus: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
) -> None:
    """Persist the corpus-side LSH index ONCE per corpus version — the
    materialization minhash_lsh_pairs_incremental's docstring promises
    (VERDICT r8 item 6), parallel to substring.write_gram_index.

    Two relations, both pure functions of the corpus:

    - ``<path>/buckets``: (doc_id, band, bucket) — the banded signature
      rows the nightly probe joins against. Written clustered by band
      (sorted by bucket within) so band-bucket row groups compress and
      min/max-skip well; the probe join shuffles on (band, bucket)
      either way, so clustering is a storage win, not a shuffle win.
    - ``<path>/shingles``: (doc_id, shingles) — the exact-verify side.
      Persisting it keeps the nightly path corpus-scan-free: verify
      reads only the candidate documents' rows (join pruning).

    At 100 TB the nightly cost drops from O(corpus + batch) to
    O(batch + candidate probes): the standing corpus is never
    re-tokenized, re-hashed, or re-banded."""
    _write_minhash_relations(
        corpus, path, id_col, text_col, n, num_hashes, bands, hash_fn,
        mode="overwrite",
    )


def _write_minhash_relations(
    corpus: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    hash_fn: str,
    mode: str,
    batch_id: str | None = None,
) -> None:
    """Shared writer for :func:`write_minhash_index` (mode="overwrite",
    the once-per-corpus-version build) and
    :func:`merge_into_minhash_index` (mode="append", the nightly
    maintenance step). Band/shingle derivation is identical either way —
    only the write protocol differs: overwrite is plain, append routes
    through sinks.committed_append so a ``batch_id``-tagged merge is
    idempotent under crash/retry (ADVICE r11 — a double-appended merge
    would duplicate band AND shingle rows; duplicate shingle rows
    duplicate verify output rows in minhash_lsh_pairs_indexed, so
    retry-safety here is correctness, not hygiene)."""
    from delfos_etl_pipeline_spark.sources.sinks import committed_append

    hashed = hash_fn != "md5"
    arrs = shingle_arrays(corpus, id_col, text_col, n, hashed=hashed).persist()
    try:
        sigs = minhash_signatures(arrs, num_hashes, hash_fn)
        buckets = (
            _band_bucket_rows(sigs, num_hashes, bands, hash_fn)
            .repartition(F.col("band"))
            .sortWithinPartitions("band", "bucket")
        )
        if mode == "append":
            committed_append(buckets, f"{path}/buckets", batch_id=batch_id)
            committed_append(arrs, f"{path}/shingles", batch_id=batch_id)
        else:
            buckets.write.mode(mode).parquet(f"{path}/buckets")
            arrs.write.mode(mode).parquet(f"{path}/shingles")
    finally:
        arrs.unpersist()


def merge_into_minhash_index(
    batch: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
    batch_id: str | None = None,
) -> None:
    """Index MAINTENANCE (VERDICT r10 item 1): append an ACCEPTED ingest
    batch's band-bucket rows and shingle arrays to an existing
    :func:`write_minhash_index` materialization, so the next day's batch
    probes corpus ∪ today's keeps without re-tokenizing, re-hashing, or
    re-banding the standing corpus.

    Pure O(batch): signatures/bands/shingles are per-document functions,
    so the merged relations equal a from-scratch rebuild over the union
    up to file layout (doc_ids are unique across generations — no row
    can duplicate; pytest pins merged-probe ≡ rebuilt-probe). The
    banded probe join shuffles on (band, bucket) regardless of file
    count, so append-generation fragmentation is a storage/compaction
    concern (:func:`compact_minhash_index`), never correctness.

    Pass a ``batch_id`` to make the two appends idempotent under
    crash/retry (the committed_append marker protocol, one marker per
    relation); without one, the caller owns exactly-once.

    Re-adding a TOMBSTONED id raises (sinks.guard_tombstone_readd):
    the anti-join cannot tell the old generation from the new — compact
    first, then merge. Skipped on a retry of an already-committed
    batch (tombstones appended since must not fail the replay no-op)."""
    from delfos_etl_pipeline_spark.sources.sinks import (
        guard_tombstone_readd,
        is_committed,
    )

    if not is_committed(f"{path}/buckets", batch_id):
        guard_tombstone_readd(
            batch.select(id_col),
            _minhash_tombstones(batch.sparkSession, path),
            f"MinHash index {path!r}",
        )
    _write_minhash_relations(
        batch, path, id_col, text_col, n, num_hashes, bands, hash_fn,
        mode="append", batch_id=batch_id,
    )


def remove_from_minhash_index(doc_ids: DataFrame, path: str) -> None:
    """Index DELETION (VERDICT r11 item 1): tombstone a set of document
    ids out of a persisted MinHash index. ``doc_ids`` (single column,
    any name — renamed to ``doc_id``) is APPENDED to
    ``<path>/tombstones``; the probe anti-joins it against both stored
    relations, so tombstoned documents stop appearing as candidates or
    verify partners immediately, at O(probe × |tombstones|-broadcast)
    cost, while the standing band/shingle files are never touched.
    Physical removal is deferred to :func:`compact_minhash_index` —
    the same probe-time-logical / compaction-time-physical split as
    remove_from_gram_index. Removing an id that was never indexed is a
    harmless no-op (anti-join semantics), unlike the gram index's
    refcount subtraction — and for the same reason a crashed-and-
    RETRIED removal is safe without any marker protocol: duplicate
    tombstone rows anti-join identically (the committed_append
    machinery exists for the merge/refcount paths, where duplicates
    change results)."""
    ids = doc_ids.select(F.col(doc_ids.columns[0]).alias("doc_id"))
    ids.write.mode("append").parquet(f"{path}/tombstones")


def _minhash_tombstones(spark, path: str) -> DataFrame | None:
    """The tombstone relation of a MinHash index, or None if the index
    has never absorbed a removal. Existence-checked with os.path (the
    engine's index stores are directory-shaped local/DFS paths; an
    object-store deployment would pass an explicit catalog flag
    instead)."""
    import os

    if not os.path.isdir(f"{path}/tombstones"):
        return None
    return spark.read.parquet(f"{path}/tombstones")


def compact_minhash_index(spark, path: str) -> None:
    """Offline COMPACTION for a maintained MinHash index: rewrite both
    stored relations with tombstoned documents physically dropped and
    append fragmentation collapsed (buckets re-clustered by band,
    shingles rewritten densely), then retire the tombstone relation —
    deleted LAST, so a crash anywhere leaves either the old state or a
    compacted-but-still-tombstoned state, both of which probe
    identically (anti-joining an already-removed id is a no-op; pytest
    pins probe equality across compaction + crash leftovers). Each
    relation swap is sinks.staged_swap's audited rename-aside protocol.
    Runs out of band, never on the nightly path.

    Tombstones are applied and retired by SNAPSHOT (ADVICE r12): the
    relation's entries are listed once at start, the rewrites drop
    exactly the snapshotted ids, and only the snapshotted files are
    deleted at the end — a ``remove_from_minhash_index`` landing
    mid-compaction appends new files that survive the retire and stay
    pending, instead of being discarded without ever being applied."""
    import os

    from delfos_etl_pipeline_spark.sources.sinks import (
        record_compaction_watermark,
        retire_tombstones,
        snapshot_parquet_files,
        staged_swap,
        tombstone_snapshot,
    )

    tpath = os.path.join(path, "tombstones")
    snap = tombstone_snapshot(tpath)
    snap_files = snapshot_parquet_files(tpath, snap) if snap else []
    tomb = spark.read.parquet(*snap_files) if snap_files else None

    def _rewrite(rel_path: str, clustered: bool):
        def _write(tmp: str) -> None:
            rel = spark.read.parquet(rel_path)
            if tomb is not None:
                rel = rel.join(F.broadcast(tomb), "doc_id", "left_anti")
            if clustered:
                rel = rel.repartition(F.col("band")).sortWithinPartitions(
                    "band", "bucket"
                )
            rel.write.mode("overwrite").parquet(tmp)

        staged_swap(rel_path, _write)

    _rewrite(f"{path}/buckets", clustered=True)
    _rewrite(f"{path}/shingles", clustered=False)
    # reset the generation-debt axis on both swapped relations
    record_compaction_watermark(f"{path}/buckets")
    record_compaction_watermark(f"{path}/shingles")
    if snap is not None:
        retire_tombstones(tpath, snap)


def minhash_lsh_pairs_indexed(
    batch: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """minhash_lsh_pairs_incremental with the corpus side RESTORED from a
    write_minhash_index materialization: (doc_new, doc_old, jaccard >=
    threshold) for batch documents near-duplicating the standing corpus.
    Bit-identical to the from-scratch incremental form — band buckets and
    shingle arrays are deterministic functions of the corpus, so
    persist/restore cannot change a single candidate or Jaccard value
    (tests/test_dedup.py pins the equality, including across a simulated
    restart; the registered query certifies it against the from-scratch
    SQL oracle). Only the batch is tokenized/hashed at probe time.

    If the index has absorbed :func:`remove_from_minhash_index`
    takedowns, the tombstoned ids are anti-joined out of BOTH stored
    relations here (broadcast anti-join — tombstone sets are
    takedown-manifest-sized), so removed documents can neither surface
    as candidates nor as verify partners; bit-identical to probing an
    index rebuilt over corpus ∖ removed (pytest + the
    curate_nightly_ingest_day3 oracle pin it)."""
    spark = batch.sparkSession
    buckets_old = spark.read.parquet(f"{index_path}/buckets")
    sh_old = spark.read.parquet(f"{index_path}/shingles")
    tomb = _minhash_tombstones(spark, index_path)
    if tomb is not None:
        buckets_old = buckets_old.join(F.broadcast(tomb), "doc_id", "left_anti")
        sh_old = sh_old.join(F.broadcast(tomb), "doc_id", "left_anti")
    hashed = hash_fn != "md5"
    # The persist serves the two in-plan consumers (banding + verify) and
    # deliberately has NO paired unpersist: repeat invocations build the
    # IDENTICAL logical plan, and Spark's CacheManager.cacheQuery refuses
    # to double-cache a plan it can already look up — so the session
    # holds AT MOST ONE cached copy of the batch shingles (reused, not
    # accumulated; ADVICE r9 investigated, and an unpersist-per-call
    # variant measured 0.9s -> 4.5s at sf0.1 because every bench
    # iteration re-tokenized the batch instead of hitting the cache).
    # LRU eviction reclaims it under memory pressure; session stop frees it.
    arrs_b = shingle_arrays(batch, id_col, text_col, n, hashed=hashed).persist()
    bb_new = _band_bucket_rows(
        minhash_signatures(arrs_b, num_hashes, hash_fn),
        num_hashes,
        bands,
        hash_fn,
    ).select(F.col("doc_id").alias("doc_new"), "band", "bucket")
    cands = (
        bb_new.join(
            buckets_old.select(
                F.col("doc_id").alias("doc_old"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select("doc_new", "doc_old")
        .distinct()
    )
    sh_new = arrs_b.select(
        F.col("doc_id").alias("doc_new"), F.col("shingles").alias("_sa")
    )
    sh_restored = sh_old.select(
        F.col("doc_id").alias("doc_old"), F.col("shingles").alias("_sb")
    )
    shared = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union_sz = F.size("_sa") + F.size("_sb") - shared
    jac = F.round(shared / union_sz, 6)
    return (
        cands.join(sh_new, "doc_new")
        .join(sh_restored, "doc_old")
        .select("doc_new", "doc_old", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
