"""Index lifecycle — DELETION + COMPACTION + retry-safe merges (r12).

VERDICT r11 items 1-2 / ADVICE r11: the four persisted index families
(counted grams, MinHash bands+shingles, IVF cells, PQ codes) gain
takedown support (probe-time refcount netting / tombstone anti-joins,
physical removal deferred to compaction), every compaction swaps via the
audited staged_swap protocol (no destructive crash window), and every
merge append is idempotent under crash/retry when tagged with a
batch_id. Each family's contract: probe-for-probe equality with a
FROM-SCRATCH rebuild over the effective corpus, before AND after
compaction, plus restart probes.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.sources.parquet import load_table


# ---------------------------------------------------------------- fs layer


def test_staged_swap_self_heals(tmp_path):
    """Every crash interleaving of the swap leaves a recoverable state:
    bak-without-live rolls back, bak-with-live finishes cleanup, stale
    tmp is discarded — and a trailing-slash path must not relocate the
    staging dirs (the ADVICE r11 compact_gram_index bug class)."""
    from delfos_etl_pipeline_spark.sources.sinks import staged_swap

    def _mkdir(p, marker):
        os.makedirs(p)
        with open(os.path.join(p, "data.txt"), "w") as f:
            f.write(marker)

    def _marker(p):
        with open(os.path.join(p, "data.txt")) as f:
            return f.read()

    def _writer(content):
        def _w(tmp):
            _mkdir(tmp, content)

        return _w

    # normal swap (with a trailing slash): new content lands, old gone
    live = str(tmp_path / "ds")
    _mkdir(live, "v1")
    staged_swap(live + "/", _writer("v2"))
    assert _marker(live) == "v2"
    assert not os.path.exists(live + "._compact_tmp")
    assert not os.path.exists(live + "._compact_bak")

    # crash between the two renames: live missing, bak holds the original
    os.rename(live, live + "._compact_bak")
    staged_swap(live, _writer("v3"))
    assert _marker(live) == "v3"

    # crash after the second rename, before the bak delete
    _mkdir(live + "._compact_bak", "stale-old")
    staged_swap(live, _writer("v4"))
    assert _marker(live) == "v4"
    assert not os.path.exists(live + "._compact_bak")

    # crash mid-write: a stale tmp must be discarded, not swapped in
    _mkdir(live + "._compact_tmp", "half-written")
    staged_swap(live, _writer("v5"))
    assert _marker(live) == "v5"


def test_committed_append_idempotent(spark, tmp_path):
    """committed_append with a batch_id is exactly-once under retries:
    a plain retry no-ops on the done marker, and a crash between the
    file moves and the marker (staging left with _SUCCESS and no data
    files) commits without re-appending a single row."""
    from delfos_etl_pipeline_spark.sources.sinks import committed_append

    live = str(tmp_path / "rel")
    base = spark.range(10).select(F.col("id").alias("v"))
    base.write.parquet(live)
    batch = spark.range(100, 105).select(F.col("id").alias("v"))

    committed_append(batch, live, batch_id="b1")
    assert spark.read.parquet(live).count() == 15
    # retry after success: marker short-circuits
    committed_append(batch, live, batch_id="b1")
    assert spark.read.parquet(live).count() == 15
    # crash-sim: marker lost, staging present with _SUCCESS but every
    # data file already moved — the retry must move nothing and commit
    done = live + "._merged_b1"
    staging = live + "._merge_b1"
    os.remove(done)
    os.makedirs(staging)
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    committed_append(batch, live, batch_id="b1")
    assert spark.read.parquet(live).count() == 15
    assert os.path.exists(done)
    assert not os.path.exists(staging)
    # a second batch id still appends
    committed_append(batch, live, batch_id="b2")
    assert spark.read.parquet(live).count() == 20
    with pytest.raises(ValueError, match="path-safe"):
        committed_append(batch, live, batch_id="../evil")


# ---------------------------------------------------------------- grams


def _gram_fixture(spark):
    corpus0 = spark.createDataFrame(
        [
            # docs 1 and 2 SHARE their grams: removing doc 2 must keep
            # every shared gram alive via doc 1's refcount
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "an entirely different standing corpus document body here"),
        ],
        "doc_id long, text string",
    )
    keeps = spark.createDataFrame(
        [
            (10, "fresh accepted document with shared lazy dog again today"),
            (11, "unique nightly accepted text that nothing else repeats"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (20, "prefix words the quick brown fox jumps over the lazy dog"),
            (21, "unique nightly accepted text that nothing else repeats"),
            (22, "fresh accepted document with shared lazy dog again today"),
            (23, "no gram here overlaps any standing corpus document text"),
        ],
        "doc_id long, text string",
    )
    return corpus0, keeps, batch


def test_gram_counted_remove_equals_rebuild(spark, tmp_path):
    """Counted gram index: build → merge → REMOVE must probe identically
    to a from-scratch index over (corpus ∪ keeps) ∖ removed — including
    the shared-gram case where a removed document's gram survives via a
    surviving document's refcount."""
    from delfos_etl_pipeline_spark.dedup.substring import (
        merge_into_gram_index,
        remove_from_gram_index,
        remove_spans_matching_indexed,
        write_gram_index,
    )

    corpus0, keeps, batch = _gram_fixture(spark)
    # remove doc 2 (its grams shared with doc 1 must stay) and doc 11
    # (its grams die with it — doc 21's matches must disappear)
    removed = corpus0.where(F.col("doc_id") == 2).union(
        keeps.where(F.col("doc_id") == 11)
    )
    effective = corpus0.union(keeps).join(
        removed.select("doc_id"), "doc_id", "left_anti"
    )
    for hashed in (False, True):
        live = str(tmp_path / f"grams_{hashed}")
        write_gram_index(
            corpus0, live, "doc_id", "text", k=5, hashed=hashed, counted=True
        )
        merge_into_gram_index(
            keeps, live, "doc_id", "text", k=5, hashed=hashed, counted=True,
            batch_id="day1",
        )
        remove_from_gram_index(
            removed, live, "doc_id", "text", k=5, hashed=hashed,
            batch_id="takedown",
        )
        rebuilt = str(tmp_path / f"grams_rebuilt_{hashed}")
        write_gram_index(
            effective, rebuilt, "doc_id", "text", k=5, hashed=hashed
        )
        got = sorted(
            remove_spans_matching_indexed(
                batch, live, "doc_id", "text", k=5, hashed=hashed,
                net_counts=True,
            ).collect()
        )
        want = sorted(
            remove_spans_matching_indexed(
                batch, rebuilt, "doc_id", "text", k=5, hashed=hashed
            ).collect()
        )
        assert got == want
        # retrying the removal is idempotent (marker protocol)
        remove_from_gram_index(
            removed, live, "doc_id", "text", k=5, hashed=hashed,
            batch_id="takedown",
        )
        again = sorted(
            remove_spans_matching_indexed(
                batch, live, "doc_id", "text", k=5, hashed=hashed,
                net_counts=True,
            ).collect()
        )
        assert again == want
    by_id = {r.doc_id: r for r in want}
    assert by_id[20].n_removed > 0   # shared grams survive doc 2's removal
    assert by_id[21].n_removed == 0  # doc 11's unique grams are gone
    assert by_id[22].n_removed > 0   # untouched keep still cuts
    assert by_id[23].n_removed == 0


def test_gram_counted_compaction(spark, tmp_path):
    """compact_gram_index(counted=True) nets the refcount generations,
    physically drops dead grams, and is probe-for-probe invisible."""
    from delfos_etl_pipeline_spark.dedup.substring import (
        compact_gram_index,
        merge_into_gram_index,
        remove_from_gram_index,
        remove_spans_matching_indexed,
        write_gram_index,
    )

    corpus0, keeps, batch = _gram_fixture(spark)
    removed = corpus0.where(F.col("doc_id") == 2).union(
        keeps.where(F.col("doc_id") == 11)
    )
    live = str(tmp_path / "grams")
    write_gram_index(
        corpus0, live, "doc_id", "text", k=5, hashed=False, counted=True
    )
    merge_into_gram_index(
        keeps, live, "doc_id", "text", k=5, hashed=False, counted=True
    )
    remove_from_gram_index(removed, live, "doc_id", "text", k=5, hashed=False)

    def _probe():
        return sorted(
            remove_spans_matching_indexed(
                batch, live, "doc_id", "text", k=5, hashed=False,
                net_counts=True,
            ).collect()
        )

    before = _probe()
    compact_gram_index(spark, live, counted=True)
    after = _probe()
    assert after == before
    rel = spark.read.parquet(live)
    # one row per surviving gram, every count positive, dead grams gone
    assert rel.count() == rel.select("gram").distinct().count()
    assert rel.where(F.col("cnt") <= 0).count() == 0
    # doc 11's unique grams are physically absent: re-adding doc 11
    # restores cuts (count algebra starts clean, not from a stale -1)
    merge_into_gram_index(
        keeps.where(F.col("doc_id") == 11), live, "doc_id", "text",
        k=5, hashed=False, counted=True,
    )
    by_id = {r.doc_id: r for r in _probe()}
    assert by_id[21].n_removed > 0


# ---------------------------------------------------------------- MinHash


def test_minhash_remove_and_compact_equals_rebuild(spark, tmp_path):
    """MinHash tombstones: removed docs stop surfacing as candidates or
    verify partners, probe ≡ rebuild over the effective corpus, and
    compaction physically retires them without changing one probe row."""
    from delfos_etl_pipeline_spark.dedup.minhash import (
        compact_minhash_index,
        merge_into_minhash_index,
        minhash_lsh_pairs_indexed,
        remove_from_minhash_index,
        write_minhash_index,
    )

    corpus0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "an entirely different standing corpus document body here"),
        ],
        "doc_id long, text string",
    )
    keeps = spark.createDataFrame(
        [(10, "a freshly accepted nightly document body with novel words")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (20, "the quick brown fox jumps over the lazy dog again tonight"),
            (21, "a freshly accepted nightly document body with novel terms"),
        ],
        "doc_id long, text string",
    )
    # remove doc 1 (a base-generation doc) and doc 10 (a merged keep)
    removed = spark.createDataFrame([(1,), (10,)], "doc_id long")
    effective = corpus0.union(keeps).join(removed, "doc_id", "left_anti")
    live = str(tmp_path / "lsh")
    write_minhash_index(corpus0, live, "doc_id", "text", n=3, hash_fn="md5")
    merge_into_minhash_index(
        keeps, live, "doc_id", "text", n=3, hash_fn="md5", batch_id="day1"
    )

    def _probe(path):
        return sorted(
            minhash_lsh_pairs_indexed(
                batch, path, "doc_id", "text", n=3,
                threshold=0.5, hash_fn="md5",
            ).collect()
        )

    pre = _probe(live)
    assert any(r.doc_old == 1 for r in pre) and any(
        r.doc_old == 10 for r in pre
    )
    remove_from_minhash_index(removed, live)
    rebuilt = str(tmp_path / "lsh_rebuilt")
    write_minhash_index(effective, rebuilt, "doc_id", "text", n=3, hash_fn="md5")
    got = _probe(live)
    want = _probe(rebuilt)
    assert got == want
    assert not any(r.doc_old in (1, 10) for r in got)
    compact_minhash_index(spark, live)
    assert not os.path.isdir(os.path.join(live, "tombstones"))
    assert _probe(live) == want
    stored = {
        r.doc_id
        for r in spark.read.parquet(f"{live}/shingles").select("doc_id").collect()
    }
    assert stored == {2}


# ---------------------------------------------------------------- IVF


def test_ivf_remove_and_compact_equals_rebuild(spark, sf_dir, tmp_path):
    """IVF tombstones: read_ivf_index anti-joins removed ids (probe ≡
    rebuild over the effective set with the FROZEN quantizer), partition
    pruning survives, and compaction physically drops the rows."""
    from delfos_etl_pipeline_spark.similarity.ivf import (
        assign_fixed_centroids,
        build_ivf_index_fixed,
        compact_ivf_index,
        ivf_topk,
        merge_into_ivf_index,
        read_ivf_index,
        remove_from_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.where(F.col("vec_id") % 3 != 0)
    day1 = emb.where(F.col("vec_id") % 6 == 0)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]

    assigned0, cents = build_ivf_index_fixed(corpus0, n_clusters=8)
    live = str(tmp_path / "ivf")
    write_ivf_index(assigned0.select("vec_id", "embedding", "cluster"), live)
    merge_into_ivf_index(
        assign_fixed_centroids(day1, cents, inline=True).select(
            "vec_id", "embedding", "cluster"
        ),
        live,
        batch_id="day1",
    )
    union = corpus0.union(day1)
    removed = union.where(F.col("vec_id") % 5 == 1).select("vec_id")
    remove_from_ivf_index(removed, live, "vec_id")
    effective = union.join(removed, "vec_id", "left_anti")
    want = ivf_topk(
        assign_fixed_centroids(effective, cents, inline=True),
        cents, qvec, k=10, n_probe=8,
    ).collect()
    got = ivf_topk(read_ivf_index(spark, live), cents, qvec, k=10, n_probe=8).collect()
    assert got == want
    # pruning survives the tombstone anti-join
    pruned = read_ivf_index(spark, live).where(F.col("cluster").isin([0, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    compact_ivf_index(spark, live, "vec_id")
    assert not os.path.isdir(live + ".tombstones")
    got2 = ivf_topk(
        read_ivf_index(spark, live), cents, qvec, k=10, n_probe=8
    ).collect()
    assert got2 == want
    removed_ids = {r.vec_id for r in removed.collect()}
    stored_ids = {r.vec_id for r in spark.read.parquet(live).select("vec_id").collect()}
    assert not (stored_ids & removed_ids)


# ---------------------------------------------------------------- PQ


def test_pq_remove_and_compact_equals_rebuild(spark, sf_dir, tmp_path):
    """PQ tombstones: read_pq_index anti-joins removed ids out of the
    codes relation (ADC ≡ re-encode over the effective corpus with the
    FROZEN codebooks); compaction physically drops them and leaves the
    sidecar untouched."""
    from delfos_etl_pipeline_spark.similarity.pq import (
        compact_pq_index,
        fit_pq_codebooks_fixed,
        merge_into_pq_index,
        pq_adc_topk,
        pq_encode,
        read_pq_index,
        remove_from_pq_index,
        write_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.where(F.col("vec_id") % 3 != 0)
    day1 = emb.where(F.col("vec_id") % 6 == 0)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    books = fit_pq_codebooks_fixed(corpus0, m=8, k=16)

    live = str(tmp_path / "pq")
    write_pq_index(pq_encode(corpus0, books), books, live)
    merge_into_pq_index(pq_encode(day1, books), live, batch_id="day1")
    union = corpus0.union(day1)
    removed = union.where(F.col("vec_id") % 5 == 1).select("vec_id")
    remove_from_pq_index(removed, live, "vec_id")
    effective = union.join(removed, "vec_id", "left_anti")
    want = pq_adc_topk(
        pq_encode(effective, books), books, qvec, "vec_id", k=10
    ).collect()
    codes_r, books_r = read_pq_index(spark, live)
    assert books_r == books
    got = pq_adc_topk(codes_r, books_r, qvec, "vec_id", k=10).collect()
    assert got == want
    compact_pq_index(spark, live)
    assert not os.path.isdir(os.path.join(live, "tombstones"))
    codes_c, books_c = read_pq_index(spark, live)
    assert books_c == books
    assert pq_adc_topk(codes_c, books_c, qvec, "vec_id", k=10).collect() == want
    removed_ids = {r.vec_id for r in removed.collect()}
    stored_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{live}/codes").select("vec_id").collect()
    }
    assert not (stored_ids & removed_ids)


# ------------------------------------------------- r13 hardening (ADVICE r12)


def test_compact_gram_index_infers_counted_mode(spark, tmp_path):
    """ADVICE r12: every gram index the repo writes is counted, but
    compact_gram_index defaulted to counted=False — distinct() over a
    counted index collapses identical (gram, cnt) rows from different
    generations and corrupts net refcounts. The mode is now INFERRED
    from the stored schema, and an explicit flag that contradicts it
    raises instead of corrupting."""
    from delfos_etl_pipeline_spark.dedup.substring import (
        compact_gram_index,
        merge_into_gram_index,
        write_gram_index,
    )

    corpus0, keeps, _batch = _gram_fixture(spark)
    live = str(tmp_path / "grams")
    write_gram_index(
        corpus0, live, "doc_id", "text", k=5, hashed=False, counted=True
    )
    # a second generation with OVERLAPPING grams at the SAME count —
    # the distinct() failure mode collapses these pairs of rows
    merge_into_gram_index(
        corpus0, live, "doc_id", "text", k=5, hashed=False, counted=True
    )
    doubled = {
        r.gram: r.cnt
        for r in spark.read.parquet(live)
        .groupBy("gram")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    with pytest.raises(ValueError, match="contradicts the stored schema"):
        compact_gram_index(spark, live, counted=False)
    compact_gram_index(spark, live)  # infer: counted
    after = {r.gram: r.cnt for r in spark.read.parquet(live).collect()}
    assert after == doubled  # refcounts preserved, not collapsed

    # uncounted (set) index: inference picks the distinct() path
    live_set = str(tmp_path / "grams_set")
    write_gram_index(
        corpus0, live_set, "doc_id", "text", k=5, hashed=False, counted=False
    )
    merge_into_gram_index(
        corpus0, live_set, "doc_id", "text", k=5, hashed=False, counted=False
    )
    with pytest.raises(ValueError, match="contradicts the stored schema"):
        compact_gram_index(spark, live_set, counted=True)
    compact_gram_index(spark, live_set)
    rel = spark.read.parquet(live_set)
    assert rel.count() == rel.distinct().count()


def test_compaction_spares_mid_run_tombstones(spark, tmp_path, monkeypatch):
    """ADVICE r12: a remove_from_* landing while a compaction is running
    must survive — the compaction applies and retires ONLY the
    tombstones snapshotted at its start; later appends stay pending for
    the probe anti-join and the next compaction, never silently
    discarded. Simulated by injecting a removal into the first
    staged_swap of compact_minhash_index."""
    from delfos_etl_pipeline_spark.dedup.minhash import (
        compact_minhash_index,
        minhash_lsh_pairs_indexed,
        remove_from_minhash_index,
        write_minhash_index,
    )
    from delfos_etl_pipeline_spark.sources import sinks

    corpus0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "an entirely different standing corpus document body here"),
            (3, "a third standing corpus document with its own novel words"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (20, "the quick brown fox jumps over the lazy dog again tonight"),
            (21, "an entirely different standing corpus document body there"),
            (22, "a third standing corpus document with its own novel terms"),
        ],
        "doc_id long, text string",
    )
    live = str(tmp_path / "lsh")
    write_minhash_index(corpus0, live, "doc_id", "text", n=3, hash_fn="md5")
    remove_from_minhash_index(
        spark.createDataFrame([(1,)], "doc_id long"), live
    )

    real_swap = sinks.staged_swap
    fired = {"done": False}

    def _swap_with_concurrent_removal(path, write_to):
        if not fired["done"]:
            fired["done"] = True
            remove_from_minhash_index(
                spark.createDataFrame([(2,)], "doc_id long"), live
            )
        real_swap(path, write_to)

    monkeypatch.setattr(sinks, "staged_swap", _swap_with_concurrent_removal)
    compact_minhash_index(spark, live)
    monkeypatch.setattr(sinks, "staged_swap", real_swap)

    # doc 2's mid-run tombstone survived the retire and still applies
    assert os.path.isdir(os.path.join(live, "tombstones"))
    got = sorted(
        minhash_lsh_pairs_indexed(
            batch, live, "doc_id", "text", n=3, threshold=0.5, hash_fn="md5"
        ).collect()
    )
    assert not any(r.doc_old in (1, 2) for r in got)
    assert any(r.doc_old == 3 for r in got)
    # doc 1 was physically dropped by the compaction
    stored = {
        r.doc_id
        for r in spark.read.parquet(f"{live}/shingles")
        .select("doc_id")
        .collect()
    }
    assert 1 not in stored and 2 in stored
    # the NEXT compaction applies the survivor and retires it
    compact_minhash_index(spark, live)
    assert not os.path.isdir(os.path.join(live, "tombstones"))
    stored2 = {
        r.doc_id
        for r in spark.read.parquet(f"{live}/shingles")
        .select("doc_id")
        .collect()
    }
    assert stored2 == {3}
    assert sorted(
        minhash_lsh_pairs_indexed(
            batch, live, "doc_id", "text", n=3, threshold=0.5, hash_fn="md5"
        ).collect()
    ) == got


def test_clone_index_carries_sibling_tombstones(spark, sf_dir, tmp_path):
    """ADVICE r12: IVF tombstones live at the SIBLING path
    '<root>.tombstones' (the root is a partitioned parquet root), so a
    bare copytree clone drops pending removals. clone_index must carry
    them so a cloned index probes identically to its source."""
    from delfos_etl_pipeline_spark.similarity.ivf import (
        build_ivf_index_fixed,
        ivf_topk,
        read_ivf_index,
        remove_from_ivf_index,
        write_ivf_index,
    )
    from delfos_etl_pipeline_spark.sources.sinks import clone_index

    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.where(F.col("vec_id") % 3 != 0)
    qvec = [
        float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]
    ]
    assigned0, cents = build_ivf_index_fixed(corpus0, n_clusters=8)
    live = str(tmp_path / "ivf")
    write_ivf_index(assigned0.select("vec_id", "embedding", "cluster"), live)
    removed = corpus0.where(F.col("vec_id") % 5 == 1).select("vec_id")
    remove_from_ivf_index(removed, live, "vec_id")

    clone = str(tmp_path / "ivf_clone")
    clone_index(live, clone)
    assert os.path.isdir(clone + ".tombstones")

    def _probe(path):
        return ivf_topk(
            read_ivf_index(spark, path), cents, qvec, k=10, n_probe=8
        ).collect()

    got = _probe(clone)
    assert got == _probe(live)
    removed_ids = {r.vec_id for r in removed.collect()}
    assert not any(r.vec_id in removed_ids for r in got)


# ------------------------------------------------ property-based lifecycle


def _lifecycle_pool(spark):
    """14 documents with deliberately overlapping 5-gram content, so
    removals exercise shared-gram refcount algebra, plus a 3-doc probe
    batch that near-dups across the pool."""
    words = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "beta gamma delta epsilon zeta eta theta iota kappa lambda",
        "gamma delta epsilon zeta eta theta iota kappa lambda mu",
        "one two three four five six seven eight nine ten eleven",
        "two three four five six seven eight nine ten eleven twelve",
        "completely distinct body with its own private vocabulary here",
        "another fully unique document text that shares nothing at all",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa extra",
        "red orange yellow green blue indigo violet colors of the bow",
        "orange yellow green blue indigo violet colors of the bow red",
        "north south east west compass points navigation direction set",
        "spark parquet shuffle broadcast partition codegen catalyst rows",
        "parquet shuffle broadcast partition codegen catalyst rows spark",
        "final filler document body with moderately overlapping words set",
    ]
    pool = spark.createDataFrame(
        list(enumerate(words)), "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
            (101, "two three four five six seven eight nine ten eleven one"),
            (102, "spark parquet shuffle broadcast partition codegen rows"),
        ],
        "doc_id long, text string",
    )
    return pool, probe


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# op codes: 0 = merge a batch of not-yet-indexed docs, 1 = remove a
# batch of currently-indexed docs, 2 = compact both indexes, 3 = merge
# a batch through a REAL availableNow STREAM drain (the streaming sinks
# of streaming/index_ingest.py — so removals and compactions interleave
# with stream-delivered generations across the history, the VERDICT r13
# item 5 arm). The test maps codes onto VALID ops (gram removal requires
# exactly-as-indexed documents; merges exclude tombstoned ids per the
# guard contract), so every generated sequence is a legal maintenance
# history; illegal ops degrade to no-ops instead of vacuous rejection.
_op_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 13), st.integers(1, 4)),
    min_size=3,
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=_op_st)
def test_lifecycle_random_histories_equal_rebuild(spark, tmp_path_factory, ops):
    """ANY legal interleaving of merges, removals, and compactions
    leaves the counted gram index and the MinHash index probing
    bit-identically to a from-scratch build over exactly the currently
    indexed documents — the lifecycle's algebraic invariant, fuzzed
    (the fixed-scenario tests above pin one history each)."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.dedup.minhash import (
        compact_minhash_index,
        merge_into_minhash_index,
        minhash_lsh_pairs_indexed,
        remove_from_minhash_index,
        write_minhash_index,
    )
    from delfos_etl_pipeline_spark.dedup.substring import (
        compact_gram_index,
        merge_into_gram_index,
        remove_from_gram_index,
        remove_spans_matching_indexed,
        write_gram_index,
    )

    pool, probe = _lifecycle_pool(spark)
    tmp = tmp_path_factory.mktemp("fuzz")
    gram = str(tmp / "grams")
    mh = str(tmp / "lsh")

    # seed: docs 0-3 indexed. `tombstoned` tracks ids removed since the
    # last compaction — re-merging those is refused by contract
    # (sinks.guard_tombstone_readd; this fuzz originally FOUND that gap:
    # merge → remove → re-merge silently lost the re-added doc from
    # MinHash probe output), so legal histories exclude them until a
    # compaction physically purges the old generation.
    indexed = {0, 1, 2, 3}
    tombstoned: set[int] = set()
    seed = pool.where(F.col("doc_id").isin(list(indexed)))
    write_gram_index(seed, gram, "doc_id", "text", k=5, hashed=False,
                     counted=True)
    write_minhash_index(seed, mh, "doc_id", "text", n=3, hash_fn="md5")

    for i, (code, start, width) in enumerate(ops):
        if code in (0, 3):
            cand = [
                d for d in range(14)
                if d not in indexed and d not in tombstoned
            ]
            batch = cand[start % (len(cand) or 1):][:width] if cand else []
            if not batch:
                continue
            bdf = pool.where(F.col("doc_id").isin(batch))
            if code == 3:
                # the same generation delivered through a LIVE
                # availableNow drain instead of a batch merge call
                from delfos_etl_pipeline_spark.streaming.index_ingest import (
                    run_document_index_ingest,
                )
                from delfos_etl_pipeline_spark.streaming.runner import (
                    read_parquet_stream,
                )

                src = str(tmp / f"src{i}")
                bdf.repartition(1).write.parquet(src)
                q = run_document_index_ingest(
                    read_parquet_stream(
                        spark, src, bdf.schema, max_files_per_trigger=1
                    ),
                    gram, mh, str(tmp / f"ckpt{i}"), stream_id=f"s{i}",
                )
                assert q.awaitTermination(240), "fuzz stream timed out"
            else:
                merge_into_gram_index(
                    bdf, gram, "doc_id", "text", k=5, hashed=False,
                    counted=True, batch_id=f"m{i}",
                )
                merge_into_minhash_index(
                    bdf, mh, "doc_id", "text", n=3, hash_fn="md5",
                    batch_id=f"m{i}",
                )
            indexed |= set(batch)
        elif code == 1:
            cand = sorted(indexed)
            batch = cand[start % (len(cand) or 1):][:width] if cand else []
            if not batch:
                continue
            bdf = pool.where(F.col("doc_id").isin(batch))
            remove_from_gram_index(
                bdf, gram, "doc_id", "text", k=5, hashed=False,
                batch_id=f"r{i}",
            )
            remove_from_minhash_index(bdf.select("doc_id"), mh)
            indexed -= set(batch)
            tombstoned |= set(batch)
        else:
            compact_gram_index(spark, gram)
            compact_minhash_index(spark, mh)
            tombstoned.clear()

    # truth: from-scratch indexes over exactly the surviving documents
    effective = pool.where(F.col("doc_id").isin(sorted(indexed)))
    g2 = str(tmp / "g_rebuild")
    m2 = str(tmp / "m_rebuild")
    write_gram_index(effective, g2, "doc_id", "text", k=5, hashed=False,
                     counted=True)
    write_minhash_index(effective, m2, "doc_id", "text", n=3, hash_fn="md5")

    def _probe(gp, mp):
        cuts = sorted(
            remove_spans_matching_indexed(
                probe, gp, "doc_id", "text", k=5, hashed=False,
                net_counts=True,
            ).collect()
        )
        pairs = sorted(
            minhash_lsh_pairs_indexed(
                probe, mp, "doc_id", "text", n=3, threshold=0.4,
                hash_fn="md5",
            ).collect()
        )
        return cuts, pairs

    assert _probe(gram, mh) == _probe(g2, m2)
    # and the invariant survives one more compaction of the fuzzed state
    compact_gram_index(spark, gram)
    compact_minhash_index(spark, mh)
    assert _probe(gram, mh) == _probe(g2, m2)


def test_merge_refuses_tombstoned_readd_until_compaction(spark, tmp_path):
    """The re-add contract (found by the lifecycle fuzz): merging a
    tombstoned id back into an id-keyed index raises — the tombstone
    cannot tell the old generation from the new — and after compaction
    (which physically purges the old generation and retires the
    tombstone) the same merge succeeds and probes like a rebuild. A
    retry of an ALREADY-COMMITTED merge stays a no-op even if the ids
    were tombstoned after it committed."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.dedup.minhash import (
        compact_minhash_index,
        merge_into_minhash_index,
        minhash_lsh_pairs_indexed,
        remove_from_minhash_index,
        write_minhash_index,
    )

    corpus0, keeps, batch = _gram_fixture(spark)
    live = str(tmp_path / "lsh")
    write_minhash_index(corpus0, live, "doc_id", "text", n=3, hash_fn="md5")
    merge_into_minhash_index(
        keeps, live, "doc_id", "text", n=3, hash_fn="md5", batch_id="day1"
    )
    removed = keeps.where(F.col("doc_id") == 11)
    remove_from_minhash_index(removed.select("doc_id"), live)

    with pytest.raises(ValueError, match="re-add tombstoned ids"):
        merge_into_minhash_index(
            removed, live, "doc_id", "text", n=3, hash_fn="md5",
            batch_id="readd",
        )
    # retrying the already-committed day1 merge (which contains doc 11)
    # must stay a silent no-op — the guard is skipped on replay
    merge_into_minhash_index(
        keeps, live, "doc_id", "text", n=3, hash_fn="md5", batch_id="day1"
    )

    compact_minhash_index(spark, live)
    merge_into_minhash_index(
        removed, live, "doc_id", "text", n=3, hash_fn="md5",
        batch_id="readd",
    )
    rebuilt = str(tmp_path / "lsh_rebuilt")
    write_minhash_index(
        corpus0.union(keeps), rebuilt, "doc_id", "text", n=3, hash_fn="md5"
    )

    def _probe(p):
        return sorted(
            minhash_lsh_pairs_indexed(
                batch, p, "doc_id", "text", n=3, threshold=0.4,
                hash_fn="md5",
            ).collect()
        )

    assert _probe(live) == _probe(rebuilt)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=_op_st)
def test_lifecycle_random_histories_vector_families(
    spark, tmp_path_factory, ops
):
    """The same fuzzed maintenance-history invariant for the VECTOR
    families: any legal interleaving of merges, removals, and
    compactions leaves the IVF index (frozen quantizer, partitioned
    cells, sibling tombstones) and the PQ index (frozen codebooks,
    in-root tombstones) probing identically to from-scratch state over
    exactly the surviving vectors."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.similarity.ivf import (
        assign_fixed_centroids,
        compact_ivf_index,
        ivf_topk,
        merge_into_ivf_index,
        read_ivf_index,
        remove_from_ivf_index,
        write_ivf_index,
    )
    from delfos_etl_pipeline_spark.similarity.pq import (
        compact_pq_index,
        fit_pq_codebooks_fixed,
        merge_into_pq_index,
        pq_adc_topk,
        pq_encode,
        read_pq_index,
        remove_from_pq_index,
        write_pq_index,
    )

    dim = 8
    pool_rows = [
        (v, [((v * 7 + j * 3) % 17) / 7.0 - 1.0 for j in range(dim)])
        for v in range(14)
    ]
    pool = spark.createDataFrame(
        pool_rows, "vec_id long, embedding array<double>"
    )
    qvec = [((5 * 7 + j * 3) % 17) / 7.0 - 1.0 + 0.01 for j in range(dim)]
    tmp = tmp_path_factory.mktemp("vfuzz")
    ivf = str(tmp / "ivf")
    pq = str(tmp / "pq")

    indexed = {0, 1, 2, 3}
    tombstoned: set[int] = set()
    seed = pool.where(F.col("vec_id").isin(sorted(indexed)))
    # frozen quantizer: the 3 lowest-id seed vectors
    cents = [e for _, e in pool_rows[:3]]
    write_ivf_index(
        assign_fixed_centroids(seed, cents, inline=True).select(
            "vec_id", "embedding", "cluster"
        ),
        ivf,
    )
    books = fit_pq_codebooks_fixed(seed, m=2, k=4, dim=dim)
    write_pq_index(pq_encode(seed, books), books, pq)

    for i, (code, start, width) in enumerate(ops):
        if code in (0, 3):
            cand = [
                v for v in range(14)
                if v not in indexed and v not in tombstoned
            ]
            batch = cand[start % (len(cand) or 1):][:width] if cand else []
            if not batch:
                continue
            bdf = pool.where(F.col("vec_id").isin(batch))
            if code == 3:
                # stream-delivered generation: IVF + PQ streaming sinks
                from delfos_etl_pipeline_spark.streaming.index_ingest import (
                    run_pq_index_ingest,
                    run_vector_index_ingest,
                )
                from delfos_etl_pipeline_spark.streaming.runner import (
                    read_parquet_stream,
                )

                src = str(tmp / f"vsrc{i}")
                bdf.repartition(1).write.parquet(src)
                q = run_vector_index_ingest(
                    read_parquet_stream(
                        spark, src, bdf.schema, max_files_per_trigger=1
                    ),
                    ivf, cents, str(tmp / f"vckpt{i}"), stream_id=f"s{i}",
                )
                assert q.awaitTermination(240), "fuzz stream timed out"
                q2 = run_pq_index_ingest(
                    read_parquet_stream(
                        spark, src, bdf.schema, max_files_per_trigger=1
                    ),
                    pq, books, str(tmp / f"pckpt{i}"), stream_id=f"s{i}",
                )
                assert q2.awaitTermination(240), "fuzz stream timed out"
            else:
                merge_into_ivf_index(
                    assign_fixed_centroids(bdf, cents, inline=True).select(
                        "vec_id", "embedding", "cluster"
                    ),
                    ivf, batch_id=f"m{i}",
                )
                merge_into_pq_index(
                    pq_encode(bdf, books), pq, batch_id=f"m{i}"
                )
            indexed |= set(batch)
        elif code == 1:
            cand = sorted(indexed)
            batch = cand[start % (len(cand) or 1):][:width] if cand else []
            if not batch:
                continue
            ids = spark.createDataFrame(
                [(v,) for v in batch], "vec_id long"
            )
            remove_from_ivf_index(ids, ivf, "vec_id")
            remove_from_pq_index(ids, pq, "vec_id")
            indexed -= set(batch)
            tombstoned |= set(batch)
        else:
            compact_ivf_index(spark, ivf, "vec_id")
            compact_pq_index(spark, pq)
            tombstoned.clear()

    effective = pool.where(F.col("vec_id").isin(sorted(indexed)))
    got_ivf = ivf_topk(
        read_ivf_index(spark, ivf), cents, qvec, k=14, n_probe=3
    ).collect()
    want_ivf = ivf_topk(
        assign_fixed_centroids(effective, cents, inline=True),
        cents, qvec, k=14, n_probe=3,
    ).collect()
    assert got_ivf == want_ivf
    codes_r, books_r = read_pq_index(spark, pq)
    assert books_r == books
    got_pq = pq_adc_topk(codes_r, books, qvec, "vec_id", k=14).collect()
    want_pq = pq_adc_topk(
        pq_encode(effective, books), books, qvec, "vec_id", k=14
    ).collect()
    assert got_pq == want_pq


def test_index_stats_and_compaction_policy(spark, tmp_path):
    """index_admin: the three debt axes (generations, tombstones,
    negative refcount rows) are visible from the store, drive the
    needs_compaction policy, and compaction zeroes them."""
    from delfos_etl_pipeline_spark.dedup.minhash import (
        compact_minhash_index,
        merge_into_minhash_index,
        remove_from_minhash_index,
        write_minhash_index,
    )
    from delfos_etl_pipeline_spark.dedup.substring import (
        compact_gram_index,
        merge_into_gram_index,
        remove_from_gram_index,
        write_gram_index,
    )
    from delfos_etl_pipeline_spark.sources.index_admin import (
        index_stats,
        needs_compaction,
    )

    corpus0, keeps, _batch = _gram_fixture(spark)
    gram = str(tmp_path / "grams")
    mh = str(tmp_path / "lsh")
    write_gram_index(
        corpus0, gram, "doc_id", "text", k=5, hashed=False, counted=True
    )
    write_minhash_index(corpus0, mh, "doc_id", "text", n=3, hash_fn="md5")
    merge_into_gram_index(
        keeps, gram, "doc_id", "text", k=5, hashed=False, counted=True,
        batch_id="day1",
    )
    merge_into_minhash_index(
        keeps, mh, "doc_id", "text", n=3, hash_fn="md5", batch_id="day1"
    )
    removed = keeps.where(F.col("doc_id") == 11)
    remove_from_gram_index(
        removed, gram, "doc_id", "text", k=5, hashed=False,
        batch_id="takedown",
    )
    remove_from_minhash_index(removed.select("doc_id"), mh)

    gs = index_stats(spark, gram, "gram")
    ms = index_stats(spark, mh, "minhash")
    assert gs["generations"] >= 2  # day1 merge + takedown refcounts
    assert gs["negative_rows"] > 0
    assert ms["generations"] >= 1 and ms["tombstone_rows"] == 1
    assert gs["data_files"] > 0 and gs["bytes"] > 0

    # tight thresholds: the debts trip the policy with named reasons
    hit, reasons = needs_compaction(
        gs, max_generations=1, max_negative_rows=0
    )
    assert hit and any("negative_rows" in r for r in reasons)
    hit, reasons = needs_compaction(ms, max_tombstone_rows=0)
    assert hit and any("tombstone_rows" in r for r in reasons)

    compact_gram_index(spark, gram)
    compact_minhash_index(spark, mh)
    gs2 = index_stats(spark, gram, "gram")
    ms2 = index_stats(spark, mh, "minhash")
    assert gs2["negative_rows"] == 0
    assert ms2["tombstone_rows"] == 0
    # generation debt resets at compaction (ADVICE r13): the ._merged_*
    # markers survive (replay idempotence), but the watermark makes them
    # stop counting — otherwise an index past max_generations LIFETIME
    # merges would re-trip needs_compaction forever, scheduling useless
    # O(index) rewrites immediately after every compaction
    assert gs2["generations"] == 0
    assert ms2["generations"] == 0
    assert not needs_compaction(gs2, max_generations=1)[0]
    # default thresholds: a freshly compacted index does not re-trip
    assert not needs_compaction(gs2)[0]
    assert not needs_compaction(ms2)[0]
    # ...and only merges SINCE the rewrite count toward the next one
    merge_into_gram_index(
        keeps.where(F.col("doc_id") == 12), gram, "doc_id", "text", k=5,
        hashed=False, counted=True, batch_id="day2",
    )
    assert index_stats(spark, gram, "gram")["generations"] == 1


def test_compact_gram_index_self_heals_before_schema_read(spark, tmp_path):
    """ADVICE r13: compact_gram_index's counted-vs-set schema inference
    reads the live path BEFORE entering staged_swap, so a compaction
    retried after a crash between the swap's two renames (live dir
    missing, ._compact_bak holding the only copy) must self-heal first —
    otherwise the read throws PATH_NOT_FOUND and the documented rollback
    is never reached."""
    import os
    import shutil

    from delfos_etl_pipeline_spark.dedup.substring import (
        compact_gram_index,
        remove_spans_matching_indexed,
        write_gram_index,
    )

    corpus0, _keeps, batch = _gram_fixture(spark)
    gram = str(tmp_path / "grams")
    write_gram_index(
        corpus0, gram, "doc_id", "text", k=5, hashed=False, counted=True
    )
    want = sorted(
        remove_spans_matching_indexed(
            batch, gram, "doc_id", "text", k=5, hashed=False,
            net_counts=True,
        ).collect()
    )
    # simulate the crash window: live renamed aside, new copy not yet in
    os.rename(gram, gram + "._compact_bak")
    assert not os.path.exists(gram)
    compact_gram_index(spark, gram)  # must roll back, then compact
    assert os.path.exists(gram)
    assert not os.path.exists(gram + "._compact_bak")
    got = sorted(
        remove_spans_matching_indexed(
            batch, gram, "doc_id", "text", k=5, hashed=False,
            net_counts=True,
        ).collect()
    )
    assert got == want
    shutil.rmtree(gram)


def test_compact_fully_emptied_partitioned_index_stays_usable(
    spark, tmp_path
):
    """Lifecycle-fuzz regression, pinned deterministically: compacting a
    FULLY-tombstoned partitioned store (IVF root, cluster-partitioned PQ
    codes) must leave a READABLE empty relation — a partitionBy write of
    zero rows emits no schema file — and the next merge must restore a
    clean partitioned layout that probes like a from-scratch encode."""
    from delfos_etl_pipeline_spark.similarity.ivf import (
        assign_fixed_centroids,
        compact_ivf_index,
        ivf_topk,
        merge_into_ivf_index,
        read_ivf_index,
        remove_from_ivf_index,
        write_ivf_index,
    )
    from delfos_etl_pipeline_spark.similarity.pq import (
        compact_pq_index,
        fit_pq_codebooks_fixed,
        merge_into_pq_index,
        pq_adc_topk,
        pq_encode,
        read_pq_index,
        remove_from_pq_index,
        write_pq_index,
    )

    dim = 8
    rows = [
        (v, [((v * 7 + j * 3) % 17) / 7.0 - 1.0 for j in range(dim)])
        for v in range(8)
    ]
    pool = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [e for _, e in rows[:3]]
    qvec = [x + 0.01 for x in rows[5][1]]
    seed = pool.where(F.col("vec_id") < 4)
    later = pool.where(F.col("vec_id") >= 4)

    ivf = str(tmp_path / "ivf")
    write_ivf_index(
        assign_fixed_centroids(seed, cents, inline=True).select(
            "vec_id", "embedding", "cluster"
        ),
        ivf,
    )
    remove_from_ivf_index(seed.select("vec_id"), ivf, "vec_id")
    compact_ivf_index(spark, ivf, "vec_id")
    # readable and empty — this read used to raise UNABLE_TO_INFER_SCHEMA
    assert read_ivf_index(spark, ivf).count() == 0
    merge_into_ivf_index(
        assign_fixed_centroids(later, cents, inline=True).select(
            "vec_id", "embedding", "cluster"
        ),
        ivf, batch_id="b2",
    )
    got = ivf_topk(read_ivf_index(spark, ivf), cents, qvec, k=8, n_probe=3)
    want = ivf_topk(
        assign_fixed_centroids(later, cents, inline=True),
        cents, qvec, k=8, n_probe=3,
    )
    assert got.collect() == want.collect()
    # the restored layout is partitioned again (pruning returns)
    assert any(
        n.startswith("cluster=") for n in os.listdir(ivf)
    )

    pq = str(tmp_path / "pq")
    books = fit_pq_codebooks_fixed(seed, m=2, k=4, dim=dim)
    codes0 = pq_encode(seed, books).withColumn(
        "cluster", (F.col("vec_id") % 3).cast("int")
    )
    write_pq_index(codes0, books, pq, partition_col="cluster")
    remove_from_pq_index(seed.select("vec_id"), pq, "vec_id")
    compact_pq_index(spark, pq, partition_col="cluster")
    codes_r, books_r = read_pq_index(spark, pq)
    assert books_r == books and codes_r.count() == 0
    codes1 = pq_encode(later, books).withColumn(
        "cluster", (F.col("vec_id") % 3).cast("int")
    )
    merge_into_pq_index(codes1, pq, partition_col="cluster", batch_id="b2")
    codes_r2, _ = read_pq_index(spark, pq)
    got_pq = pq_adc_topk(codes_r2, books, qvec, "vec_id", k=8).collect()
    want_pq = pq_adc_topk(
        pq_encode(later, books), books, qvec, "vec_id", k=8
    ).collect()
    assert got_pq == want_pq


def test_nightly_close_report_shapes_the_metrics_struct(spark, tmp_path):
    """nightly_close_report: one post-close call returns the debt axes +
    scheduling decision per family — the metrics struct a nightly
    orchestration records beside RunResult.stats and alerts on."""
    from delfos_etl_pipeline_spark.dedup.minhash import (
        merge_into_minhash_index,
        remove_from_minhash_index,
        write_minhash_index,
    )
    from delfos_etl_pipeline_spark.dedup.substring import (
        merge_into_gram_index,
        write_gram_index,
    )
    from delfos_etl_pipeline_spark.sources.index_admin import (
        nightly_close_report,
    )

    corpus0, keeps, _batch = _gram_fixture(spark)
    gram = str(tmp_path / "grams")
    mh = str(tmp_path / "lsh")
    write_gram_index(
        corpus0, gram, "doc_id", "text", k=5, hashed=False, counted=True
    )
    write_minhash_index(corpus0, mh, "doc_id", "text", n=3, hash_fn="md5")
    merge_into_gram_index(
        keeps, gram, "doc_id", "text", k=5, hashed=False, counted=True,
        batch_id="day1",
    )
    merge_into_minhash_index(
        keeps, mh, "doc_id", "text", n=3, hash_fn="md5", batch_id="day1"
    )
    remove_from_minhash_index(
        keeps.where(F.col("doc_id") == 11).select("doc_id"), mh
    )

    rep = nightly_close_report(
        spark, {"gram": (gram, "gram"), "minhash": (mh, "minhash")}
    )
    assert set(rep) == {"gram", "minhash"}
    for fam in rep.values():
        assert {"generations", "tombstone_rows", "data_files", "bytes",
                "compact", "reasons"} <= set(fam)
    assert rep["gram"]["generations"] == 1
    assert rep["minhash"]["tombstone_rows"] == 1
    # defaults (the measured policy): a one-merge index does not trip
    assert not rep["gram"]["compact"] and not rep["minhash"]["compact"]
    # tight thresholds trip with named reasons — the alerting contract
    rep2 = nightly_close_report(
        spark, {"minhash": (mh, "minhash")}, max_tombstone_rows=0
    )
    assert rep2["minhash"]["compact"]
    assert any("tombstone_rows" in r for r in rep2["minhash"]["reasons"])
