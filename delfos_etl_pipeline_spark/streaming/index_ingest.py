"""Streaming index maintenance — continuous ingest into the persisted
dedup/similarity indexes via foreachBatch + committed_append.

The batch lifecycle (build → probe → merge → remove → compact; certified
end-to-end by the curate_nightly_ingest_day2/3/4 oracles) assumed a
nightly cadence: one tagged ``merge_into_*`` call per day. A continuous
crawl doesn't arrive nightly — it arrives as a stream, and the index
maintenance step becomes a Structured Streaming sink. This module is
that sink: each micro-batch of accepted documents/vectors is appended to
the standing index materializations through the SAME ``merge_into_*``
functions the nightly path uses, tagged with the micro-batch epoch id,
so the streaming form inherits every property the batch form certified —
O(batch) appends, standing files untouched, probes tombstone-aware, and
EXACTLY-ONCE under failure replay.

Exactly-once contract (the canonical foreachBatch recipe): Structured
Streaming re-runs a failed micro-batch with the SAME epoch id and the
same input rows; ``sinks.committed_append``'s done-marker protocol makes
a replayed (batch, id) pair a no-op per target relation. A crash BETWEEN
the per-family merges inside one batch (gram committed, MinHash not)
re-runs the batch: the committed family skips on its marker, the
uncommitted one applies — per-relation exactly-once, no cross-relation
transaction needed because each relation is independently idempotent.
The contract does NOT survive deleting the checkpoint directory: epoch
ids restart and the id→content mapping changes, which no marker protocol
can see. Keep the checkpoint; it IS the stream's identity.

At 100 TB: the stream's shuffle volume per batch is the batch's gram /
band+shingle / assigned-vector rows — corpus-independent, the measured
invariant (SCALE.md round 13: merges flat across a 10× corpus on a fixed
batch). Compaction stays out of band, exactly as in the nightly story.

Remove/compact DURING a live stream (VERDICT r13 item 5 — the pinned
merge-vs-compact contract): takedowns and compactions may land BETWEEN
the stream's micro-batch commits — in practice from inside the
foreachBatch callback after its merges, the only place the driver can
order them against epochs — under three rules, each fuzz/pytest-pinned
(tests/test_index_lifecycle.py, tests/test_streaming.py,
curate_nightly_ingest_day3_streamed's oracle):

1. **A removal must target already-merged ids that are not still
   arriving on the stream.** Tombstoning an id a later epoch will merge
   makes that merge REFUSE (sinks.guard_tombstone_readd — the refusal
   is the contract working, not a race bug): compact first, then
   re-submit. Id-disjointness of in-flight batches from takedown
   manifests is the caller's invariant, exactly as in the nightly
   story.
2. **Mid-stream operations must be replay-idempotent on their own**,
   because a crash inside an epoch re-runs the whole callback: gram
   removals need a ``batch_id`` (negative refcounts would otherwise
   stack), MinHash/IVF/PQ tombstone appends and every compact_* are
   idempotent by construction (duplicate tombstones anti-join
   identically; compaction is a semantic no-op on compacted state).
3. **Compaction between commits never perturbs the stream's own
   protocol**: the ``._merged_*`` epoch markers are SIBLINGS of the
   swapped directory, so staged_swap preserves them, replayed epochs
   still no-op, and the generation watermark the compaction records
   counts later epochs as fresh debt.

Exclusive-writer still holds WITHIN an instant: these rules order
remove/compact against a SINGLE stream's commits; two writers racing
the same index concurrently remain out of contract (table-format
optimistic commits at 100 TB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def run_document_index_ingest(
    stream: DataFrame,
    gram_path: str,
    mh_path: str,
    checkpoint_dir: str,
    stream_id: str = "docingest",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n: int = 3,
    hash_fn: str = "md5",
    accept: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Drain a document stream into the counted gram index and the
    MinHash band/shingle index. ``accept`` (optional) filters each
    micro-batch to the accepted documents — the disposition gate of the
    nightly pipeline, applied per batch (e.g. a quality screen or a
    dedup-probe-then-keep). ``stream_id`` namespaces the epoch ids so
    two streams maintaining the same index cannot collide on markers.
    availableNow trigger: drain everything staged, then stop — the
    orchestrator-free incremental batch (T2), re-runnable on a cron."""
    return (
        stream.writeStream.foreachBatch(
            document_index_batch_fn(
                gram_path, mh_path, stream_id=stream_id, id_col=id_col,
                text_col=text_col, k=k, n=n, hash_fn=hash_fn,
                accept=accept,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def document_index_batch_fn(
    gram_path: str,
    mh_path: str,
    stream_id: str = "docingest",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n: int = 3,
    hash_fn: str = "md5",
    accept: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """The (batch_df, epoch_id) function behind
    :func:`run_document_index_ingest`, exposed so callers composing
    their own foreachBatch (e.g. disposition-write + index-merge in one
    sink) reuse the tagged-merge discipline, and so the replay contract
    is directly testable: calling it twice with the same epoch id must
    change nothing (tests/test_streaming.py pins it)."""
    from delfos_etl_pipeline_spark.dedup.minhash import (
        merge_into_minhash_index,
    )
    from delfos_etl_pipeline_spark.dedup.substring import (
        merge_into_gram_index,
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        keeps = batch_df if accept is None else accept(batch_df)
        bid = f"{stream_id}-{batch_id}"
        merge_into_gram_index(
            keeps, gram_path, id_col, text_col, k=k, hashed=False,
            counted=True, batch_id=bid,
        )
        merge_into_minhash_index(
            keeps, mh_path, id_col, text_col, n=n, hash_fn=hash_fn,
            batch_id=bid,
        )

    return _apply


def run_vector_index_ingest(
    stream: DataFrame,
    ivf_path: str,
    centroids: list[list[float]],
    checkpoint_dir: str,
    stream_id: str = "vecingest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_norm: bool = False,
) -> StreamingQuery:
    """Drain an embedding stream into a persisted IVF index: each
    micro-batch is assigned to the index's FROZEN quantizer cells
    (IVF serving never re-trains on ingest) and appended into the
    matching ``cluster=<cid>`` partition directories. Same epoch-id
    idempotence as the document form. ``with_norm=True`` appends the
    precomputed L2 norm column ``cv_n`` the nightly-pipeline IVF store
    carries (the appended rows must match the standing relation's
    schema). The PQ composition is implemented by
    :func:`run_pq_index_ingest` — ``pq_encode`` against frozen
    codebooks inside the batch function, then ``merge_into_pq_index``
    with the same tagged id."""
    return (
        stream.writeStream.foreachBatch(
            vector_index_batch_fn(
                ivf_path, centroids, stream_id=stream_id, id_col=id_col,
                vec_col=vec_col, with_norm=with_norm,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def vector_index_batch_fn(
    ivf_path: str,
    centroids: list[list[float]],
    stream_id: str = "vecingest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_norm: bool = False,
) -> Callable[[DataFrame, int], None]:
    """The (batch_df, epoch_id) function behind
    :func:`run_vector_index_ingest`, exposed — like the document and PQ
    forms — so callers composing their own foreachBatch (e.g. the
    day-3-streamed chapter's interleaved takedown/compaction wrapper)
    reuse the tagged-merge discipline, and replay is directly
    testable."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.similarity.ivf import (
        assign_fixed_centroids,
        merge_into_ivf_index,
    )
    from delfos_etl_pipeline_spark.similarity.knn import _as_double, _dot

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        assigned = assign_fixed_centroids(batch_df, centroids, inline=True)
        cols = [F.col(id_col), F.col(vec_col)]
        if with_norm:
            e = _as_double(vec_col)
            cols.append(F.sqrt(_dot(e, e)).alias("cv_n"))
        assigned = assigned.select(*cols, F.col("cluster"))
        merge_into_ivf_index(
            assigned, ivf_path, batch_id=f"{stream_id}-{batch_id}"
        )

    return _apply

def pq_index_batch_fn(
    pq_path: str,
    codebooks: list[list[list[float]]],
    stream_id: str = "pqingest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | None = None,
    centroids: list[list[float]] | None = None,
    accept: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """The (batch_df, epoch_id) function behind
    :func:`run_pq_index_ingest`, exposed — like
    :func:`document_index_batch_fn` — so the replay contract is directly
    testable: calling it twice with the same epoch id must change
    nothing (tests/test_streaming.py pins it), and so callers composing
    their own foreachBatch reuse the tagged-merge discipline.

    Each batch is :func:`~delfos_etl_pipeline_spark.similarity.pq.pq_encode`-d
    against the index's FROZEN codebooks (PQ serving never re-trains
    codebooks on ingest — exactly the quantizer-freeze discipline of the
    IVF sink) and appended through ``merge_into_pq_index`` with the
    epoch-tagged id, inheriting ``committed_append``'s done-marker
    idempotence and ``guard_tombstone_readd``. For the IVF-PQ
    composition (codes relation partitioned by cell), pass the frozen
    ``centroids`` and ``partition_col="cluster"``: the batch is also
    assigned to its cells and the codes land inside their
    ``cluster=<cid>`` partition directories, so probes keep partition
    pruning over corpus ∪ streamed rows."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.similarity.pq import (
        merge_into_pq_index,
        pq_encode,
    )

    if (partition_col is None) != (centroids is None):
        raise ValueError(
            "IVF-PQ streaming ingest needs BOTH partition_col and the "
            "frozen centroids (or neither, for a flat codes relation)"
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        keeps = batch_df if accept is None else accept(batch_df)
        codes = pq_encode(keeps, codebooks, id_col, vec_col)
        if centroids is not None:
            from delfos_etl_pipeline_spark.similarity.ivf import (
                assign_fixed_centroids,
            )

            cells = assign_fixed_centroids(
                keeps, centroids, vec_col, inline=True
            ).select(F.col(id_col), F.col("cluster"))
            codes = codes.join(cells, id_col)  # batch-sized join
        merge_into_pq_index(
            codes, pq_path, partition_col=partition_col,
            batch_id=f"{stream_id}-{batch_id}",
        )

    return _apply


def run_pq_index_ingest(
    stream: DataFrame,
    pq_path: str,
    codebooks: list[list[list[float]]],
    checkpoint_dir: str,
    stream_id: str = "pqingest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | None = None,
    centroids: list[list[float]] | None = None,
    accept: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Drain an embedding stream into a persisted PQ index — the fourth
    index family's streaming maintenance path (VERDICT r13 item 1: the
    one lifecycle gap; gram/MinHash/IVF already had certified sinks).
    Each micro-batch is encoded against the index's FROZEN codebooks and
    appended to the ``codes`` relation through the SAME
    ``merge_into_pq_index`` the nightly path uses, tagged with the
    micro-batch epoch id — exactly-once under failure replay via the
    done-marker protocol, O(batch) appends, codebook sidecar never
    touched. availableNow trigger: drain everything staged, then stop
    (the orchestrator-free incremental batch, re-runnable on a cron).
    The sim_pq_probe_streamed oracle certifies the full equivalence:
    streamed codes ∪ standing codes rank bit-identically to a
    from-scratch encode of the union corpus."""
    return (
        stream.writeStream.foreachBatch(
            pq_index_batch_fn(
                pq_path, codebooks, stream_id=stream_id, id_col=id_col,
                vec_col=vec_col, partition_col=partition_col,
                centroids=centroids, accept=accept,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
