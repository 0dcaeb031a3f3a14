"""Embedding-cosine near-duplicate detection.

Completes the dedup family (exact / n-gram Jaccard / MinHash-LSH /
SimHash) with the semantic tier: two documents are near-dups when their
embedding vectors' cosine similarity clears a threshold.

Two tiers, mirroring similarity/knn.py:

- **exact (BLAS)** — the reference matrix is L2-normalized once and
  broadcast; the query side streams through ``mapInPandas`` in Arrow
  batches, one numpy matmul per batch, emitting only pairs ≥ threshold
  with id_a < id_b (each unordered pair computed exactly once). Right
  whenever one side fits in executor memory (dimension tables, eval sets,
  or one shard of a sharded loop).
- **LSH-bucketed** — BANDED random-hyperplane signatures bucket the
  corpus (b bands × r planes, mirroring minhash.lsh_candidates); a pair
  becomes a candidate when it agrees on all r signs of ANY band, then
  candidates are verified with an expression-level cosine. Recall for a
  pair at angle θ is 1-(1-p^r)^b with p = 1-θ/π — banding both raises
  recall over a single wide signature and keeps each band's bucket key
  short. Dense regions (near-dup clusters are exactly that) still
  concentrate in one bucket per band, so per-bucket occupancy is CAPPED:
  buckets over ``max_bucket`` rows are split into salted sub-buckets,
  bounding a bucket of m rows to m·max_bucket candidate pairs instead of
  m². The split drops some intra-bucket pairs on mega-buckets, but each
  member still pairs with ~max_bucket neighbors, so connected-components
  clustering (clusters.py) keeps dense clusters connected w.h.p.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.similarity.knn import (
    _as_double,
    _broadcast_reference,
    _hyperplane,
    collect_reference,
    cosine_similarity_col,
)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_decimals: int | None = 6,
    max_ref_rows: int | None = 500_000,
) -> DataFrame:
    """Exact (id_a, id_b, cosine_sim ≥ threshold) pairs, id_a < id_b,
    via broadcast + Arrow-batched BLAS (one matmul per input batch).

    ``max_ref_rows`` guards the driver-side collect of the broadcast
    matrix (knn.collect_reference): above the cap this raises with the
    shard-loop alternative instead of OOMing the driver at corpus scale.
    The LSH form (below) is the unguarded-scale path.
    """
    spark = df.sparkSession
    ref = collect_reference(df, id_col, vec_col, max_ref_rows)
    b_ids, b_mat = _broadcast_reference(spark, ref, id_col, vec_col)
    return df.select(id_col, vec_col).mapInPandas(
        _pairs_mapper(b_ids, b_mat, id_col, vec_col, threshold, round_decimals),
        "id_a long, id_b long, cosine_sim double",
    )


def _pairs_mapper(b_ids, b_mat, id_col, vec_col, threshold, round_decimals):
    """mapInPandas closure: per Arrow batch, one matmul against the
    broadcast reference; emits (id_a, id_b, cosine_sim) for every hit
    with id_a < id_b — each unordered pair exactly once, by the query
    batch that holds its lower id."""
    import numpy as np
    import pandas as pd

    def pairs(batches):
        ref_ids, ref_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ ref_mat.T  # one BLAS call per Arrow batch
            out_a, out_b, out_s = [], [], []
            for row_idx, qid in enumerate(pdf[id_col].to_numpy()):
                s = sims[row_idx]
                hit = np.nonzero((ref_ids > qid) & (s >= threshold))[0]
                out_a.extend([qid] * hit.size)
                out_b.extend(ref_ids[hit])
                out_s.extend(s[hit])
            sims_out = np.asarray(out_s)
            if round_decimals is not None and sims_out.size:
                sims_out = sims_out.round(round_decimals)
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cosine_sim": sims_out}
            )

    return pairs


def embedding_near_dup_pairs_sharded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_shards: int = 4,
    round_decimals: int | None = 6,
    max_ref_rows: int | None = 500_000,
) -> DataFrame:
    """Exact near-dup pairs when the reference exceeds one broadcast —
    the shard loop the collect guard prescribes, implemented.

    The reference splits into ``n_shards`` deterministic hash shards
    (``pmod(xxhash64(id), n_shards)``); each is collected (per-shard
    guard), broadcast, and matched against the FULL query stream with the
    same Arrow-batched matmul. Because a pair (a, b) with a < b is
    emitted only by the shard holding b, the per-shard pair sets are
    DISJOINT and their plain union is the exact full pair set — no
    re-rank or dedup stage, unlike the top-k shard loop. Driver peak
    memory is one shard, not the corpus.
    """
    spark = df.sparkSession
    shard_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    query_side = df.select(id_col, vec_col)
    parts = []
    for s in range(n_shards):
        ref = collect_reference(
            df.where(shard_of == s), id_col, vec_col, max_ref_rows
        )
        if len(ref) == 0:
            continue
        b_ids, b_mat = _broadcast_reference(spark, ref, id_col, vec_col)
        parts.append(
            query_side.mapInPandas(
                _pairs_mapper(
                    b_ids, b_mat, id_col, vec_col, threshold, round_decimals
                ),
                "id_a long, id_b long, cosine_sim double",
            )
        )
    if not parts:  # empty input: match the unsharded form's empty output
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine_sim double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _band_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_bands: int,
    planes_per_band: int,
) -> DataFrame:
    """(id, band, bucket) — one row per (document, band); ``bucket`` packs
    the r hyperplane signs of that band into a long.

    All b·r sign bits come from ONE numpy matmul per Arrow batch
    (vectorized pandas UDF): Spark's higher-order array functions are
    interpreted per-element, and b·r·dim multiply-adds per row through
    them measured ~4× slower than the Arrow round-trip + BLAS at every
    scale tested. Narrow projection + posexplode: no shuffle.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    dim = len(df.select(vec_col).first()[0])
    planes_t = np.array(
        _hyperplane(n_bands * planes_per_band, dim), dtype=np.float64
    ).T  # (dim, b·r)
    weights = (1 << np.arange(planes_per_band, dtype=np.int64))  # bit packing

    @pandas_udf("array<long>")
    def band_sigs(vecs: pd.Series) -> pd.Series:
        q = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (q @ planes_t) > 0  # one BLAS call per batch
        packed = bits.reshape(len(q), n_bands, planes_per_band) @ weights
        return pd.Series(list(packed))

    # posexplode_outer: plain posexplode's inferred size()>0 filter would
    # re-evaluate the UDF below the generate (see ngram.explode_shingles).
    # The signature array is never empty.
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(band_sigs(_as_double(vec_col))).alias("band", "bucket"),
    )


def _verify_pairs_blas(
    cands: DataFrame,
    vecs: DataFrame,
    threshold: float,
    round_decimals: int | None,
) -> DataFrame:
    """Verify explicit (id_a, id_b) candidate pairs with an Arrow-batched
    numpy cosine — the vectorized sibling of :func:`_pairs_mapper` for
    pairs that arrive as rows (post-LSH candidates) rather than as a
    query-stream × broadcast-reference product. Two keyed joins attach the
    raw vectors; per Arrow batch the cosine is one fused einsum pass
    (dot(a,b) / (‖a‖·‖b‖) on the RAW vectors — the same IEEE expression
    the oracle's list_dot_product/nrm form evaluates). The expression-level
    ``cosine_similarity_col`` alternative pays b·r·dim interpreted
    multiply-adds per pair (measured ~4× slower than Arrow+BLAS at every
    scale tested — see _band_buckets); at 10⁵–10⁶ candidates that was the
    single worst number in BENCH_r07 (dedup_semdedup_survivors, 21.9 s).
    """
    import numpy as np

    # The half-up rounding below (floor(x·10^k + 0.5)) rounds toward
    # +infinity, which diverges from F.round/DuckDB's half-away-from-zero
    # on NEGATIVE sims. It is exact here only because a positive
    # threshold discards every negative sim before the caller compares —
    # guard the precondition instead of silently mis-rounding if a
    # future caller passes threshold <= 0 (ADVICE r8).
    if round_decimals is not None and threshold <= 0:
        raise ValueError(
            "_verify_pairs_blas: round_decimals requires threshold > 0 "
            "(half-up rounding only matches half-away-from-zero on "
            "positive sims)"
        )

    joined = cands.join(
        vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("_va")),
        "id_a",
    ).join(
        vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("_vb")),
        "id_b",
    )

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf["_va"].to_numpy()).astype(np.float64)
            b = np.stack(pdf["_vb"].to_numpy()).astype(np.float64)
            sim = np.einsum("ij,ij->i", a, b) / (
                np.sqrt(np.einsum("ij,ij->i", a, a))
                * np.sqrt(np.einsum("ij,ij->i", b, b))
            )
            if round_decimals is not None:
                # floor(x·10^k + 0.5)/10^k — HALF-UP, matching F.round
                # and DuckDB round on the positive sims that survive the
                # threshold (numpy .round is half-even).
                scale = 10.0 ** round_decimals
                sim = np.floor(sim * scale + 0.5) / scale
            keep = sim >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine_sim": sim[keep],
                }
            )

    return joined.mapInPandas(
        verify, "id_a long, id_b long, cosine_sim double"
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bands: int = 4,
    planes_per_band: int = 8,
    round_decimals: int | None = 6,
    max_bucket: int | None = 1000,
    verify: str = "blas",
) -> DataFrame:
    """Approximate near-dup pairs via banded hyperplane LSH: candidates
    share all ``planes_per_band`` signs of at least one of ``n_bands``
    bands; candidates are then verified with an exact cosine. Same output
    contract as the exact form.

    ``verify``: ``blas`` (default — Arrow-batched numpy over the joined
    candidate vectors, :func:`_verify_pairs_blas`) or ``expr`` (the
    pre-r8 expression-level ``cosine_similarity_col`` form, kept for
    plan-shape comparison). Both compute dot(a,b)/(‖a‖·‖b‖) on the raw
    double vectors rounded to ``round_decimals`` and filter on the
    ROUNDED value, so they share one oracle; outputs are bit-identical
    on the test corpora (re-certified at sf0.01 and sf0.1).

    ``max_bucket`` bounds skew: a (band, bucket) group with m > max_bucket
    rows is split into ceil(m/max_bucket) deterministic salt groups
    (xxhash64 of the id), capping its candidate pairs at ~m·max_bucket
    instead of m² — the scale guard for clustered corpora where a dense
    embedding region lands in one bucket per band. ``None`` disables.
    """
    # Both self-join sides (and the occupancy count) read this projection;
    # persist so the b·r-plane signature computation runs once per row.
    buckets = _band_buckets(df, id_col, vec_col, n_bands, planes_per_band).persist()
    if max_bucket is not None:
        # The occupancy table has at most 2^planes_per_band · n_bands rows
        # (the whole bucket key space) at ANY corpus size — always
        # broadcastable, so salting costs one tiny partial-agg exchange
        # and zero shuffles of the bucket rows themselves.
        occ = buckets.groupBy("band", "bucket").agg(F.count("*").alias("occ"))
        n_salt = F.greatest(
            F.lit(1), F.ceil(F.col("occ") / F.lit(max_bucket)).cast("long")
        )
        buckets = buckets.join(F.broadcast(occ), ["band", "bucket"]).select(
            "id",
            "band",
            "bucket",
            F.pmod(F.xxhash64(F.col("id")), n_salt).alias("salt"),
        )
        join_keys = ["band", "bucket", "salt"]
    else:
        join_keys = ["band", "bucket"]
    a = buckets.select(F.col("id").alias("id_a"), *join_keys)
    b = buckets.select(F.col("id").alias("id_b"), *join_keys)
    cands = (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
    if verify == "blas":
        return _verify_pairs_blas(cands, vecs, threshold, round_decimals)
    sim = cosine_similarity_col(F.col("vec_a"), F.col("vec_b"))
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        cands.join(vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b")), "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def embedding_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    method: str = "exact",
) -> DataFrame:
    """Drop the higher-id member of every cosine-near-dup pair; return
    surviving rows. ``method`` ∈ {exact, lsh}."""
    fn = embedding_near_dup_pairs if method == "exact" else embedding_near_dup_pairs_lsh
    pairs = fn(df, id_col, vec_col, threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
