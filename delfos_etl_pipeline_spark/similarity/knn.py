"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (SURVEY.md §7 M5). Two tiers:

- **brute force** — exact cosine top-k via expression-level dot products
  (``zip_with`` + ``aggregate``, all JVM-side, no UDFs). For one query
  vector this is a single scan: broadcast the query, O(N·d) work, top-k
  via TakeOrderedAndProject. The correctness baseline.
- **LSH-bucketed** — random-hyperplane signatures (deterministic seeded
  pseudo-random planes derived per (plane, dim) so the plan is stable
  across runs) bucket vectors; search within matching buckets only. The
  scale path: at 100 TB the candidate set per query is a bucket, not the
  corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec_sql(vals: list[float]) -> str:
    # cast('<repr>' as double): Python repr round-trips IEEE-754 exactly
    # and Java's correctly-rounded parse recovers the identical bits, so
    # the SQL-parsed literal equals F.lit(float) bit-for-bit.
    return (
        "array("
        + ",".join(f"cast('{float(x)!r}' as double)" for x in vals)
        + ")"
    )


def _lit_vec(vals: list[float]) -> Column:
    """Literal double array via ONE parsed SQL expression — the
    F.array(*[F.lit(x) ...]) form costs ~len py4j round-trips per vector,
    which dominates plan-construction time once literals reach
    planes×dim / centroids×dim scale (measured on the PQ operators:
    ~3.5 s construction vs ~1.5 s execution at sf0.1 before the switch)."""
    return F.expr(_vec_sql(vals))


def _lit_mat(mat: list[list[float]]) -> Column:
    """Literal array<array<double>> in one parsed SQL expression."""
    return F.expr("array(" + ",".join(_vec_sql(v) for v in mat) + ")")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _dot_sql(a: str, b: str) -> str:
    """SQL-text twin of :func:`_dot` — the same zip_with/aggregate left
    fold, emitted as text so builders that assemble MANY dot trees
    (k centroids × 3 folds each) parse ONE expression string instead of
    paying hundreds of py4j round trips (round 15: Column construction,
    not Catalyst and not execution, dominated the PQ/IVF query
    construction — measured in OPTIMIZATION_r15.md)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "cast('0.0' as double), (acc, x) -> acc + x)"
    )


def _cosine_sql(a: str, b: str) -> str:
    """SQL-text twin of :func:`cosine_similarity_col` (same op order:
    dot / (sqrt(self-dot) * sqrt(self-dot)))."""
    return (
        f"({_dot_sql(a, b)}) / "
        f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


# NOTE (measured, r10): an unrolled element_at chain as a "codegen-
# visible" substitute for the _dot HOF fold on column-column pairs is
# SLOWER (nightly semantic probe 5.2s -> 7.7s at sf0.1): 64 separate
# element_at calls re-access the array value per term, while the HOF
# fold reads it once; the inline win in assign_fixed_centroids comes
# from LITERAL centroid operands (constant-folded element access), not
# from unrolling itself. Keep _dot for column-column dots.


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns — built-in
    higher-order functions only, stays in codegen."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


class ReferenceTooLargeError(ValueError):
    """The reference side of a broadcast-BLAS path exceeds the collect guard."""


def collect_reference(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    max_ref_rows: int | None,
):
    """Collect (id, vec) to the driver for broadcast — guarded.

    The BLAS paths are correct only when the *reference* side fits in
    driver + executor memory (eval sets, dimension tables, one shard of a
    sharded loop). Nothing structural stops a caller from pointing them at
    the corpus side, and at 100 TB that collect is a driver OOM. So: count
    via ``limit(max_ref_rows + 1)`` — a short-circuiting job that stops as
    soon as the cap is exceeded, never scanning the full corpus — and
    refuse with the sharded alternative spelled out.

    ``max_ref_rows=None`` disables the guard (caller asserts fit).
    """
    if max_ref_rows is not None:
        n = df.select(id_col).limit(max_ref_rows + 1).count()
        if n > max_ref_rows:
            raise ReferenceTooLargeError(
                f"reference side has more than max_ref_rows={max_ref_rows} rows; "
                "collecting it for broadcast would OOM the driver at corpus "
                "scale. Use the shard loop instead: "
                "all_pairs_topk_blas_sharded (kNN: per-shard top-k + global "
                "re-rank) or embedding_near_dup_pairs_sharded (near-dup: "
                "disjoint per-shard pair union), raising n_shards until each "
                "shard fits. If the reference genuinely fits, raise "
                "max_ref_rows (or pass None) explicitly."
            )
    return df.select(id_col, vec_col).toPandas()


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    One scan; the query vector is a literal array folded into the plan.
    Output: (id, cosine_sim) ordered desc with id tiebreak.
    """
    q = _lit_vec(query_vec)
    sim = cosine_similarity_col(_as_double(vec_col), q)
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def all_pairs_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact k nearest neighbors for EVERY vector (brute-force N²).

    Feasible for dimension tables / eval sets; for corpus-scale use
    :func:`lsh_bucketed_topk`. Normalizes once before the self-join so the
    pair computation is a plain dot product.
    """
    from pyspark.sql import Window

    # materialize cast + norm before the per-element divide: referencing
    # an aggregate expression inside the transform lambda would re-reduce
    # the whole vector per element (O(dim²) per row)
    normed = (
        df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("_e"))
        .select("id", "_e", _norm(F.col("_e")).alias("_n"))
        .select(
            "id",
            F.transform(F.col("_e"), lambda x: x / F.col("_n")).alias("unit"),
        )
    )
    a = normed.select(F.col("id").alias("id_a"), F.col("unit").alias("unit_a"))
    b = normed.select(F.col("id").alias("id_b"), F.col("unit").alias("unit_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") != F.col("id_b"))
    sim = _dot(F.col("unit_a"), F.col("unit_b")).alias("cosine_sim")
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine_sim"), F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _broadcast_reference(spark, ref, id_col: str, vec_col: str):
    """Normalize a collected (id, vec) pandas frame into broadcast
    (ids, unit-row matrix) handles shared by the BLAS paths."""
    import numpy as np

    ids = ref[id_col].to_numpy()
    mat = np.stack(ref[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return spark.sparkContext.broadcast(ids), spark.sparkContext.broadcast(mat)


def _blas_topk_mapper(b_ids, b_mat, id_col, vec_col, k, round_decimals):
    """mapInPandas closure: per Arrow batch, one matmul against the
    broadcast reference + argpartition top-k (excluding self), emitting
    (id_a, id_b, cosine_sim, rank) ranked by (sim desc, id asc)."""
    import numpy as np
    import pandas as pd

    def topk(batches):
        ref_ids, ref_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ ref_mat.T  # one BLAS call per Arrow batch
            out_a, out_b, out_s, out_r = [], [], [], []
            for row_idx, qid in enumerate(pdf[id_col].to_numpy()):
                s = sims[row_idx]
                mask = ref_ids != qid
                cand_idx = np.nonzero(mask)[0]
                take = min(k, cand_idx.size)
                if take == 0:
                    continue
                part = cand_idx[np.argpartition(-s[cand_idx], take - 1)[:take]]
                # final order: sim desc, id asc (matches SQL tiebreak)
                order = np.lexsort((ref_ids[part], -s[part]))
                sel = part[order]
                out_a.extend([qid] * take)
                out_b.extend(ref_ids[sel])
                out_s.extend(s[sel])
                out_r.extend(range(1, take + 1))
            sims_out = np.asarray(out_s)
            if round_decimals is not None and sims_out.size:
                sims_out = sims_out.round(round_decimals)
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cosine_sim": sims_out, "rank": out_r}
            )

    return topk


def all_pairs_topk_blas(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_decimals: int | None = 6,
    max_ref_rows: int | None = 500_000,
) -> DataFrame:
    """Exact k-NN for every vector via broadcast + Arrow-batched BLAS.

    The scale design for brute-force kNN: the *reference* matrix (all
    vectors) is broadcast once per executor; the *query* side streams
    through ``mapInPandas`` in Arrow batches, and each batch is one numpy
    matmul (batch×d @ d×N) + argpartition top-k. ~10-100× faster than
    per-pair expression evaluation (one BLAS call vs 4M interpreted
    lambdas at N=2000), and the pattern extends to corpus-scale queries
    against a broadcastable index shard.

    Output schema/ordering matches :func:`all_pairs_topk`:
    (id_a, id_b, cosine_sim, rank) with rank by (sim desc, id_b asc).

    ``max_ref_rows`` guards the driver collect (see
    :func:`collect_reference`): above the cap this raises
    :class:`ReferenceTooLargeError` naming the shard-loop alternative
    (:func:`all_pairs_topk_blas_sharded` — the implemented form of it)
    rather than silently OOMing at corpus scale.
    """
    spark = df.sparkSession
    ref = collect_reference(df, id_col, vec_col, max_ref_rows)
    b_ids, b_mat = _broadcast_reference(spark, ref, id_col, vec_col)
    return df.select(id_col, vec_col).mapInPandas(
        _blas_topk_mapper(b_ids, b_mat, id_col, vec_col, k, round_decimals),
        "id_a long, id_b long, cosine_sim double, rank integer",
    )


def all_pairs_topk_blas_sharded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_shards: int = 4,
    round_decimals: int | None = 6,
    max_ref_rows: int | None = 500_000,
) -> DataFrame:
    """Exact k-NN for every vector when the REFERENCE side exceeds one
    broadcast — the shard loop the collect guard prescribes, implemented.

    The reference is split into ``n_shards`` deterministic hash shards
    (``pmod(xxhash64(id), n_shards)``), each collected under the (now
    per-shard) guard and broadcast in turn; every shard pass streams the
    full query side through the same Arrow-batched matmul and keeps its
    local top-k. The union of per-shard candidates (≤ n_shards·k per
    query) is re-ranked globally by (sim desc, id asc) — row_number over
    a window PARTITIONED BY query id, so the re-rank shuffles only the
    candidate set, never the corpus, and parallelizes across query ids.

    Equality with :func:`all_pairs_topk_blas` is exact: every true
    top-k neighbor is in some shard, where it survives the shard-local
    top-k (shard candidates ⊇ shard ∩ global top-k), so the global
    re-rank sees every true neighbor. At 100 TB: n_shards scales with
    reference size (each shard sized to executor memory); driver peak
    memory is ONE shard, not the corpus.

    Rounding is applied after the global re-rank so ranks are decided on
    full-precision similarities, exactly as the unsharded form does
    within each batch.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    shard_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    parts = []
    query_side = df.select(id_col, vec_col)
    for s in range(n_shards):
        ref = collect_reference(
            df.where(shard_of == s), id_col, vec_col, max_ref_rows
        )
        if len(ref) == 0:
            continue
        b_ids, b_mat = _broadcast_reference(spark, ref, id_col, vec_col)
        parts.append(
            query_side.mapInPandas(
                # unrounded: global ranks must be decided on full precision
                _blas_topk_mapper(b_ids, b_mat, id_col, vec_col, k, None),
                "id_a long, id_b long, cosine_sim double, rank integer",
            ).drop("rank")
        )
    if not parts:  # empty input: match the unsharded form's empty output
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine_sim double, rank integer"
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionAll(p)
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine_sim"), F.col("id_b"))
    out = (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    sim = F.col("cosine_sim")
    if round_decimals is not None:
        # bround = half-to-even, matching numpy's .round in the unsharded
        # mapper — F.round (half-up) would diverge from it on 6th-decimal
        # ties and break the documented exact equality
        sim = F.bround(sim, round_decimals)
    return out.select("id_a", "id_b", sim.alias("cosine_sim"), "rank")


def cross_topk_blas(
    query_df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    round_decimals: int | None = 6,
    max_ref_rows: int | None = 500_000,
) -> DataFrame:
    """Exact top-k neighbors of every QUERY vector within a separate
    REFERENCE set — the cross-set sibling of :func:`all_pairs_topk_blas`
    (same broadcast + Arrow-batched matmul mapper, same (sim desc, id
    asc) rank rule). The canonical asymmetric shape: the reference side
    (an eval set, a seed/dimension set) is small and broadcast once; the
    query side is the corpus and streams through — at 100 TB the corpus
    is never collected, never shuffled, and each executor does one BLAS
    call per Arrow batch. The collect guard applies to the REFERENCE
    side only; a corpus-sized reference belongs in
    :func:`all_pairs_topk_blas_sharded`'s loop instead. Id sets are
    expected disjoint (the mapper's self-id exclusion is a no-op
    then)."""
    spark = query_df.sparkSession
    ref = collect_reference(ref_df, id_col, vec_col, max_ref_rows)
    b_ids, b_mat = _broadcast_reference(spark, ref, id_col, vec_col)
    return query_df.select(id_col, vec_col).mapInPandas(
        _blas_topk_mapper(b_ids, b_mat, id_col, vec_col, k, round_decimals),
        "id_a long, id_b long, cosine_sim double, rank integer",
    )


def _hyperplane(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 pseudo-random hyperplanes from a splitmix-style
    integer mix — stable across runs/machines without Math.random."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            z = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & (
                (1 << 64) - 1
            )
            z = (z ^ (z >> 31)) * 0xD6E8FEB86659FD93 & ((1 << 64) - 1)
            row.append(1.0 if (z >> 63) else -1.0)
        planes.append(row)
    return planes


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket of the query vector is
    scanned exactly; other buckets are skipped.

    n_planes=8 → 256 buckets; recall depends on bucket granularity vs
    corpus density. Output schema matches brute_force_topk.
    """
    dim = len(query_vec)
    planes = _hyperplane(n_planes, dim)

    def bucket_of(vec_col_: Column) -> Column:
        bits = []
        for i, plane in enumerate(planes):
            pl = _lit_vec(plane)
            bits.append(F.shiftleft((_dot(vec_col_, pl) > 0).cast("long"), i))
        return reduce(lambda x, y: x.bitwiseOR(y), bits)

    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(x * y for x, y in zip(query_vec, plane)) > 0
    )
    q = _lit_vec(query_vec)
    cand = df.where(bucket_of(_as_double(vec_col)) == F.lit(qbucket))
    sim = cosine_similarity_col(_as_double(vec_col), q)
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        cand.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )
