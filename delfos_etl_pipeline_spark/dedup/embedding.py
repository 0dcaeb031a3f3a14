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
- **LSH-bucketed** — random-hyperplane signatures bucket the corpus;
  only within-bucket pairs are verified with an expression-level cosine.
  The corpus-scale path: candidate count follows bucket occupancy, not
  N². Approximate (a near-dup pair split across buckets is missed);
  raise n_planes to trade recall for candidate volume.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.similarity.knn import (
    _as_double,
    _dot,
    _hyperplane,
    cosine_similarity_col,
)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Exact (id_a, id_b, cosine_sim ≥ threshold) pairs, id_a < id_b,
    via broadcast + Arrow-batched BLAS (one matmul per input batch)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    ref = df.select(id_col, vec_col).toPandas()
    ids = ref[id_col].to_numpy()
    mat = np.stack(ref[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def pairs(batches):
        ref_ids, ref_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ ref_mat.T  # one BLAS call per Arrow batch
            out_a, out_b, out_s = [], [], []
            for row_idx, qid in enumerate(pdf[id_col].to_numpy()):
                s = sims[row_idx]
                # id_a < id_b: each unordered pair emitted exactly once,
                # by the batch that holds its lower id.
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

    return df.select(id_col, vec_col).mapInPandas(
        pairs, "id_a long, id_b long, cosine_sim double"
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Approximate near-dup pairs: hyperplane-bucket the corpus, verify
    cosine only within buckets. Same output contract as the exact form."""
    dim_planes = None

    def bucket_of(vec: F.Column) -> F.Column:
        bits = [
            F.shiftleft(
                (
                    _dot(vec, F.array(*[F.lit(x) for x in plane]).cast("array<double>"))
                    > 0
                ).cast("long"),
                i,
            )
            for i, plane in enumerate(dim_planes)
        ]
        return reduce(lambda x, y: x.bitwiseOR(y), bits)

    dim = len(df.select(vec_col).first()[0])
    dim_planes = _hyperplane(n_planes, dim)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("vec"),
        bucket_of(_as_double(vec_col)).alias("bucket"),
    )
    a = bucketed.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    b = bucketed.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    sim = cosine_similarity_col(F.col("vec_a"), F.col("vec_b"))
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
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
