"""Similarity search: brute-force exactness, LSH bucket soundness."""

import pytest
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.similarity.knn import (
    all_pairs_topk,
    brute_force_topk,
    lsh_bucketed_topk,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]


def test_self_similarity_is_one(emb, qvec):
    top = brute_force_topk(emb, qvec, k=1, round_decimals=6).collect()
    assert top[0].vec_id == 0
    assert top[0].cosine_sim == pytest.approx(1.0, abs=1e-6)


def test_topk_ordering_and_bounds(emb, qvec):
    rows = brute_force_topk(emb.where(F.col("vec_id") != 0), qvec, k=10).collect()
    sims = [r.cosine_sim for r in rows]
    assert len(rows) == 10
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


def test_lsh_results_subset_of_corpus_truth(emb, qvec):
    """Every LSH hit must carry the same cosine the brute-force scan
    assigns — the approximation only restricts the candidate set."""
    brute = {
        r.vec_id: r.cosine_sim
        for r in brute_force_topk(
            emb.where(F.col("vec_id") != 0), qvec, k=10**6
        ).collect()
    }
    lsh = lsh_bucketed_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10, n_planes=4
    ).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert brute[r.vec_id] == pytest.approx(r.cosine_sim, abs=1e-6)


def test_all_pairs_topk_shape(emb):
    out = all_pairs_topk(emb.limit(50), k=3)
    rows = out.collect()
    assert len(rows) == 50 * 3
    assert all(1 <= r.rank <= 3 for r in rows)
    assert all(r.id_a != r.id_b for r in rows)
