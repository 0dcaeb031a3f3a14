"""Numeric iterative graph algorithms — PageRank over an edge list.

Complements the combinatorial closure family (dedup/clusters.py label
propagation + large-star/small-star): PageRank is the numeric-fixpoint
archetype — per round one join (propagate mass along edges) and one
keyed sum (gather), exactly the shuffle shape a 1000-executor cluster
runs as plain hash exchanges with no driver state. Fixed iteration
count (power iteration truncated at ``iterations``) rather than an
epsilon test: deterministic output, unrollable into an exact SQL twin,
and in practice rank ORDER stabilizes long before values converge.

Cross-engine exactness contract (same discipline as the corr/LM
queries): per-node rank is carried as DECIMAL(18,12); each round's
contribution pr(u)/deg(u) and the damped update 0.15/n + 0.85·Σ are
computed in double from those exact decimals and immediately half-up
rounded back to 12 decimals — so the per-round gather sum is an exact,
order-independent DECIMAL sum and every engine lands on identical
values at every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,12)"


def pagerank(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iterations: int = 3,
    damping: float = 0.85,
    teleport: float = 0.15,
) -> DataFrame:
    """(node, pr) after ``iterations`` damped power-iteration rounds over
    the UNDIRECTED graph given as a pair list (edges are symmetrized, so
    every incident node has degree ≥ 1 — no dangling-mass handling
    needed). Teleport and damping follow Page et al.'s original
    formulation with uniform 1/n initialization."""
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    # persist both: every round's contribution join re-reads edges and the
    # final plan references deg per round — without caching, an expensive
    # upstream pair detector (e.g. the shingle self-join) would re-execute
    # 2× per iteration (measured 9s → ~3s at sf0.1). The |V|-count action
    # below materializes both into the cache before the loop builds on
    # them; blocks stay pinned for the caller's terminal action and are
    # evicted LRU afterwards.
    edges = (
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).persist()
    n = deg.count()  # scalar: |V|, driver-side by design; warms both caches
    if n == 0:
        return deg.select("node", F.lit(None).cast(_DEC).alias("pr"))
    nlit = F.lit(n)
    rnd = lambda c: (F.floor(c * 1e12 + F.lit(0.5)) / 1e12).cast(_DEC)  # noqa: E731
    pr = deg.select("node", "deg", rnd(F.lit(1.0) / nlit).alias("pr"))
    for _ in range(iterations):
        contrib = edges.join(pr, edges.b == pr.node).select(
            edges.a.alias("node"),
            rnd(F.col("pr").cast("double") / F.col("deg")).alias("c"),
        )
        gathered = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (
            deg.join(gathered, "node")
            .select(
                "node",
                "deg",
                # teleport is a SEPARATE literal, not 1-damping: the float
                # 1.0-0.85 is 0.15000000000000002, which would diverge
                # from the SQL twin's literal 0.15
                rnd(
                    F.lit(teleport) / nlit
                    + F.lit(damping) * F.col("s").cast("double")
                ).alias("pr"),
            )
        )
    return pr.select("node", "pr")


def triangle_counts(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(node, degree, n_triangles, clustering_coef) over the undirected
    graph given as a pair list — per-node triangle participation and the
    local clustering coefficient 2T / (deg·(deg−1)).

    Scale shape — degree-ordered orientation (the standard distributed
    triangle-count trick; cf. Suri & Vassilvitskii's MapReduce
    formulation): every undirected edge is oriented from its lower
    (degree, id) endpoint to the higher, which caps any node's
    out-degree at O(√m). Wedges are enumerated per ORIENTED source —
    so the hot celebrity node that would generate deg² wedge candidates
    under naive enumeration generates at most O(m) across the whole
    graph — and closed with one equi-join back to the oriented edge
    list. Total work O(m^1.5) worst case, three keyed shuffles, no
    driver state. The (degree, id) order is realized as Spark struct
    comparison, so no global rank window (which would serialize on a
    single partition) is needed.

    Each triangle {u,v,w} is found exactly once (its three edges form
    exactly one length-2 oriented path closed by an oriented edge), then
    credited to all three corners via explode + count."""
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    edges = (
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    und = edges.where(F.col("a") < F.col("b"))
    withdeg = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("dega")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("degb")), "b")
    )
    ka = F.struct(F.col("dega").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("degb").alias("d"), F.col("b").alias("i"))
    oriented = withdeg.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ka < kb, kb).otherwise(ka).alias("kv"),
    ).persist()
    e1 = oriented.select(F.col("u"), F.col("v").alias("v1"), F.col("kv").alias("k1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("v2"), F.col("kv").alias("k2"))
    wedges = e1.join(e2, "u").where(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    pernode = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    coef = F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
        F.floor(
            (
                F.lit(2.0)
                * t
                / (F.col("degree") * (F.col("degree") - F.lit(1.0)))
            )
            * 1000000.0
            + 0.5
        )
        / 1000000.0
    )
    return deg.join(pernode, "node", "left").select(
        "node",
        "degree",
        t.alias("n_triangles"),
        coef.alias("clustering_coef"),
    )
