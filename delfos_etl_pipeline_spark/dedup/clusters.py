"""Duplicate-cluster assembly: connected components over near-dup pairs.

The pairwise detectors (ngram.jaccard_pairs, minhash.minhash_lsh_pairs,
embedding.embedding_near_dup_pairs) emit edges; turning edges into
canonical-per-cluster decisions ("keep one doc per duplicate GROUP, not
per pair") needs the transitive closure. This is the standard label-
propagation formulation: every node starts as its own component, each
round adopts the minimum label among itself and its neighbors, and the
loop stops at fixpoint — O(diameter) rounds, and near-dup graphs are
shallow (clusters are cliques-ish), so 3-5 rounds in practice.

Scale posture: each round is one join + one min-aggregate, both keyed on
the node id — a 1000-executor cluster runs rounds as plain shuffles with
no driver-side state besides the fixpoint counter. For web-scale graphs
with giant components, swap in the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond") — same
per-round operator shape, provably fewer rounds on high-diameter graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, comp) for every node incident to a pair; comp = min node id
    reachable in the undirected pair graph (the component's canonical id).

    The input edge list is symmetrized once and persisted — it is re-read
    every round. Labels persist per round and the previous round is
    explicitly unpersisted so executor storage stays O(|V|), not
    O(rounds·|V|). Checkpoint rounds need extra care: Dataset.unpersist
    only releases cache-manager entries, not the RDD-level blocks
    localCheckpoint writes, so those RDD ids are tracked explicitly (via
    getPersistentRDDs diffing) and unpersisted when the round's labels are
    superseded.
    """
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    # Labels under min-propagation are monotone non-increasing, so the sum
    # of labels strictly decreases every round until fixpoint — comparing
    # one scalar per round detects convergence with a single aggregate
    # action instead of a changed-rows join.
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    jsc = pairs.sparkSession.sparkContext._jsc

    def _persistent_ids() -> set:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _free_rdds(ids: set) -> None:
        pmap = jsc.getPersistentRDDs()
        for rid in ids:
            rdd = pmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)

    prev_ckpt_ids: set = set()
    for it in range(max_iter):
        # neighbor labels flow along edges; keep own label in the running
        prop = edges.join(labels, edges.b == labels.node).select(
            edges.a.alias("node"), labels.comp
        )
        new_labels = (
            labels.select("node", "comp")
            .union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        if (it + 1) % checkpoint_every == 0:
            # Truncate lineage: without this the logical plan nests one
            # join+agg layer per round and high-diameter graphs blow up
            # optimizer time / stack depth long before data size matters.
            before = _persistent_ids()
            new_labels = new_labels.localCheckpoint()  # eager: blocks exist now
            new_ckpt_ids = _persistent_ids() - before
        else:
            new_labels = new_labels.persist()
            new_ckpt_ids = set()
        new_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()  # no-op if labels was checkpoint-backed ...
        _free_rdds(prev_ckpt_ids)  # ... so free its RDD blocks explicitly
        prev_ckpt_ids = new_ckpt_ids
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, comp) via large-star/small-star alternation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    web-scale path the label-propagation docstring promises. Same output
    contract as :func:`connected_components`.

    Why a second algorithm: min-label propagation needs O(diameter)
    rounds, fine for the clique-ish near-dup graphs dedup produces but
    quadratic-feeling on path-shaped giant components (a 10^6-node chain
    is 10^6 rounds). Large-star/small-star contracts every component to a
    star in O(log² n) rounds regardless of diameter, with the SAME
    per-round operator shape (one group-by-min + one join, both keyed on
    node id — plain shuffles, no driver state beyond the convergence
    scalar), so it holds on a 1000-executor cluster for any graph shape.

    Per round:
      large-star: symmetrize, group by u, m = min(Γ(u) ∪ {u}); emit
        (v, m) for every neighbor v > u — strictly-larger neighbors hook
        onto the local minimum.
      small-star: orient each edge (max, min), group by the max u,
        m = min(Γ(u) ∪ {u}); emit (x, m) for x ∈ Γ(u) ∪ {u}, x ≠ m.
    Fixpoint when the small-star edge set stops changing (checked with
    one count+xxhash aggregate — a single scalar action per round).
    Each round is localCheckpoint'ed: lineage would otherwise nest two
    join+agg layers per round, and the RDD blocks of the superseded
    round are freed explicitly (Dataset.unpersist does not release
    localCheckpoint blocks)."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    )
    # start from the small-star canonical orientation (big → small)
    edges = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .persist()
    )

    jsc = pairs.sparkSession.sparkContext._jsc

    def _persistent_ids() -> set:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _free_rdds(ids: set) -> None:
        pmap = jsc.getPersistentRDDs()
        for rid in ids:
            rdd = pmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)

    def _fingerprint(df: DataFrame) -> tuple:
        # decimal accumulator: a long sum of 64-bit hashes overflows ANSI
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_fp = _fingerprint(edges)
    prev_ckpt_ids: set = set()
    was_persist = True  # first `edges` is persist()-backed, not checkpointed
    for _ in range(max_iter):
        # large-star over the symmetrized neighborhood
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = sym.groupBy("u").agg(F.min("v").alias("mv"))
        lmin = lmin.select("u", F.least("mv", "u").alias("m"))
        large = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the (max, min) orientation of large's output
        small_in = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
        smin = small_in.groupBy("u").agg(F.min("v").alias("m"))
        new_edges = (
            small_in.join(smin, "u")
            .select(F.col("v").alias("x"), F.col("m"))
            .union(small_in.join(smin, "u").select(F.col("u").alias("x"), "m"))
            .where(F.col("x") != F.col("m"))
            .select(F.col("x").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        before = _persistent_ids()
        new_edges = new_edges.localCheckpoint()
        new_ckpt_ids = _persistent_ids() - before
        fp = _fingerprint(new_edges)
        if was_persist:
            edges.unpersist()
        _free_rdds(prev_ckpt_ids)
        prev_ckpt_ids, was_persist = new_ckpt_ids, False
        edges = new_edges
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged star graph: every edge is (member, root), root < member
    labels = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .union(edges.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .distinct()
    )
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    algorithm: str = "label_prop",
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) — every document that has at
    least one near-duplicate, labeled with its duplicate group. Docs with
    no pairs are absent (they are their own singleton cluster — joining
    them in would just echo the corpus). ``algorithm``: ``label_prop``
    (O(diameter) rounds, ideal for clique-ish dup graphs), ``star``
    (large-star/small-star, O(log² n) rounds on any graph shape), or
    ``auto`` (guarded driver union-find when the edge list fits —
    near-dup pair lists usually do after LSH/prefix pruning — falling
    back to ``star`` beyond the guard)."""
    if algorithm == "auto":
        try:
            cc = connected_components_driver(pairs, src, dst)
        except EdgeListTooLargeError:
            cc = connected_components_star(pairs, src, dst)
    elif algorithm == "star":
        cc = connected_components_star(pairs, src, dst)
    else:
        cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )


class EdgeListTooLargeError(ValueError):
    """The pair list exceeds the driver union-find guard."""


def connected_components_driver(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_edges: int = 2_000_000,
) -> DataFrame:
    """(node, comp) via a GUARDED driver-side union-find — the contraction
    endgame for graphs whose EDGE LIST fits the driver (the near-dup case
    after LSH/prefix pruning: pairs are a vanishing fraction of the
    corpus even when the corpus is 100 TB). Union-by-min + path
    compression gives comp = min reachable id — the identical contract as
    the distributed algorithms, so the three tiers interchange freely.

    The guard collects at most ``max_edges + 1`` rows (one pass over the
    pair subtree — no separate count job) and raises
    :class:`EdgeListTooLargeError` when exceeded; callers fall back to
    the O(log² n) star algorithm. 2 M edges ≈ 32 MB of longs on the
    driver — conservative against a multi-GB heap.
    """
    sel = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rows = sel.limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        raise EdgeListTooLargeError(
            f"pair list exceeds max_edges={max_edges}; use "
            "connected_components_star (O(log^2 n) rounds, distributed) "
            "or raise the guard if the driver heap genuinely fits it"
        )
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if ra < rb:  # union-by-min: the root IS the component minimum
            parent[rb] = ra
        else:
            parent[ra] = rb
    data = [(n, find(n)) for n in parent]
    node_type = pairs.schema[src].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("node", node_type, False),
            StructField("comp", node_type, False),
        ]
    )
    return pairs.sparkSession.createDataFrame(data, schema)
