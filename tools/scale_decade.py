"""Measure one more decade of scale for the index lifecycle (VERDICT
r12 item 5): build → probe → merge → remove → compact timings for the
gram / MinHash / IVF index families at the bench corpus (sf0.1:
5,000 documents / 2,000 vectors) and a deterministic 10× amplification
(50,000 / 20,000), with an IDENTICAL probe batch and takedown manifest
at both scales.

The claim under test is the lifecycle's scaling story: probe cost is
O(batch) semi-joins against the persisted relations (so a 10× corpus
must NOT make the same batch ~10× slower), merges are O(batch) appends,
removals are O(manifest), and only build + compact pay O(corpus). The
probe batch is selected by `doc_id < 3000` predicates whose matching
rows are BIT-IDENTICAL at both scales (amplified replicas get ids
≥ 5,000), so any probe-time growth is corpus-induced by construction.

The 10× corpus amplifies /root/testdata/sf0.1 deterministically
(replica k of doc d gets id d + k·5000; every 7th token is tagged per
replica so replicas are near- but not exact duplicates; embeddings get
a per-replica deterministic perturbation on one rotating dimension).
Written OUTSIDE the read-only testdata tree. Run ALONE, like bench —
concurrent Spark work contaminates medians.

Usage: python tools/scale_decade.py [out_markdown]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
MULT = 10
BASE_DOCS = 5000


def amplify(out_dir: str) -> None:
    """Deterministic 10× documents/embeddings amplification of sf0.1."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
      COPY (
        SELECT d.doc_id + r.k * {BASE_DOCS} AS doc_id,
               CASE WHEN r.k = 0 THEN d.text ELSE
                 list_aggregate(list_transform(
                   string_split(d.text, ' '),
                   (t, i) -> CASE WHEN i % 7 = 0 THEN t || 'r' || r.k
                             ELSE t END), 'string_agg', ' ')
               END AS text,
               d.lang, d.source,
               CAST(length(CASE WHEN r.k = 0 THEN d.text ELSE
                 list_aggregate(list_transform(
                   string_split(d.text, ' '),
                   (t, i) -> CASE WHEN i % 7 = 0 THEN t || 'r' || r.k
                             ELSE t END), 'string_agg', ' ')
               END) AS BIGINT) AS n_chars
        FROM read_parquet('{SF_DIR}/documents.parquet') d
        CROSS JOIN (SELECT unnest(range({MULT})) AS k) r
      ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(f"""
      COPY (
        SELECT e.vec_id + r.k * {n_vecs} AS vec_id,
               list_transform(e.embedding,
                 (x, i) -> CASE WHEN i - 1 = r.k * 3 % 64
                           THEN x + CAST(0.001 * (r.k + 1) AS FLOAT)
                           ELSE x END) AS embedding,
               e.label
        FROM read_parquet('{SF_DIR}/embeddings.parquet') e
        CROSS JOIN (SELECT unnest(range({MULT})) AS k) r
      ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)


def _timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def _median3(fn) -> float:
    times = sorted(_timed(fn) for _ in range(3))
    return times[1]


def run_lifecycle(spark, sf_dir: str, work: str) -> dict[str, float]:
    """Build the three families over the standing corpus, probe with the
    fixed batch, merge the batch, remove a fixed manifest, re-probe,
    compact, re-probe. Returns stage → seconds."""
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
    from delfos_etl_pipeline_spark.similarity.ivf import (
        build_ivf_index_fixed,
        compact_ivf_index,
        ivf_topk,
        merge_into_ivf_index,
        read_ivf_index,
        remove_from_ivf_index,
        write_ivf_index,
        assign_fixed_centroids,
    )
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    # identical rows at BOTH scales (amplified replicas have ids >= 5000)
    batch = docs.where((F.col("doc_id") % 6 == 0) & (F.col("doc_id") < 3000))
    manifest = corpus.where(
        (F.col("doc_id") % 5 == 1) & (F.col("doc_id") < 3000)
    )
    vcorpus = emb.where(F.col("vec_id") % 3 != 0)
    n_vecs = vcorpus.count()
    n_clusters = max(8, n_vecs // 250)  # constant cell size across scales
    qvec = [float(x)
            for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]

    gram = os.path.join(work, "grams")
    mh = os.path.join(work, "lsh")
    ivf = os.path.join(work, "ivf")
    res: dict[str, float] = {
        "corpus_docs": corpus.count(),
        "batch_docs": batch.count(),
        "manifest_docs": manifest.count(),
        "ivf_cells": n_clusters,
    }

    res["build_gram"] = _timed(lambda: write_gram_index(
        corpus, gram, "doc_id", "text", k=5, hashed=False, counted=True))
    res["build_minhash"] = _timed(lambda: write_minhash_index(
        corpus, mh, "doc_id", "text", n=3, hash_fn="md5"))
    assigned, cents = build_ivf_index_fixed(vcorpus, n_clusters=n_clusters)
    res["build_ivf"] = _timed(lambda: write_ivf_index(
        assigned.select("vec_id", "embedding", "cluster"), ivf))

    def probe_gram():
        remove_spans_matching_indexed(
            batch, gram, "doc_id", "text", k=5, hashed=False,
            net_counts=True,
        ).write.format("noop").mode("overwrite").save()

    def probe_mh():
        minhash_lsh_pairs_indexed(
            batch, mh, "doc_id", "text", n=3, threshold=0.6, hash_fn="md5"
        ).write.format("noop").mode("overwrite").save()

    def probe_ivf():
        ivf_topk(
            read_ivf_index(spark, ivf), cents, qvec, k=10, n_probe=2
        ).write.format("noop").mode("overwrite").save()

    for name, fn in (("gram", probe_gram), ("minhash", probe_mh),
                     ("ivf", probe_ivf)):
        fn()  # warm (codegen + file index)
        res[f"probe_{name}"] = _median3(fn)

    res["merge_gram"] = _timed(lambda: merge_into_gram_index(
        batch, gram, "doc_id", "text", k=5, hashed=False, counted=True,
        batch_id="b1"))
    res["merge_minhash"] = _timed(lambda: merge_into_minhash_index(
        batch, mh, "doc_id", "text", n=3, hash_fn="md5", batch_id="b1"))
    vbatch = emb.where((F.col("vec_id") % 6 == 0) & (F.col("vec_id") < 1200))
    res["merge_ivf"] = _timed(lambda: merge_into_ivf_index(
        assign_fixed_centroids(vbatch, cents, inline=True).select(
            "vec_id", "embedding", "cluster"), ivf, batch_id="b1"))

    res["remove_gram"] = _timed(lambda: remove_from_gram_index(
        manifest, gram, "doc_id", "text", k=5, hashed=False,
        batch_id="takedown"))
    res["remove_minhash"] = _timed(lambda: remove_from_minhash_index(
        manifest.select("doc_id"), mh))
    vman = vcorpus.where(
        (F.col("vec_id") % 5 == 1) & (F.col("vec_id") < 1200)
    ).select("vec_id")
    res["remove_ivf"] = _timed(lambda: remove_from_ivf_index(
        vman, ivf, "vec_id"))

    for name, fn in (("gram", probe_gram), ("minhash", probe_mh),
                     ("ivf", probe_ivf)):
        fn()
        res[f"probe_{name}_tombstoned"] = _median3(fn)

    res["compact_gram"] = _timed(
        lambda: compact_gram_index(spark, gram))
    res["compact_minhash"] = _timed(lambda: compact_minhash_index(spark, mh))
    res["compact_ivf"] = _timed(
        lambda: compact_ivf_index(spark, ivf, "vec_id"))

    for name, fn in (("gram", probe_gram), ("minhash", probe_mh),
                     ("ivf", probe_ivf)):
        fn()
        res[f"probe_{name}_compacted"] = _median3(fn)
    return res


def main() -> None:
    from delfos_etl_pipeline_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    big = os.path.join(tempfile.gettempdir(), "delfos_scale10x")
    if not os.path.exists(os.path.join(big, "embeddings.parquet")):
        shutil.rmtree(big, ignore_errors=True)
        amplify(big)

    results = {}
    for label, sf_dir in (("1x", SF_DIR), ("10x", big)):
        spark = get_spark(
            "scale-decade", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            extra_conf={"spark.ui.enabled": "false",
                        "spark.ui.showConsoleProgress": "false",
                        "spark.driver.memory": "16g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        work = tempfile.mkdtemp(prefix=f"scale_decade_{label}_")
        try:
            results[label] = run_lifecycle(spark, sf_dir, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
            spark.stop()

    stages = [k for k in results["1x"] if not k.startswith(("corpus",
              "batch_", "manifest", "ivf_cells"))]
    lines = [
        "| stage | 1x (5k docs / 2k vecs) | 10x (50k / 20k) | ratio |",
        "| --- | --- | --- | --- |",
    ]
    for s in stages:
        a, b = results["1x"][s], results["10x"][s]
        ratio = round(b / a, 2) if a else float("inf")
        lines.append(f"| {s} | {a} | {b} | {ratio} |")
    meta = (
        f"fixed batch: {results['1x']['batch_docs']} docs "
        f"(identical rows at both scales); manifest: "
        f"{results['1x']['manifest_docs']} docs; IVF cells: "
        f"{results['1x']['ivf_cells']} -> {results['10x']['ivf_cells']} "
        f"(constant cell size)"
    )
    out = "\n".join([meta, ""] + lines)
    print(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
