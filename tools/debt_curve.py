"""Measure the compaction-debt curve behind index_admin.needs_compaction
(VERDICT r13 item 3: "the thresholds are asserted, not measured").

On a FIXED corpus (sf0.1: 5,000 documents / 2,000 vectors) this
accumulates each debt axis independently and times the indexed probes at
every step, so the policy defaults can be read off a measured latency
curve instead of asserted:

- **generation debt**: 0 → 50 committed ``merge_into_*`` generations
  (distinct synthetic filler batches, ids ≥ 1,000,000, so the probe's
  own matches are untouched and every merge is a legal new-id append).
  Probe cost grows with files-per-scan (open/footer/listing overhead) —
  the curve says where that knee is.
- **tombstone debt**: 0 → 200,000 tombstone rows (synthetic never-indexed
  ids — removing a never-indexed id is the documented no-op, so the
  probe's OUTPUT is invariant while the anti-join's build side grows).
  Probe cost grows with the broadcast anti-join — the curve says when a
  tombstone relation stops being cheap.

Round 15 (VERDICT r14 item 2): the PQ family is measured on BOTH axes —
``merge_into_pq_index`` filler generations and never-indexed tombstones
against the persisted codes store, probe = ``pq_adc_topk`` over
``read_pq_index`` — so ``needs_compaction``'s PQ thresholds cite a PQ
curve instead of the IVF anti-join analogy.

The probe batch is fixed (500 docs / 1 query vector) at every step;
probes are warm median-of-3 in one session per axis. index_stats is
read at each checkpoint so the table's x-axis is the store's own debt
report, not the loop counter. Run ALONE, like bench — concurrent Spark
work contaminates medians.

Usage: python tools/debt_curve.py [out_markdown]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
GEN_CHECKPOINTS = (0, 1, 2, 5, 10, 20, 30, 50)
TOMB_CHECKPOINTS = (0, 1_000, 10_000, 50_000, 100_000, 200_000)
FILLER_BASE = 1_000_000


def _median3(fn) -> float:
    times = []
    for _ in range(3):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def run_generations(spark, work: str) -> list[dict]:
    """Probe latency vs committed merge generations (gram + MinHash)."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.dedup.minhash import (
        merge_into_minhash_index,
        minhash_lsh_pairs_indexed,
        write_minhash_index,
    )
    from delfos_etl_pipeline_spark.dedup.substring import (
        merge_into_gram_index,
        remove_spans_matching_indexed,
        write_gram_index,
    )
    from delfos_etl_pipeline_spark.similarity.pq import (
        fit_pq_codebooks_fixed,
        merge_into_pq_index,
        pq_adc_topk,
        pq_encode,
        read_pq_index,
        write_pq_index,
    )
    from delfos_etl_pipeline_spark.sources.index_admin import index_stats
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where((F.col("doc_id") % 6 == 0) & (F.col("doc_id") < 3000))
    vcorpus = emb.where(F.col("vec_id") % 3 != 0)
    qvec = [float(x)
            for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    gram = os.path.join(work, "grams")
    mh = os.path.join(work, "lsh")
    pq = os.path.join(work, "pq")
    write_gram_index(corpus, gram, "doc_id", "text", k=5, hashed=False,
                     counted=True)
    write_minhash_index(corpus, mh, "doc_id", "text", n=3, hash_fn="md5")
    books = fit_pq_codebooks_fixed(vcorpus, "vec_id", "embedding", m=8, k=16)
    write_pq_index(
        pq_encode(vcorpus, books, "vec_id", "embedding"), books, pq
    )

    def probe_gram():
        remove_spans_matching_indexed(
            batch, gram, "doc_id", "text", k=5, hashed=False,
            net_counts=True,
        ).write.format("noop").mode("overwrite").save()

    def probe_mh():
        minhash_lsh_pairs_indexed(
            batch, mh, "doc_id", "text", n=3, threshold=0.6, hash_fn="md5"
        ).write.format("noop").mode("overwrite").save()

    def probe_pq():
        codes, bks = read_pq_index(spark, pq)
        pq_adc_topk(codes, bks, qvec, "vec_id", k=10).write.format(
            "noop"
        ).mode("overwrite").save()

    # deterministic 20-vector filler batches, encoded against the FROZEN
    # codebooks (the merge contract): new ids, never probed
    def vfiller(g: int):
        rows = [
            (
                FILLER_BASE + g * 100 + i,
                [float((g * 31 + i * 7 + j) % 17) / 16.0 for j in range(64)],
            )
            for i in range(20)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    # distinct 20-doc filler batches: every merge is a legal new-id
    # append; texts overlap nothing in the probe batch
    def filler(g: int):
        rows = [
            (
                FILLER_BASE + g * 100 + i,
                f"filler generation {g} document {i} "
                + " ".join(f"tok{g}x{i}y{j}" for j in range(30)),
            )
            for i in range(20)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    out = []
    done = 0
    probe_gram(), probe_mh(), probe_pq()  # warm (codegen + file index)
    for cp in GEN_CHECKPOINTS:
        while done < cp:
            done += 1
            b = filler(done)
            merge_into_gram_index(b, gram, "doc_id", "text", k=5,
                                  hashed=False, counted=True,
                                  batch_id=f"g{done}")
            merge_into_minhash_index(b, mh, "doc_id", "text", n=3,
                                     hash_fn="md5", batch_id=f"g{done}")
            merge_into_pq_index(
                pq_encode(vfiller(done), books, "vec_id", "embedding"),
                pq, batch_id=f"g{done}",
            )
        gs = index_stats(spark, gram, "gram")
        ms = index_stats(spark, mh, "minhash")
        ps = index_stats(spark, pq, "pq")
        out.append({
            "generations": gs["generations"],
            "gram_files": gs["data_files"],
            "mh_files": ms["data_files"],
            "pq_files": ps["data_files"],
            "probe_gram": _median3(probe_gram),
            "probe_minhash": _median3(probe_mh),
            "probe_pq": _median3(probe_pq),
        })
    return out


def run_tombstones(spark, work: str) -> list[dict]:
    """Probe latency vs pending tombstone rows (MinHash + IVF + PQ)."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.dedup.minhash import (
        minhash_lsh_pairs_indexed,
        remove_from_minhash_index,
        write_minhash_index,
    )
    from delfos_etl_pipeline_spark.similarity.ivf import (
        build_ivf_index_fixed,
        ivf_topk,
        read_ivf_index,
        remove_from_ivf_index,
        write_ivf_index,
    )
    from delfos_etl_pipeline_spark.similarity.pq import (
        fit_pq_codebooks_fixed,
        pq_adc_topk,
        pq_encode,
        read_pq_index,
        remove_from_pq_index,
        write_pq_index,
    )
    from delfos_etl_pipeline_spark.sources.index_admin import index_stats
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where((F.col("doc_id") % 6 == 0) & (F.col("doc_id") < 3000))
    vcorpus = emb.where(F.col("vec_id") % 3 != 0)
    qvec = [float(x)
            for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    mh = os.path.join(work, "lsh_t")
    ivf = os.path.join(work, "ivf_t")
    pq = os.path.join(work, "pq_t")
    write_minhash_index(corpus, mh, "doc_id", "text", n=3, hash_fn="md5")
    assigned, cents = build_ivf_index_fixed(vcorpus, n_clusters=8)
    write_ivf_index(assigned.select("vec_id", "embedding", "cluster"), ivf)
    books = fit_pq_codebooks_fixed(vcorpus, "vec_id", "embedding", m=8, k=16)
    write_pq_index(
        pq_encode(vcorpus, books, "vec_id", "embedding"), books, pq
    )

    def probe_mh():
        minhash_lsh_pairs_indexed(
            batch, mh, "doc_id", "text", n=3, threshold=0.6, hash_fn="md5"
        ).write.format("noop").mode("overwrite").save()

    def probe_ivf():
        ivf_topk(
            read_ivf_index(spark, ivf), cents, qvec, k=10, n_probe=2
        ).write.format("noop").mode("overwrite").save()

    def probe_pq():
        codes, bks = read_pq_index(spark, pq)
        pq_adc_topk(codes, bks, qvec, "vec_id", k=10).write.format(
            "noop"
        ).mode("overwrite").save()

    out = []
    done = 0
    probe_mh(), probe_ivf(), probe_pq()  # warm
    for cp in TOMB_CHECKPOINTS:
        if cp > done:
            # synthetic never-indexed ids: output-invariant, build-side real
            ids = spark.range(
                FILLER_BASE + done, FILLER_BASE + cp
            ).select(F.col("id").alias("doc_id"))
            remove_from_minhash_index(ids, mh)
            remove_from_ivf_index(
                ids.withColumnRenamed("doc_id", "vec_id"), ivf, "vec_id"
            )
            remove_from_pq_index(
                ids.withColumnRenamed("doc_id", "vec_id"), pq, "vec_id"
            )
            done = cp
        ms = index_stats(spark, mh, "minhash")
        ivs = index_stats(spark, ivf, "ivf")
        ps = index_stats(spark, pq, "pq")
        out.append({
            "tombstone_rows": ms["tombstone_rows"],
            "ivf_tombstone_rows": ivs["tombstone_rows"],
            "pq_tombstone_rows": ps["tombstone_rows"],
            "probe_minhash": _median3(probe_mh),
            "probe_ivf": _median3(probe_ivf),
            "probe_pq": _median3(probe_pq),
        })
    return out


def main() -> None:
    from delfos_etl_pipeline_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    lines = []
    for label, runner in (("generations", run_generations),
                          ("tombstones", run_tombstones)):
        spark = get_spark(
            "debt-curve", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            extra_conf={"spark.ui.enabled": "false",
                        "spark.ui.showConsoleProgress": "false",
                        "spark.driver.memory": "16g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        work = tempfile.mkdtemp(prefix=f"debt_curve_{label}_")
        try:
            rows = runner(spark, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
            spark.stop()
        keys = list(rows[0])
        lines.append(f"### {label}")
        lines.append("| " + " | ".join(keys) + " |")
        lines.append("| " + " | ".join("---" for _ in keys) + " |")
        for r in rows:
            lines.append("| " + " | ".join(str(r[k]) for k in keys) + " |")
        lines.append("")
    out = "\n".join(lines)
    print(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
