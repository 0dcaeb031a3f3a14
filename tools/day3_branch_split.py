"""Split curate_nightly_ingest_day3's PROBE execution across its three
index branches (gram substring cut / MinHash band probe / IVF semantic
probe) plus the composed plan, timing each as a separate noop write in
one warm session. Methodology: tools/profile_split.py (median of 3,
warm first). Evidence for VERDICT r15 item 6."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark import get_spark
    from delfos_etl_pipeline_spark.queries import curation as cu
    from delfos_etl_pipeline_spark.queries._registry import _t

    spark = get_spark(
        "delfos-day3-split",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    gram, mh_path, ivf, cents, doc_manifest, vec_manifest = (
        cu._ensure_day3_state(spark, sf_dir)
    )

    def build_branches():
        from delfos_etl_pipeline_spark.dedup.minhash import (
            minhash_lsh_pairs_indexed,
        )
        from delfos_etl_pipeline_spark.dedup.substring import (
            remove_spans_matching_indexed,
        )

        docs = _t(spark, sf_dir, "documents")
        doc_pred = spark.createDataFrame(
            [(i,) for i in doc_manifest], "doc_id bigint"
        )
        batch = docs.join(
            F.broadcast(doc_pred.select(F.col("doc_id"))),
            "doc_id",
            "left_semi",
        )
        sub = remove_spans_matching_indexed(
            batch, gram, "doc_id", "text", k=5, hashed=False,
            net_counts=True,
        )
        mh = (
            minhash_lsh_pairs_indexed(
                batch, mh_path, "doc_id", "text",
                n=3, threshold=0.6, hash_fn="md5",
            )
            .groupBy("doc_new")
            .agg(F.max("jaccard").alias("top_jaccard"))
        )
        return sub, mh

    def full():
        from delfos_etl_pipeline_spark.queries._registry import QUERIES

        return QUERIES["curate_nightly_ingest_day3"](spark, sf_dir)

    def timed(tag, mk):
        for _ in range(2):
            mk().write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(3):
            df = mk()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(json.dumps({"branch": tag, "exec_s": round(sorted(ts)[1], 3)}),
              flush=True)

    timed("gram_sub", lambda: build_branches()[0])
    timed("minhash", lambda: build_branches()[1])
    timed("full_day3", full)
    spark.stop()


if __name__ == "__main__":
    main()
