"""Per-stage write timing for curate_pipeline_staged: time each of the
five stage boundaries (write + read-back count) separately, warm, in one
session. Evidence for VERDICT r15 item 7 (guide §6)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark import get_spark
    from delfos_etl_pipeline_spark.dedup.exact import exact_dedup
    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from delfos_etl_pipeline_spark.text.curation import (
        decontaminate_corpus,
        mixture_sample,
        quality_gate,
        token_budget_sample,
    )

    spark = get_spark(
        "delfos-staged-split",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="staged_split_")

    docs_all = load_table(spark, sf_dir, "documents")
    docs = docs_all.where(F.col("doc_id") % 17 != 0)
    eval_df = docs_all.where(F.col("doc_id") % 17 == 0)
    rates = {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.25}

    def stages():
        out = {}

        def stage(df, name):
            path = f"{workdir}/{name}"
            t0 = time.time()
            df.write.mode("overwrite").parquet(path)
            t1 = time.time()
            back = spark.read.parquet(path)
            out[name] = round(t1 - t0, 3)
            return back

        quality = stage(quality_gate(docs, "text", 30, 0.35), "01_quality")
        deduped = stage(exact_dedup(quality, ["text"], "doc_id"), "02_deduped")
        clean = stage(
            decontaminate_corpus(deduped, eval_df, "doc_id", "text", n=5),
            "03_clean",
        )
        mixed = stage(mixture_sample(clean, rates, "lang", "doc_id"), "04_mixed")
        final = stage(
            token_budget_sample(
                mixed, "doc_id", "text", budget=5_000, carry_cols=("lang",)
            ),
            "05_budget",
        )
        t0 = time.time()
        final.write.format("noop").mode("overwrite").save()
        out["read_final"] = round(time.time() - t0, 3)
        return out

    for _ in range(2):
        stages()
    runs = [stages() for _ in range(3)]
    med = {
        k: sorted(r[k] for r in runs)[1] for k in runs[0]
    }
    # file counts per stage
    files = {
        n: sum(
            1
            for f in os.listdir(os.path.join(workdir, n))
            if f.endswith(".parquet")
        )
        for n in sorted(os.listdir(workdir))
    }
    print(json.dumps({"stage_write_s": med, "files": files}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
