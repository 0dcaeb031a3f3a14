"""SHJ audit probe (VERDICT r15 item 9, guide §3.1): time selected
queries as-written vs with shuffle_hash hints on their large SMJ sides,
warm median-of-3 noop execs in one session. Read-only experiment — the
engine is unchanged; a win justifies a per-query hint in the code."""

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
    from delfos_etl_pipeline_spark.queries import queries
    from delfos_etl_pipeline_spark.queries._registry import _t

    spark = get_spark(
        "delfos-shj-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def timed(tag, mk):
        for _ in range(2):
            mk().write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(3):
            df = mk()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(json.dumps({"variant": tag, "exec_s": round(sorted(ts)[1], 3)}),
              flush=True)

    # --- as-written ---
    for name in ("tpch_q9_product_profit", "tpch_q21_waiting_suppliers"):
        timed(f"{name}:smj", lambda n=name: qs[n](spark, sf_dir))

    # --- session-level preferSortMergeJoin=false (planner free to pick
    # SHJ wherever its size conditions hold) ---
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    for name in ("tpch_q9_product_profit", "tpch_q21_waiting_suppliers"):
        timed(f"{name}:prefshj", lambda n=name: qs[n](spark, sf_dir))
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.stop()


if __name__ == "__main__":
    main()
