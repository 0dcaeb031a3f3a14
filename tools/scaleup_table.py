"""Measure warm median timings for a query list at two scale factors.

Produces the SCALE.md "measured 10x scale-up" table rows: each query
runs in ONE fresh session per SF (warm once, median of 3), printing
markdown. Run ALONE — concurrent Spark work contaminates medians.

Usage: python tools/scaleup_table.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_all(names: list[str], sf_dir: str, cpus: str) -> dict[str, float]:
    from delfos_etl_pipeline_spark import get_spark
    from delfos_etl_pipeline_spark.queries import queries
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    spark = get_spark(
        "scaleup", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    load_table(spark, sf_dir, "lineitem").count()
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        times.sort()
        out[name] = round(times[1], 2)
    spark.stop()
    return out


def main() -> None:
    names = sys.argv[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    small = _time_all(names, "/root/testdata/sf0.01", cpus)
    big = _time_all(names, "/root/testdata/sf0.1", cpus)
    print("| query | sf0.01 s | sf0.1 s | ratio |")
    print("|---|---|---|---|")
    for n in names:
        r = round(big[n] / small[n], 1) if small[n] else float("nan")
        print(f"| {n} | {small[n]} | {big[n]} | {r} |")


if __name__ == "__main__":
    main()
