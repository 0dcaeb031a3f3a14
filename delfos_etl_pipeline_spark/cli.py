"""CLI entry point — parity with the reference's ``python etl/main.py
<date>`` (/root/reference/etl/main.py:18-42, SURVEY.md §3.2).

Runs one daily-partition ETL over the synthetic sensor feed (or a parquet
path you point it at), prints the run record, exits 0 on success / 1 on
error — the same contract the reference CLI gives its operators.

Usage::

    python -m delfos_etl_pipeline_spark.cli 2025-08-11
    python -m delfos_etl_pipeline_spark.cli 2025-08-11 --source /path/sensor.parquet \
        --sink /path/out --inclusive-end
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("date", help="partition day, YYYY-MM-DD")
    p.add_argument(
        "--source",
        default=None,
        help="parquet path of the wide sensor table; default: the "
        "deterministic seed generator (reference parity, seed=42)",
    )
    p.add_argument(
        "--sink",
        default=None,
        help="output parquet dir (partitioned by date); default: dry run",
    )
    p.add_argument(
        "--inclusive-end",
        action="store_true",
        help="bug-compatible inclusive end bound (reference behavior, "
        "duplicates the midnight row — SURVEY.md §2.10(1))",
    )
    args = p.parse_args(argv)

    from delfos_etl_pipeline_spark import get_spark
    from delfos_etl_pipeline_spark.plans.pipeline import (
        default_signal_dim,
        run_day,
    )

    spark = get_spark("delfos-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.source:
        df = spark.read.parquet(args.source)
    else:
        from delfos_etl_pipeline_spark.sources.synthetic import (
            generate_sensor_data,
        )

        df = generate_sensor_data(spark)

    sink = None
    if args.sink:
        from delfos_etl_pipeline_spark.sources.sinks import write_partitioned

        def sink(out, _path=args.sink):
            write_partitioned(out, _path, ts_col="timestamp")

    result = run_day(
        df,
        default_signal_dim(spark, ("wind_speed", "power")),
        args.date,
        sink=sink,
        inclusive_end=args.inclusive_end,
    )
    print(
        json.dumps(
            {
                "partition": result.partition,
                "status": result.status,
                "rows_extracted": result.rows_extracted,
                "rows_loaded": result.rows_loaded,
                "error": result.error,
            }
        )
    )
    return 0 if result.status in ("success", "no_data") else 1


if __name__ == "__main__":
    sys.exit(main())
