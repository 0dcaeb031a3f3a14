"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``delfos_etl_pipeline_spark`` (see SURVEY.md §2 for
the operator inventory each query covers); this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full sensor-ETL
    pipeline (tumbling 10-min multi-agg → unpivot → broadcast dim join)
    over the `events` table — SURVEY.md §2 A1/R1/J1 chain."""
    from delfos_etl_pipeline_spark.plans.pipeline import (
        default_signal_dim,
        sensor_pipeline,
    )
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    dim = default_signal_dim(spark, ("value",))
    return sensor_pipeline(ev, dim, ts_col="ts", measures=("value",))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from delfos_etl_pipeline_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry."""
    from delfos_etl_pipeline_spark.queries import oracle_sql as _oracle

    return _oracle()
