"""Query registry primitives shared by every family module.

Each family module in this package registers its queries at import time
via the :func:`query` decorator; the package ``__init__`` imports the
families in a fixed order and exposes the driver contract
(``queries()`` / ``oracle_sql()``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from delfos_etl_pipeline_spark.sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with its
    DuckDB oracle SQL (omitted → driver records rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
