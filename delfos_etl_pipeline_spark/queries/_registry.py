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
#: Oracles whose SQL is EXPENSIVE to build (e.g. a generated VALUES
#: table recomputed from the testdata corpus) register a thunk here
#: instead of a string; ``queries.oracle_sql()`` resolves and caches
#: them into ORACLE on first call, so plain package imports (bench,
#: tests that never touch oracles) pay nothing.
LAZY_ORACLE: dict[str, Callable[[], str]] = {}


def query(
    name: str,
    oracle: str | None = None,
    lazy_oracle: Callable[[], str] | None = None,
):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with its
    DuckDB oracle SQL (omitted → driver records rows-only check).
    ``lazy_oracle`` defers oracle construction to the first
    ``oracle_sql()`` call (mutually exclusive with ``oracle``)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None and lazy_oracle is not None:
            raise ValueError(f"{name}: oracle and lazy_oracle are exclusive")
        if oracle is not None:
            ORACLE[name] = oracle
        if lazy_oracle is not None:
            LAZY_ORACLE[name] = lazy_oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
