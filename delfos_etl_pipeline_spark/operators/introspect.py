"""S10 — catalog/schema introspection.

The reference inspects ``information_schema`` for columns + FK constraints
(/root/reference/dagster/assets.py:261-307). Spark's catalog covers the
column side natively; FK metadata has no Spark equivalent, so the engine
carries its own registry for the star schema it manages — same as the
reference, whose FKs live in its own DDL (etl/prepare_alvo_db.py:29-37).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: Engine-declared FK relationships for the managed star schema plus the
#: driver testdata tables (TPC-H-ish), in information_schema-like shape.
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    # (table, column, ref_table, ref_column)
    ("data", "signal_id", "signal", "id"),  # reference target schema
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def table_columns(spark: SparkSession, table: str) -> DataFrame:
    """Column inventory for a registered table/view — the
    information_schema.columns analog (assets.py:261-271)."""
    cols = spark.catalog.listColumns(table)
    return spark.createDataFrame(
        [(table, c.name, c.dataType, c.nullable) for c in cols],
        "table_name string, column_name string, data_type string, is_nullable boolean",
    )


def schema_structure(spark: SparkSession, tables: list[str]) -> DataFrame:
    """Multi-table column report (UNION over table_columns)."""
    out = None
    for t in tables:
        part = table_columns(spark, t)
        out = part if out is None else out.unionByName(part)
    return out


def foreign_keys(spark: SparkSession, tables: list[str] | None = None) -> DataFrame:
    """J6/S10 — FK relationships from the engine registry, filtered to
    ``tables`` when given — replaces the reference's 3-way
    information_schema join (assets.py:292-307): Spark has no FK catalog,
    so the registry is the engine's own schema metadata."""
    rows = FOREIGN_KEYS
    if tables is not None:
        keep = set(tables)
        rows = [r for r in rows if r[0] in keep]
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, "
        "foreign_table_name string, foreign_column_name string",
    )
