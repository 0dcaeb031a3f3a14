"""Declarative data-quality expectations — Deequ/Great-Expectations shape.

The reference validates inputs imperatively (ISO-date parsing and column
allowlists, /root/reference/api/app/routers.py:31-43,
/root/reference/etl/etl_process.py:35-52); a warehouse needs the same
idea as DATA checks: "null rate of X below r", "Y within [lo, hi]",
"Z's values all in this set", "FK coverage of W in dim D". Each check is
declared as a spec; ALL checks over one table compile into a SINGLE
aggregate pass (conditional counts), so a 100-check suite over 100 TB
costs one scan — never one job per check.

Output is one row per check: (check_name, metric, passed) with the
metric rounded half-up so thresold comparisons and oracles are
cross-engine stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.functions.stable import round_half_up


def null_rate_below(col: str, threshold: float) -> dict:
    """Fraction of NULLs in ``col`` must be < threshold."""
    return {"name": f"null_rate({col})<{threshold}", "kind": "null_rate",
            "col": col, "threshold": threshold}


def value_range(col: str, lo: float, hi: float) -> dict:
    """Every non-null value of ``col`` must lie in [lo, hi]; the metric is
    the fraction of in-range values (1.0 = pass)."""
    return {"name": f"range({col})", "kind": "range", "col": col,
            "lo": lo, "hi": hi}


def values_in(col: str, allowed: Sequence[str]) -> dict:
    """Every non-null value of ``col`` must be one of ``allowed``."""
    return {"name": f"values_in({col})", "kind": "values_in", "col": col,
            "allowed": tuple(allowed)}


def unique_key(col: str) -> dict:
    """``col`` must be unique (distinct count == row count)."""
    return {"name": f"unique({col})", "kind": "unique", "col": col}


def _metric(spec: dict, n: Column) -> tuple[Column, Column]:
    """(metric expression over one aggregate pass, pass predicate)."""
    c = F.col(spec["col"])
    if spec["kind"] == "null_rate":
        m = F.sum(F.when(c.isNull(), 1).otherwise(0)) / n
        return m, m < F.lit(spec["threshold"])
    if spec["kind"] == "range":
        ok = F.sum(
            F.when(c.isNull() | ((c >= spec["lo"]) & (c <= spec["hi"])), 1)
            .otherwise(0)
        )
        m = ok / n
        return m, m == F.lit(1.0)
    if spec["kind"] == "values_in":
        ok = F.sum(
            F.when(c.isNull() | c.isin(*spec["allowed"]), 1).otherwise(0)
        )
        m = ok / n
        return m, m == F.lit(1.0)
    if spec["kind"] == "unique":
        m = F.countDistinct(c) / n
        return m, m == F.lit(1.0)
    raise ValueError(f"unknown check kind {spec['kind']!r}")


def run_expectations(df: DataFrame, specs: Sequence[dict]) -> DataFrame:
    """Evaluate all ``specs`` in ONE aggregate over ``df``.

    Returns (check_name, metric, passed) rows — metric rounded to 6,
    passed as 0/1 INT. The single-row aggregate is exploded into one row
    per check via inline(array(struct...)), so the plan is: one scan →
    one reduce → constant-width projection. Check names are carried as
    literal Columns, never interpolated into SQL text — a quote in a
    values_in spec's name cannot break parsing (ADVICE r3)."""
    if not specs:
        return df.sparkSession.createDataFrame(
            [], "check_name string, metric double, passed int"
        )
    n = F.count(F.lit(1))
    aggs: list[Column] = []
    for i, spec in enumerate(specs):
        m, p = _metric(spec, n)
        aggs.append(round_half_up(m, 6).alias(f"_m{i}"))
        aggs.append(p.cast("int").alias(f"_p{i}"))
    one = df.agg(*aggs)
    return one.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(spec["name"]).alias("check_name"),
                        F.col(f"_m{i}").alias("metric"),
                        F.col(f"_p{i}").alias("passed"),
                    )
                    for i, spec in enumerate(specs)
                ]
            )
        )
    )
