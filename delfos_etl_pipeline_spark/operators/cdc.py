"""Change-data-capture maintenance: merge-upsert and SCD type-2 builds.

The reference's ETL is append-only (etl/etl_process.py:156-163 appends
each day's batch to Postgres); real warehouse maintenance also needs the
two mutation shapes Spark lacks as built-ins:

- ``merge_upsert``: apply a changeset (upserts + deletes) to a snapshot —
  the MERGE INTO statement of Delta/Iceberg, expressed as pure DataFrame
  ops so it runs on plain parquet: latest change per key wins, a delete
  change removes the key, unchanged base rows pass through.
- ``scd2_from_changes``: build a slowly-changing-dimension type-2 table
  (valid_from / valid_to / is_current version intervals) from a change
  log, via one lead() window.

Scale posture (100 TB): both are single-key-shuffle plans. The changeset
window, the base/change full-outer join, and the SCD2 lead() all hash on
the business key, so AQE coalesces them onto one exchange per input; no
driver-side state, no collect. Skewed hot keys behave like any skewed
join key (AQE skew-join splits them; the per-key window state is one row).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key: str, order: tuple[str, ...]
) -> DataFrame:
    """Keep the last row per key under (order...) ascending — deterministic
    via the full order tuple (include a unique id as the final
    tie-breaker). One shuffle on ``key``."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str,
    order: tuple[str, ...],
) -> DataFrame:
    """Apply ``changes`` (op_col: 'U' upsert / 'D' delete) to ``base``.

    Semantics match ANSI MERGE with latest-change-wins: for each key the
    final change (by ``order``) decides — 'D' removes the key, 'U'
    replaces (or inserts) the row; keys without changes keep their base
    row. Columns common to both sides are coalesced change-first; the
    output adds ``was_updated`` (1 if the surviving row came from the
    changeset).
    """
    last = latest_per_key(changes, key, order)
    data_cols = [c for c in base.columns if c != key]
    joined = base.alias("b").join(
        last.alias("c"), F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer"
    )
    survives = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") == F.lit("U"))
    picked = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key),
        *[
            F.when(F.col(f"c.{op_col}") == "U", F.col(f"c.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in data_cols
        ],
        F.when(F.col(f"c.{op_col}") == "U", F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("was_updated"),
    ]
    return joined.filter(survives).select(*picked)


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    ts_col: str,
    order: tuple[str, ...],
    attrs: tuple[str, ...],
) -> DataFrame:
    """Type-2 dimension from a change log: one output row per change,
    valid from its own timestamp until the next change for the same key
    (NULL = open/current). ``is_current`` is an INT flag (cross-engine
    boolean dtypes differ). One shuffle + one sort on ``key``."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order])
    nxt = F.lead(F.col(ts_col)).over(w)
    return changes.select(
        key,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias(
            "is_current"
        ),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Generate the change feed between two snapshot versions — the
    inverse of :func:`merge_upsert`: (key, op 'I'/'U'/'D',
    before_<col>/after_<col>) rows for keys inserted, deleted, or whose
    ``compare_cols`` changed (null-safe). Unchanged keys are dropped, so
    the output is sized by churn. One full-outer join hashed on the key.
    """
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
            for c in compare_cols
        ],
    )
    op = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("I"))
        .when(F.col(f"n.{key}").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return joined.filter(
        F.col(f"o.{key}").isNull() | F.col(f"n.{key}").isNull() | changed
    ).select(
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        op.alias("op"),
        *[F.col(f"o.{c}").alias(f"before_{c}") for c in compare_cols],
        *[F.col(f"n.{c}").alias(f"after_{c}") for c in compare_cols],
    )
