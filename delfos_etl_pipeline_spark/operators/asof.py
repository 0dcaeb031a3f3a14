"""As-of join — natural extension for the reference's sensor domain
(SURVEY.md §2.3 "extension candidate"): align each left row with the most
recent right row at or before it, per key.

Spark has no native as-of join; the scalable re-expression is the
union-and-carry-forward pattern: tag both sides, union, and use a
``last(..., ignorenulls=True)`` window ordered by (time, side) per key.
Cost: ONE shuffle keyed on the join key (same as the join itself would
need) and a linear window pass — no range-condition nested loop, no
per-key collect. Skewed keys fall out of AQE skew handling like any other
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` with
    ``right.on <= left.on`` within the same ``by`` key (backward as-of,
    inclusive — ties at equal timestamps take the right row).
    ``direction="forward"`` flips the inequality: the NEAREST right row
    with ``right.on >= left.on`` (the same one-shuffle union plan, scanned
    in descending event time).

    Right value columns are emitted as ``{name}{suffix}``; left rows with
    no earlier right row get NULLs (left-outer semantics).

    ``tolerance_us`` bounds match staleness like pandas ``merge_asof``'s
    ``tolerance``: a nearest match farther than that many microseconds
    (in the join direction) is treated as NO match — its value columns
    null out and ``staleness_us{suffix}`` (emitted only when a tolerance
    is set) is NULL. Exact integer epoch-microsecond arithmetic, never
    interval/boundary-crossing date math.

    Matches pandas ``merge_asof`` row semantics: ALL value columns come
    from the single most recent right ROW — carried as one struct picked
    with a single ``last(ignorenulls=True)`` — so a NULL field in the
    matched row stays NULL (a per-column carry-forward would silently
    substitute older non-null values for NULL fields).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {on, *by}]

    struct_fields = [F.col(c) for c in value_cols]
    if tolerance_us is not None:
        struct_fields.append(F.col(on).alias("__r_on"))
    row_struct = F.struct(*struct_fields)
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(row_struct.alias("s")).schema["s"].dataType
        ).alias("__r_row"),
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in {on, *by}],
        *[F.col(k) for k in [on, *by]],
        F.lit(0).alias("__side"),
        row_struct.alias("__r_row"),
    ).select(*lt.columns)

    unioned = lt.unionByName(rt)
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__r_row"), ignorenulls=True).over(w)
    if tolerance_us is None:
        carried = unioned.select(
            *[F.col(c) for c in left.columns],
            F.col("__side"),
            *[matched[c].alias(f"{c}{suffix}") for c in value_cols],
        )
        return carried.where(F.col("__side") == 1).drop("__side")
    if direction == "backward":
        staleness = F.unix_micros(F.col(on)) - F.unix_micros(matched["__r_on"])
    else:
        staleness = F.unix_micros(matched["__r_on"]) - F.unix_micros(F.col(on))
    ok = staleness <= F.lit(tolerance_us)
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[F.when(ok, matched[c]).alias(f"{c}{suffix}") for c in value_cols],
        F.when(ok, staleness).cast("bigint").alias(f"staleness_us{suffix}"),
    )
    return carried.where(F.col("__side") == 1).drop("__side")
