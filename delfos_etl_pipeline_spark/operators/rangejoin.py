"""Range (interval-containment) join: ts ∈ [start, end] pairs.

Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as
BroadcastNestedLoopJoin (fine only when one side broadcasts) or a
cartesian product — O(|L|·|R|) either way. The scale path here is the
standard bucketed prefilter: quantize time to a grain, explode each
interval into the buckets it covers, equi-join point-buckets to
interval-buckets (a plain shuffle hash join Catalyst/AQE handle like any
other), then refine with the exact predicate.

Cost: shuffle of |L| + Σ(interval_length/grain) rows instead of a nested
loop over |L|·|R|. Pick ``grain_seconds`` near the typical interval
length: too coarse → each bucket pairs a point with many non-matching
intervals (refine discards them); too fine → long intervals explode into
many buckets. No dedup pass is needed: a point has exactly ONE bucket, so
each (point, interval) pair can meet at most once.

Related: operators/asof.py covers the nearest-predecessor (as-of) flavor;
this module covers containment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    grain_seconds: int = 86400,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them
    (inclusive bounds). Output: all point columns + all interval columns.
    """
    g = int(grain_seconds)
    pb = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / g)
    )
    ib = (
        intervals.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start_col)) / g),
                    F.floor(F.unix_timestamp(F.col(end_col)) / g),
                )
            ),
        )
    )
    return (
        pb.join(ib, "_bucket")
        .where(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
