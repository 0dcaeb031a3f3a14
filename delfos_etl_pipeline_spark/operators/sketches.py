"""Mergeable distinct-count sketches — HLL build/union/estimate rollups.

The scale story behind every "distinct users per window" metric: an
EXACT distinct count is not re-aggregable (day-level results cannot be
summed into months — overlap is lost), so wide windows either re-scan
raw data (dau_wau_rolling's 7× contribution explode; fine at WAU, not at
MAU/QAU) or keep per-bucket SKETCHES and merge them. Spark 4 ships the
Apache DataSketches HLL primitives (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`), which makes the rollup a
plain two-level aggregation: build one ~KB sketch per fine bucket (a
map-side-combinable agg), then union sketches per coarse bucket — the
second level exchanges kilobytes per group regardless of corpus size,
the property that makes 100 TB windowed-distinct metrics cheap.

No exact DuckDB oracle is possible (DataSketches HLL internals aren't
reproducible in SQL), so certification follows the a_approx_distinct
pattern: tests/test_sketches.py drives the rollup against the exact
per-bucket distinct counts and asserts the published HLL error bound
(lgConfigK=12 → ~1.6% standard error; asserted at 5% ≈ 3σ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    value_col: str,
    fine_bucket,
    coarse_bucket,
    lg_config_k: int = 12,
) -> DataFrame:
    """(coarse, n_fine_buckets, approx_distinct): build an HLL sketch of
    ``value_col`` per fine bucket, union per coarse bucket, estimate.
    ``fine_bucket``/``coarse_bucket`` are Column expressions; the coarse
    bucket must be derivable from the fine one (e.g. day → month)."""
    fine = (
        df.select(
            fine_bucket.alias("_fine"),
            coarse_bucket.alias("_coarse"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_coarse", "_fine")
        .agg(F.hll_sketch_agg("_v", F.lit(lg_config_k)).alias("_sk"))
    )
    return fine.groupBy("_coarse").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fine_buckets"),
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("approx_distinct"),
    )
