"""Deterministic hash-based sampling — reproducible corpus subsetting.

Training-data pipelines need samples that are (a) reproducible across
runs, engines, and cluster sizes, (b) stable under repartitioning, and
(c) cheap at 100 TB. Seeded random sampling (``df.sample``) fails (a)/(b)
— Spark's Bernoulli sampler draws per-partition, so the selected rows
change with the partitioning. Hashing a KEY column into buckets gives a
pure function of the data: the same document lands on the same side of
every split on any engine, which is also what keeps train/test membership
stable as the corpus grows (new docs hash in; old docs never migrate).

The bucket hash is md5-based rather than xxhash64 so the DuckDB oracle
can reproduce it bit-for-bit (xxhash64 is Spark-only); md5 costs more
than xxhash64 but sampling is scan-bound either way. All expression-level
— no shuffle, no UDF; the filter is evaluated at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket granularity: fractions resolve to 1/1000 precision.
BUCKETS = 1000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(key as string) as an integer, mod buckets. SQL twin:
    ``CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
    % buckets``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def bernoulli_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep rows whose key hashes below fraction·buckets — a deterministic
    Bernoulli sample keyed on ``key_col``."""
    return df.where(hash_bucket(F.col(key_col), buckets) < int(fraction * buckets))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep the tail) — one scan, no shuffle: the stratum column selects the
    threshold the key bucket is compared against. Strata absent from
    ``fractions`` are dropped (rate 0)."""
    thresh = F.lit(0)
    for value, fraction in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(fraction * buckets))
        ).otherwise(thresh)
    return df.where(hash_bucket(F.col(key_col), buckets) < thresh)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Label every row 'train'/'test' by key hash — membership is a pure
    function of the key, so it survives corpus growth, repartitioning,
    and engine changes (the leakage-safety property eval pipelines need)."""
    is_test = hash_bucket(F.col(key_col), buckets) < int(test_fraction * buckets)
    return df.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )
