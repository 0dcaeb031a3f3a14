"""Deterministic global shuffle + shard assignment for training-data
output (SURVEY.md §7 M5 extension family).

A training run wants the corpus (a) randomly ordered — no source/time
locality between neighboring examples — and (b) split into a fixed number
of shard files with a stable within-shard order, reproducible across
runs. Both come from one hash: ``key = H(seed, id)`` is the random
permutation, ``key % n_shards`` the shard, and rank of ``key`` within the
shard the position. No RNG state, no driver-side ordering — re-running
with the same seed reproduces the exact layout (and a different seed is a
fresh permutation).

Keying tiers (same pattern as dedup/minhash.py): ``xxhash64`` is the
production default (8-byte JVM hash, no string materialization);
``md5`` keys through hex so a DuckDB oracle reproduces bit-identical
assignments (``('0x' || substr(md5(..),1,15))::BIGINT``).

Scale posture: shard assignment is a stateless projection (scan-speed).
Within-shard positions are a per-shard total order — ONE task per shard —
which is the intended layout: real corpus builds use thousands of shards,
bounding any task at corpus/n_shards rows. ``write_shards`` clusters by
shard before writing so each output file is one shard, in order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shuffle_key(id_col: str, seed: int, keying: str) -> Column:
    if keying == "md5":
        hex15 = F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
            1,
            15,
        )
        return F.conv(hex15, 16, 10).cast("bigint")  # 60 bits, always >= 0
    if keying == "xxhash64":
        return F.xxhash64(F.col(id_col), F.lit(seed))
    raise ValueError(f"unknown keying {keying!r}")


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
    keying: str = "xxhash64",
    with_position: bool = True,
) -> DataFrame:
    """(id, shard, pos) — deterministic pseudo-random shard + within-shard
    rank. ``pos`` windows partition on ``shard`` (parallel across shards);
    pass ``with_position=False`` for the scan-speed assignment-only form."""
    key = _shuffle_key(id_col, seed, keying)
    out = df.select(F.col(id_col), key.alias("_key")).withColumn(
        "shard", F.pmod(F.col("_key"), F.lit(n_shards)).cast("int")
    )
    if with_position:
        w = Window.partitionBy("shard").orderBy("_key", id_col)
        out = out.withColumn("pos", F.row_number().over(w).cast("bigint"))
    return out.drop("_key")


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
    keying: str = "xxhash64",
) -> DataFrame:
    """Full rows of ``df`` + (shard, pos), globally pseudo-shuffled —
    the frame ``write_shards`` persists."""
    assign = shard_assignment(df, id_col, n_shards, seed, keying)
    return df.join(assign, id_col)


def write_shards(df: DataFrame, path: str, n_shards: int) -> None:
    """Persist one file-cluster per shard: repartition on the shard column
    (co-locates each shard in one task), sort within partitions by pos,
    write partitioned by shard — readers stream any shard independently."""
    (
        df.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
