"""SimHash — 64-bit similarity fingerprints + banded Hamming search.

Each document gets a 64-bit signature: bit i is the sign of
Σ_words (±1 depending on bit i of xxhash64(word)). Near-duplicates have
small Hamming distance. Candidate generation uses the pigeonhole trick:
split the signature into ``hamming_max+1`` bands — any pair within the
distance budget must agree exactly on ≥1 band — then verify with
``bit_count(a XOR b)``.

All expression-level (explode → 64 conditional sums → bit assembly via
shiftleft/OR); one shuffle keyed by doc for the signature, one banded
self-join for candidates. No Python UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over whitespace word tokens.

    ``hash_fn="md5"`` keys word hashes on the first 16 hex nibbles of
    ``md5(word)`` (bit i = bit i%4 of nibble i//4) — reproducible in
    DuckDB SQL via ``strpos('0123456789abcdef', ...)``, giving the pairs
    query an exact oracle. xxhash64 stays the production default (one
    8-byte hash per word vs 16 nibble extractions)."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    if hash_fn == "md5":
        hexd = F.md5(F.col("word"))
        nibbled = words.select(
            "doc_id",
            *[
                F.conv(F.substring(hexd, c + 1, 1), 16, 10)
                .cast("int")
                .alias(f"n{c}")
                for c in range(16)
            ],
        )
        bit = lambda i: F.shiftright(F.col(f"n{i // 4}"), i % 4).bitwiseAND(  # noqa: E731
            F.lit(1)
        )
        sums = nibbled.groupBy("doc_id").agg(
            *[
                F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"s{i}")
                for i in range(64)
            ]
        )
    else:
        h = F.xxhash64(F.col("word"))
        sums = words.groupBy("doc_id").agg(
            *[
                F.sum(
                    F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                ).alias(f"s{i}")
                for i in range(64)
            ]
        )
    bits = [
        F.shiftleft((F.col(f"s{i}") > 0).cast("long"), i) for i in range(64)
    ]
    simhash = reduce(lambda a, b: a.bitwiseOR(b), bits)
    return sums.select("doc_id", simhash.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hamming_max: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming distance ≤ hamming_max.

    Bands = hamming_max+1 slices of the 64-bit signature; by pigeonhole a
    qualifying pair matches exactly on at least one band, so the banded
    equi-join loses nothing (exact, unlike LSH).
    """
    sig = simhash_signatures(df, id_col, text_col, hash_fn)
    n_bands = hamming_max + 1
    width = 64 // n_bands
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            # final band takes the remaining high bits
            (
                F.shiftrightunsigned(F.col("simhash"), j * width)
                if j == n_bands - 1
                else F.shiftrightunsigned(F.col("simhash"), j * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                )
            ).alias("bucket"),
        )
        for j in range(n_bands)
    ]
    buckets = sig.select(
        "doc_id", "simhash", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "bucket"
    )
    b = buckets.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= hamming_max)
        .distinct()
    )
