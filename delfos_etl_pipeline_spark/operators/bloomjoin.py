"""Bloom-filter pre-filtered semi-join — shrink the shuffled fact side
before a semi-join whose right side is too large to broadcast as rows.

The standard plans for ``fact SEMI JOIN dim ON key``:

- **broadcast semi-join** — right side must fit in the driver + every
  executor as *rows*; fails once the dim has hundreds of millions of keys.
- **shuffle semi-join** — both sides shuffle on the key; at 100 TB the
  fact-side shuffle dominates the job even when only 1% of rows survive.

This operator adds the classic third option (Spark's own runtime
row-level filtering / "bloom join" strategy, here as an explicit,
testable operator): build a k-hash Bloom *bitmap* over the dim keys —
``num_bits / 8`` bytes regardless of key count, e.g. 8 MiB covers 50 M
keys at ~1% FP — broadcast the bitmap (never the rows), drop every fact
row whose key cannot be in the dim *before* the shuffle, then run the
real semi-join on the survivors to remove false positives. Exactness is
therefore unconditional; the bloom pass is purely an exchange-volume
optimization, which is why the registered query's oracle is the plain
``IN``-subquery SQL.

Everything stays JVM-side: the bitmap is built with
``xxhash64``/``bit_or``/``shiftleft`` Catalyst expressions (one shuffle
of ``num_bits/64`` longs), shipped as a one-row broadcast (a 1-row
BroadcastNestedLoopJoin — constant cost), and probed with
``element_at``/``shiftright`` expressions inside whole-stage codegen.
No Python touches any row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def build_bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """One-row DataFrame ``(_bloom_words array<long>)`` — the packed Bloom
    bitmap of ``keys[key_col]`` under ``num_hashes`` seeded xxhash64
    probes.

    Distributed build: each key fans out to its k bit positions, positions
    group by 64-bit word index with a ``bit_or`` of the in-word masks
    (map-side partial → at most ``num_bits/64`` rows ever shuffle), and a
    single ``map_from_entries``/``transform`` pass densifies the sparse
    words into a positional array. The result is one row of
    ``num_bits/64`` longs — broadcastable at any dim cardinality.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(num_bits)
                    ).alias("p")
                    for seed in range(num_hashes)
                ]
            )
        ).alias("p")
    )
    sparse = (
        pos.select(
            F.shiftright(F.col("p"), 6).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 AS int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
    )
    # Densify: map word-index -> word, then read positions 0..n_words-1.
    # coalesce(..., 0) fills words no key hashed into.
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("_m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(_m, i), 0L))"
        ).alias("_bloom_words")
    )


def _probe_bit_set(key_col: str, seed: int, num_bits: int) -> Column:
    """Catalyst predicate: probe bit ``seed`` of ``key_col`` is set in the
    joined ``_bloom_words`` array.

    ``shiftright`` with a *column* shift amount needs the SQL form — the
    PySpark wrapper only accepts a Python int — so the whole probe is one
    ``F.expr``: position ``p = xxhash64(key, seed) mod num_bits``, word
    ``element_at(words, p >> 6 + 1)``, test ``(word >> (p % 64)) & 1``.
    """
    p = f"pmod(xxhash64({key_col}, {seed}), {num_bits})"
    word = f"element_at(_bloom_words, cast(shiftright({p}, 6) AS int) + 1)"
    return F.expr(f"(shiftright({word}, cast({p} % 64 AS int)) & 1) = 1")


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    exact: bool = True,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim_keys`` with a Bloom pre-filter on the fact
    side.

    ``exact=True`` (default) follows the bloom pass with the real
    semi-join, so the result is exactly the semi-join — false positives
    removed — and only the bloom survivors reach the shuffle.
    ``exact=False`` returns the bloom-only superset (≤ FP-rate extra
    rows) for pipelines that tolerate approximation and want zero
    fact-side shuffle.

    Null semantics match SQL semi-join: a NULL fact key never matches.
    """
    bitmap = build_bloom_bitmap(dim_keys, dim_key, num_bits, num_hashes)
    # 1-row broadcast: a BroadcastNestedLoopJoin against a single row is
    # constant-cost glue, not a real cartesian.
    probed = fact.crossJoin(F.broadcast(bitmap))
    cond = F.col(fact_key).isNotNull()
    for seed in range(num_hashes):
        cond = cond & _probe_bit_set(fact_key, seed, num_bits)
    survivors = probed.where(cond).drop("_bloom_words")
    if not exact:
        return survivors
    dim_distinct = dim_keys.select(dim_key).distinct()
    return survivors.join(
        dim_distinct,
        on=survivors[fact_key] == dim_distinct[dim_key],
        how="left_semi",
    )
