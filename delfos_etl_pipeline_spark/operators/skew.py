"""Skew mitigation: salted aggregation and salted broadcast-free joins.

At 100 TB a handful of hot keys (the null user, the default tenant, the
viral document) can put one shuffle partition hours behind the rest. Two
standing answers, complementing AQE's runtime skew-join splitting
(spark.sql.adaptive.skewJoin, enabled by session.py):

- **salted aggregation** — AQE does NOT split skewed *aggregations* (only
  sort-merge-join partitions), so a hot groupBy key still serializes into
  one task. ``salted_agg`` runs the classic two-phase shape: phase 1
  groups on (key, salt) spreading each hot key over ``n_salts`` tasks,
  phase 2 merges the partials per key. Works for any algebraic aggregate
  (sum/count/min/max; avg = sum+count merged at phase 2).
- **salted join** — for a skewed fact⋈dim equi-join where the dim is too
  big to broadcast: explode the dim side ``n_salts``× with a salt column,
  salt the fact side randomly, join on (key, salt). Usually unnecessary —
  prefer ``broadcast()`` or AQE skew-join — but it is THE fallback when
  both sides are large and one key dominates.

Deterministic salting: the salt is ``pmod(xxhash64(row-identity), n)``
rather than ``rand()`` so retried tasks produce identical output
(nondeterministic salts break exactly-once under task retry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates that merge by the same function (phase2(phase1(x)) = agg(x)).
_SELF_MERGING = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps output column → (agg, input column) with agg ∈
    {sum, count, min, max, avg}. ``salt_on`` are the columns hashed into
    the salt (defaults to all non-key columns) — any row attributes with
    enough entropy to spread a hot key.

    Equivalent to ``df.groupBy(keys).agg(...)`` for every input, skewed or
    not; the win is that no single reduce task ever sees more than
    ~1/n_salts of one key's rows.
    """
    salt_cols = salt_on if salt_on is not None else [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )

    phase1, phase2 = [], []
    for out, (how, col) in aggs.items():
        if how in _SELF_MERGING:
            fn = _SELF_MERGING[how]
            phase1.append(fn(col).alias(f"_p_{out}"))
            phase2.append(fn(f"_p_{out}").alias(out))
        elif how == "count":
            phase1.append(F.count(col).alias(f"_p_{out}"))
            phase2.append(F.sum(f"_p_{out}").alias(out))
        elif how == "avg":
            phase1.append(F.sum(col).alias(f"_ps_{out}"))
            phase1.append(F.count(col).alias(f"_pc_{out}"))
            phase2.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out)
            )
        else:
            raise ValueError(f"unsupported agg for salting: {how}")

    return (
        salted.groupBy(*keys, "_salt")
        .agg(*phase1)
        .groupBy(*keys)
        .agg(*phase2)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe large⋈large equi-join: replicate the dim rows across
    ``n_salts`` salt values, hash-salt the fact rows, join on (key, salt).
    Each hot fact key spreads over n_salts reduce tasks at the cost of
    shuffling the dim side n_salts times — worth it exactly when one key's
    fact rows dwarf a shuffle partition and the dim can't broadcast."""
    fact_cols = [c for c in fact.columns if c != on]
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(n_salts)),
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(salted_dim, [on, "_salt"], how)
    return out.drop("_salt")
