"""Cross-engine hash-stable aggregate statistics.

Two things make float aggregates drift between Spark and any oracle
engine even when both are "correct":

1. ``avg``/``stddev`` over doubles are accumulation-order-dependent —
   a ±1 ulp difference is enough to flip a round() at the target decimal.
2. ``round()`` tie-breaking differs: Spark rounds the double's shortest
   decimal string HALF_UP (BigDecimal), DuckDB rounds the binary value —
   and with fixed-precision input data, window means land on EXACT
   ``…5`` ties often (measured: 1 of 3913 windows at sf0.1).

The fix is to make the *pre-round value bit-identical* and the *rounding
rule explicit*:

- sums accumulate in DECIMAL (exact, order-independent; the testdata
  measures carry ≤6 decimals so DECIMAL(18,6) loses nothing);
- mean = exact-sum cast to double / count — one IEEE division, identical
  bits on both engines;
- variance from the exact sum and sum-of-squares with the all-double
  formula (ss − s²/n)/(n−1) — identical inputs → identical bits (the
  textbook cancellation concern affects accuracy, not cross-engine
  consistency, and is clamped at 0);
- rounding = ``floor(x·10^d + 0.5)/10^d`` — explicit half-up, no
  engine-native round() involved.

Every Spark column builder here has a SQL twin returning the identical
formula for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def round_half_up(col: Column, decimals: int = 6) -> Column:
    f = float(10**decimals)
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def stable_stat_aggs(measures: tuple[str, ...]) -> list[Column]:
    """Aggregate components (count, exact sum, exact sum of squares,
    min, max) per measure — feed to groupBy().agg(*...)."""
    aggs: list[Column] = []
    for m in measures:
        dec = F.col(m).cast(_DEC)
        aggs += [
            F.count(F.col(m)).alias(f"_n_{m}"),
            F.sum(dec).alias(f"_s_{m}"),
            F.sum(dec * dec).alias(f"_ss_{m}"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return aggs


def stable_stat_projection(
    measures: tuple[str, ...],
    stats: tuple[str, ...],
    decimals: int = 6,
) -> list[Column]:
    """Output columns (mean/std derived from the components) in the same
    naming scheme as plans.pipeline.windowed_stats."""
    cols: list[Column] = []
    for m in measures:
        n = F.col(f"_n_{m}")
        s = F.col(f"_s_{m}").cast("double")
        ss = F.col(f"_ss_{m}").cast("double")
        for st in stats:
            if st == "mean":
                cols.append(round_half_up(s / n, decimals).alias(f"{m}_mean"))
            elif st == "std":
                var = F.greatest((ss - s * s / n) / (n - 1), F.lit(0.0))
                cols.append(
                    F.when(n > 1, round_half_up(F.sqrt(var), decimals)).alias(
                        f"{m}_std"
                    )
                )
            elif st in ("min", "max"):
                cols.append(F.col(f"{m}_{st}"))
            else:
                raise ValueError(f"unsupported stable stat: {st}")
    return cols


def sql_mean(col: str = "value", decimals: int = 6) -> str:
    f = f"{10**decimals}.0"
    return (
        f"floor((CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) / count({col}))"
        f" * {f} + 0.5) / {f}"
    )


def sql_std(col: str = "value", decimals: int = 6) -> str:
    f = f"{10**decimals}.0"
    s = f"CAST(sum(CAST({col} AS DECIMAL(18,6))) AS DOUBLE)"
    ss = (
        f"CAST(sum(CAST({col} AS DECIMAL(18,6)) * CAST({col} AS DECIMAL(18,6)))"
        " AS DOUBLE)"
    )
    n = f"count({col})"
    var = f"greatest(({ss} - {s} * {s} / {n}) / ({n} - 1), 0.0)"
    return (
        f"CASE WHEN {n} > 1 THEN floor(sqrt({var}) * {f} + 0.5) / {f} END"
    )


def sql_round_half_up(expr: str, decimals: int) -> str:
    f = f"{10**decimals}.0"
    return f"floor(({expr}) * {f} + 0.5) / {f}"
