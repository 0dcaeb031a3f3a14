"""Z-order (Morton curve) multi-column clustering for data skipping.

A 100 TB table filtered by TWO columns can only be file-skipped on one of
them if files are range-sorted linearly: sorting by ``(a, b)`` gives tight
per-file min/max on ``a`` and useless full-range stats on ``b``. Bit-
interleaving rank-quantized column values onto a Morton space-filling
curve and range-partitioning by that key gives every file a small
bounding BOX in (a, b) space — parquet min/max row-group stats then prune
on either column (or both), which is how Delta OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite cut multi-predicate scan cost.

Pipeline shape (all declarative, one shuffle):
  1. rank-quantize each cluster column to ``bits``-bit codes — quantile
     boundaries via ``approxQuantile`` on a sample (driver holds 2^bits
     scalars per column, never data), so skewed distributions still fill
     the code space evenly;
  2. bit-interleave the codes into the Morton key (pure integer
     expressions — shiftleft/|, whole-stage codegen);
  3. ``repartitionByRange(morton)`` + ``sortWithinPartitions(morton)``
     so each output task writes one tight curve segment.

The interleave itself (:func:`morton_key` / :func:`sql_morton_key`) is
certified exactly against a DuckDB oracle (layout_zorder_key);
:func:`zorder_layout`'s skipping win is asserted by
tests/test_zorder.py: per-file bounding-box area shrinks vs linear sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(codes: list[Column], bits: int) -> Column:
    """Bit-interleave ``bits``-bit non-negative integer codes into one
    Morton key: output bit ``i*len(codes)+d`` = bit ``i`` of ``codes[d]``.
    Pure shiftleft/OR expression tree — codegen'd, no UDF. Total bits
    must fit a signed long (``len(codes) * bits <= 62``)."""
    ndim = len(codes)
    if ndim * bits > 62:
        raise ValueError(f"{ndim} dims x {bits} bits overflows a long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(codes):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * ndim + d))
    return out


def sql_morton_key(codes: list[str], bits: int) -> str:
    """DuckDB twin of :func:`morton_key` — identical bit arithmetic as a
    SQL string over the given code expressions."""
    ndim = len(codes)
    terms = []
    for i in range(bits):
        for d, c in enumerate(codes):
            terms.append(f"(((({c}) >> {i}) & 1) << {i * ndim + d})")
    return " | ".join(terms)


def quantile_codes(
    df: DataFrame, cols: list[str], bits: int, sample_fraction: float = 0.1
) -> tuple[DataFrame, dict[str, list[float]]]:
    """Add ``_code_<col>`` rank-quantized ``bits``-bit columns. Boundaries
    come from ``approxQuantile`` over a bounded sample — 2^bits - 1 cut
    points per column on the driver (scalars, not rows), then a codegen'd
    chained comparison assigns codes. Equal-width binning would collapse
    under skew (every row in one code); equal-frequency fills all codes."""
    n_codes = 1 << bits
    probs = [i / n_codes for i in range(1, n_codes)]
    sample = df.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else df
    cuts = {
        c: sample.approxQuantile(c, probs, 0.01) for c in cols
    }
    out = df
    for c in cols:
        code = F.lit(0)
        for b in cuts[c]:
            code = code + F.when(F.col(c) > F.lit(b), 1).otherwise(0)
        out = out.withColumn(f"_code_{c}", code.cast("long"))
    return out, cuts


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` Morton-curve segments on ``cols``:
    returns the input rows (plus ``_zorder`` key) range-partitioned and
    sorted so a writer emits one tight (a, b, ...)-bounding-box file per
    partition. One range shuffle; the quantile fit is a sampled scan."""
    coded, _ = quantile_codes(df, cols, bits)
    z = coded.withColumn(
        "_zorder", morton_key([F.col(f"_code_{c}") for c in cols], bits)
    ).drop(*[f"_code_{c}" for c in cols])
    return z.repartitionByRange(n_files, "_zorder").sortWithinPartitions("_zorder")


def with_hilbert_key(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bits: int,
    out_col: str = "hilbert_key",
) -> DataFrame:
    """Append the 2-D Hilbert curve index of (``bits``-bit x, y) cells —
    the canonical xy2d quadrant-rotation recurrence, one PROJECTION per
    rotation step over named state columns (_hx, _hy, _hd). Hilbert
    beats Morton for data layout because consecutive keys are always
    ADJACENT cells (no Z-curve diagonal jumps), so range-partitioned
    files have strictly tighter bounding boxes at equal file counts.

    Why a projection chain and not one nested Column: each step
    references the previous x AND y twice, so inline composition grows
    the expression tree 3^bits (measured: analysis hangs at bits=8);
    named intermediate columns keep the plan linear in ``bits``, and
    CollapseProject keeps the steps separate because collapsing would
    duplicate non-cheap expressions. Still pure codegen — shift/mask/
    CASE, stateless per row, no UDF."""
    n = 1 << bits
    out = df.withColumns(
        {
            "_hx": x_col.cast("long"),
            "_hy": y_col.cast("long"),
            "_hd": F.lit(0).cast("long"),
        }
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        xx, yy = F.col("_hx"), F.col("_hy")
        rx = F.shiftright(xx, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(yy, i).bitwiseAND(F.lit(1))
        out = out.withColumns(
            {
                "_hd": F.col("_hd")
                + F.lit(s * s).cast("long")
                * ((F.lit(3) * rx).bitwiseXOR(ry)).cast("long"),
                "_hx": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - yy).otherwise(yy),
                ).otherwise(xx),
                "_hy": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - xx).otherwise(xx),
                ).otherwise(yy),
            }
        )
    return out.withColumn(out_col, F.col("_hd")).drop("_hx", "_hy", "_hd")


def sql_hilbert_query(
    source_sql: str, carry_cols: list[str], x_sql: str, y_sql: str, bits: int
) -> str:
    """DuckDB twin of :func:`hilbert_key`: a chain of one CTE per
    rotation step (linear SQL growth — a single nested expression would
    explode 3^bits), carrying ``carry_cols`` through and emitting the
    final ``hilbert_key``. Identical bit arithmetic, so the comparison
    is exact."""
    n = 1 << bits
    carry = ", ".join(carry_cols)
    parts = [
        f"h{bits} AS (SELECT {carry}, CAST({x_sql} AS BIGINT) AS x,"
        f" CAST({y_sql} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d"
        f" FROM {source_sql})"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((x >> {i}) & 1)"
        ry = f"((y >> {i}) & 1)"
        parts.append(
            f"h{i} AS (SELECT {carry},"
            f" CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f" THEN {n - 1} - y ELSE y END ELSE x END AS x,"
            f" CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f" THEN {n - 1} - x ELSE x END ELSE y END AS y,"
            f" d + {s * s} * xor(3 * {rx}, {ry}) AS d FROM h{i + 1})"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {carry}, CAST(d AS BIGINT) AS hilbert_key FROM h0"
    )
