"""Scalar (int8) embedding quantization — the storage/transfer tier of a
100 TB vector corpus (SURVEY.md §7 M5 extension family).

Per-dimension affine quantization: fit (min, max) per dimension over the
corpus, then code each value to ``floor((x - mn) * 256 / (mx - mn))``
clamped to [0, 255]. 4× smaller than float32, and IVF/LSH candidate
generation works on codes directly; exact re-scoring dequantizes with
``mn + (q + 0.5) * (mx - mn) / 256`` (midpoint rule).

Scale posture: the fit is ONE aggregate producing 2·dim scalars (driver
holds 2·dim numbers, never data); codes are a stateless projection over
broadcast-literal bounds — scan throughput, zero UDFs, zero shuffles
beyond the fit's single reduce. All arithmetic is double with a fixed
operation order, so the DuckDB oracle reproduces codes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.similarity.knn import _lit_vec


def fit_bounds(emb_df: DataFrame, vec_col: str, dim: int) -> tuple[list, list]:
    """Per-dimension (mins, maxes) over the corpus — one aggregate row."""
    e = F.col(vec_col).cast("array<double>")
    aggs = [F.min(F.element_at(e, i + 1)).alias(f"mn{i}") for i in range(dim)] + [
        F.max(F.element_at(e, i + 1)).alias(f"mx{i}") for i in range(dim)
    ]
    row = emb_df.agg(*aggs).first()
    return [row[f"mn{i}"] for i in range(dim)], [row[f"mx{i}"] for i in range(dim)]


def quantize(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bounds: tuple[list, list] | None = None,
) -> DataFrame:
    """(id, q_sig, recon_mse): comma-joined uint8 codes + mean squared
    dequantization error (rounded to 9 — the comparison contract keeps
    arrays out of the output, same lesson as mm_byte_histogram)."""
    if bounds is None:
        bounds = fit_bounds(emb_df, vec_col, dim)
    mins, maxes = bounds
    mn = _lit_vec(mins)
    mx = _lit_vec(maxes)

    # Materialize the cast vector and the code array as COLUMNS between
    # projections. Referencing a non-trivial expression inside a
    # higher-order-function lambda inlines it per element: element_at(q, i)
    # with q a transform() re-ran the whole 64-wide transform per
    # dimension (O(dim²) per row — measured 10 s → ~1 s at sf0.1), and
    # element_at(cast(vec), i) re-cast the whole array per dimension.
    # CollapseProject keeps the projection boundaries because each alias
    # has multiple non-cheap consumers.
    pre = emb_df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_e")
    )
    e = F.col("_e")

    # zip by index so each dimension pairs with its own bounds; the
    # expression shape (sub, mul, div, floor, clamp) is mirrored verbatim
    # in the oracle SQL so IEEE doubles agree bit-for-bit.
    idx = F.sequence(F.lit(1), F.lit(dim))
    q = F.transform(
        idx,
        lambda i: F.when(
            F.element_at(mx, i) > F.element_at(mn, i),
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.floor(
                        (F.element_at(e, i) - F.element_at(mn, i))
                        * 256.0
                        / (F.element_at(mx, i) - F.element_at(mn, i))
                    ),
                ),
            ),
        ).otherwise(F.lit(0.0)),
    )
    coded = pre.select(F.col(id_col), e, q.alias("_q"))
    qc = F.col("_q")
    deq = F.transform(
        idx,
        lambda i: F.element_at(mn, i)
        + (F.element_at(qc, i) + 0.5)
        * (F.element_at(mx, i) - F.element_at(mn, i))
        / 256.0,
    )
    sq_err = F.aggregate(
        F.zip_with(e, deq, lambda x, d: (x - d) * (x - d)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return coded.select(
        F.col(id_col),
        F.array_join(qc.cast("array<bigint>").cast("array<string>"), ",").alias(
            "q_sig"
        ),
        F.round(sq_err / dim, 9).alias("recon_mse"),
    )
