"""Rolling (sliding-frame) order statistics.

Two implementations of the same semantic — trailing-frame median per key,
frame ordered deterministically:

- the DECLARATIVE form lives in the query registry (`w6_rolling_median`):
  exact ``percentile`` as a window aggregate. Oracle-certified, pure JVM,
  but percentile is not invertible, so Spark rebuilds the frame buffer
  per row — O(n · frame) (measured 5.9 s at sf0.1, frame=100).
- :func:`rolling_median_pandas` here: ``applyInPandas`` per key, pandas'
  skip-list rolling median — O(n log frame) per key, one Arrow hop.
  Measured 0.71 s vs 3.2 s warm at sf0.1/frame=100 (4.5×); the gap
  widens with the frame. The production swap when frames widen or the
  window query dominates a pipeline. Equality with the declarative form
  is pytest-asserted (both interpolate the even-frame midpoint).

At 100 TB: keys partition the work either way; the pandas form
additionally needs each key's rows to fit one executor's Arrow batch
stream (they stream in chunks — only per-GROUP sort memory matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rolling_median_pandas(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    frame: int = 100,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Trailing-``frame``-row median of ``value_col`` per ``key_col``,
    frame ordered by ``order_cols`` — pandas rolling median under
    ``applyInPandas``. Output: input columns + ``out_col``."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # build a NEW StructType: StructType.add mutates the receiver, and
    # df.schema is cached on the DataFrame — mutating it desyncs
    # df.columns from the JVM plan and breaks later column resolution
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def per_key(pdf):
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].rolling(frame, min_periods=1).median().astype(float)
        )
        return pdf

    return df.groupBy(key_col).applyInPandas(per_key, out_schema)
