"""S4 — deterministic synthetic sensor-data generator, Spark-native.

Re-expresses the reference seeder's generation laws
(/root/reference/database/seed_fonte.py:13-39, laws restated in
FIXTURES.md §1) as a distributed ``spark.range`` plan:

- 1-minute grid over [start, end]
- wind_speed  = N(12, 5) clipped to [0, 25]
- power       = 0 if ws<3; 2000 if ws>20; else ws²·8 + N(0,100); clip [0,2000]
- ambient_temprature (sic — the misspelling is load-bearing API surface,
  SURVEY.md §2.10(4)) = 20 + 10·sin(2π·i/1440) + N(0,3)

Parity with the reference is *distributional*, not bitwise: numpy's
MT19937 stream can't be reproduced by Spark's ``randn`` (different RNG,
different partitioning), and reproducing it would force a single-threaded
driver loop — the opposite of a 100 TB-posture generator. The generator IS
deterministic for a fixed (seed, num_partitions): ``randn(seed)`` derives
per-partition streams.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_sensor_data(
    spark: SparkSession,
    start: str = "2025-08-10 00:00:00",
    end: str = "2025-08-20 23:59:00",
    freq_minutes: int = 1,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Wide 1-minute sensor table: (id, timestamp, wind_speed, power,
    ambient_temprature) — FIXTURES.md §1 schema."""
    # row count from the time span (inclusive end, like the reference's
    # pd.date_range(start, end, freq='1min'))
    import datetime as dt

    t0 = dt.datetime.fromisoformat(start)
    t1 = dt.datetime.fromisoformat(end)
    n_rows = int((t1 - t0).total_seconds() // (60 * freq_minutes)) + 1

    base = spark.range(0, n_rows, 1, numPartitions=num_partitions)
    i = F.col("id")
    ts = F.to_timestamp(F.lit(start)) + F.make_interval(mins=i * freq_minutes)

    # F6 — gaussian noise (seed_fonte.py:21); F7 clip below.
    wind_raw = F.randn(seed) * 5.0 + 12.0
    wind = F.least(F.greatest(wind_raw, F.lit(0.0)), F.lit(25.0))

    # Materialize wind in its own projection: randn is nondeterministic, so
    # referencing the expression twice (output column + power piecewise)
    # would draw two different samples. CollapseProject never inlines
    # nondeterministic expressions, so this boundary is stable.
    staged = base.select(
        (i + 1).alias("id"),
        ts.alias("timestamp"),
        (i * freq_minutes).alias("_minute_idx"),
        wind.alias("wind_speed"),
    )

    w = F.col("wind_speed")
    power_noise = F.randn(seed + 1) * 100.0
    power_raw = (
        F.when(w < 3.0, F.lit(0.0))
        .when(w > 20.0, F.lit(2000.0))
        .otherwise(F.pow(w, 2) * 8.0 + power_noise)
    )
    power = F.least(F.greatest(power_raw, F.lit(0.0)), F.lit(2000.0))

    minutes_of_day = F.col("_minute_idx") % (24 * 60)
    temp = (
        20.0
        + 10.0 * F.sin(minutes_of_day * (2.0 * math.pi / 1440.0))
        + F.randn(seed + 2) * 3.0
    )

    return staged.select(
        "id",
        "timestamp",
        "wind_speed",
        power.alias("power"),
        temp.alias("ambient_temprature"),  # sic — reference spelling
    )


def with_null_injection(
    df: DataFrame,
    measure_cols: list[str],
    null_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """FIXTURES.md §1 robustness variant: ~null_fraction NULLs per measure
    column, exercising the dropna paths (A2)."""
    out = df
    for idx, c in enumerate(measure_cols):
        out = out.withColumn(
            c,
            F.when(F.rand(seed + idx) < null_fraction, F.lit(None)).otherwise(
                F.col(c)
            ),
        )
    return out
