"""Hash-stable stat formulas: rounding is a pure function of the binary
double — floor(x*10^d + 0.5)/10^d — so any engine computing IEEE doubles
produces identical results (unlike engine round(), whose tie handling
differs between Spark's shortest-string BigDecimal and DuckDB's binary)."""

import math

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.functions.stable import round_half_up


def test_round_half_up_matches_ieee_reference(spark):
    vals = [48.3478125, 65.0465625, -1.2345675, 2.00000049, 0.0, 123.456789]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r.x: r.y
        for r in df.select("x", round_half_up(F.col("x"), 6).alias("y")).collect()
    }
    for v in vals:
        want = math.floor(v * 1e6 + 0.5) / 1e6
        assert got[v] == want, (v, got[v], want)
