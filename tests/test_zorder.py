"""Z-order layout: Morton arithmetic, quantile coding under skew, and the
actual data-skipping win (per-file bounding-box extents vs linear sort)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for d, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + d)
    return out


def test_morton_key_matches_reference_bit_math(spark):
    from delfos_etl_pipeline_spark.operators.zorder import morton_key

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85), (200, 13)]
    df = spark.createDataFrame(cases, "a long, b long")
    rows = df.select(
        "a", "b", morton_key([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in rows:
        assert r.z == _py_morton([r.a, r.b], 8), (r.a, r.b)
    # 3-dim interleave too
    df3 = spark.createDataFrame([(5, 9, 14)], "a long, b long, c long")
    (r3,) = df3.select(
        morton_key([F.col("a"), F.col("b"), F.col("c")], 4).alias("z")
    ).collect()
    assert r3.z == _py_morton([5, 9, 14], 4)


def test_quantile_codes_fill_code_space_under_skew(spark):
    """Equal-frequency coding must spread a heavily skewed column across
    the full code range (equal-width would collapse to one code)."""
    from delfos_etl_pipeline_spark.operators.zorder import quantile_codes

    # lognormal-ish skew: many small values, few huge ones
    df = spark.range(4000).select(
        (F.pow(F.lit(10.0), (F.col("id") % 40) / 10.0)).alias("x")
    )
    coded, cuts = quantile_codes(df, ["x"], bits=4, sample_fraction=1.0)
    dist = coded.groupBy("_code_x").count().collect()
    codes_used = {r["_code_x"] for r in dist}
    assert len(codes_used) >= 12, f"skewed column collapsed: {sorted(codes_used)}"
    assert max(r["count"] for r in dist) < 4000 * 0.25


def test_zorder_layout_tightens_bounding_boxes(spark):
    """The reason the operator exists: with 16 output files over a 2-D
    uniform table, linear sort on `a` leaves every file spanning the FULL
    `b` range (no pruning on b-only predicates), while the Morton layout
    must bound BOTH dimensions well below half the domain — so parquet
    min/max stats prune on either column."""
    from delfos_etl_pipeline_spark.operators.zorder import zorder_layout

    n, domain = 20_000, 1024
    base = spark.range(n).select(
        (F.xxhash64("id") % domain).alias("a"),
        (F.xxhash64("id", F.lit(1)) % domain).alias("b"),
    ).select(F.abs("a").alias("a"), F.abs("b").alias("b"))

    def extents(df):
        per_file = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("a") - F.min("a")).alias("ea"),
                (F.max("b") - F.min("b")).alias("eb"),
            )
            .agg(F.avg("ea").alias("ea"), F.avg("eb").alias("eb"))
            .collect()[0]
        )
        return per_file.ea / domain, per_file.eb / domain

    linear = base.repartitionByRange(16, "a").sortWithinPartitions("a")
    lin_a, lin_b = extents(linear)
    zed = zorder_layout(base, ["a", "b"], n_files=16, bits=8)
    z_a, z_b = extents(zed)

    assert lin_b > 0.9, f"linear sort should span full b range, got {lin_b}"
    assert z_a < 0.5 and z_b < 0.5, f"morton extents too wide: {z_a}, {z_b}"
    assert z_b < lin_b / 2, "z-order did not beat linear sort on the 2nd dim"


def test_zorder_files_actually_skip_on_second_dim(spark, tmp_path):
    """End-to-end skipping proof on REAL parquet: write the same table
    laid out linearly (sorted by `a`) and Morton-clustered on (a, b),
    then filter on a narrow `b` range. Files whose row groups are fully
    pruned by footer min/max stats yield no rows, so distinct
    input_file_name() counts the files actually touched — the Morton
    layout must touch well under half of what the linear layout does."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.operators.zorder import zorder_layout

    n, domain, n_files = 40_000, 1024, 16
    base = spark.range(n).select(
        F.abs(F.xxhash64("id") % domain).alias("a"),
        F.abs(F.xxhash64("id", F.lit(1)) % domain).alias("b"),
    )
    lin_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    base.repartitionByRange(n_files, "a").sortWithinPartitions("a").write.parquet(lin_path)
    zorder_layout(base, ["a", "b"], n_files=n_files).drop("_zorder").write.parquet(z_path)

    pred = (F.col("b") >= 100) & (F.col("b") < 164)  # 1/16 of the b domain

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    lin, zed = files_touched(lin_path), files_touched(z_path)
    # linear-on-a layout spreads every b everywhere: all files touched
    assert lin >= n_files - 1, f"linear layout unexpectedly pruned: {lin}"
    assert zed <= lin / 2, f"z-order touched {zed}/{lin} files — no skipping win"
    # same rows come back from both layouts
    assert (
        spark.read.parquet(z_path).where(pred).count()
        == spark.read.parquet(lin_path).where(pred).count()
    )


def test_hilbert_key_matches_canonical_and_steps_by_one(spark):
    """The unrolled Spark recurrence must equal the canonical xy2d
    algorithm on the full 16x16 grid (bits=4), and the inverse walk
    must step exactly one cell per consecutive key — the locality
    property that makes Hilbert the stronger clustering curve."""
    from delfos_etl_pipeline_spark.operators.zorder import with_hilbert_key

    def xy2d_ref(order, x, y):
        d, s = 0, order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = order - 1 - x, order - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 4, 16
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    rows = with_hilbert_key(grid, F.col("x"), F.col("y"), bits).collect()
    inv = {}
    for r in rows:
        assert r.hilbert_key == xy2d_ref(n, r.x, r.y), (r.x, r.y)
        inv[r.hilbert_key] = (r.x, r.y)
    assert len(inv) == n * n  # bijective over the grid
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1
