"""Mergeable HLL rollups: union-of-daily-sketches vs exact distinct."""

from __future__ import annotations

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.sources.parquet import load_table


def test_sketch_rollup_matches_exact_within_bound(spark, sf_dir):
    """Weekly distinct users from unioned DAILY sketches must sit within
    the published HLL error bound of the exact weekly distinct count —
    the re-aggregability that exact counts fundamentally lack."""
    from delfos_etl_pipeline_spark.operators.sketches import sketch_rollup

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    week = F.date_trunc("week", "ts")
    approx = {
        r["_coarse"]: (r.approx_distinct, r.n_fine_buckets)
        for r in sketch_rollup(ev, "user_id", day, week).collect()
    }
    exact = {
        r.w: r.d
        for r in ev.groupBy(week.alias("w"))
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) >= 2
    for w, (est, n_days) in approx.items():
        assert 1 <= n_days <= 7
        rel = abs(est - exact[w]) / exact[w]
        assert rel < 0.05, f"week {w}: est {est} vs exact {exact[w]} ({rel:.3f})"


def test_sketch_rollup_union_equals_flat_sketch(spark):
    """Merging per-bucket sketches must estimate the same as sketching
    the whole column directly — the mergeability property itself."""
    from delfos_etl_pipeline_spark.operators.sketches import sketch_rollup

    df = spark.range(20_000).select(
        (F.col("id") % 10).alias("b"), (F.col("id") % 5000).alias("v")
    )
    rolled = sketch_rollup(
        df, "v", F.col("b"), F.lit(1), lg_config_k=12
    ).collect()[0]
    flat = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("e")
    ).collect()[0]
    assert rolled.approx_distinct == flat.e
    assert rolled.n_fine_buckets == 10


def test_freqitems_sketch_superset_of_exact_heavy_hitters(spark, sf_dir):
    """df.stat.freqItems (Karp et al. / Misra-Gries) guarantees a
    SUPERSET of the items above the support threshold — the approximate
    tier behind the exact heavy_hitters query."""
    from pyspark.sql import functions as F

    from delfos_etl_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    support = 0.1
    n = ev.count()
    exact = {
        r["event_type"]
        for r in ev.groupBy("event_type")
        .count()
        .where(F.col("count") > support * n)
        .collect()
    }
    sketch = set(ev.stat.freqItems(["event_type"], support).collect()[0][0])
    assert exact <= sketch
