"""Salted aggregation / join equivalence with the unsalted plans."""

from pyspark.sql import functions as F

from delfos_etl_pipeline_spark.operators.skew import salted_agg, salted_join
from delfos_etl_pipeline_spark.sources.parquet import load_table


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("count", "*"),
                "s": ("sum", "value"),
                "a": ("avg", "value"),
                "lo": ("min", "value"),
                "hi": ("max", "value"),
            },
        ).collect()
    }
    want = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.avg("value").alias("a"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k].n == want[k].n
        assert abs(got[k].s - want[k].s) < 1e-6
        assert abs(got[k].a - want[k].a) < 1e-9
        assert got[k].lo == want[k].lo and got[k].hi == want[k].hi


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(k, i, float(i)) for k in ("hot", "cold") for i in range(200 if k == "hot" else 3)],
        "k string, i long, v double",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unseen", "U")], "k string, label string"
    )
    got = salted_join(fact, dim, "k", n_salts=4).select("k", "i", "v", "label")
    want = fact.join(dim, "k").select("k", "i", "v", "label")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # left join keeps unmatched fact rows exactly once
    fact2 = fact.union(spark.createDataFrame([("orphan", 0, 0.0)], fact.schema))
    got_l = salted_join(fact2, dim, "k", n_salts=4, how="left")
    assert got_l.count() == fact2.count()
