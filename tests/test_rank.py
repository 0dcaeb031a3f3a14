"""operators/rank.py::distributed_rank — exactness vs the single-task
window form, globally and per key, on shuffled input."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def _events(spark):
    from delfos_etl_pipeline_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR

    return (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "ts", "value")
        .repartition(7)  # adversarial initial layout
    )


def test_global_rank_matches_window(spark):
    from delfos_etl_pipeline_spark.operators.rank import distributed_rank

    ev = _events(spark)
    got = distributed_rank(ev, order_cols=("ts", "event_id"))
    w = Window.orderBy("ts", "event_id")
    want = ev.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert (
        got.select("event_id", "rn")
        .exceptAll(want.select("event_id", "rn"))
        .count()
        == 0
    )
    n = ev.count()
    ranks = got.agg(
        F.min("rn"), F.max("rn"), F.count_distinct("rn")
    ).first()
    assert tuple(ranks) == (1, n, n)  # a permutation of 1..n


def test_per_key_rank_matches_window(spark):
    from delfos_etl_pipeline_spark.operators.rank import distributed_rank

    ev = _events(spark)
    got = distributed_rank(
        ev, order_cols=("ts", "event_id"), key_cols=("event_type",)
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    want = ev.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert (
        got.select("event_id", "rn")
        .exceptAll(want.select("event_id", "rn"))
        .count()
        == 0
    )


def test_rank_column_name_and_partition_count(spark):
    from delfos_etl_pipeline_spark.operators.rank import distributed_rank

    ev = _events(spark)
    got = distributed_rank(
        ev, order_cols=("ts", "event_id"), num_partitions=5, rank_col="pos"
    )
    assert "pos" in got.columns
    assert not {"_pid", "_lrn", "_off"} & set(got.columns)
