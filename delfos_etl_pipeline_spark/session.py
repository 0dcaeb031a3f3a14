"""SparkSession factory with scale-ready defaults.

The reference (yurimags/Delfos-ETL-Pipeline) delegates all execution to
Postgres + pandas (SURVEY.md §4); here Catalyst/Tungsten/AQE replace that.
Defaults are tuned so the same code path works from sf0.001 local tests up
to a multi-executor cluster: AQE handles runtime partition coalescing and
skew joins, Arrow accelerates any pandas interop, and nanosecond parquet
timestamps (unsupported natively by Spark) are read as longs and normalized
by the source adapter (see sources/parquet.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that must be set before the JVM starts.
_STARTUP_CONF: dict[str, str] = {
    # Naive/NTZ timestamps everywhere (reference uses tz-naive TIMESTAMP,
    # /root/reference/database/init_fonte.sql:6); pin UTC so date functions
    # are deterministic across environments.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-optimization: partition coalescing, skew-join splitting,
    # dynamic join-strategy switch. Essential at 100 TB, harmless at sf0.001.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # By default Spark pins cached-plan output partitioning, which disables
    # AQE partition coalescing under .persist() — the dedup/LSH pipelines
    # cache intermediates, so allow AQE to re-plan them too.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # The driver testdata's `events.ts` is parquet TIMESTAMP(NANOS) which
    # Spark cannot read natively; read as long and let the source adapter
    # convert (truncate) to microsecond timestamps.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # MIN/MAX/COUNT pushdown straight to parquet footers.
    "spark.sql.parquet.aggregatePushdown": "true",
    # Arrow for toPandas / pandas UDF exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(
    app_name: str = "delfos-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when the env var is
    set, else Spark's own default. ``shuffle_partitions`` should be sized to
    the data: ~2-4x total cores locally; on a real cluster leave Spark/AQE
    defaults (AQE coalesces down from a high initial number).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_STARTUP_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
