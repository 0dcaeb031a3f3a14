from delfos_etl_pipeline_spark.plans.pipeline import (  # noqa: F401
    DEFAULT_STATS,
    RunResult,
    default_signal_dim,
    extract_range,
    map_signals,
    run_day,
    sensor_pipeline,
    signal_names,
    to_long,
    windowed_stats,
)
