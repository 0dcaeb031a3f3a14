from delfos_etl_pipeline_spark.sources.parquet import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
