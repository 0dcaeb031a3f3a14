from delfos_etl_pipeline_spark.text.analysis import (  # noqa: F401
    document_fingerprint,
    language_id,
    text_stats,
)
