"""delfos_etl_pipeline_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of yurimags/Delfos-ETL-Pipeline.

The reference is a pandas+Postgres ETL for wind-turbine sensor series
(SURVEY.md). This package re-expresses its capabilities Spark-first:
declarative DataFrame/SQL plans, Catalyst optimization, AQE, broadcast
joins — plus large-scale training-data operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB inputs.
"""

from delfos_etl_pipeline_spark._vendor import ensure_protobuf

# Workers unpickling our UDFs import this package, so the conditional
# google.protobuf shim (needed by transformWithState v2's state
# protocol) lands on every interpreter's sys.path — see _vendor.
ensure_protobuf()

from delfos_etl_pipeline_spark.session import get_spark
from delfos_etl_pipeline_spark.sources.parquet import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]
__version__ = "0.1.0"
