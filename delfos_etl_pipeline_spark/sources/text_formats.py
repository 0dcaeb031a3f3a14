"""CSV / JSON-lines connectors — schema-first, corrupt-row capturing.

The reference ingests JSON over HTTP with silent pandas inference
(/root/reference/etl/etl_process.py:58-66); the engine's file-format path
instead declares the schema up front (SURVEY §1.3: "declare schemas as
the reference declares DDL") and captures malformed rows in a quarantine
column rather than dropping or crashing — at 100 TB some rows ARE
malformed, and a pipeline that dies at row 40 billion is worse than one
that quarantines it.

Scan posture: explicit schemas mean no inference pass (inference reads
the data twice); CSV/JSON scans parallelize per file split like parquet
but push down no predicates — convert to parquet at the ingest edge and
query that (write_partitioned in sinks.py); these readers exist for the
ingest edge itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Name of the quarantine column malformed rows land in.
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    """Schema + the corrupt-record capture column (PERMISSIVE mode parks
    the raw line there when parsing fails). Copies — StructType.add
    mutates the caller's schema in place."""
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with declared schema; malformed rows are captured, not
    dropped. Returns ALL rows — split with quarantine()."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines scan with declared schema (no inference pass over the
    data); malformed lines are captured, not dropped."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows with the capture column dropped, and
    the quarantined raw lines for dead-lettering. Spark requires caching
    the scan before referencing only the corrupt column (the parser
    short-circuits otherwise) — done here, once."""
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt
