"""S3 — HTTP/JSON extract source (driver-side, explicit schema).

The reference ETL pulls one day at a time from its FastAPI read API and
infers a pandas frame from the JSON envelope
(/root/reference/etl/etl_process.py:36-76). Engine-native pipelines should
scan the underlying table directly (S1); this connector exists for parity
with deployments where HTTP is the only access path.

Design: the fetch happens ON THE DRIVER (one day ≈ 1,440 rows — an HTTP
client has no business on executors), then ``spark.createDataFrame`` with
a DECLARED schema — never JSON inference in the hot path (SURVEY.md §1.3).
The fetcher is injectable so tests run without a network.
"""

from __future__ import annotations

import datetime as _dt
import json
import urllib.parse
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Envelope schema mirroring the reference API's response
#: (/root/reference/api/app/main.py:143-158).
SENSOR_FIELDS: dict[str, T.DataType] = {
    "timestamp": T.StringType(),  # ISO-8601 at the boundary (F1)
    "wind_speed": T.DoubleType(),
    "power": T.DoubleType(),
    "ambient_temprature": T.DoubleType(),  # sic — reference spelling
}


def _default_fetch(url: str, timeout: float) -> dict:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return json.load(resp)


def read_sensor_api(
    spark: SparkSession,
    base_url: str,
    start_date: _dt.datetime | str | None = None,
    end_date: _dt.datetime | str | None = None,
    variables: list[str] | None = None,
    timeout: float = 30.0,  # reference httpx timeout (etl_process.py:54)
    fetch: Callable[[str, float], dict] | None = None,
) -> DataFrame:
    """GET {base_url}/data/ with the reference's query params, parse the
    JSON envelope against the declared schema, cast timestamp (F1)."""
    cols = variables or list(SENSOR_FIELDS)
    unknown = [c for c in cols if c not in SENSOR_FIELDS]
    if unknown:  # P2 allowlist, mirrored from api/app/main.py:120-131
        raise ValueError(f"unknown variables: {unknown}")
    if "timestamp" not in cols:
        cols = ["timestamp", *cols]

    params: dict[str, str] = {"variables": ",".join(c for c in cols if c != "timestamp")}
    if start_date is not None:
        params["start_date"] = str(start_date)
    if end_date is not None:
        params["end_date"] = str(end_date)
    url = f"{base_url.rstrip('/')}/data/?{urllib.parse.urlencode(params)}"

    envelope = (fetch or _default_fetch)(url, timeout)
    rows = envelope.get("data", [])

    schema = T.StructType([T.StructField(c, SENSOR_FIELDS[c], True) for c in cols])
    df = spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows], schema
    )
    # F1: ISO parse with Z→offset rewrite (api/app/main.py:104,113)
    return df.withColumn(
        "timestamp",
        F.to_timestamp(F.regexp_replace(F.col("timestamp"), "Z$", "+00:00")),
    )
