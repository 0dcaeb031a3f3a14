"""M3 — SQL façade + API-parity query layer (SURVEY.md §3.3).

Replaces the reference FastAPI's hand-built SQL strings
(/root/reference/api/app/database.py:41-74, main.py:80-164) with temp
views + ``spark.sql`` / DataFrame plans. The same validation contract
(ISO date parse, variable allowlist) runs driver-side; Catalyst handles
what Postgres' planner did (pushdown, index-equivalent pruning).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ValidationError(ValueError):
    """Maps to the API's HTTP 400 responses (main.py:108-118,126-131)."""


def parse_iso(value: str | _dt.datetime | None, param: str) -> _dt.datetime | None:
    """P5/F1 — ISO-8601 parse with Z→offset rewrite
    (/root/reference/api/app/main.py:99-118)."""
    if value is None or isinstance(value, _dt.datetime):
        return value
    try:
        return _dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError as exc:
        raise ValidationError(f"invalid {param}: {value!r} (expected ISO-8601)") from exc


@dataclass
class QueryResult:
    """The API's JSON envelope, engine-side (main.py:143-158)."""

    df: DataFrame
    count: int
    filters: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict)


def get_data(
    df: DataFrame,
    start_date: str | _dt.datetime | None = None,
    end_date: str | _dt.datetime | None = None,
    variables: list[str] | str | None = None,
    ts_col: str = "timestamp",
    inclusive_end: bool = True,
    with_metadata: bool = True,
) -> QueryResult:
    """GET /data/ parity: projection + inclusive range filter + ORDER BY
    timestamp + envelope metadata (count, echoed filters, table range).

    ``variables`` accepts the API's comma-separated string form (F5) or a
    list; ``timestamp`` is always included, mirroring main.py:133-137.
    """
    if isinstance(variables, str):  # F5 split+trim
        variables = [v.strip() for v in variables.split(",") if v.strip()]
    cols = variables or [c for c in df.columns if c != "id"]
    unknown = [c for c in cols if c not in df.columns]
    if unknown:  # P2 allowlist → 400
        raise ValidationError(
            f"invalid variables: {unknown}; available: {df.columns}"
        )
    if ts_col not in cols:
        cols = [ts_col, *cols]

    start = parse_iso(start_date, "start_date")
    end = parse_iso(end_date, "end_date")
    out = df.select(*cols)
    c = F.col(ts_col)
    if start is not None:
        out = out.where(c >= F.lit(start))
    if end is not None:  # reference bound is inclusive (database.py:59)
        out = out.where(c <= F.lit(end) if inclusive_end else c < F.lit(end))
    out = out.orderBy(ts_col)  # O1 ordering contract (database.py:62)

    count = out.count()
    meta: dict = {}
    if with_metadata:  # A3/A4 — total count + available range (main.py:150-157)
        total = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts_col).alias("lo"),
            F.max(ts_col).alias("hi"),
        ).first()
        meta = {
            "total_records": total["n"],
            "date_range": {"start": total["lo"], "end": total["hi"]},
        }
    return QueryResult(
        df=out,
        count=count,
        filters={
            "start_date": start,
            "end_date": end,
            "variables": [c for c in cols if c != ts_col],
        },
        metadata=meta,
    )


def health(df: DataFrame) -> dict:
    """/health parity — connectivity + row count (main.py:46-58)."""
    try:
        return {"status": "healthy", "records": df.count()}
    except Exception as exc:  # noqa: BLE001
        return {"status": "unhealthy", "error": str(exc)}


def register_sql(spark: SparkSession, frames: dict[str, DataFrame]) -> None:
    """Expose frames as temp views so users query via ``spark.sql`` —
    the engine's replacement for the API's dynamic SQL builder."""
    for name, frame in frames.items():
        frame.createOrReplaceTempView(name)
