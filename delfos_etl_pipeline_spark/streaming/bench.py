"""Steady-state Structured Streaming throughput measurement.

The batch bench (bench.py) deliberately excludes the streaming_* queries:
their timed path would measure temp-dir IO setup, not the engine. This
module measures what those exclusions left unmeasured — micro-batch
THROUGHPUT at steady state:

- source: ``rate-micro-batch`` — exactly ``rows_per_batch`` deterministic
  rows per trigger, so batch boundaries are under test control (no
  wall-clock coupling like the plain ``rate`` source).
- topology: the engine's two stateful streaming flagships — event-time
  windowed aggregation under a watermark, and watermark-bounded
  exactly-once dedup — the shapes streaming/runner.py ships.
- sink: ``noop`` with a pre-created checkpoint dir; setup (session, dirs,
  first-trigger state-store formation) happens OUTSIDE the measured
  region.
- measurement: per-batch ``numInputRows`` and trigger durations from the
  StreamingQueryProgress feed, skipping ``warmup_batches`` so state-store
  formation and codegen don't pollute the number. rows/sec =
  Σ rows / Σ triggerExecution over the measured batches only.

At 100 TB-scale streaming the same topologies run with the same state
design (watermark bounds state; keys partition across executors); the
single-node rows/sec here is the per-core baseline the cluster number
scales from.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _drain(query, n_batches: int, timeout_s: float) -> list[dict]:
    """Wait until ``n_batches`` data-bearing batches completed; return
    their progress dicts (numInputRows > 0 only — empty keep-alive
    triggers carry no throughput signal). A failed query raises
    immediately instead of spinning to the timeout and reporting a
    silent 0 rows/sec into the bench record."""
    deadline = time.time() + timeout_s
    seen: dict[int, dict] = {}
    while time.time() < deadline and len(seen) < n_batches:
        exc = query.exception()
        if exc is not None:
            raise RuntimeError(f"streaming bench query failed: {exc}")
        for p in query.recentProgress:
            if p["numInputRows"] > 0:
                seen[p["batchId"]] = p
        time.sleep(0.05)
    return [seen[k] for k in sorted(seen)][:n_batches]


def measure_stream_rate(
    spark: SparkSession,
    topology: str = "windowed_agg",
    rows_per_batch: int = 200_000,
    n_batches: int = 12,
    warmup_batches: int = 4,
    timeout_s: float = 120.0,
) -> dict:
    """Run one streaming topology at steady state; return
    {"rows_per_sec": float, "batches": int, "rows_per_batch": int}.

    ``topology``: "windowed_agg" (watermark + 5s event-time windows,
    update mode) or "dedup" (watermark-bounded dropDuplicates, append).
    """
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", "0")
        .option("advanceMillisPerBatch", "1000")
        .load()
    )
    if topology == "windowed_agg":
        out = (
            src.withWatermark("timestamp", "10 seconds")
            .groupBy(
                F.window("timestamp", "5 seconds").alias("w"),
                (F.col("value") % 16).alias("k"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("s"),
                F.avg("value").alias("a"),
            )
        )
        mode = "update"
    elif topology == "dedup":
        out = src.withWatermark("timestamp", "10 seconds").dropDuplicatesWithinWatermark(
            ["value"]
        )
        mode = "append"
    elif topology == "stream_join":
        # watermarked stream-stream self-join, 1:1 key matching (values
        # are globally unique in rate-micro-batch) with a time-range
        # bound — measures join state-store insert/match/evict
        # throughput, the heaviest stateful shape runner.py ships
        left = src.withWatermark("timestamp", "10 seconds").select(
            F.col("timestamp").alias("lt"), F.col("value").alias("k")
        )
        right = src.withWatermark("timestamp", "10 seconds").select(
            F.col("timestamp").alias("rt"), F.col("value").alias("rk")
        )
        out = left.join(
            right,
            (left.k == right.rk)
            & (right.rt >= left.lt)
            & (right.rt <= left.lt + F.expr("interval 5 seconds")),
            "inner",
        )
        mode = "append"
    else:
        raise ValueError(f"unknown topology {topology!r}")

    ckpt = tempfile.mkdtemp(prefix=f"stream_bench_{topology}_")
    query = (
        out.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        progress = _drain(query, warmup_batches + n_batches, timeout_s)
    finally:
        query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    measured = progress[warmup_batches:]
    if not measured:
        return {"rows_per_sec": 0.0, "batches": 0, "rows_per_batch": rows_per_batch}
    rows = sum(p["numInputRows"] for p in measured)
    secs = sum(p["durationMs"]["triggerExecution"] for p in measured) / 1000.0
    return {
        "rows_per_sec": round(rows / secs, 1) if secs > 0 else 0.0,
        "batches": len(measured),
        "rows_per_batch": rows_per_batch,
    }
