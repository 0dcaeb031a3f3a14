"""Index administration — fragmentation/debt observability and the
compaction decision, completing the persisted-index lifecycle's
operational story (build → probe → merge → remove → COMPACT needs a
"when to compact" answer, not just a verb).

An append-only index accretes cost along three axes, each visible from
the store itself with a driver-side listing plus at most one
manifest-sized scan:

- **generation debt** — committed ``merge_into_*`` batches
  (``._merged_<id>`` markers) since the last rewrite: more generations →
  more files per probe scan (open/footer overhead; at 100 TB, listing
  pressure).
- **tombstone debt** — pending logical removals: every probe pays a
  broadcast anti-join over them, and the bytes are not reclaimed.
- **refcount debt** (counted gram index only) — negative-append rows:
  every net-counts probe re-nets them per matched gram.

``index_stats`` reports the axes; ``needs_compaction`` turns them into
the out-of-band scheduling decision with explicit thresholds. Neither
reads data files beyond the tombstone relation (row count only) — the
policy must stay cheap enough to run after every nightly close.
"""

from __future__ import annotations

import os


def _dir_file_stats(root: str) -> tuple[int, int]:
    """(parquet data files, total bytes) under ``root``, recursively —
    partitioned roots (IVF's cluster=<cid> dirs) included."""
    files = 0
    size = 0
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                files += 1
                size += os.path.getsize(os.path.join(dirpath, n))
    return files, size


def _merge_markers(live_dir: str) -> int:
    """Committed merge generations SINCE THE LAST COMPACTION:
    ``<live>._merged_<batch_id>`` done markers are SIBLINGS of the live
    dir (committed_append's protocol), so they enumerate the appends
    that survived a retry storm exactly once each — but they can never
    be deleted (they ARE the replay-idempotence record), so the raw
    count is a lifetime total, not a debt (ADVICE r13: past
    ``max_generations`` lifetime merges, ``needs_compaction`` tripped
    permanently, even right after a compaction). Every compact_* records
    the marker names present at rewrite time in ``<live>._compacted``
    (sinks.record_compaction_watermark); only markers beyond that
    watermark count as debt."""
    from delfos_etl_pipeline_spark.sources.sinks import (
        compaction_watermark,
    )

    live_dir = os.path.normpath(live_dir)
    parent = os.path.dirname(live_dir) or "."
    prefix = os.path.basename(live_dir) + "._merged_"
    compacted = compaction_watermark(live_dir)
    return sum(
        1
        for n in os.listdir(parent)
        if n.startswith(prefix) and n not in compacted
    )


def index_stats(spark, path: str, kind: str) -> dict:
    """Debt/fragmentation statistics for a persisted index.

    ``kind``: ``"gram"`` (counted or set relation at ``path``),
    ``"minhash"`` (``buckets``/``shingles`` subdirs, in-root
    ``tombstones``), ``"ivf"`` (partitioned root, SIBLING
    ``<path>.tombstones``), ``"pq"`` (``codes``/``codebooks`` subdirs,
    in-root ``tombstones``). Returns data_files / bytes / generations /
    tombstone_rows, plus negative_rows for a counted gram index (the
    refcount-debt axis — one column-pruned scan of the cnt column)."""
    path = os.path.normpath(path)
    if kind == "gram":
        roots = {"index": path}
        tomb = None
    elif kind == "minhash":
        roots = {
            "buckets": os.path.join(path, "buckets"),
            "shingles": os.path.join(path, "shingles"),
        }
        tomb = os.path.join(path, "tombstones")
    elif kind == "ivf":
        roots = {"index": path}
        tomb = path + ".tombstones"
    elif kind == "pq":
        roots = {"codes": os.path.join(path, "codes")}
        tomb = os.path.join(path, "tombstones")
    else:
        raise ValueError(f"unknown index kind {kind!r}")

    files = 0
    size = 0
    generations = 0
    for root in roots.values():
        f, s = _dir_file_stats(root)
        files += f
        size += s
        generations = max(generations, _merge_markers(root))
    stats: dict = {
        "kind": kind,
        "data_files": files,
        "bytes": size,
        "generations": generations,
    }
    if tomb is not None and os.path.isdir(tomb):
        stats["tombstone_rows"] = spark.read.parquet(tomb).count()
    else:
        stats["tombstone_rows"] = 0
    if kind == "gram":
        from pyspark.sql import functions as F

        rel = spark.read.parquet(path)
        if "cnt" in rel.columns:
            stats["negative_rows"] = rel.where(
                F.col("cnt") < 0
            ).count()
        else:
            stats["negative_rows"] = 0
    return stats


def needs_compaction(
    stats: dict,
    max_generations: int = 30,
    max_tombstone_rows: int = 100_000,
    max_negative_rows: int = 100_000,
    max_files_per_gib: int = 256,
) -> tuple[bool, list[str]]:
    """The out-of-band scheduling decision: (compact?, reasons).

    Defaults target the measured cost model: ~30 nightly generations
    before listing/open overhead is worth one O(index) rewrite; a
    tombstone relation past ~100k rows stops being a cheap broadcast;
    negative gram rows past the same bound make probe-time netting
    re-aggregate real volume; and more than ~256 files per GiB means
    appends fragmented far below the 128 MB scan-split target. Every
    threshold is a parameter — the numbers are a policy, not physics."""
    reasons = []
    if stats["generations"] > max_generations:
        reasons.append(
            f"generations {stats['generations']} > {max_generations}"
        )
    if stats["tombstone_rows"] > max_tombstone_rows:
        reasons.append(
            f"tombstone_rows {stats['tombstone_rows']} > "
            f"{max_tombstone_rows}"
        )
    if stats.get("negative_rows", 0) > max_negative_rows:
        reasons.append(
            f"negative_rows {stats['negative_rows']} > {max_negative_rows}"
        )
    gib = max(stats["bytes"], 1) / (1 << 30)
    if stats["data_files"] / gib > max_files_per_gib and stats[
        "data_files"
    ] > 64:
        reasons.append(
            f"data_files {stats['data_files']} over "
            f"{max_files_per_gib}/GiB at {gib:.3f} GiB"
        )
    return bool(reasons), reasons
