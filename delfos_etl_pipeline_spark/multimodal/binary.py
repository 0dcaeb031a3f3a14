"""Multimodal columns — opaque binary payloads with typed metadata.

Training-data-pipeline extension (SURVEY.md §7 M5): image/audio/video are
carried as ``binary`` columns plus a metadata struct; transforms run as
Arrow-batched ``mapInPandas`` so each Python batch touches thousands of
payloads with one serialization hop. The Spark-side plumbing (schema,
partitioning, batch shape) is real and tested; the media *decode* step is
stubbed behind NotImplementedError because codec libraries are not in
this container — slot a real decoder into ``decode_image_batch`` /
``sample_video_frames`` without touching the plan.

At 100 TB: payload columns dominate IO — keep them in their own parquet
column (column pruning skips them for metadata-only queries), partition by
content date/source, and size ``spark.sql.files.maxPartitionBytes`` so one
task's payload batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Arrow batch schema produced by byte_histogram_features.
_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, entropy double, feature array<double>"
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    With no media files in the container, the payload is the UTF-8 encoded
    document body — the schema/partitioning contract is identical for real
    image/audio bytes.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )


def byte_histogram_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: 16-bin byte
    histogram (normalized) + Shannon entropy. A real featurizer (CLIP,
    mel-spectrogram, ...) replaces the numpy body; the mapInPandas batch
    contract stays the same."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                total = hist.sum()
                p = hist / total if total else hist
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
                out.append((int(doc_id), int(arr.size), round(entropy, 6), (p.round(9)).tolist()))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "entropy", "feature"]
            )

    return binary_df.select("doc_id", "payload").mapInPandas(compute, _FEATURE_SCHEMA)


def decode_image_batch(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """Decode + resize images to (height, width, 3) uint8 tensors.

    STUB: image codecs (Pillow/opencv) are not available in this
    container. The plan-side contract — input (doc_id, payload), output
    (doc_id, pixels array<array<array<int>>>) — is what a real decoder
    plugs into.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this container; "
        "plug a decoder into the mapInPandas body (see byte_histogram_features "
        "for the batch contract)"
    )


def sample_video_frames(binary_df: DataFrame, every_n_seconds: float) -> DataFrame:
    """Sample frames from video payloads. STUB — see decode_image_batch."""
    raise NotImplementedError(
        "video frame sampling requires a codec library not present in this "
        "container; the mapInPandas batch contract matches byte_histogram_features"
    )
