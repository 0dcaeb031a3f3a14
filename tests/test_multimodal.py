"""Multimodal binary-column plumbing: schema, batch contract, stubs."""

import pytest

from delfos_etl_pipeline_spark.multimodal.binary import (
    attach_binary_payload,
    byte_histogram_features,
    decode_image_batch,
    sample_video_frames,
)
from delfos_etl_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bin_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return attach_binary_payload(docs, "doc_id", "text")


def test_payload_schema(bin_df):
    s = dict((f.name, f.dataType.simpleString()) for f in bin_df.schema.fields)
    assert s["payload"] == "binary"
    assert s["meta"] == "struct<n_bytes:int,mime:string>"


def test_byte_histogram_contract(bin_df):
    feats = byte_histogram_features(bin_df).collect()
    assert len(feats) == bin_df.count()
    for r in feats[:20]:
        assert len(r.feature) == 16
        assert sum(r.feature) == pytest.approx(1.0, abs=1e-6)
        assert 0.0 <= r.entropy <= 4.0  # 16 bins → max 4 bits
        assert r.n_bytes > 0
        assert len(r.counts) == 16 and sum(r.counts) == r.n_bytes
        for c, p in zip(r.counts, r.feature):
            assert p == pytest.approx(c / r.n_bytes, abs=1e-8)


def test_decode_image_batch_contract(bin_df):
    """Fake-decode + REAL resize: every payload becomes a 64×48×3 uint8
    tensor, deterministically (same payload → same bytes)."""
    import numpy as np

    out = decode_image_batch(bin_df.limit(20), width=48, height=64)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.height, r.width, r.channels) == (64, 48, 3)
        assert len(r.pixels) == 64 * 48 * 3
        np.frombuffer(r.pixels, dtype=np.uint8).reshape(64, 48, 3)
    again = {r.doc_id: r.pixels for r in
             decode_image_batch(bin_df.limit(20), width=48, height=64).collect()}
    assert all(again[r.doc_id] == r.pixels for r in rows)


def test_decode_custom_decoder_plugs_in(bin_df):
    """The decoder= seam: a custom codec changes pixels, not the plan."""
    import numpy as np

    white = lambda payload: np.full((8, 8, 3), 255, dtype=np.uint8)
    rows = decode_image_batch(bin_df.limit(3), 4, 4, decoder=white).collect()
    assert all(set(r.pixels) == {255} and len(r.pixels) == 4 * 4 * 3 for r in rows)


def test_sample_video_frames_fanout(bin_df):
    """One input row fans out to ceil(n_frames/stride) frame rows with
    monotone timestamps; stride follows every_n_seconds*fps."""
    out = sample_video_frames(bin_df.limit(10), every_n_seconds=0.1, fps=30.0)
    rows = out.collect()
    assert len(rows) >= 10  # fan-out: at least one frame per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert len(r.pixels) == 32 * 32 * 3
        assert r.ts_sec == pytest.approx(r.frame_idx / 30.0, abs=1e-6)
    for frames in by_doc.values():
        idxs = sorted(f.frame_idx for f in frames)
        assert all(b - a == 3 for a, b in zip(idxs, idxs[1:]))  # stride 3
