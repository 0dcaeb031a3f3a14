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


def test_decode_stubs_raise(bin_df):
    with pytest.raises(NotImplementedError):
        decode_image_batch(bin_df, 224, 224)
    with pytest.raises(NotImplementedError):
        sample_video_frames(bin_df, 1.0)
