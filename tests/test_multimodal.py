"""Multimodal plumbing: binary columns + mapInPandas batch shapes."""

from __future__ import annotations

import pytest

from geo_db_spark.io import load
from geo_db_spark.operators.multimodal import (
    N_FEATURES,
    decode_image,
    extract_features,
    fake_decode_meta,
    frame_sample,
    with_binary_payload,
)
from tests.conftest import SF_SMOKE


def test_binary_payload_schema(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(20)
    media = with_binary_payload(docs)
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_extract_features_batched(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(50)
    feats = extract_features(with_binary_payload(docs)).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["features"]) == N_FEATURES
        assert r["batch_rows"] >= 1
    # deterministic across runs
    again = extract_features(with_binary_payload(docs)).collect()
    assert sorted((r["doc_id"], tuple(r["features"])) for r in feats) == sorted(
        (r["doc_id"], tuple(r["features"])) for r in again
    )


def test_frame_sample_explodes_rows(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(5)
    media = with_binary_payload(docs)
    frames = frame_sample(media, every_n_bytes=64)
    got = frames.groupBy("doc_id").count().collect()
    sizes = {r["doc_id"]: r["meta"]["n_bytes"] for r in media.collect()}
    for r in got:
        expected = (sizes[r["doc_id"]] + 63) // 64
        assert r["count"] == expected


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    assert fake_decode_meta(b"abc") == (4, 4, "fake")
