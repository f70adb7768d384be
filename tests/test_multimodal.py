"""Multimodal plumbing tests: schema, batching, and determinism of the
binary-payload operators (decode itself is stubbed — no media libs here)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators.multimodal import (
    FEATURE_DIM,
    byte_histogram,
    decode_media,
    fake_decode_features,
    frame_sample,
    media_from_documents,
)

DOCS = [
    (0, "abcabc"),
    (1, "A" * 100),
    (2, ""),
]


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    return media_from_documents(docs)


class TestMediaSchema:
    def test_schema_and_payload(self, media_df):
        assert [f.name for f in media_df.schema.fields] == [
            "media_id", "kind", "payload", "meta",
        ]
        rows = {r.media_id: r for r in media_df.collect()}
        assert bytes(rows[0].payload) == b"abcabc"
        assert rows[1].meta.content_length == 100
        assert rows[0].kind == "text"


class TestByteHistogram:
    def test_counts(self, media_df):
        out = {
            (r.media_id, r.bin): r.cnt
            for r in byte_histogram(media_df, bins=16).collect()
        }
        # 'a'=97,'b'=98,'c'=99 -> bin 6; 'A'=65 -> bin 4
        assert out[(0, 6)] == 6
        assert out[(1, 4)] == 100
        # empty payload yields no rows
        assert not any(mid == 2 for mid, _ in out)

    def test_bins_must_divide(self, media_df):
        with pytest.raises(ValueError):
            byte_histogram(media_df, bins=7)


class TestFrameSample:
    def test_frames_and_stride(self, media_df):
        out = frame_sample(media_df, frame_size=30, every_n=2).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.media_id, {})[r.frame_no] = bytes(r.frame)
        # doc 1: 100 bytes -> frames 0..3, stride 2 keeps 0 and 2
        assert sorted(by_id[1]) == [0, 2]
        assert by_id[1][0] == b"A" * 30
        # doc 0: 6 bytes -> single partial frame
        assert by_id[0] == {0: b"abcabc"}


class TestDecode:
    def test_raises_without_decoder(self, media_df):
        with pytest.raises(NotImplementedError):
            decode_media(media_df)  # PIL not installed here

    def test_fake_features_deterministic(self, media_df):
        rows = {
            r.media_id: r.features
            for r in decode_media(media_df, allow_fake=True).collect()
        }
        digest = hashlib.md5(b"abcabc").digest()
        assert rows[0] == [b / 255.0 for b in digest[:FEATURE_DIM]]
        assert fake_decode_features(b"abcabc") == rows[0]
        assert len(rows[1]) == FEATURE_DIM
