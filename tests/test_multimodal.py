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


class TestDhash:
    def test_identical_payloads_hash_equal(self, spark):
        from symtseries_spark.operators.multimodal import (
            dhash_pairs,
            media_dhash,
            media_from_documents,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "a completely different payload with other bytes"),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        media = media_from_documents(docs)
        h = {r["media_id"]: r["dhash"] for r in media_dhash(media).collect()}
        assert h[1] == h[2]
        assert h[1] != h[3]
        assert 4 not in h  # empty payload dropped
        assert all(0 <= v < (1 << 56) for v in h.values())
        pairs = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in dhash_pairs(media, max_hamming=3).collect()
        }
        assert pairs[(1, 2)] == 0

    def test_pigeonhole_validation(self, spark):
        import pytest as _pytest

        from symtseries_spark.operators.multimodal import (
            dhash_pairs,
            media_from_documents,
        )

        docs = spark.createDataFrame(
            [(1, "abc")], "doc_id long, text string"
        )
        with _pytest.raises(ValueError, match="pigeonhole"):
            dhash_pairs(
                media_from_documents(docs), max_hamming=4, bands=4
            )

    def test_pairs_match_brute_force(self, spark):
        # banding must find EVERY pair within the bound (pigeonhole)
        from symtseries_spark.operators.multimodal import (
            dhash_pairs,
            media_dhash,
            media_from_documents,
        )

        texts = [
            "aaaa bbbb cccc dddd eeee ffff",
            "aaaa bbbb cccc dddd eeee fffg",
            "aaaa bbbb cccc dddd eeff ffff",
            "zzzz yyyy xxxx wwww vvvv uuuu",
            "aaaa bbbb cccc dddd eeee ffff extra tail here",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        media = media_from_documents(docs)
        h = {r["media_id"]: r["dhash"] for r in media_dhash(media).collect()}
        want = {
            (a, b): bin(h[a] ^ h[b]).count("1")
            for a in h
            for b in h
            if a < b and bin(h[a] ^ h[b]).count("1") <= 3
        }
        got = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in dhash_pairs(media, max_hamming=3).collect()
        }
        assert got == want
