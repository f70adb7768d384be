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

    def test_hot_bucket_fail_fast(self, spark):
        # the seg_cap convention for the perceptual modality: a
        # (band, chunk) bucket above max_bucket means the candidate
        # self-join is quadratic in that population — raise BEFORE
        # attempting it. Identical payloads share every bucket, so 5
        # copies overflow max_bucket=4.
        import pytest as _pytest

        from symtseries_spark.operators.multimodal import (
            dhash_pairs,
            media_from_documents,
        )

        docs = spark.createDataFrame(
            [(i, "the same constant payload every time") for i in range(5)],
            "doc_id long, text string",
        )
        media = media_from_documents(docs)
        with _pytest.raises(ValueError, match="max_bucket"):
            dhash_pairs(media, max_hamming=3, max_bucket=4)
        # under the cap the same call plans and returns all 10 pairs
        got = dhash_pairs(media, max_hamming=3, max_bucket=5).collect()
        assert len(got) == 10 and all(r["hamming"] == 0 for r in got)

    def test_planted_twin_registration(self, spark):
        # the registered media_dhash_pairs corpus plants 1-byte
        # perturbation twins; with len >= 63 each dhash sample offset
        # is unique, so every (base, base + TWIN_OFF) pair lands
        # within hamming <= 1 and the scale-sane radius finds it
        import __spark_entry__ as entry_mod

        got = entry_mod.queries()["media_dhash_pairs"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        off = entry_mod.DHASH_TWIN_OFF
        planted = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in got
            if r["media_b"] >= off
        }
        assert planted, "planting produced no twin pairs"
        assert all(
            b == a + off and h <= 1 for (a, b), h in planted.items()
        )

    def test_wide_hash_pack_equivalence_and_pairs(self, spark):
        # media_dhash_wide at the packed geometry (7x9) must agree
        # word-for-word with media_dhash's single BIGINT, and
        # dhash_pairs_wide must find exactly the brute-force pairs
        import pytest as _pytest

        from symtseries_spark.operators.multimodal import (
            dhash_pairs_wide,
            media_dhash,
            media_dhash_wide,
            media_from_documents,
        )

        texts = [
            "aaaa bbbb cccc dddd eeee ffff gggg hhhh",
            "aaaa bbbb cccc dddd eeee ffff gggg hhhx",
            "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss",
            "aaaa bbbb cccc dddd eeee ffff extra tail here",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        media = media_from_documents(docs)
        packed = {
            r["media_id"]: r["dhash"] for r in media_dhash(media).collect()
        }
        wide7 = {
            r["media_id"]: r["dhash_rows"]
            for r in media_dhash_wide(media, rows=7, cols=9).collect()
        }
        for i, words in wide7.items():
            assert packed[i] == sum(w << (8 * j) for j, w in enumerate(words))
        # 13x9 brute-force parity at radius 12
        wide = {
            r["media_id"]: r["dhash_rows"]
            for r in media_dhash_wide(media).collect()
        }

        def ham(a, b):
            return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

        want = {
            (a, b, ham(wide[a], wide[b]))
            for a in wide
            for b in wide
            if a < b and ham(wide[a], wide[b]) <= 12
        }
        got = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in dhash_pairs_wide(media, max_hamming=12).collect()
        }
        assert got == want
        with _pytest.raises(ValueError, match="pigeonhole"):
            dhash_pairs_wide(media, max_hamming=13, rows=13)
        # identical payloads overflow the hot-bucket cap
        dups = media_from_documents(
            spark.createDataFrame(
                [(i, "constant payload") for i in range(4)],
                "doc_id long, text string",
            )
        )
        with _pytest.raises(ValueError, match="max_bucket"):
            dhash_pairs_wide(dups, max_hamming=12, max_bucket=3)

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
