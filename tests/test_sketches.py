"""Unit tests for the bloom-filter sketch (build/probe determinism and
the no-false-negative guarantee)."""

import hashlib

import pytest
from pyspark.sql import Row

from symtseries_spark.operators import bloom_build, bloom_probe

M_BITS, K = 256, 3


def _positions(val: str) -> list[int]:
    return [
        int(hashlib.md5(f"{val}:{i}".encode()).hexdigest()[:15], 16) % M_BITS
        for i in range(K)
    ]


def _ids(spark, ids):
    rows = [Row(x=int(i)) for i in ids]
    return (
        spark.createDataFrame(rows) if rows else spark.createDataFrame([], "x long")
    )


class TestBloom:
    def test_no_false_negatives(self, spark):
        build = list(range(0, 40, 2))
        bloom = bloom_build(_ids(spark, build), col="x", m_bits=M_BITS, k=K)
        probed = {
            r.x: r.bloom_hit
            for r in bloom_probe(
                _ids(spark, range(40)), bloom, col="x", m_bits=M_BITS, k=K
            ).collect()
        }
        for i in build:
            assert probed[i], f"false negative for {i}"

    def test_bits_match_reference_md5(self, spark):
        """The dense words must equal a pure-Python replay of the same
        md5 positions (engine-reproducibility is the whole point)."""
        build = [7, 11, 13]
        words = bloom_build(
            _ids(spark, build), col="x", m_bits=M_BITS, k=K
        ).first()["bloom"]
        expect = [0] * (M_BITS // 32)
        for v in build:
            for p in _positions(str(v)):
                expect[p // 32] |= 1 << (p % 32)
        assert list(words) == expect

    def test_probe_matches_python_membership(self, spark):
        build = [100, 200, 300]
        bloom = bloom_build(_ids(spark, build), col="x", m_bits=M_BITS, k=K)
        bits = set()
        for v in build:
            bits.update(_positions(str(v)))
        got = {
            r.x: r.bloom_hit
            for r in bloom_probe(
                _ids(spark, range(500)), bloom, col="x", m_bits=M_BITS, k=K
            ).collect()
        }
        for i in range(500):
            assert got[i] == all(p in bits for p in _positions(str(i)))

    def test_empty_build_set(self, spark):
        bloom = bloom_build(_ids(spark, []), col="x", m_bits=M_BITS, k=K)
        got = bloom_probe(
            _ids(spark, [1, 2]), bloom, col="x", m_bits=M_BITS, k=K
        ).collect()
        assert all(not r.bloom_hit for r in got)

    def test_m_bits_validation(self, spark):
        with pytest.raises(ValueError):
            bloom_build(_ids(spark, [1]), col="x", m_bits=100, k=K)
