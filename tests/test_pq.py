"""Unit tests for product quantization (operators/pq.py)."""

import pytest
from pyspark.sql import functions as F

from symtseries_spark.operators.pq import pq_codebook, pq_encode, pq_topk
from symtseries_spark.operators.simsearch import _sq_l2
from symtseries_spark.sources import load

M, KS, DIM, K = 4, 16, 64, 20


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


class TestPQ:
    def test_codebook_shape(self, spark, vectors):
        cb = pq_codebook(vectors, m=M, ks=KS, dim=DIM).collect()
        assert len(cb) == M * KS
        assert {(r.sub_id, r.code) for r in cb} == {
            (s, c) for s in range(M) for c in range(KS)
        }
        assert all(len(r.centroid) == DIM // M for r in cb)

    def test_codes_valid_and_deterministic(self, spark, vectors):
        cb = pq_codebook(vectors, m=M, ks=KS, dim=DIM)
        a = {r.vec_id: list(r.codes) for r in pq_encode(vectors, cb, m=M, dim=DIM).collect()}
        b = {r.vec_id: list(r.codes) for r in pq_encode(vectors, cb, m=M, dim=DIM).collect()}
        assert a == b
        assert all(len(c) == M and all(0 <= x < KS for x in c) for c in a.values())

    def test_duplicate_vectors_same_codes(self, spark, vectors):
        dup = vectors.limit(5).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        )
        both = vectors.limit(5).union(dup)
        cb = pq_codebook(vectors, m=M, ks=KS, dim=DIM)
        codes = {r.vec_id: list(r.codes) for r in pq_encode(both, cb, m=M, dim=DIM).collect()}
        for vid in list(codes):
            if vid >= 1_000_000:
                assert codes[vid] == codes[vid - 1_000_000]

    def test_recall_vs_brute_force(self, spark, vectors):
        qid = 3
        pq_ids = {
            r.vec_id
            for r in pq_topk(vectors, query_id=qid, k=K, m=M, ks=KS, dim=DIM).collect()
        }
        q = vectors.where(F.col("vec_id") == qid).select(
            F.col("embedding").cast("array<double>").alias("qv")
        )
        exact = {
            r.vec_id
            for r in vectors.crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != qid)
            .select(
                "vec_id",
                _sq_l2(
                    F.col("embedding").cast("array<double>"), F.col("qv")
                ).alias("d2"),
            )
            .orderBy("d2", "vec_id")
            .limit(K)
            .collect()
        }
        assert len(pq_ids & exact) / K >= 0.25

    def test_adc_ascending(self, spark, vectors):
        rows = pq_topk(vectors, query_id=0, k=K, m=M, ks=KS, dim=DIM).collect()
        adcs = [r.adc for r in rows]
        assert adcs == sorted(adcs) and len(rows) == K

    def test_dim_validation(self, spark, vectors):
        with pytest.raises(ValueError):
            pq_codebook(vectors, m=5, ks=KS, dim=DIM)
