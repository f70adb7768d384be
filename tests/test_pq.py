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


class TestIVFPQ:
    def test_full_probe_equals_pq_topk(self, spark, sf_dir):
        """With nprobe == num_lists every vector is a candidate, so the
        IVF+PQ composition must return exactly pq_topk's ADC top-k."""
        from symtseries_spark.operators.pq import ivfpq_topk, pq_topk
        from symtseries_spark.sources import load

        vecs = load(spark, sf_dir, "embeddings")
        full = ivfpq_topk(
            vecs, query_id=3, k=10, m=4, ks=16, num_lists=8, nprobe=8,
            dim=64,
        ).collect()
        want = pq_topk(
            vecs, query_id=3, k=10, m=4, ks=16, dim=64
        ).collect()
        assert [(r["vec_id"], r["adc"]) for r in full] == [
            (r["vec_id"], r["adc"]) for r in want
        ]

    def test_partial_probe_subset(self, spark, sf_dir):
        """Partial probe returns a subset of the candidates' ADC order:
        every returned id must carry the same ADC the full table gives
        it, and ranks ascend."""
        from symtseries_spark.operators.pq import ivfpq_topk, pq_topk
        from symtseries_spark.sources import load

        vecs = load(spark, sf_dir, "embeddings")
        part = ivfpq_topk(
            vecs, query_id=3, k=10, m=4, ks=16, num_lists=8, nprobe=2,
            dim=64,
        ).collect()
        assert 0 < len(part) <= 10
        adcs = [r["adc"] for r in part]
        assert adcs == sorted(adcs)
        full_map = {
            r["vec_id"]: r["adc"]
            for r in pq_topk(
                vecs, query_id=3, k=500, m=4, ks=16, dim=64
            ).collect()
        }
        for r in part:
            assert full_map[r["vec_id"]] == r["adc"]

    def test_full_probe_recall_equals_pq_recall(self, spark, sf_dir):
        """With nprobe == num_lists the coarse stage prunes nothing,
        so ivfpq_recall must reproduce pq_recall row for row; a
        partial probe can only lose candidates (n_hit <= full's)."""
        from symtseries_spark.operators.pq import ivfpq_recall, pq_recall
        from symtseries_spark.sources import load

        vecs = load(spark, sf_dir, "embeddings")
        full = ivfpq_recall(
            vecs, max_query_id=5, k=8, m=4, ks=16, num_lists=8,
            nprobe=8, dim=64,
        ).orderBy("query_id").collect()
        want = pq_recall(
            vecs, max_query_id=5, k=8, m=4, ks=16, dim=64
        ).orderBy("query_id").collect()
        assert [tuple(r) for r in full] == [tuple(r) for r in want]
        part = {
            r["query_id"]: r
            for r in ivfpq_recall(
                vecs, max_query_id=5, k=8, m=4, ks=16, num_lists=8,
                nprobe=2, dim=64,
            ).collect()
        }
        for f in full:
            p = part[f["query_id"]]
            assert p["n_approx"] <= f["n_approx"]
            assert 0.0 <= p["recall"] <= 1.0

    def test_validation(self, spark):
        import pytest as _pytest

        from symtseries_spark.operators.pq import ivfpq_topk

        df = spark.createDataFrame(
            [(0, [0.0] * 64)], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="divisible"):
            ivfpq_topk(
                df, query_id=0, k=1, m=3, ks=4, num_lists=2, nprobe=1,
                dim=64,
            )
        # nprobe < 1 would silently probe zero lists -> empty result
        with _pytest.raises(ValueError, match="nprobe"):
            ivfpq_topk(
                df, query_id=0, k=1, m=4, ks=4, num_lists=2, nprobe=0,
                dim=64,
            )


class TestIVFPQResidual:
    def _toy(self, spark, n=24, dim=8):
        import random

        rng = random.Random(11)
        rows = [
            (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
            for i in range(n)
        ]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_exact_when_ks_covers_corpus(self, spark):
        """With ks >= N every residual is its own codeword, so the
        encoding is lossless and ADC(v) = ||(q-c) - (v-c)||^2 =
        ||q - v||^2 exactly: full-probe residual IVFPQ == brute-force
        top-k by squared L2."""
        from symtseries_spark.operators.pq import ivfpq_residual_topk

        rows, df = self._toy(spark)
        got = ivfpq_residual_topk(
            df, query_id=0, k=5, m=2, ks=24, num_lists=4, nprobe=4,
            dim=8, round_to=6,
        ).collect()
        qv = dict(rows)[0]

        def d2(v):
            return sum((a - b) ** 2 for a, b in zip(qv, v))

        want = sorted(
            (round(d2(v), 6), i) for i, v in rows if i != 0
        )[:5]
        assert [(r.adc, r.vec_id) for r in got] == want

    def test_residual_codes_differ_from_raw(self, spark):
        """Residual encoding is a genuinely different quantizer: with
        a lossy budget (ks < N) at least one vector's codes differ
        from the raw-vector encoding."""
        from symtseries_spark.operators.pq import pq_codebook, pq_encode
        from symtseries_spark.operators.simsearch import ivf_index

        rows, df = self._toy(spark)
        assigned, centroids = ivf_index(
            df, num_lists=4, dim=8, refine=False
        )
        res = (
            df.select("vec_id", F.col("embedding").alias("__v"))
            .join(assigned.select("vec_id", "list_id"), "vec_id")
            .join(F.broadcast(centroids), "list_id")
            .select(
                "vec_id",
                F.zip_with(
                    "__v", "centroid", lambda a, b: a - b
                ).alias("__rv"),
            )
        )
        raw_cb = pq_codebook(df, m=2, ks=4, dim=8)
        raw = {
            r.vec_id: list(r.codes)
            for r in pq_encode(df, raw_cb, m=2, dim=8).collect()
        }
        res_cb = pq_codebook(res, m=2, ks=4, dim=8, vec_col="__rv")
        rescodes = {
            r.vec_id: list(r.codes)
            for r in pq_encode(
                res, res_cb, m=2, dim=8, vec_col="__rv"
            ).collect()
        }
        assert raw != rescodes

    def test_partial_probe_subset_and_validation(self, spark):
        from symtseries_spark.operators.pq import ivfpq_residual_topk

        _, df = self._toy(spark)
        full = {
            r.vec_id
            for r in ivfpq_residual_topk(
                df, query_id=0, k=24, m=2, ks=8, num_lists=4, nprobe=4,
                dim=8,
            ).collect()
        }
        part = {
            r.vec_id
            for r in ivfpq_residual_topk(
                df, query_id=0, k=24, m=2, ks=8, num_lists=4, nprobe=1,
                dim=8,
            ).collect()
        }
        assert part <= full and part
        with pytest.raises(ValueError, match="nprobe"):
            ivfpq_residual_topk(
                df, query_id=0, k=1, m=2, ks=4, num_lists=2, nprobe=0,
                dim=8,
            )

    def test_carry_columns_identical_codes(self, spark):
        """The r12 carry= passthrough: carrying a column functionally
        dependent on the id (the IVF list_id of an assigned row) must
        not change any group — codes are bit-identical to the
        carry-free encode joined back to the assignment."""
        from symtseries_spark.operators.pq import pq_codebook, pq_encode
        from symtseries_spark.operators.simsearch import ivf_index

        _, df = self._toy(spark)
        assigned, _ = ivf_index(df, num_lists=4, dim=8, refine=False)
        cb = pq_codebook(df, m=2, ks=4, dim=8)
        plain = {
            r.vec_id: list(r.codes)
            for r in pq_encode(df, cb, m=2, dim=8).collect()
        }
        lists = {
            r.vec_id: r.list_id
            for r in assigned.select("vec_id", "list_id").collect()
        }
        carried = pq_encode(
            assigned, cb, m=2, dim=8, carry=("list_id",)
        ).collect()
        assert {r.vec_id: list(r.codes) for r in carried} == plain
        assert {r.vec_id: r.list_id for r in carried} == lists
