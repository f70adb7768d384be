"""Tests for the driver-visible recall reporting queries
(simsearch.ann_lsh_recall / ivf_recall) and the embedding_near_dup
quarantine gate."""

import pytest

from symtseries_spark.operators.simsearch import (
    ann_lsh_recall,
    embedding_near_dup,
    ivf_recall,
)
from symtseries_spark.sources import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


class TestAnnRecall:
    def test_lsh_recall_shape_and_bounds(self, emb):
        rows = ann_lsh_recall(
            emb, max_query_id=4, k=5, num_planes=4, seed=13, dim=64
        ).collect()
        assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
        for r in rows:
            assert 0 <= r["n_hit"] <= r["n_approx"] <= 5 or r["n_approx"] >= 5
            assert 0.0 <= r["recall"] <= 1.0
            assert r["recall"] == pytest.approx(r["n_hit"] / 5, abs=1e-9)

    def test_multiprobe_dominates_single_bucket(self, emb):
        """Hamming-1 probing scans a strict superset of the single
        bucket, and a superset candidate pool can only displace an
        exact-top-k member with another exact-top-k member — so per-query
        hits are monotone in the probe radius."""
        single = {
            r["query_id"]: r["n_hit"]
            for r in ann_lsh_recall(
                emb, max_query_id=4, k=5, num_planes=4, seed=13, dim=64,
                probe_hamming=0,
            ).collect()
        }
        multi = {
            r["query_id"]: r["n_hit"]
            for r in ann_lsh_recall(
                emb, max_query_id=4, k=5, num_planes=4, seed=13, dim=64,
                probe_hamming=1,
            ).collect()
        }
        for qid, hits in single.items():
            assert multi[qid] >= hits

    def test_ivf_full_probe_recall_is_one(self, emb):
        """Probing every list scans the whole corpus -> the approximate
        top-k IS the exact top-k, recall exactly 1.0 for every query."""
        rows = ivf_recall(
            emb, max_query_id=4, k=5, num_lists=4, nprobe=4, dim=64
        ).collect()
        assert len(rows) == 4
        assert all(r["recall"] == 1.0 for r in rows)

    def test_ivf_partial_probe_bounds(self, emb):
        rows = ivf_recall(
            emb, max_query_id=4, k=5, num_lists=8, nprobe=2, dim=64
        ).collect()
        for r in rows:
            assert 0.0 <= r["recall"] <= 1.0


class TestNearDupQuarantine:
    def test_guard_raises_above_bound(self, emb):
        with pytest.raises(ValueError, match="quarantined"):
            embedding_near_dup(emb, threshold=0.4, max_rows=10)

    def test_guard_passes_at_validation_scale(self, emb):
        # default bound (50k) admits the validation tables
        df = embedding_near_dup(emb.limit(50), threshold=0.4)
        assert df.columns == ["vec_a", "vec_b", "cos"]


def test_version_surface():
    """L9 `sax.version()` parity surface (lua/lua_sax.c version export):
    the package exposes a semver string."""
    import symtseries_spark

    parts = symtseries_spark.__version__.split(".")
    assert len(parts) == 3 and all(p.isdigit() for p in parts)


def test_bench_segmentation_partitions_suite_exactly():
    """The segmented bench must run every timed query exactly once
    across its fresh-JVM segments (bench.py chunking math)."""
    import math
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    names = bench.timed_query_names()
    n_segments = max(1, math.ceil(len(names) / bench.SEGMENT_SIZE))
    seen = []
    for i in range(n_segments):
        seen.extend(names[i::n_segments])
    assert sorted(seen) == names  # striped cover, canonical order
    # r11: the brute-force baseline's registry entry was folded into
    # emb_near_dup_recall, so every registered query is bench-timed
    assert "emb_near_dup" not in names
    assert "emb_near_dup_recall" in names


class TestJaccardPrefix:
    def test_identical_to_full_index_plan(self, spark, sf_dir):
        """The prefix filter is lossless: pair set and every value must
        equal jaccard_pairs exactly (same cap, sizes, rounding)."""
        from symtseries_spark.operators import jaccard_pairs, jaccard_pairs_prefix
        from symtseries_spark.sources import load

        docs = load(spark, sf_dir, "documents")
        kw = dict(k=3, threshold=0.35, max_shingle_freq=256)
        full = {tuple(r) for r in jaccard_pairs(docs, **kw).collect()}
        pref = {tuple(r) for r in jaccard_pairs_prefix(docs, **kw).collect()}
        assert pref == full and len(full) > 0

    def test_low_threshold_still_lossless(self, spark, sf_dir):
        from symtseries_spark.operators import jaccard_pairs, jaccard_pairs_prefix
        from symtseries_spark.sources import load

        docs = load(spark, sf_dir, "documents").limit(120)
        kw = dict(k=2, threshold=0.1)
        full = {tuple(r) for r in jaccard_pairs(docs, **kw).collect()}
        pref = {tuple(r) for r in jaccard_pairs_prefix(docs, **kw).collect()}
        assert pref == full


class TestTruncatedDimRecall:
    def test_full_dim_is_perfect(self, emb):
        from symtseries_spark.operators.simsearch import truncated_dim_recall

        rows = truncated_dim_recall(
            emb, max_query_id=4, k=5, trunc_dim=64, dim=64
        ).collect()
        assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
        # trunc_dim == dim -> approx leg IS the exact leg
        assert all(r["recall"] == pytest.approx(1.0) for r in rows)

    def test_prefix_recall_bounded_and_monotone_ish(self, emb):
        from symtseries_spark.operators.simsearch import truncated_dim_recall

        r16 = truncated_dim_recall(
            emb, max_query_id=4, k=5, trunc_dim=16, dim=64
        ).collect()
        for r in r16:
            assert 0.0 <= r["recall"] <= 1.0
            assert r["n_approx"] == 5
            assert r["recall"] == pytest.approx(r["n_hit"] / 5, abs=1e-9)

    def test_param_guards(self, emb):
        from symtseries_spark.operators.simsearch import truncated_dim_recall

        with pytest.raises(ValueError):
            truncated_dim_recall(emb, max_query_id=4, k=5, trunc_dim=0)
        with pytest.raises(ValueError):
            truncated_dim_recall(emb, max_query_id=4, k=5, trunc_dim=65)
        with pytest.raises(ValueError):
            truncated_dim_recall(emb, max_query_id=4, k=0, trunc_dim=16)


class TestPqRecall:
    def test_shape_bounds_and_consistency(self, emb):
        from symtseries_spark.operators.pq import pq_recall

        rows = pq_recall(
            emb, max_query_id=4, k=5, m=4, ks=16, dim=64
        ).collect()
        assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
        for r in rows:
            assert r["n_approx"] == 5
            assert 0 <= r["n_hit"] <= 5
            assert r["recall"] == pytest.approx(r["n_hit"] / 5, abs=1e-9)

    def test_saturated_codebook_is_exact(self, emb):
        from symtseries_spark.operators.pq import pq_recall

        # ks >= |vectors|: every vector is its own centroid, so ADC
        # reproduces the exact distances and recall must be perfect
        n = emb.count()
        rows = pq_recall(
            emb, max_query_id=4, k=5, m=4, ks=n, dim=64
        ).collect()
        assert all(r["recall"] == pytest.approx(1.0) for r in rows)

    def test_param_guards(self, emb):
        from symtseries_spark.operators.pq import pq_recall

        with pytest.raises(ValueError):
            pq_recall(emb, max_query_id=0, k=5, m=4, ks=16, dim=64)
        with pytest.raises(ValueError):
            pq_recall(emb, max_query_id=4, k=0, m=4, ks=16, dim=64)


class TestKnnLabelAccuracy:
    def test_separable_clusters_recover_labels(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.simsearch import knn_label_accuracy

        # two tight, well-separated clusters: every panel point's
        # neighbors share its label
        rows = []
        for i in range(10):
            rows.append(Row(vec_id=i, embedding=[1.0 + 0.01 * i, 0.0], label=0))
            rows.append(Row(vec_id=10 + i, embedding=[0.0, 1.0 + 0.01 * i], label=1))
        df = spark.createDataFrame(rows)
        out = knn_label_accuracy(df, max_query_id=4, k=3).collect()
        assert len(out) == 4
        assert all(r.is_correct for r in out)
        assert all(r.n_votes == 3 for r in out)

    def test_vote_tiebreak_is_min_label(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.simsearch import knn_label_accuracy

        # query 0 with k=2: one neighbor of each label -> tie -> label 1
        # (the smaller label among the tied) must win deterministically
        df = spark.createDataFrame(
            [
                Row(vec_id=0, embedding=[1.0, 0.0], label=9),
                Row(vec_id=1, embedding=[1.0, 0.1], label=2),
                Row(vec_id=2, embedding=[1.0, -0.1], label=1),
                Row(vec_id=3, embedding=[-1.0, 0.0], label=5),
            ]
        )
        out = knn_label_accuracy(df, max_query_id=1, k=2).collect()[0]
        assert out.pred_label == 1
        assert out.n_votes == 1
        assert not out.is_correct

    def test_guards(self, emb):
        from symtseries_spark.operators.simsearch import knn_label_accuracy

        with pytest.raises(ValueError):
            knn_label_accuracy(emb, max_query_id=0, k=3)
        with pytest.raises(ValueError):
            knn_label_accuracy(emb, max_query_id=4, k=0)


class TestInt8Recall:
    def test_int8_is_near_lossless_here(self, emb):
        from symtseries_spark.operators.pq import int8_recall

        rows = int8_recall(emb, max_query_id=4, k=5).collect()
        assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
        # int8 keeps ~7 significant bits per component: ranking should
        # survive essentially intact on gaussian-ish embeddings
        assert sum(r["recall"] for r in rows) / 4 >= 0.8

    def test_zero_vector_is_excluded_from_candidates(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.pq import int8_recall

        df = spark.createDataFrame(
            [
                Row(vec_id=0, embedding=[1.0, 0.5]),
                Row(vec_id=1, embedding=[0.9, 0.6]),
                Row(vec_id=2, embedding=[0.0, 0.0]),  # NaN cosine
                Row(vec_id=3, embedding=[0.8, 0.4]),
            ]
        )
        rows = int8_recall(df, max_query_id=1, k=2).collect()
        assert len(rows) == 1
        # the zero vector must not rank (NaN sorts first desc in Spark)
        assert rows[0]["n_approx"] == 2 and rows[0]["recall"] > 0

    def test_guards(self, emb):
        from symtseries_spark.operators.pq import int8_recall

        with pytest.raises(ValueError):
            int8_recall(emb, max_query_id=0, k=5)


class TestJlRecall:
    def test_signs_deterministic_and_pm1(self):
        from symtseries_spark.operators.simsearch import jl_signs

        a = jl_signs(8, 64)
        b = jl_signs(8, 64)
        assert a == b
        assert len(a) == 8 and all(len(r) == 64 for r in a)
        assert all(s in (-1, 1) for r in a for s in r)
        # roughly balanced signs (md5 parity): not all one sign per row
        assert all(-64 < sum(r) < 64 for r in a)
        # tag changes the matrix
        assert jl_signs(8, 64, tag="jl2") != a

    def test_project_matches_numpy(self, spark, emb):
        import numpy as np

        from symtseries_spark.operators.simsearch import jl_project, jl_signs

        rows = (
            jl_project(emb, out_dim=6, dim=64)
            .join(emb.select("vec_id", "embedding"), "vec_id")
            .orderBy("vec_id")
            .limit(10)
            .collect()
        )
        S = np.array(jl_signs(6, 64), dtype=np.float64)
        for r in rows:
            x = np.array(r["embedding"], dtype=np.float64)
            np.testing.assert_allclose(
                np.array(r["jl"]), S @ x, rtol=0, atol=1e-9
            )

    def test_recall_shape_and_bounds(self, emb):
        from symtseries_spark.operators.simsearch import jl_recall

        rows = jl_recall(emb, max_query_id=4, k=5, out_dim=16, dim=64).collect()
        assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
        for r in rows:
            # the projected scan ranks the full corpus, so it always
            # fills k candidates; hits are bounded by k
            assert r["n_approx"] == 5
            assert 0 <= r["n_hit"] <= 5
            assert r["recall"] == pytest.approx(r["n_hit"] / 5, abs=1e-9)

    def test_full_width_projection_is_lossless_ranking(self, emb):
        """out_dim == dim random signs form (almost surely) a full-rank
        rotation-like map; with out_dim == dim = 64 the projection is a
        bijection of R^64, but cosine is NOT preserved by a non-
        orthogonal map — so instead check the cheap invariant: recall in
        the projected space improves (weakly) as out_dim grows, on
        average over the panel."""
        from symtseries_spark.operators.simsearch import jl_recall

        lo = jl_recall(emb, max_query_id=4, k=5, out_dim=4, dim=64).collect()
        hi = jl_recall(emb, max_query_id=4, k=5, out_dim=48, dim=64).collect()
        avg = lambda rows: sum(r["recall"] for r in rows) / len(rows)
        assert avg(hi) >= avg(lo)


class TestJlLinearity:
    def test_exact_linearity_on_integer_vectors(self, spark):
        """With integer-valued inputs the +-1 projection is exact
        integer arithmetic in doubles: proj(a + b) == proj(a) + proj(b)
        componentwise, bit-for-bit."""
        from pyspark.sql import functions as F

        from symtseries_spark.operators.simsearch import jl_project

        rows = [
            (0, [float(i % 7) for i in range(16)]),
            (1, [float((i * 3) % 5) for i in range(16)]),
            (2, [float((i % 7) + (i * 3) % 5) for i in range(16)]),  # 0 + 1
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = {
            r["vec_id"]: r["jl"]
            for r in jl_project(df, out_dim=6, dim=16).collect()
        }
        assert [a + b for a, b in zip(got[0], got[1])] == got[2]


class TestIVFBatch:
    def test_full_probe_equals_brute_force_per_query(self, spark):
        import random

        from symtseries_spark.operators.simsearch import ivf_topk_batch

        rng = random.Random(5)
        rows = [
            (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        queries = df.where("vec_id % 10 = 1")  # 1, 11, 21
        got = ivf_topk_batch(
            df, queries, k=4, num_lists=5, nprobe=5, dim=8, round_to=6
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.d2, r.vec_id))
        vecs = dict(rows)
        for qid in (1, 11, 21):
            want = sorted(
                (
                    round(
                        sum(
                            (a - b) ** 2
                            for a, b in zip(vecs[qid], v)
                        ),
                        6,
                    ),
                    i,
                )
                for i, v in rows
                if i != qid
            )[:4]
            assert by_q[qid] == want
        with pytest.raises(ValueError, match="k >= 1"):
            ivf_topk_batch(df, queries, k=0, num_lists=5, nprobe=1, dim=8)
