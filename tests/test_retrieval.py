"""Tests for retrieval.hybrid_rrf_topk — the reciprocal-rank-fusion
hybrid of the BM25 lexical leg and the cosine semantic leg."""

import pytest

from symtseries_spark.operators.retrieval import hybrid_rrf_topk
from symtseries_spark.sources import load


@pytest.fixture(scope="module")
def tiny(spark):
    """Five docs with 1:1 vectors; doc 0 is the probe. Lexical order
    for query 'apple': 4 > 1 > 2 > 3; semantic order vs [1, 0]:
    3 > 2 > 1 > 4."""
    docs = spark.createDataFrame(
        [
            (0, "probe text"),
            (1, "apple apple"),
            (2, "apple"),
            (3, "banana"),
            (4, "apple apple apple"),
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.01]),
            (3, [1.0, 0.0]),
            (4, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    return docs, vecs


class TestHybridRrf:
    def test_hand_computed_fusion(self, tiny):
        docs, vecs = tiny
        rows = hybrid_rrf_topk(
            docs, vecs, terms=["apple"], query_vec_id=0, n_leg=2, k=3
        ).collect()
        got = [(r["doc_id"], r["r_lex"], r["r_sem"]) for r in rows]
        # legs: lex top-2 = {4: 1, 1: 2}; sem top-2 = {3: 1, 2: 2}
        # fused: 3 and 4 tie at 1/61 (id tiebreak), then 1 and 2 tie
        # at 1/62 (id tiebreak) -> k=3 keeps doc 1
        assert got == [(3, 0, 1), (4, 1, 0), (1, 2, 0)]
        by_id = {r["doc_id"]: r["rrf_score"] for r in rows}
        assert by_id[3] == pytest.approx(1.0 / 61, abs=1e-6)
        assert by_id[1] == pytest.approx(1.0 / 62, abs=1e-6)

    def test_probe_doc_excluded_from_both_legs(self, tiny):
        docs, vecs = tiny
        rows = hybrid_rrf_topk(
            docs, vecs, terms=["probe"], query_vec_id=0, n_leg=4, k=5
        ).collect()
        assert all(r["doc_id"] != 0 for r in rows)

    def test_rrf_score_law_on_real_tables(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        vecs = load(spark, sf_dir, "embeddings")
        rows = hybrid_rrf_topk(
            docs, vecs, terms=["hash", "join"], query_vec_id=0,
            n_leg=10, k=15,
        ).collect()
        assert 0 < len(rows) <= 15
        for r in rows:
            want = (1.0 / (60 + r["r_lex"]) if r["r_lex"] else 0.0) + (
                1.0 / (60 + r["r_sem"]) if r["r_sem"] else 0.0
            )
            assert r["rrf_score"] == pytest.approx(want, abs=1e-6)
            assert 0 <= r["r_lex"] <= 10 and 0 <= r["r_sem"] <= 10
            assert r["r_lex"] or r["r_sem"]
        # descending fused score, doc_id tiebreak
        keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
