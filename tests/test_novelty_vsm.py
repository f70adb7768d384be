"""Tests for decontam.novelty_scores and search.vsm_series_pairs."""

import pytest
from pyspark.sql import functions as F

from symtseries_spark.operators.decontam import novelty_scores
from symtseries_spark.operators.search import vsm_series_pairs


class TestNovelty:
    def test_first_doc_fully_novel_duplicate_not(self, spark):
        df = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta"),
                (1, "alpha beta gamma delta"),          # exact dup of 0
                (2, "epsilon zeta eta theta"),          # all fresh
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in novelty_scores(df, k=2).collect()}
        assert out[0]["novelty_ratio"] == 1.0
        assert out[1]["novelty_ratio"] == 0.0
        assert out[2]["novelty_ratio"] == 1.0
        assert out[1]["total_shingles"] == out[0]["total_shingles"]

    def test_short_docs_unscored(self, spark):
        df = spark.createDataFrame(
            [(0, "one"), (1, "two words here")], "doc_id long, text string"
        )
        ids = {r["doc_id"] for r in novelty_scores(df, k=3).collect()}
        assert ids == {1}

    def test_partial_overlap(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c x")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in novelty_scores(df, k=2).collect()}
        # doc1 shingles: "a b" (seen), "b c" (seen), "c x" (novel)
        assert out[1]["novel_shingles"] == 1
        assert out[1]["total_shingles"] == 3


class TestVsmPairs:
    def test_identical_series_most_similar(self, spark):
        pat = [1.0, 5.0, 2.0, 6.0, 1.0, 5.0, 2.0, 6.0]
        flat = [3.0, 3.1, 2.9, 3.0, 3.2, 2.8, 3.0, 3.1]
        rows = []
        for sid, series in ((1, pat * 4), (2, pat * 4), (3, flat * 4)):
            rows += [(sid, i, v) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = vsm_series_pairs(
            df, key="user_id", order="ts", value="value",
            n=8, w=4, c=4, df_cap=200, top=10,
        ).collect()
        assert out, "expected at least one pair"
        assert (out[0]["series_a"], out[0]["series_b"]) == (1, 2)
        assert out[0]["cos_sim"] == pytest.approx(1.0, abs=1e-6)

    def test_df_cap_prunes_universal_words(self, spark):
        """With df_cap=1 every word shared by 2+ series is pruned, so
        no pair can have any shared word -> empty output."""
        pat = [1.0, 5.0, 2.0, 6.0] * 8
        rows = [(s, i, v) for s in (1, 2) for i, v in enumerate(pat)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = vsm_series_pairs(
            df, key="user_id", order="ts", value="value",
            n=8, w=4, c=4, df_cap=1, top=10,
        ).collect()
        assert out == []

    def test_cos_bounds_and_order(self, spark, sf_dir):
        from symtseries_spark.sources import load

        out = vsm_series_pairs(
            load(spark, sf_dir, "events"),
            key="user_id", order=["ts", "event_id"], value="value",
            n=8, w=4, c=4, df_cap=200, top=20,
        ).collect()
        sims = [r["cos_sim"] for r in out]
        assert all(-1.000001 <= s <= 1.000001 for s in sims)
        assert sims == sorted(sims, reverse=True)


class TestCharEntropy:
    def test_closed_forms(self, spark):
        from symtseries_spark.operators.retrieval import char_entropy

        import math

        df = spark.createDataFrame(
            [
                (0, "aaaa"),            # zero entropy
                (1, "abab"),            # ln 2
                (2, "abcd"),            # ln 4
                (3, ""),                # unscored
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in char_entropy(df).collect()}
        assert 3 not in out
        assert out[0]["char_entropy"] == 0.0
        assert abs(out[1]["char_entropy"] - math.log(2)) < 1e-6
        assert abs(out[2]["char_entropy"] - math.log(4)) < 1e-6
        assert out[2]["distinct_chars"] == 4 and out[2]["n_chars"] == 4

    def test_bounded_by_log_alphabet(self, spark, sf_dir):
        from symtseries_spark.operators.retrieval import char_entropy
        from symtseries_spark.sources import load

        import math

        for r in char_entropy(load(spark, sf_dir, "documents")).collect():
            assert -1e-9 <= r["char_entropy"] <= math.log(r["distinct_chars"]) + 1e-6
