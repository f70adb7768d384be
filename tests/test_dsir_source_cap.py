"""Tests for operators/pipeline.py: dsir_logweights and source_cap."""

import pytest
from pyspark.sql import functions as F

from symtseries_spark.operators.pipeline import dsir_logweights, source_cap
from symtseries_spark.sources import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


class TestDsir:
    def test_shape_and_determinism(self, docs):
        out = dsir_logweights(docs, n_buckets=256).collect()
        n_with_tokens = docs.where(
            F.size(F.split(F.lower("text"), "[^a-z0-9]+")) > 0
        ).count()
        assert 0 < len(out) <= n_with_tokens
        again = dsir_logweights(docs, n_buckets=256).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_target_docs_score_higher_on_average(self, docs):
        """English docs should look more like the English target model
        than non-English docs do — per-token mean weight separates."""
        w = dsir_logweights(docs, n_buckets=1024).join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        rows = (
            w.groupBy(F.col("lang") == "en")
            .agg(F.avg(F.col("dsir_logweight") / F.col("n_tokens")))
            .collect()
        )
        means = {r[0]: r[1] for r in rows}
        assert means[True] > means[False]

    def test_degenerate_target_all_rows(self, docs):
        """If the target IS the corpus, every bucket ratio is 1 and all
        weights are ~0 (exactly 0 up to smoothing-identical models)."""
        allsrc = docs.withColumn("__all", F.lit("x"))
        out = dsir_logweights(
            allsrc, n_buckets=128, target_col="__all", target_value="x"
        ).collect()
        assert all(abs(r["dsir_logweight"]) < 1e-9 for r in out)


class TestSourceCap:
    def test_cap_and_rank_properties(self, docs):
        out = source_cap(docs, per_source=3).collect()
        per = {}
        for r in out:
            per.setdefault(r["source"], []).append(r)
        n_sources = docs.select("source").distinct().count()
        assert len(per) == n_sources
        for rows in per.values():
            ranks = sorted(r["src_rank"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
            assert len(rows) <= 3
            # rank order follows (quality DESC, doc_id ASC)
            srt = sorted(rows, key=lambda r: (-r["quality_score"], r["doc_id"]))
            assert [r["src_rank"] for r in srt] == ranks

    def test_two_stage_prune_is_lossless(self, docs):
        """The salted plan's kept set equals the naive per-source rank
        (compare against a 1-salt run, which IS the naive plan)."""
        a = sorted(
            map(tuple, source_cap(docs, per_source=5, n_salts=32).collect())
        )
        b = sorted(
            map(tuple, source_cap(docs, per_source=5, n_salts=1).collect())
        )
        assert a == b
