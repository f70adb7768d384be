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


class TestCMS:
    def test_estimate_at_least_true_and_exact_when_wide(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators import cms_build, cms_estimate

        vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
        df = spark.createDataFrame([Row(v=x) for x in vals])
        truth = {"a": 5, "b": 3, "c": 1}
        qs = spark.createDataFrame([Row(v=x) for x in truth])
        # narrow sketch: est >= true
        cms = cms_build(df, col="v", width=4, depth=2)
        got = {
            r.v: r.cms_est
            for r in cms_estimate(qs, cms, col="v", width=4, depth=2).collect()
        }
        assert all(got[k] >= v for k, v in truth.items())
        # wide sketch: no collisions at this cardinality -> exact
        cms_w = cms_build(df, col="v", width=4096, depth=3)
        got_w = {
            r.v: r.cms_est
            for r in cms_estimate(
                qs, cms_w, col="v", width=4096, depth=3
            ).collect()
        }
        assert got_w == truth

    def test_unseen_value_estimates_zero_when_wide(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators import cms_build, cms_estimate

        df = spark.createDataFrame([Row(v="x")])
        qs = spark.createDataFrame([Row(v="never-seen")])
        cms = cms_build(df, col="v", width=4096, depth=3)
        [r] = cms_estimate(qs, cms, col="v", width=4096, depth=3).collect()
        assert r.cms_est == 0


class TestFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, ts long, event_type string")

    def test_ordered_chain_counts(self, spark):
        from symtseries_spark.operators import funnel_counts

        rows = [
            # u1: full ordered chain
            (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
            # u2: purchase BEFORE click -> stops at click
            (2, 10, "signup"), (2, 30, "click"), (2, 20, "purchase"),
            # u3: signup only
            (3, 10, "signup"),
            # u4: no signup -> never enters
            (4, 10, "click"), (4, 20, "purchase"),
        ]
        out = {
            r.stage: r.n_entities
            for r in funnel_counts(
                self._ev(spark, rows), key="user_id", ts="ts",
                type_col="event_type", stages=["signup", "click", "purchase"],
            ).collect()
        }
        assert out == {"signup": 3, "click": 2, "purchase": 1}

    def test_equal_timestamp_not_counted(self, spark):
        from symtseries_spark.operators import funnel_counts

        rows = [(1, 10, "signup"), (1, 10, "click")]
        out = {
            r.stage: r.n_entities
            for r in funnel_counts(
                self._ev(spark, rows), key="user_id", ts="ts",
                type_col="event_type", stages=["signup", "click"],
            ).collect()
        }
        assert out == {"signup": 1, "click": 0}


class TestBloomColumnCollision:
    def test_probe_df_with_bloom_column(self, spark):
        """Probing a table that already has a 'bloom' column must work
        (internal bits column is renamed before the join) and must not
        drop the caller's column."""
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(x=1, bloom="keep-me"), Row(x=2, bloom="me-too")]
        )
        filt = bloom_build(_ids(spark, [1]), col="x", m_bits=M_BITS, k=K)
        out = bloom_probe(df, filt, col="x", m_bits=M_BITS, k=K).collect()
        assert {r.bloom for r in out} == {"keep-me", "me-too"}
        assert {r.x: r.bloom_hit for r in out}[1] is True


class TestHistogramQuantiles:
    def test_uniform_grid_is_near_exact(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.sketches import histogram_quantiles

        # 0..1023 with 256 bins: bucket width 4, estimate error <= 4
        df = spark.createDataFrame([Row(v=float(x)) for x in range(1024)])
        rows = {r.quantile: r for r in histogram_quantiles(
            df, value="v", bins=256
        ).collect()}
        assert set(rows) == {0.5, 0.9, 0.99}
        for r in rows.values():
            assert r.abs_err <= 4.0 + 1e-9
            assert r.est == pytest.approx(r.exact, abs=4.0 + 1e-9)

    def test_flat_input(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame([Row(v=7.5)] * 10)
        rows = histogram_quantiles(df, value="v", bins=16).collect()
        for r in rows:
            assert r.est == pytest.approx(7.5)
            assert r.exact == pytest.approx(7.5)
            assert r.abs_err == pytest.approx(0.0)

    def test_param_guards(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame([Row(v=1.0)])
        with pytest.raises(ValueError):
            histogram_quantiles(df, value="v", bins=1)
        with pytest.raises(ValueError):
            histogram_quantiles(df, value="v", quantiles=(0.0, 0.5))


class TestHllGrouped:
    def test_per_group_estimates_track_exact(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.sketches import hll_grouped

        rows = [Row(g="a", u=i) for i in range(200)]
        rows += [Row(g="b", u=i) for i in range(40)]
        rows += [Row(g="b", u=i) for i in range(40)]  # duplicates
        df = spark.createDataFrame(rows)
        out = {r.g: r for r in hll_grouped(
            df, group="g", col="u", p=9
        ).collect()}
        assert out["a"].exact_distinct == 200
        assert out["b"].exact_distinct == 40
        for r in out.values():
            # p=9 small-range correction: should be within a few %
            assert r.rel_err < 0.1
            assert r.n_buckets_used <= r.exact_distinct

    def test_guard(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.sketches import hll_grouped

        df = spark.createDataFrame([Row(g="a", u=1)])
        with pytest.raises(ValueError):
            hll_grouped(df, group="g", col="u", p=2)
