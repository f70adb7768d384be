"""Temporal join operators: as-of join, interval join, sessionization.

Brute-force pandas/python references over small hand-built frames (plus
the events table) pin the exact semantics: tie-inclusive as-of matching,
tolerance nulling, inclusive interval bounds, left-join row preservation,
and gap-boundary session splits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from symtseries_spark.operators.joins import asof_join, interval_join, sessionize
from symtseries_spark.sources import load


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_matches_bruteforce_on_events(self, spark, sf_dir):
        ev = load(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("cid"), "ts_us"
        )
        purch = ev.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("pid"),
            F.col("ts_us").alias("p_us"), F.col("value").alias("pv"),
        )
        got = {
            r.cid: r.pid
            for r in asof_join(
                clicks, purch, on="user_id", left_ts="ts_us",
                right_ts="p_us", right_cols=["pid", "pv"],
            ).collect()
        }
        p_rows = purch.collect()
        for c in clicks.collect():
            cands = [p for p in p_rows if p.user_id == c.user_id and p.p_us <= c.ts_us]
            want = max(cands, key=lambda p: p.p_us).pid if cands else None
            assert got[c.cid] == want

    def test_tie_is_inclusive_and_tolerance_nulls(self, spark):
        left = _mk(spark, [(1, 100, "a"), (1, 200, "b"), (2, 50, "c")],
                   "k long, t long, tag string")
        right = _mk(spark, [(1, 100, 10.0), (1, 150, 20.0), (2, 60, 30.0)],
                    "k long, rt long, v double")
        j = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                      right_cols=["v"]).collect()
        by_tag = {r.tag: (r.rt, r.v) for r in j}
        assert by_tag["a"] == (100, 10.0)  # equal ts matches (inclusive)
        assert by_tag["b"] == (150, 20.0)  # latest at-or-before wins
        assert by_tag["c"] == (None, None)  # no right row <= 50
        # tolerance: the 150 match is 50 old; tolerance 40 voids it
        j2 = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                       right_cols=["v"], tolerance=40).collect()
        by_tag2 = {r.tag: (r.rt, r.v) for r in j2}
        assert by_tag2["a"] == (100, 10.0)
        assert by_tag2["b"] == (None, None)
        assert by_tag2["c"] == (None, None)


class TestIntervalJoin:
    def test_bounds_inclusive_and_bucket_straddle(self, spark):
        left = _mk(spark, [(1, 100, "p1"), (1, 1000, "p2")], "k long, lt long, tag string")
        right = _mk(
            spark,
            [(1, 100, "r0"), (1, 101, "r1"), (1, 150, "r2"), (1, 200, "r3"),
             (1, 201, "r4"), (2, 150, "r5")],
            "k long, rt long, rtag string",
        )
        got = sorted(
            r.rtag
            for r in interval_join(left, right, on="k", left_ts="lt",
                                   right_ts="rt", lower=1, upper=100).collect()
            if r.tag == "p1"
        )
        # (100, 200]: excludes rt=100 (lower=1), includes rt=200, excludes 201
        assert got == ["r1", "r2", "r3"]

    def test_left_keeps_unmatched_once(self, spark):
        left = _mk(spark, [(1, 100, "m"), (1, 9000, "u")], "k long, lt long, tag string")
        right = _mk(spark, [(1, 150, 5.0)], "k long, rt long, v double")
        rows = interval_join(left, right, on="k", left_ts="lt", right_ts="rt",
                             lower=1, upper=100, how="left").collect()
        tags = sorted(r.tag for r in rows)
        assert tags == ["m", "u"]
        unmatched = next(r for r in rows if r.tag == "u")
        assert unmatched.rt is None and unmatched.v is None

    def test_rejects_empty_interval(self, spark):
        df = _mk(spark, [(1, 1)], "k long, t long")
        with pytest.raises(ValueError):
            interval_join(df, df, on="k", left_ts="t", right_ts="t",
                          lower=5, upper=5)


class TestSessionize:
    def test_gap_boundary_splits(self, spark):
        # gap=10: diff >10 starts a new session; ==10 does not
        df = _mk(spark, [(1, 0), (1, 10), (1, 20), (1, 31), (1, 41), (2, 5)],
                 "k long, t long")
        got = {
            (r.k, r.t): r.session_id
            for r in sessionize(df, key="k", ts="t", gap=10).collect()
        }
        assert got == {(1, 0): 0, (1, 10): 0, (1, 20): 0,
                       (1, 31): 1, (1, 41): 1, (2, 5): 0}

    def test_single_shuffle_plan(self, spark):
        df = _mk(spark, [(1, 0), (1, 5)], "k long, t long")
        plan = sessionize(df, key="k", ts="t", gap=10)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1  # lag + running sum share one shuffle


class TestSessionWindowParity:
    def test_exact_gap_tie_semantics(self, spark):
        # diff == gap MERGES in BOTH implementations: session_window
        # treats touching windows [0,10),[10,20) as one session, exactly
        # like batch sessionize's `diff > gap` split rule. (Verified
        # empirically — the "strict overlap" reading of session_window
        # is wrong.)
        from pyspark.sql import Row

        rows = [Row(k=1, t=0), Row(k=1, t=10), Row(k=1, t=25)]
        df = spark.createDataFrame(rows)
        batch = sessionize(df, key="k", ts="t", gap=10)
        assert {r.t: r.session_id for r in batch.collect()} == {0: 0, 10: 0, 25: 1}

        tdf = df.select("k", F.timestamp_seconds(F.col("t")).alias("ts"))
        sw = (
            tdf.groupBy("k", F.session_window("ts", "10 seconds").alias("w"))
            .count()
            .select(F.unix_timestamp("w.start").alias("s"), "count")
        )
        got = sorted((r.s, r["count"]) for r in sw.collect())
        assert got == [(0, 2), (25, 1)]


class TestStreamingMinhashBands:
    def test_short_docs_have_no_bands(self, spark):
        from symtseries_spark.streaming.minhash import minhash_band_structs

        df = spark.createDataFrame(
            [(1, "too short"), (2, "one two three four five")],
            "doc_id long, text string",
        )
        out = df.select(
            "doc_id",
            F.size(
                minhash_band_structs(
                    F.col("text"), k=3, num_hashes=32, bands=8, seed=7
                )
            ).alias("nb"),
        )
        got = {r.doc_id: r.nb for r in out.collect()}
        assert got == {1: 0, 2: 8}


class TestSaltedJoin:
    def test_equals_plain_join(self, spark, sf_dir):
        from symtseries_spark.operators.joins import salted_join

        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        part = load(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("l_partkey"), "p_brand"
        )
        plain = li.join(part, "l_partkey").groupBy("p_brand").count()
        salted = salted_join(li, part, on="l_partkey", salts=4) \
            .groupBy("p_brand").count()
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_keeps_unmatched(self, spark):
        from symtseries_spark.operators.joins import salted_join

        fact = spark.createDataFrame([(1, "a"), (99, "b")], "k long, t string")
        dim = spark.createDataFrame([(1, "x")], "k long, d string")
        rows = {r.t: r.d for r in salted_join(fact, dim, on="k", salts=3, how="left").collect()}
        assert rows == {"a": "x", "b": None}


class TestConnectedComponents:
    def test_chain_clique_singleton(self, spark):
        from symtseries_spark.operators.graph import connected_components

        # chain 1-2-3, clique 10-11-12, singleton 99
        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12)], "src long, dst long"
        )
        verts = spark.createDataFrame(
            [(v,) for v in [1, 2, 3, 10, 11, 12, 99]], "v long"
        )
        got = {r.v: r.canonical_id for r in connected_components(edges, verts).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}

    def test_long_chain_converges(self, spark):
        from symtseries_spark.operators.graph import connected_components

        n = 12  # diameter n-1: worst case for per-hop propagation
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        verts = spark.createDataFrame([(v,) for v in range(n)], "v long")
        got = {r.v: r.canonical_id for r in connected_components(edges, verts).collect()}
        assert got == {v: 0 for v in range(n)}

    def test_chain_past_old_round_cap_converges(self, spark):
        """Before round 9's pointer doubling, iterations = diameter, so
        a chain longer than max_iter=50 hops raised outright; doubling
        closes any diameter in O(log d) rounds with identical labels."""
        from symtseries_spark.operators.graph import connected_components

        n = 120  # > the 50-round cap under per-hop propagation
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        verts = spark.createDataFrame([(v,) for v in range(n)], "v long")
        cc = connected_components(edges, verts)
        got = {r.v: r.canonical_id for r in cc.collect()}
        assert got == {v: 0 for v in range(n)}


class TestAsofProperty:
    def test_random_graphs_vs_bruteforce(self, spark):
        # randomized (seeded) micro-corpora: keys with empty sides,
        # boundary-equal timestamps, tolerance cutoffs
        import random

        rng = random.Random(1234)
        for trial in range(5):
            nl, nr = rng.randint(0, 12), rng.randint(0, 12)
            keys = [1, 2]
            left = [(rng.choice(keys), rng.randint(0, 30), i) for i in range(nl)]
            # unique right ts per key so the at-or-before winner is unique
            right = []
            used = set()
            for j in range(nr):
                k, t = rng.choice(keys), rng.randint(0, 30)
                if (k, t) in used:
                    continue
                used.add((k, t))
                right.append((k, t, float(j)))
            tol = rng.choice([None, 5, 10])
            ldf = spark.createDataFrame(left or [(99, 0, 0)], "k long, t long, lid long")
            rdf = spark.createDataFrame(right or [(98, 0, 0.0)], "k long, rt long, v double")
            got = {
                r.lid: (r.rt, r.v)
                for r in asof_join(
                    ldf, rdf, on="k", left_ts="t", right_ts="rt",
                    right_cols=["v"], tolerance=tol,
                ).collect()
            }
            for k, t, lid in (left or [(99, 0, 0)]):
                cands = [
                    (rt, v) for (rk, rt, v) in (right or [(98, 0, 0.0)])
                    if rk == k and rt <= t and (tol is None or rt >= t - tol)
                ]
                want = max(cands, key=lambda c: c[0]) if cands else (None, None)
                assert got[lid] == want, (trial, k, t, tol, got[lid], want)


class TestGapfill:
    def test_locf_and_flags(self, spark):
        from symtseries_spark.operators.joins import gapfill_locf

        df = spark.createDataFrame(
            [(1, 10, 1.0), (1, 13, 2.0), (2, 11, 5.0)],
            "k long, b long, v double",
        )
        got = {
            (r.k, r.b): (r.v, r.is_filled)
            for r in gapfill_locf(df, key="k", bucket="b", value="v",
                                  lo=10, hi=13).collect()
        }
        assert got == {
            (1, 10): (1.0, False), (1, 11): (1.0, True),
            (1, 12): (1.0, True), (1, 13): (2.0, False),
            (2, 10): (None, True), (2, 11): (5.0, False),
            (2, 12): (5.0, True), (2, 13): (5.0, True),
        }


class TestPagerank:
    def _pr(self, spark, pairs, **kw):
        from symtseries_spark.operators.graph import pagerank

        edges = spark.createDataFrame(pairs, "src long, dst long")
        return {r.v: r for r in pagerank(edges, **kw).collect()}

    def test_star_center_dominates(self, spark):
        # star: 0 touches 1..4 -> center collects damped mass
        out = self._pr(spark, [(0, j) for j in range(1, 5)])
        assert set(out) == {0, 1, 2, 3, 4}
        assert out[0].degree == 4
        assert all(out[0].pagerank > out[j].pagerank for j in range(1, 5))
        # leaves are symmetric -> identical scores
        assert len({out[j].pagerank for j in range(1, 5)}) == 1

    def test_regular_graph_uniform_and_conserved(self, spark):
        # 4-cycle: every node degree 2 -> stationary at 1/4 each round
        out = self._pr(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
        assert all(abs(r.pagerank - 0.25) < 1e-5 for r in out.values())
        assert abs(sum(r.pagerank for r in out.values()) - 1.0) < 1e-4

    def test_deterministic_and_param_guards(self, spark):
        import pytest as _pt

        from symtseries_spark.operators.graph import pagerank

        pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
        a = sorted(self._pr(spark, pairs).items())
        b = sorted(self._pr(spark, pairs).items())
        assert a == b
        edges = spark.createDataFrame(pairs, "src long, dst long")
        with _pt.raises(ValueError):
            pagerank(edges, damping=1.0)
        with _pt.raises(ValueError):
            pagerank(edges, n_iter=0)


class TestTriangleStats:
    def _stats(self, spark, pairs):
        from symtseries_spark.operators.graph import triangle_stats

        edges = spark.createDataFrame(pairs, "src long, dst long")
        return triangle_stats(edges).collect()[0]

    def test_triangle_plus_tail(self, spark):
        # triangle 0-1-2 plus a tail 2-3: 1 triangle, wedges = 1+1+3+0
        r = self._stats(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        assert r.n_nodes == 4 and r.n_edges == 4
        assert r.n_triangles == 1
        assert r.n_wedges == 5  # deg 1,2,3,... -> C(1,2)+C(2,2)... = 0+1+3+1? no: degs 2,2,3,1 -> 1+1+3+0
        assert r.clustering_coeff == pytest.approx(3 * 1 / 5, abs=1e-6)

    def test_clique_is_fully_clustered(self, spark):
        from itertools import combinations

        r = self._stats(spark, list(combinations(range(5), 2)))
        assert r.n_triangles == 10  # C(5,3)
        assert r.clustering_coeff == pytest.approx(1.0, abs=1e-6)

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        r = self._stats(spark, [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2)])
        assert r.n_edges == 3 and r.n_triangles == 1

    def test_chain_has_no_triangles(self, spark):
        r = self._stats(spark, [(0, 1), (1, 2), (2, 3)])
        assert r.n_triangles == 0
        assert r.clustering_coeff == pytest.approx(0.0, abs=1e-6)
