"""Exactness tests for operators/fuzzy.py edit_distance_pairs: the
pigeonhole-blocked join must return EXACTLY the brute-force pair set
(no false negatives from blocking, none of the candidate superset
leaking through the refine)."""
import random

import pytest

from symtseries_spark.operators.fuzzy import (
    edit_distance_join,
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(keys, tau):
    ks = sorted(set(k for k in keys if k))
    out = set()
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            d = _lev(a, b)
            if 1 <= d <= tau:
                out.add((a, b, d))
    return out


def _spark_pairs(spark, keys, tau, **kw):
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    return {
        (r.key_a, r.key_b, r.dist)
        for r in edit_distance_pairs(df, key="key", tau=tau, **kw).collect()
    }


class TestEditDistancePairs:
    @pytest.mark.parametrize("tau", [1, 2, 3])
    def test_random_matches_brute_force(self, spark, tau):
        rng = random.Random(100 + tau)
        keys = [
            "".join(rng.choice("abc") for _ in range(rng.randint(0, 10)))
            for _ in range(120)
        ]
        keys = [k for k in keys if k]  # operator drops empties anyway
        assert _spark_pairs(spark, keys, tau) == _brute(keys, tau)

    def test_short_keys_route_through_short_bucket(self, spark):
        # lengths 1..4 with tau=2: every pair with min length <= 2
        # must come from the broadcast short path and still be exact
        keys = ["a", "b", "ab", "ba", "abc", "abcd", "x", "xy"]
        assert _spark_pairs(spark, keys, 2) == _brute(keys, 2)

    def test_duplicates_and_empties_collapse(self, spark):
        keys = ["foo", "foo", "foo", "fob", "", "fob"]
        got = _spark_pairs(spark, [k for k in keys], 1)
        assert got == {("fob", "foo", 1)}

    def test_no_pairs_beyond_tau(self, spark):
        keys = ["aaaa", "bbbb", "cccc"]
        assert _spark_pairs(spark, keys, 2) == set()

    def test_variable_lengths_with_shifts(self, spark):
        # insertions shift segment alignment; the +-tau probe window
        # must still find them
        keys = ["abcdefgh", "abcdefghx", "xabcdefgh", "abcxdefgh",
                "abcdefg", "bcdefgh"]
        assert _spark_pairs(spark, keys, 2) == _brute(keys, 2)

    def test_unicode_codepoint_semantics(self, spark):
        # Spark's length/substring/levenshtein are codepoint-based, so
        # the blocked join must agree with a codepoint-level brute
        # force on non-ASCII keys (the DuckDB oracle is byte-based and
        # only used on ASCII corpora — this guards the operator
        # itself beyond that domain; assert_ascii=False is the
        # explicit opt-in the contract requires)
        keys = ["héllo", "hello", "hållo", "héllò", "naïve", "naive",
                "日本語", "日本誤", "日本", "crème", "creme"]
        assert _spark_pairs(spark, keys, 2, assert_ascii=False) == \
            _brute(keys, 2)

    def test_non_ascii_raises_by_default(self, spark):
        # the engine-parity CONTRACT: Spark levenshtein counts
        # codepoints, the DuckDB oracle counts bytes, so by default a
        # non-ASCII key must fail LOUDLY instead of silently
        # diverging from the oracle
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import SparkRuntimeException

        keys = ["hello", "héllo", "naive"]
        with pytest.raises((Py4JJavaError, SparkRuntimeException),
                           match="non-ASCII key"):
            _spark_pairs(spark, keys, 2)
        rdf = spark.createDataFrame([("naïve",)], "key string")
        ldf = spark.createDataFrame([("naive",)], "key string")
        with pytest.raises((Py4JJavaError, SparkRuntimeException),
                           match="non-ASCII key"):
            edit_distance_join(ldf, rdf, tau=1).collect()
        # and the explicit opt-out still works on both entry points
        got = {
            (r.key_l, r.key_r, r.dist)
            for r in edit_distance_join(
                ldf, rdf, tau=1, assert_ascii=False
            ).collect()
        }
        assert got == {("naive", "naïve", 1)}

    def test_null_keys_dropped_under_ascii_guard(self, spark):
        # NULL keys are dropped per the contract, NOT routed into the
        # assert_ascii raise branch (octet_length(NULL)==length(NULL)
        # is NULL, which a naive guard treats as "not ASCII")
        df = spark.createDataFrame(
            [("kitten",), (None,), ("sitten",)], "key string"
        )
        got = {
            (r.key_a, r.key_b, r.dist)
            for r in edit_distance_pairs(df, tau=1).collect()
        }
        assert got == {("kitten", "sitten", 1)}

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "key string")
        with pytest.raises(ValueError):
            edit_distance_pairs(df, key="key", tau=0)

    def test_seg_cap_raises_on_hot_segment(self, spark):
        # constant-prefix population: every key shares segment 0
        # verbatim, the quadratic worst case the module docstring
        # declares inherent — seg_cap must fail fast instead of
        # attempting the blowup, and stay silent on a healthy corpus
        keys = [f"PREFIXPREFIX{i:04d}" for i in range(50)]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        with pytest.raises(ValueError, match="seg_cap"):
            edit_distance_pairs(df, key="key", tau=2, seg_cap=10)
        # same population under the cap: exact result, no raise
        assert _spark_pairs(spark, keys, 2, seg_cap=100) == _brute(keys, 2)
        with pytest.raises(ValueError, match="seg_cap"):
            edit_distance_join(df, df, tau=2, seg_cap=10)

    def test_short_cap_raises(self, spark):
        keys = ["a", "b", "c", "d"]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        with pytest.raises(ValueError, match="short_cap"):
            edit_distance_pairs(df, key="key", tau=2, short_cap=2).collect()


def _brute_rs(lkeys, rkeys, tau):
    out = set()
    for a in set(k for k in lkeys if k):
        for b in set(k for k in rkeys if k):
            d = _lev(a, b)
            if d <= tau:
                out.add((a, b, d))
    return out


class TestEditDistanceJoin:
    def _run(self, spark, lkeys, rkeys, tau):
        ldf = spark.createDataFrame([(k,) for k in lkeys], "key string")
        rdf = spark.createDataFrame([(k,) for k in rkeys], "key string")
        return {
            (r.key_l, r.key_r, r.dist)
            for r in edit_distance_join(ldf, rdf, tau=tau).collect()
        }

    @pytest.mark.parametrize("tau", [1, 2, 3])
    def test_random_matches_brute_force(self, spark, tau):
        rng = random.Random(200 + tau)
        mk = lambda n: [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            for _ in range(n)
        ]
        lkeys, rkeys = mk(80), mk(80)
        assert self._run(spark, lkeys, rkeys, tau) == _brute_rs(
            lkeys, rkeys, tau
        )

    def test_exact_match_included(self, spark):
        got = self._run(spark, ["hello"], ["hello", "hellp"], 1)
        assert got == {("hello", "hello", 0), ("hello", "hellp", 1)}

    def test_right_longer_than_left(self, spark):
        # the matching segment of a longer indexed key must still fit
        # inside the shorter probe string
        got = self._run(spark, ["abcdef"], ["abcdefgh", "abcdefg"], 2)
        assert got == {("abcdef", "abcdefg", 1), ("abcdef", "abcdefgh", 2)}

    def test_shorts_on_both_sides(self, spark):
        lkeys = ["a", "ab", "abcd"]
        rkeys = ["b", "abc", "x"]
        assert self._run(spark, lkeys, rkeys, 2) == _brute_rs(
            lkeys, rkeys, 2
        )

    def test_same_dataframe_both_sides(self, spark):
        keys = ["foo", "fob", "bar", "barn"]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        got = {
            (r.key_l, r.key_r, r.dist)
            for r in edit_distance_join(df, df, tau=1).collect()
        }
        assert got == _brute_rs(keys, keys, 1)

    def test_long_strings_planted_edits(self, spark):
        # 15-30 char strings: segment widths > 1 and every planted
        # variant type (sub, delete+sub, 3 subs) must be recovered
        rng = random.Random(7)
        base = [
            "".join(rng.choice("abcdef") for _ in range(rng.randint(15, 30)))
            for _ in range(40)
        ]
        variants = []
        for j, b in enumerate(base[:12]):
            p = 3 + (j % 9)
            if j % 3 == 0:
                variants.append(b[:p] + "z" + b[p + 1:])
            elif j % 3 == 1:
                variants.append(b[:p] + "z" + b[p + 1:p + 2] + b[p + 3:])
            else:
                variants.append(
                    b[:p] + "x" + b[p + 1:p + 4] + "y" + b[p + 5:]
                )
        keys = base + variants
        assert _spark_pairs(spark, keys, 3) == _brute(keys, 3)
