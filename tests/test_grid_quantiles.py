"""Nearest-rank grid quantiles (operators/sketches.py:grid_quantiles):
rank math against a pure-Python reference, exact-multiple boundary
ranks, nulls, ties, and the empty-input contract."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators.sketches import grid_quantiles


def _nearest_rank(vals, num, den):
    s = sorted(vals)
    k = -(-num * len(s) // den)  # ceil
    return s[k - 1]


def _run(spark, vals, probs):
    df = spark.createDataFrame(
        [Row(v=x) for x in vals], schema="v long"
    )
    return grid_quantiles(df, value="v", probs=probs).collect()[0]


def test_matches_reference_on_random_grid(spark):
    import random

    rng = random.Random(7)
    vals = [rng.randrange(0, 50) for _ in range(997)]
    r = _run(spark, vals, [(1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")])
    assert r["n"] == 997
    assert r["p50"] == _nearest_rank(vals, 1, 2)
    assert r["p90"] == _nearest_rank(vals, 9, 10)
    assert r["p99"] == _nearest_rank(vals, 99, 100)


def test_exact_multiple_rank_boundary(spark):
    # n=10, p=9/10: k = ceil(9) = 9 exactly — the off-by-one trap a
    # float floor(n*0.9) formulation falls into
    vals = list(range(1, 11))
    r = _run(spark, vals, [(9, 10, "p90"), (1, 2, "p50")])
    assert r["p90"] == 9
    assert r["p50"] == 5


def test_all_ties_single_value(spark):
    r = _run(spark, [42] * 100, [(1, 2, "p50"), (9, 10, "p90")])
    assert r["p50"] == 42 and r["p90"] == 42 and r["n"] == 100


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [Row(v=1), Row(v=None), Row(v=3), Row(v=None)], schema="v long"
    )
    r = grid_quantiles(
        df, value="v", probs=[(1, 2, "p50")]
    ).collect()[0]
    assert r["n"] == 2 and r["p50"] == 1


def test_empty_input(spark):
    df = spark.createDataFrame([], schema="v long")
    r = grid_quantiles(df, value="v", probs=[(1, 2, "p50")]).collect()[0]
    assert r["n"] == 0 and r["p50"] is None


def test_invalid_probs_raise(spark):
    df = spark.createDataFrame([Row(v=1)], schema="v long")
    with pytest.raises(ValueError):
        grid_quantiles(df, value="v", probs=[])
    with pytest.raises(ValueError):
        grid_quantiles(df, value="v", probs=[(3, 2, "bad")])
