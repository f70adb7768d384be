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


def _nearest_rank_weighted(pairs, num, den):
    """pairs = (value, weight); reference weighted nearest-rank."""
    total = sum(w for _, w in pairs if w and w > 0)
    k = -(-num * total // den)
    cum = 0
    for v, w in sorted(p for p in pairs if p[1] and p[1] > 0):
        cum += w
        if cum >= k:
            return v
    return None


def test_weighted_matches_reference(spark):
    import random

    rng = random.Random(11)
    pairs = [(rng.randrange(1, 40), rng.randrange(1, 9)) for _ in range(800)]
    df = spark.createDataFrame(pairs, schema="v long, w long")
    r = grid_quantiles(
        df,
        value="v",
        weight="w",
        probs=[(1, 2, "p50"), (9, 10, "p90")],
        n_alias="total_w",
    ).collect()[0]
    assert r["total_w"] == sum(w for _, w in pairs)
    assert r["p50"] == _nearest_rank_weighted(pairs, 1, 2)
    assert r["p90"] == _nearest_rank_weighted(pairs, 9, 10)


def test_weighted_excludes_nonpositive_and_null_weights(spark):
    from pyspark.sql import Row

    rows = [
        Row(v=1, w=5),
        Row(v=2, w=0),
        Row(v=3, w=-4),
        Row(v=4, w=None),
        Row(v=10, w=5),
    ]
    df = spark.createDataFrame(rows, schema="v long, w long")
    r = grid_quantiles(
        df, value="v", weight="w", probs=[(1, 2, "p50"), (9, 10, "p90")]
    ).collect()[0]
    # only (1,5) and (10,5) carry mass: total 10, p50 at cum>=5 -> 1,
    # p90 at cum>=9 -> 10
    assert r["n"] == 10 and r["p50"] == 1 and r["p90"] == 10


def test_weight_equals_value_token_mass_semantics(spark):
    # one doc of length 100 and nine of length 10: the long doc holds
    # 100/190 of the token mass -> token-mass p50 is 100 (the median
    # token lives in the long doc), while the per-doc p50 is 10
    vals = [100] + [10] * 9
    df = spark.createDataFrame([(v,) for v in vals], schema="v long")
    r = grid_quantiles(
        df, value="v", weight="v", probs=[(1, 2, "p50")], n_alias="total"
    ).collect()[0]
    assert r["total"] == 190 and r["p50"] == 100
    unweighted = grid_quantiles(
        df, value="v", probs=[(1, 2, "p50")]
    ).collect()[0]
    assert unweighted["p50"] == 10


def test_weighted_equals_replicated_rows(spark):
    """Metamorphic: integer weight w must mean exactly 'this row, w
    times' — the weighted form over (v, w) equals the unweighted form
    over v exploded w times."""
    import random

    rng = random.Random(23)
    pairs = [(rng.randrange(0, 25), rng.randrange(1, 6)) for _ in range(300)]
    wdf = spark.createDataFrame(pairs, schema="v long, w long")
    edf = spark.createDataFrame(
        [(v,) for v, w in pairs for _ in range(w)], schema="v long"
    )
    probs = [(1, 4, "p25"), (1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")]
    rw = grid_quantiles(wdf, value="v", weight="w", probs=probs).collect()[0]
    re_ = grid_quantiles(edf, value="v", probs=probs).collect()[0]
    assert rw.asDict() == re_.asDict()
