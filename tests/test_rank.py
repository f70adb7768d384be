"""distributed_row_number / distributed_ntile must be bit-identical to
the single-partition global window they replace — including ties,
descending order, and degenerate (constant-key, tiny, n<k) inputs."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from symtseries_spark.operators.rank import (
    distributed_ntile,
    distributed_row_number,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def _rows(n, n_distinct):
    rng = random.Random(42)
    return [(i, float(rng.randrange(n_distinct))) for i in range(n)]


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize(
    "n,n_distinct,buckets",
    [(500, 400, 8), (500, 5, 8), (500, 1, 4), (3, 3, 64), (0, 1, 8)],
)
def test_row_number_matches_global_window(
    spark, n, n_distinct, buckets, descending
):
    df = _mk(spark, _rows(n, n_distinct))
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", descending=descending,
        buckets=buckets,
    )
    key = F.col("v").desc() if descending else F.col("v").asc()
    exp = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(key, "id")).cast("long")
    )
    g = {(r["id"]): r["rn"] for r in got.collect()}
    e = {(r["id"]): r["rn"] for r in exp.collect()}
    assert g == e


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("n,k", [(503, 5), (500, 5), (3, 5), (20, 7)])
def test_ntile_matches_global_window(spark, n, k, descending):
    df = _mk(spark, _rows(n, max(1, n // 3)))
    got = distributed_ntile(
        df, "v", tiebreak="id", n_tiles=k, out="t", descending=descending,
        buckets=8,
    )
    key = F.col("v").desc() if descending else F.col("v").asc()
    exp = df.withColumn("t", F.ntile(k).over(Window.orderBy(key, "id")))
    g = {(r["id"]): r["t"] for r in got.collect()}
    e = {(r["id"]): r["t"] for r in exp.collect()}
    assert g == e


def test_plan_has_no_global_sort(spark):
    """The physical plan must show a window PARTITIONED BY the bucket
    key and contain NO global sort (a regression to an unpartitioned
    window would reintroduce the single-task sort)."""
    df = _mk(spark, _rows(200, 50))
    got = distributed_row_number(df, "v", tiebreak="id", buckets=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # The window's partition spec must be the bucket key...
    assert "windowspecdefinition(__bkt" in plan
    # ...and every physical Sort must be partition-local (global flag
    # prints as ", true," on the Sort node).
    global_sorts = [
        line
        for line in plan.splitlines()
        if "Sort [" in line and "], true," in line
    ]
    assert global_sorts == []


def test_null_key_raises(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, v double"
    )
    with pytest.raises(Exception, match="null/NaN"):
        distributed_row_number(df, "v", tiebreak="id", buckets=4)


def test_nan_key_raises(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "id long, v double"
    )
    with pytest.raises(Exception, match="null/NaN"):
        distributed_row_number(df, "v", tiebreak="id", buckets=4)


# Property coverage: random key distributions (heavy ties, negatives,
# wide magnitude spread) must stay bit-identical to the global window.
# Spark round-trips per example are expensive, so examples are few but
# each covers 200 rows x both directions.
from hypothesis import given, settings
from hypothesis import strategies as st

key_pool = st.sampled_from(
    [-1e12, -7.5, -1.0, -1e-6, 0.0, 1e-6, 0.25, 3.0, 3.0, 1e9]
)


class TestRankProperties:
    @given(st.lists(key_pool, min_size=1, max_size=200), st.booleans())
    @settings(max_examples=10, deadline=None)
    def test_row_number_property(self, spark, vals, descending):
        df = _mk(spark, [(i, v) for i, v in enumerate(vals)])
        got = distributed_row_number(
            df, "v", tiebreak="id", out="rn", descending=descending,
            buckets=7,
        )
        key = F.col("v").desc() if descending else F.col("v").asc()
        exp = df.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(key, "id")).cast("long"),
        )
        g = {r["id"]: r["rn"] for r in got.collect()}
        e = {r["id"]: r["rn"] for r in exp.collect()}
        assert g == e

    @given(
        st.lists(key_pool, min_size=1, max_size=200),
        st.integers(min_value=1, max_value=9),
    )
    @settings(max_examples=10, deadline=None)
    def test_ntile_property(self, spark, vals, k):
        df = _mk(spark, [(i, v) for i, v in enumerate(vals)])
        got = distributed_ntile(
            df, "v", tiebreak="id", n_tiles=k, out="t", buckets=5
        )
        exp = df.withColumn(
            "t", F.ntile(k).over(Window.orderBy(F.col("v").asc(), "id"))
        )
        g = {r["id"]: r["t"] for r in got.collect()}
        e = {r["id"]: r["t"] for r in exp.collect()}
        assert g == e


@pytest.mark.parametrize(
    "key_bounds",
    [
        [100.0],                      # one boundary, most rows above it
        [float(v) for v in range(0, 400, 13)],   # dense uniform grid
        [-5.0, 0.5, 399.0, 1e9],      # boundaries outside the domain
        [7.0, 7.0, 7.0],              # duplicate boundary values
    ],
)
def test_key_bounds_matches_global_window(spark, key_bounds):
    """r12 fast path: caller-supplied boundaries must yield ranks
    bit-identical to the global window (boundary placement is
    balance-only), including boundaries that are duplicated, out of
    domain, or leave most rows in one bucket."""
    from symtseries_spark.operators.rank import ranked_with_total

    df = _mk(spark, _rows(500, 400))
    got, total = ranked_with_total(
        df, "v", tiebreak="id", out="rn", descending=False,
        key_bounds=key_bounds,
    )
    exp = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("v").asc(), "id")).cast("long"),
    )
    g = {r["id"]: r["rn"] for r in got.collect()}
    e = {r["id"]: r["rn"] for r in exp.collect()}
    assert g == e
    assert total == 500


def test_key_bounds_rejects_nan_keys(spark):
    """The fast path must keep the null/NaN fail-fast of the adaptive
    path (bad keys bucket differently than they sort)."""
    from symtseries_spark.operators.rank import ranked_with_total

    df = _mk(spark, [(0, 1.0), (1, float("nan"))])
    with pytest.raises(ValueError, match="null/NaN"):
        ranked_with_total(
            df, "v", tiebreak="id", out="rn", descending=False,
            key_bounds=[0.5],
        )


@pytest.mark.parametrize(
    "n,buckets", [(503, 8), (500, 4), (4, 8), (0, 8)]
)
def test_ntile_multi_matches_chained_single(spark, n, buckets):
    """ntile_multi's shared quantile/tie-split/count passes must yield
    the EXACT columns three chained distributed_ntile calls produce —
    including heavy-tie keys (v2: 5 distinct values over n rows) and a
    descending spec."""
    from symtseries_spark.operators.rank import ntile_multi

    rng = random.Random(7)
    rows = [
        (i, float(rng.randrange(max(n, 1))), float(rng.randrange(5)),
         float(rng.randrange(50)) / 7.0)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, v1 double, v2 double, v3 double"
    )
    specs = [
        dict(key="v1", tiebreak="id", n_tiles=5, out="t1",
             descending=True),
        dict(key="v2", tiebreak="id", n_tiles=4, out="t2"),
        dict(key="v3", tiebreak="id", n_tiles=7, out="t3"),
    ]
    got = ntile_multi(df, specs, buckets=buckets)
    exp = df
    for s in specs:
        exp = distributed_ntile(
            exp, s["key"], tiebreak=s["tiebreak"], n_tiles=s["n_tiles"],
            out=s["out"], descending=s.get("descending", False),
            buckets=buckets,
        )
    cols = ["t1", "t2", "t3"]
    g = {r["id"]: tuple(r[c] for c in cols) for r in got.collect()}
    e = {r["id"]: tuple(r[c] for c in cols) for r in exp.collect()}
    assert g == e


def test_ntile_multi_nan_key_raises(spark):
    from symtseries_spark.operators.rank import ntile_multi

    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, float("nan"), 2.0)],
        "id long, v1 double, v2 double",
    )
    with pytest.raises(ValueError, match="null/NaN"):
        ntile_multi(
            df,
            [
                dict(key="v1", tiebreak="id", n_tiles=3, out="a"),
                dict(key="v2", tiebreak="id", n_tiles=3, out="b"),
            ],
        ).collect()


def test_ntile_multi_validations(spark):
    from symtseries_spark.operators.rank import ntile_multi

    df = spark.createDataFrame([(0, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="at least one"):
        ntile_multi(df, [])
    with pytest.raises(ValueError, match="distinct 'out'"):
        ntile_multi(
            df,
            [
                dict(key="v", tiebreak="id", n_tiles=2, out="a"),
                dict(key="v", tiebreak="id", n_tiles=3, out="a"),
            ],
        )
    with pytest.raises(ValueError, match="n_tiles"):
        ntile_multi(df, [dict(key="v", tiebreak="id", n_tiles=0, out="a")])


@pytest.mark.parametrize(
    "n,n_distinct,key_bounds",
    [
        (500, 50, [float(v) for v in range(0, 50, 7)]),  # heavy dup rows
        (500, 400, [100.0]),                   # near-distinct, 1 boundary
        (500, 1, [0.5]),                       # single key class
        (7, 7, [float(v) for v in range(64)]), # more buckets than rows
        (0, 1, [1.0]),                         # empty input
    ],
)
def test_dense_rank_fused_matches_unfused(spark, n, n_distinct, key_bounds):
    """r13 fusion: dense_ranked_with_total carried on the FULL relation
    must be bit-identical to the unfused distinct -> ranked_with_total
    -> join-back shape it replaces (the suffix doubling round), with
    the same total (= distinct class count)."""
    from symtseries_spark.operators.rank import (
        dense_ranked_with_total,
        ranked_with_total,
    )

    rng = random.Random(7)
    rows = [
        (i, float(rng.randrange(n_distinct)), rng.randrange(5) - 1)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, v double, t long").persist()
    try:
        got, got_total = dense_ranked_with_total(
            df, "v", tiebreak="t", out="nr", key_bounds=key_bounds
        )
        distinct = df.select("v", "t").distinct()
        ranked, exp_total = ranked_with_total(
            distinct, "v", tiebreak="t", out="nr", descending=False,
            key_bounds=key_bounds,
        )
        exp = df.join(ranked, ["v", "t"])
        g = {r["id"]: r["nr"] for r in got.collect()}
        e = {r["id"]: r["nr"] for r in exp.collect()}
        assert g == e
        assert got_total == exp_total
    finally:
        df.unpersist()


def test_dense_rank_fused_rejects_bad_rows(spark):
    """NULL tiebreaks and NaN keys must fail fast with the row count in
    the message (count_distinct alone reads 0 over null-carrying
    groups — the count pass counts ROWS for the bad bucket)."""
    from symtseries_spark.operators.rank import dense_ranked_with_total

    df = spark.createDataFrame(
        [(0, 1.0, 1), (1, float("nan"), 2)], "id long, v double, t long"
    )
    with pytest.raises(ValueError, match="1 null/NaN"):
        dense_ranked_with_total(df, "v", tiebreak="t", out="nr", key_bounds=[0.5])
    df2 = spark.createDataFrame(
        [(0, 1.0, 1), (1, 2.0, None)], "id long, v double, t long"
    )
    with pytest.raises(ValueError, match="1 null/NaN"):
        dense_ranked_with_total(df2, "v", tiebreak="t", out="nr", key_bounds=[0.5])
