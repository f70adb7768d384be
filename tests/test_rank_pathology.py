"""Boundary-pathology coverage for operators/rank.py (round-8 ask).

The two-pass rank's correctness argument is "bucket id is a monotone
function of the key, equal keys share a bucket, so bucket order +
in-bucket order = global order". These tests attack each leg of that
argument where it is most fragile:

- keys sitting EXACTLY on the approxQuantile boundaries (the `<=`
  versus `<` edge of `_bucket_expr`),
- one dominant value owning almost every row (heavy ties — all must
  land in ONE bucket or ranks within the tie run would split),
- ±Infinity keys (valid doubles: must rank first/last, never poison
  the quantile pass),
- -0.0 vs 0.0 (equal as doubles, so they must share a bucket while
  the tiebreak orders them),
- long keys above 2^53 (the bucket pass casts to double and collapses
  adjacent values — the FINAL window orders by the original column,
  so ranks must still be exact),
- degenerate knobs: buckets=1, buckets >> n, rel_err at its coarsest,
  and the buckets=None default that sizes from shuffle.partitions.

Every case is checked bit-identical against the single-partition
global window it replaces, and `ranked_with_total`'s returned total
against the true row count.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from symtseries_spark.operators.rank import (
    _default_buckets,
    distributed_row_number,
    ranked_with_total,
)


def _mk(spark, rows, schema="id long, v double"):
    return spark.createDataFrame(rows, schema)


def _assert_matches_window(df, got, *, descending, out="rn"):
    key = F.col("v").desc() if descending else F.col("v").asc()
    exp = df.withColumn(
        out, F.row_number().over(Window.orderBy(key, "id")).cast("long")
    )
    g = {r["id"]: r[out] for r in got.collect()}
    e = {r["id"]: r[out] for r in exp.collect()}
    assert g == e


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("buckets", [1, 3, 1024])
def test_keys_on_exact_boundaries(spark, buckets, descending):
    """Keys drawn from a tiny grid so approxQuantile boundaries land
    ON key values: the <= bucketing edge must keep equal keys
    together whichever side of the boundary they fall."""
    rows = [(i, float(i % 5)) for i in range(100)]
    df = _mk(spark, rows)
    ranked, total = ranked_with_total(
        df, "v", tiebreak="id", out="rn", descending=descending,
        buckets=buckets, rel_err=0.0,  # exact quantiles: bounds ARE keys
    )
    assert total == 100
    _assert_matches_window(df, ranked, descending=descending)


@pytest.mark.parametrize("descending", [False, True])
def test_heavy_ties_single_dominant_key(spark, descending):
    """95% of rows share one key value: all ties must land in one
    bucket (ranks inside a tie run can't be split across buckets) and
    the remaining keys still rank exactly around them."""
    rows = [(i, 7.0) for i in range(950)]
    rows += [(950 + i, float(i)) for i in range(50)]
    df = _mk(spark, rows)
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", descending=descending, buckets=16
    )
    _assert_matches_window(df, got, descending=descending)


@pytest.mark.parametrize("descending", [False, True])
def test_infinite_keys_rank_at_extremes(spark, descending):
    """±Inf are legal doubles (only null/NaN are rejected): they must
    survive the quantile/count passes and rank strictly first/last."""
    rows = [(0, float("-inf")), (1, float("inf")), (2, float("inf"))]
    rows += [(3 + i, float(i)) for i in range(20)]
    df = _mk(spark, rows)
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", descending=descending, buckets=4
    )
    _assert_matches_window(df, got, descending=descending)


def test_negative_zero_shares_bucket_with_zero(spark):
    """-0.0 == 0.0 as doubles: they must share a bucket and be ordered
    purely by the tiebreak, exactly like the global window does."""
    rows = [(0, -0.0), (1, 0.0), (2, -0.0), (3, -1.0), (4, 1.0)]
    df = _mk(spark, rows)
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", buckets=3
    )
    _assert_matches_window(df, got, descending=False)


@pytest.mark.parametrize("descending", [False, True])
def test_long_keys_beyond_double_precision(spark, descending):
    """Adjacent longs above 2^53 collapse to ONE double in the bucket
    pass — legal, because collapsed keys simply share a bucket and the
    final window orders by the ORIGINAL long column. Ranks must stay
    exact even though the bucket function can't separate the values."""
    base = 1 << 53
    rows = [(i, base + i) for i in range(64)]  # consecutive: doubles tie
    rows += [(64 + i, i) for i in range(16)]
    df = _mk(spark, rows, "id long, v long")
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", descending=descending, buckets=8
    )
    _assert_matches_window(df, got, descending=descending)


def test_default_buckets_follow_shuffle_partitions(spark):
    """buckets=None must size the rank stage from the session's
    shuffle width (the round-8 fix for the hardcoded 64)."""
    conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = _mk(spark, [(i, float(i % 37)) for i in range(500)])
    assert _default_buckets(df) == conf_n
    ranked, total = ranked_with_total(
        df, "v", tiebreak="id", out="rn", descending=False
    )
    assert total == 500
    _assert_matches_window(df, ranked, descending=False)


def test_coarsest_rel_err_still_exact(spark):
    """Boundary placement only affects balance, never ranks: even a
    uselessly coarse quantile sketch must yield exact results."""
    df = _mk(spark, [(i, float(i % 11)) for i in range(300)])
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", buckets=8, rel_err=0.5
    )
    _assert_matches_window(df, got, descending=False)


# Adversarial value pool: exact-boundary grid points, denormals, the
# extremes of the double range, and long tie runs. Each drawn list is
# checked bit-identical to the global window in both directions.
pathological_pool = st.sampled_from(
    [
        float("-inf"),
        -1.7976931348623157e308,
        -1.0,
        -5e-324,  # smallest denormal
        -0.0,
        0.0,
        5e-324,
        1e-6,
        1.0,
        1.0,
        1.0,  # weighted: ties are the common case
        1.0000000000000002,  # 1.0's successor — adjacent doubles
        1.7976931348623157e308,
        float("inf"),
    ]
)


@pytest.mark.parametrize("descending", [False, True])
def test_tie_split_spreads_dominant_key(spark, descending):
    """Round-8 tie splitting: with a numeric tiebreak, a 90%-dominant
    key must be SUB-BUCKETED by tiebreak quantiles — no bucket may
    hold the whole tie run — while ranks stay bit-identical."""
    n = 2000
    rows = [(i, 7.0) for i in range(int(n * 0.9))]
    rows += [(int(n * 0.9) + i, float(i % 40)) for i in range(n - len(rows))]
    df = _mk(spark, rows)
    ranked, total = ranked_with_total(
        df, "v", tiebreak="id", out="rn", descending=descending,
        buckets=16, rel_err=0.001, _keep_bucket=True,
    )
    assert total == n
    per_bucket = {
        r["__bkt"]: r["c"]
        for r in ranked.groupBy("__bkt").agg(F.count("*").alias("c")).collect()
    }
    # the 1800-row tie run must be split across several buckets: the
    # largest bucket must hold well under the full run
    assert max(per_bucket.values()) < 1000, per_bucket
    assert len(per_bucket) >= 8
    _assert_matches_window(df, ranked.drop("__bkt"), descending=descending)


def test_tie_split_null_tiebreaks_rank_first(spark):
    """NULL tiebreaks inside a split tie run must land in the lowest
    sub-bucket (matching the window's nulls-first ascending order)."""
    rows = [(float(i), 5.0) for i in range(300)]
    rows += [(None, 5.0)] * 3
    rows += [(1000.0 + i, float(i)) for i in range(30)]
    df = spark.createDataFrame(
        [(i, t, v) for i, (t, v) in enumerate(rows)],
        "id long, tb double, v double",
    )
    ranked, _ = ranked_with_total(
        df, "v", tiebreak="tb", out="rn", descending=False,
        buckets=8, rel_err=0.001,
    )
    exp = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy(F.col("v").asc(), F.col("tb").asc()))
        .cast("long"),
    )
    g = {r["id"]: r["rn"] for r in ranked.collect()}
    e = {r["id"]: r["rn"] for r in exp.collect()}
    assert g == e


def test_tie_split_duplicate_tiebreaks_share_bucket(spark):
    """Equal (key, tiebreak) pairs must never straddle a sub-bucket
    boundary: with duplicates in the tiebreak itself, the rank is a
    valid permutation and keys/ties stay contiguous in rank order."""
    rows = [(i, float(i % 3), 9.0) for i in range(600)]
    rows += [(600 + i, float(i), float(i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, tb double, v double")
    ranked, total = ranked_with_total(
        df, "v", tiebreak="tb", out="rn", descending=False,
        buckets=16, rel_err=0.001,
    )
    assert total == 700
    got = ranked.select("rn", "v", "tb").collect()
    assert sorted(r["rn"] for r in got) == list(range(1, 701))
    by_rank = sorted(got, key=lambda r: r["rn"])
    composite = [(r["v"], r["tb"]) for r in by_rank]
    assert composite == sorted(composite)


class TestRankBoundaryProperties:
    @given(
        st.lists(pathological_pool, min_size=1, max_size=150),
        st.booleans(),
        st.sampled_from([1, 2, 5, 64]),
    )
    @settings(max_examples=8, deadline=None)
    def test_pathological_values_property(
        self, spark, vals, descending, buckets
    ):
        df = _mk(spark, [(i, v) for i, v in enumerate(vals)])
        ranked, total = ranked_with_total(
            df, "v", tiebreak="id", out="rn", descending=descending,
            buckets=buckets, rel_err=0.01,
        )
        assert total == len(vals)
        _assert_matches_window(df, ranked, descending=descending)


@pytest.mark.parametrize("descending", [False, True])
def test_binary_search_bucket_path_scalar(spark, descending):
    """bounds > _LINEAR_SCAN_MAX engages the binary-search bucket
    assignment (round 9) — distinct keys, many buckets, bit-identical
    to the global window."""
    rows = [(i, float((i * 37) % 997)) for i in range(3000)]
    df = _mk(spark, rows)
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", descending=descending, buckets=256
    )
    _assert_matches_window(df, got, descending=descending)


@pytest.mark.parametrize("descending", [False, True])
def test_binary_search_bucket_path_composite(spark, descending):
    """Binary search over COMPOSITE (key, tiebreak) boundaries: one
    dominant key forces tie-split cuts into a >64-entry boundary list;
    NULL-free and NULL-bearing tiebreaks both must match the window."""
    rows = [(i, 7.0) for i in range(2500)] + [
        (10_000 + i, float(i)) for i in range(500)
    ]
    df = _mk(spark, rows)
    got = distributed_row_number(
        df, "v", tiebreak="id", out="rn", descending=descending, buckets=128
    )
    _assert_matches_window(df, got, descending=descending)


def test_binary_search_null_tiebreak_on_heavy_key(spark):
    """A NULL tiebreak probing its own key's tie-split boundary yields
    a NULL comparison — the search must treat it as FALSE (lowest
    sub-bucket), matching both the linear filter's NULL-drop and the
    window's nulls-first ascending tie order."""
    rows = [(float(i), 7.0) for i in range(2500)] + [(None, 7.0)] * 8 + [
        (float(10_000 + i), float(i) % 13) for i in range(500)
    ]
    df = _mk(spark, rows, schema="id double, v double")
    got = distributed_row_number(df, "v", tiebreak="id", buckets=128)
    exp = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("v").asc(), "id")).cast("long"),
    )
    g = {r["rn"]: (r["v"], r["id"]) for r in got.collect()}
    e = {r["rn"]: (r["v"], r["id"]) for r in exp.collect()}
    assert g == e


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_two_level_bucket_expr_equals_linear_scan(spark, data):
    """The sqrt-decomposed bucket assignment (round 9) must count
    EXACTLY like the whole-array filter scan it replaced, for any
    sorted distinct boundary list above the linear cutoff and any
    probe values — including probes equal to boundaries, below all,
    above all, and NaN-free extremes."""
    from symtseries_spark.operators.rank import (
        _LINEAR_SCAN_MAX,
        _bucket_expr,
    )

    n_bounds = data.draw(
        st.integers(min_value=_LINEAR_SCAN_MAX + 1, max_value=300)
    )
    pool = data.draw(
        st.lists(
            st.floats(
                min_value=-1e9,
                max_value=1e9,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=n_bounds,
            max_size=n_bounds,
            unique=True,
        )
    )
    bounds = [(b, None) for b in sorted(pool)]
    # probes: each boundary itself, midpoints, and beyond-range values
    vals = sorted(pool)
    probes = (
        vals
        + [(a + b) / 2 for a, b in zip(vals, vals[1:])][:50]
        + [vals[0] - 1.0, vals[-1] + 1.0]
    )
    df = spark.createDataFrame([(float(p),) for p in probes], "p double")
    key = F.col("p")
    linear = F.size(
        F.filter(
            F.array(*[F.lit(float(kb)) for kb, _ in bounds]),
            lambda b: b <= key,
        )
    )
    two_level = _bucket_expr(bounds, key, F.lit(None).cast("double"))
    bad = df.select(
        (linear.cast("int") != two_level.cast("int")).alias("diff")
    ).where(F.col("diff")).count()
    assert bad == 0
