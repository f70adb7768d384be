"""Banded DTW + LB_Keogh search (operators/dtw.py): brute-force DP
parity, bound admissibility, exact top-k through the prune."""

import random

import pytest
from pyspark.sql import functions as F

from symtseries_spark.operators.dtw import (
    dtw_distance,
    dtw_topk,
    hourly_profile,
    lb_keogh,
)

INF = float("inf")


def brute_dtw(x, q, band):
    n = len(q)
    D = [[INF] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if abs(i - j) > band:
                continue
            c = (x[i] - q[j]) ** 2
            if i == 0 and j == 0:
                D[i][j] = c
            else:
                D[i][j] = c + min(
                    D[i - 1][j] if i > 0 else INF,
                    D[i][j - 1] if j > 0 else INF,
                    D[i - 1][j - 1] if i > 0 and j > 0 else INF,
                )
    return D[n - 1][n - 1]


def brute_lb(x, q, band):
    n = len(q)
    s = 0.0
    for which in ("above", "below"):
        acc = 0.0
        for j in range(n):
            w = q[max(0, j - band) : min(n, j + band + 1)]
            if which == "above" and x[j] > max(w):
                acc += (x[j] - max(w)) * (x[j] - max(w))
            if which == "below" and x[j] < min(w):
                acc += (min(w) - x[j]) * (min(w) - x[j])
        s += acc
    return s


def _rows(m, n, seed):
    rnd = random.Random(seed)
    return [
        (i, [round(rnd.uniform(-2, 2), 3) for _ in range(n)])
        for i in range(m)
    ]


def test_dtw_and_lb_match_brute_force(spark):
    n, band = 8, 2
    rows = _rows(30, n, seed=5)
    q = [round(random.Random(99).uniform(-2, 2), 3) for _ in range(n)]
    df = spark.createDataFrame(rows, "key long, x array<double>")
    got = df.select(
        "key",
        dtw_distance(F.col("x"), q, band=band).alias("d"),
        lb_keogh(F.col("x"), q, band=band).alias("lb"),
    ).collect()
    xs = dict(rows)
    for r in got:
        assert r.d == brute_dtw(xs[r.key], q, band)
        assert r.lb == brute_lb(xs[r.key], q, band)
        assert r.lb <= r.d + 1e-12  # admissibility


def test_topk_equals_brute_force_through_prune(spark):
    n, band, k = 8, 2, 5
    rows = _rows(40, n, seed=7)
    q = rows[3][1]
    df = spark.createDataFrame(rows, "key long, x array<double>")
    got = [(r.dtw, r.key) for r in dtw_topk(df, q, k=k, band=band).collect()]
    want = sorted((brute_dtw(x, q, band), kk) for kk, x in rows)[:k]
    assert got == want
    assert got[0] == (0.0, 3)  # self-match leads


def test_band_zero_is_squared_euclidean(spark):
    rows = _rows(10, 6, seed=11)
    q = [0.5] * 6
    df = spark.createDataFrame(rows, "key long, x array<double>")
    got = df.select(
        "key", dtw_distance(F.col("x"), q, band=0).alias("d")
    ).collect()
    xs = dict(rows)
    for r in got:
        assert abs(r.d - sum((a - b) ** 2 for a, b in zip(xs[r.key], q))) < 1e-12


def test_wide_band_dominates_narrow(spark):
    # more warping freedom can only lower the distance
    rows = _rows(12, 8, seed=13)
    q = rows[0][1]
    df = spark.createDataFrame(rows, "key long, x array<double>")
    wide = {
        r.key: r.d
        for r in df.select(
            "key", dtw_distance(F.col("x"), q, band=7).alias("d")
        ).collect()
    }
    narrow = {
        r.key: r.d
        for r in df.select(
            "key", dtw_distance(F.col("x"), q, band=1).alias("d")
        ).collect()
    }
    for key in wide:
        assert wide[key] <= narrow[key] + 1e-12


def test_hourly_profile_shape(spark):
    df = spark.createDataFrame(
        [
            (1, 0, 10.0),                      # hour 0
            (1, 3_600_000_000_000, 20.0),      # hour 1 (nanos)
            (2, 0, 5.0),
        ],
        "user_id long, ts long, value double",
    )
    got = {r.key: r.x for r in hourly_profile(df).collect()}
    assert got[1][0] == 10.0 and got[1][1] == 20.0
    assert got[1][2:] == [0.0] * 22
    assert got[2][0] == 5.0 and sum(got[2]) == 5.0


def test_validation(spark):
    df = spark.createDataFrame([(1, [0.0])], "key long, x array<double>")
    with pytest.raises(ValueError):
        dtw_distance(F.col("x"), [], band=1)
    with pytest.raises(ValueError):
        dtw_distance(F.col("x"), [1.0], band=-1)
    with pytest.raises(ValueError):
        dtw_topk(df, [1.0], k=0, band=1)


def brute_frechet(x, q, band):
    n = len(q)
    D = [[INF] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if abs(i - j) > band:
                continue
            c = (x[i] - q[j]) ** 2
            if i == 0 and j == 0:
                D[i][j] = c
            else:
                D[i][j] = max(
                    c,
                    min(
                        D[i - 1][j] if i > 0 else INF,
                        D[i][j - 1] if j > 0 else INF,
                        D[i - 1][j - 1] if i > 0 and j > 0 else INF,
                    ),
                )
    return D[n - 1][n - 1]


def test_frechet_matches_brute_and_is_admissible(spark):
    from symtseries_spark.operators.dtw import frechet_distance, lb_frechet

    n, band = 8, 2
    rows = _rows(25, n, seed=17)
    q = rows[4][1]
    df = spark.createDataFrame(rows, "key long, x array<double>")
    got = df.select(
        "key",
        frechet_distance(F.col("x"), q, band=band).alias("d"),
        lb_frechet(F.col("x"), q, band=band).alias("lb"),
    ).collect()
    xs = dict(rows)
    for r in got:
        assert r.d == brute_frechet(xs[r.key], q, band)
        assert r.lb <= r.d + 1e-12


def test_frechet_topk_exact_through_prune(spark):
    from symtseries_spark.operators.dtw import frechet_topk

    n, band, k = 8, 2, 5
    rows = _rows(35, n, seed=23)
    q = rows[1][1]
    df = spark.createDataFrame(rows, "key long, x array<double>")
    got = [
        (r.frechet, r.key)
        for r in frechet_topk(df, q, k=k, band=band).collect()
    ]
    want = sorted((brute_frechet(x, q, band), kk) for kk, x in rows)[:k]
    assert got == want


def test_frechet_le_dtw(spark):
    # bottleneck cost never exceeds the summed path cost
    from symtseries_spark.operators.dtw import frechet_distance

    rows = _rows(15, 8, seed=29)
    q = rows[0][1]
    df = spark.createDataFrame(rows, "key long, x array<double>")
    both = df.select(
        "key",
        dtw_distance(F.col("x"), q, band=2).alias("d"),
        frechet_distance(F.col("x"), q, band=2).alias("f"),
    ).collect()
    for r in both:
        assert r.f <= r.d + 1e-12
