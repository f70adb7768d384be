"""k-means|| oversampling init (operators/cluster.py
kmeans_parallel_init; Bahmani et al. 2012).

The selection rule is deterministic (md5-rational u, integer-micro-unit
phi), so tests replay it exactly in pure Python and compare."""

import hashlib

import pytest

from symtseries_spark.operators.cluster import kmeans_parallel_init

M = 1 << 20


def _u(vec_id: int, r: int, salt: str = "kmpar") -> float:
    h = int(hashlib.md5(f"{vec_id}:{salt}:{r}".encode()).hexdigest()[:15], 16)
    return (h % M + 1) / float(M + 1)


def _sq_l2(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _reference(rows, k, rounds, ell):
    """Pure-Python replay of the documented algorithm."""
    rows = sorted(rows)
    centers = {rows[0][0]: rows[0][1]}
    for r in range(1, rounds + 1):
        d2i = {}
        for vid, v in rows:
            md2 = min(_sq_l2(v, c) for c in centers.values())
            import math

            d2i[vid] = int(math.floor(md2 * 1e6 + 0.5))
        phi = sum(d2i.values())
        for vid, v in rows:
            if _u(vid, r) * float(phi) < float(ell) * float(d2i[vid]):
                centers[vid] = v
    weights = {}
    for vid, v in rows:
        best = min(
            (( _sq_l2(v, c), cid) for cid, c in centers.items()),
        )
        weights[best[1]] = weights.get(best[1], 0) + 1
    return weights


def _rows(n, dim, seed=3):
    import random

    rnd = random.Random(seed)
    return [
        (i, [round(rnd.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(n)
    ]


def _run(spark, rows, dim, k=4, rounds=2, ell=None):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: r.weight
        for r in kmeans_parallel_init(
            df, k=k, dim=dim, rounds=rounds, ell=ell
        ).collect()
    }
    return got


def test_matches_python_replay(spark):
    rows = _rows(60, 4)
    got = _run(spark, rows, 4, k=4, rounds=2)
    assert got == _reference(rows, 4, 2, 8)


def test_weights_sum_to_corpus(spark):
    rows = _rows(50, 3, seed=11)
    got = _run(spark, rows, 3, k=3, rounds=3)
    assert sum(got.values()) == 50


def test_first_center_is_lowest_id(spark):
    rows = _rows(30, 2, seed=5)
    got = _run(spark, rows, 2, k=2, rounds=1)
    assert min(r[0] for r in rows) in got


def test_oversampling_grows_candidates(spark):
    # with ell >> k the candidate set should comfortably exceed k
    rows = _rows(80, 4, seed=9)
    got = _run(spark, rows, 4, k=4, rounds=3, ell=16)
    assert len(got) > 4
    assert got == _reference(rows, 4, 3, 16)


def test_duplicate_of_center_never_selected(spark):
    # a vector identical to the first center has d2 = 0 forever
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [9.0, 9.0])]
    got = _run(spark, rows, 2, k=2, rounds=2)
    assert 1 not in got
    assert got == _reference(rows, 2, 2, 4)


def test_validation(spark):
    import pyspark.sql.functions as F

    df = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError):
        kmeans_parallel_init(df, k=0, dim=1)
    with pytest.raises(ValueError):
        kmeans_parallel_init(df, k=1, dim=1, rounds=0)
    with pytest.raises(ValueError):
        kmeans_parallel_init(df, k=1, dim=1, ell=0)


def test_assign_labels_and_coverage(spark):
    from symtseries_spark.operators.cluster import kmeans_parallel_assign

    rows = _rows(60, 4, seed=21)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_parallel_assign(df, k=4, dim=4, rounds=2).collect()
    assert len(out) == 60
    assert {r.cluster for r in out} <= set(range(4))
    assert all(r.d2 >= 0.0 for r in out)


def test_assign_separates_obvious_clusters(spark):
    from symtseries_spark.operators.cluster import kmeans_parallel_assign

    lo = [(i, [0.0 + i * 1e-3, 0.0]) for i in range(10)]
    hi = [(i + 100, [50.0 + i * 1e-3, 50.0]) for i in range(10)]
    df = spark.createDataFrame(
        lo + hi, "vec_id long, embedding array<double>"
    )
    out = kmeans_parallel_assign(
        df, k=2, dim=2, rounds=2, recluster_iters=2
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.cluster, set()).add(r.vec_id)
    groups = sorted(by.values(), key=len)
    assert len(groups) == 2
    assert {frozenset(g) for g in groups} == {
        frozenset(i for i, _ in lo),
        frozenset(i for i, _ in hi),
    }


def test_assign_zero_recluster_uses_seed_candidates(spark):
    from symtseries_spark.operators.cluster import (
        _parallel_candidates,
        kmeans_parallel_assign,
    )

    rows = _rows(40, 3, seed=2)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = sorted(
        (r.cluster, r.centroid)
        for r in _parallel_candidates(df, k=3, dim=3, rounds=2).collect()
    )[:3]
    out = {
        r.vec_id: r.cluster
        for r in kmeans_parallel_assign(
            df, k=3, dim=3, rounds=2, recluster_iters=0
        ).collect()
    }
    # replay: nearest of the 3 seed centroids, (d2, label) tie order
    want = {}
    for vid, v in rows:
        want[vid] = min(
            (_sq_l2(v, c), lbl) for lbl, (_, c) in enumerate(cands)
        )[1]
    assert out == want


def test_assign_validation(spark):
    from symtseries_spark.operators.cluster import kmeans_parallel_assign

    df = spark.range(3).selectExpr(
        "id AS vec_id", "array(CAST(0.0 AS DOUBLE)) AS embedding"
    )
    with pytest.raises(ValueError):
        kmeans_parallel_assign(df, k=1, dim=1, recluster_iters=-1)
