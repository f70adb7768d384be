"""Unit tests for operators/drift.py — the PSI / chi-square /
Mann-Whitney distribution-drift battery. Every expected value is
computed by an independent pure-Python implementation of the textbook
formula (never by re-running the Spark expression), so these are
true cross-checks in the spirit of the DuckDB oracles."""
import math
import random

import pytest
from pyspark.sql import functions as F

from symtseries_spark.operators.drift import (
    chisq_independence,
    mann_whitney_u,
    psi_by_group,
)


def _psi_ref(group_counts, total_counts, n_bins, alpha):
    """Pure-python PSI: add-alpha smoothed over the full bin domain."""
    n_g = sum(group_counts.values())
    n_t = sum(total_counts.values())
    s = 0.0
    for b in range(n_bins):
        p = (group_counts.get(b, 0) + alpha) / (n_g + alpha * n_bins)
        q = (total_counts.get(b, 0) + alpha) / (n_t + alpha * n_bins)
        s += (p - q) * math.log(p / q)
    return math.floor(s * 1e6 + 0.5) / 1e6


class TestPSI:
    def test_single_group_is_exactly_zero(self, spark):
        # one group == the whole corpus -> p and q identical -> PSI 0
        rows = [("a", i % 4) for i in range(40)]
        df = spark.createDataFrame(rows, "g string, b int")
        out = psi_by_group(df, group="g", bin_col="b", n_bins=4).collect()
        assert len(out) == 1
        assert out[0].n_rows == 40
        assert out[0].psi == 0.0

    def test_matches_pure_python_reference(self, spark):
        rng = random.Random(7)
        rows = []
        for g, weights in [("web", [8, 1, 1, 1, 1]), ("wiki", [1, 1, 4, 4, 2])]:
            for _ in range(200):
                b = rng.choices(range(5), weights=weights)[0]
                rows.append((g, b))
        df = spark.createDataFrame(rows, "g string, b int")
        got = {
            r.g: (r.n_rows, r.psi)
            for r in psi_by_group(df, group="g", bin_col="b", n_bins=5).collect()
        }
        total = {}
        per_g = {"web": {}, "wiki": {}}
        for g, b in rows:
            total[b] = total.get(b, 0) + 1
            per_g[g][b] = per_g[g].get(b, 0) + 1
        for g in per_g:
            n, psi = got[g]
            assert n == 200
            assert psi == pytest.approx(_psi_ref(per_g[g], total, 5, 1), abs=2e-6)
        # the two cohorts pull against each other -> both clearly "shifted"
        assert got["web"][1] > 0.1 and got["wiki"][1] > 0.1

    def test_empty_bins_still_finite(self, spark):
        # group "a" never hits bins 2..9 -> smoothing keeps PSI finite
        rows = [("a", 0)] * 30 + [("b", i % 10) for i in range(30)]
        df = spark.createDataFrame(rows, "g string, b int")
        out = {r.g: r.psi for r in
               psi_by_group(df, group="g", bin_col="b", n_bins=10).collect()}
        assert all(math.isfinite(v) for v in out.values())
        # both diverge from the blended total; exact values via reference
        total = {0: 33, **{b: 3 for b in range(1, 10)}}
        total[0] = 33
        assert out["a"] == pytest.approx(
            _psi_ref({0: 30}, total, 10, 1), abs=2e-6)
        assert out["b"] == pytest.approx(
            _psi_ref({b: 3 for b in range(10)}, total, 10, 1), abs=2e-6)
        assert out["a"] > 0.0 and out["b"] > 0.0

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 0)], "g string, b int")
        with pytest.raises(ValueError):
            psi_by_group(df, group="g", bin_col="b", n_bins=1)
        with pytest.raises(ValueError):
            psi_by_group(df, group="g", bin_col="b", n_bins=4, alpha=0)

    def test_from_counts_equals_row_level(self, spark):
        from symtseries_spark.operators.drift import psi_from_counts

        rows = [("a", i % 3) for i in range(30)] + [
            ("b", i % 5) for i in range(25)
        ]
        df = spark.createDataFrame(rows, "g string, b int")
        via_rows = {
            (r.g, r.n_rows, r.psi)
            for r in psi_by_group(df, group="g", bin_col="b", n_bins=6).collect()
        }
        cells = df.groupBy("g", "b").count()
        via_counts = {
            (r.g, r.n_rows, r.psi)
            for r in psi_from_counts(
                cells, group="g", bin_col="b", count="count", n_bins=6
            ).collect()
        }
        assert via_counts == via_rows


class TestChiSquare:
    def test_perfect_independence_is_zero(self, spark):
        # counts proportional across rows -> observed == expected
        rows = (
            [("x", "u")] * 10 + [("x", "v")] * 30
            + [("y", "u")] * 20 + [("y", "v")] * 60
        )
        df = spark.createDataFrame(rows, "a string, b string")
        out = chisq_independence(df, a="a", b="b").collect()[0]
        assert (out.n, out.dof, out.chisq) == (120, 1, 0.0)

    def test_textbook_2x2(self, spark):
        # observed [[10, 20], [30, 5]]; expected from margins
        rows = (
            [("x", "u")] * 10 + [("x", "v")] * 20
            + [("y", "u")] * 30 + [("y", "v")] * 5
        )
        df = spark.createDataFrame(rows, "a string, b string")
        out = chisq_independence(df, a="a", b="b").collect()[0]
        n = 65
        obs = {("x", "u"): 10, ("x", "v"): 20, ("y", "u"): 30, ("y", "v"): 5}
        ra = {"x": 30, "y": 35}
        rb = {"u": 40, "v": 25}
        want = sum(
            (obs[(i, j)] - ra[i] * rb[j] / n) ** 2 / (ra[i] * rb[j] / n)
            for i in ra for j in rb
        )
        assert out.n == n and out.dof == 1
        assert out.chisq == pytest.approx(want, abs=2e-6)

    def test_observed_zero_cell_carries_expected_mass(self, spark):
        # cell (y, v) never observed; dropping it would understate chisq
        rows = [("x", "u")] * 5 + [("x", "v")] * 5 + [("y", "u")] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        out = chisq_independence(df, a="a", b="b").collect()[0]
        n = 20
        ra = {"x": 10, "y": 10}
        rb = {"u": 15, "v": 5}
        obs = {("x", "u"): 5, ("x", "v"): 5, ("y", "u"): 10, ("y", "v"): 0}
        want = sum(
            (obs[(i, j)] - ra[i] * rb[j] / n) ** 2 / (ra[i] * rb[j] / n)
            for i in ra for j in rb
        )
        assert out.chisq == pytest.approx(want, abs=2e-6)
        assert out.chisq > 0.0


def _mwu_ref(avals, bvals):
    """Brute-force U_a = sum over pairs of 1[a>b] + 0.5*1[a==b]."""
    u = 0.0
    for a in avals:
        for b in bvals:
            u += 1.0 if a > b else (0.5 if a == b else 0.0)
    return u


class TestMannWhitney:
    def _run(self, spark, avals, bvals):
        rows = [("A", v) for v in avals] + [("B", v) for v in bvals]
        df = spark.createDataFrame(rows, "g string, v int")
        return mann_whitney_u(
            df, group="g", value_int="v", group_a="A", group_b="B"
        ).collect()[0]

    def test_total_separation(self, spark):
        lo = self._run(spark, [1, 2, 3], [10, 11, 12, 13])
        assert (lo.n_a, lo.n_b, lo.u_a, lo.auc) == (3, 4, 0.0, 0.0)
        hi = self._run(spark, [10, 11, 12], [1, 2, 3, 4])
        assert (hi.u_a, hi.auc) == (12.0, 1.0)

    def test_all_tied(self, spark):
        out = self._run(spark, [5, 5, 5], [5, 5])
        assert out.u_a == pytest.approx(3.0)  # n_a*n_b/2
        assert out.auc == 0.5

    def test_matches_brute_force_randomized(self, spark):
        rng = random.Random(11)
        for trial in range(3):
            avals = [rng.randint(0, 15) for _ in range(rng.randint(5, 40))]
            bvals = [rng.randint(3, 20) for _ in range(rng.randint(5, 40))]
            out = self._run(spark, avals, bvals)
            want = _mwu_ref(avals, bvals)
            assert out.u_a == pytest.approx(want), (trial, avals, bvals)
            assert out.auc == pytest.approx(
                math.floor(want / (len(avals) * len(bvals)) * 1e6 + 0.5) / 1e6,
                abs=1e-9,
            )

    def test_other_groups_excluded(self, spark):
        rows = [("A", 1), ("B", 2), ("C", 100), ("C", -100)]
        df = spark.createDataFrame(rows, "g string, v int")
        out = mann_whitney_u(
            df, group="g", value_int="v", group_a="A", group_b="B"
        ).collect()[0]
        assert (out.n_a, out.n_b) == (1, 1)
