"""Tests for operators/search.py:discords (HOT-SAX discord discovery)."""

import pytest

from symtseries_spark.operators.search import discords

N, W, C = 8, 4, 4


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long, value double")


@pytest.fixture(scope="module")
def planted(spark):
    """One series: 7 repeats of a gentle ramp pattern, one window of a
    violent spike shape planted in the middle (window_id 3)."""
    base = [1.0, 2.0, 3.0, 4.0, 4.0, 3.0, 2.0, 1.0]
    spike = [1.0, 2.0, 50.0, -40.0, 30.0, -20.0, 2.0, 1.0]
    vals = base * 3 + spike + base * 3
    return _mk(spark, [(1, i, v) for i, v in enumerate(vals)])


class TestDiscords:
    def test_planted_anomaly_is_top_discord(self, planted):
        rows = discords(
            planted, key="user_id", order="ts", value="value",
            n=N, w=W, c=C, rare_words=4, top=3,
        ).collect()
        assert rows, "expected at least one discord"
        assert rows[0]["window_id"] == 3
        assert rows[0]["nn_dist"] > rows[-1]["nn_dist"] or len(rows) == 1
        # scores are sorted descending with deterministic tie order
        dists = [r["nn_dist"] for r in rows]
        assert dists == sorted(dists, reverse=True)

    def test_single_window_series_not_reported(self, spark):
        """A series with one full window has no neighbor — excluded."""
        df = _mk(
            spark,
            [(1, i, float(i)) for i in range(N)]      # exactly 1 window
            + [(2, i, float(i % 3)) for i in range(3 * N)],
        )
        rows = discords(
            df, key="user_id", order="ts", value="value",
            n=N, w=W, c=C, rare_words=8, top=10,
        ).collect()
        assert all(r["series_key"] == 2 for r in rows)

    def test_nn_distance_value(self, spark):
        """Two identical windows + one offset window: the offset
        window's NN distance is exactly sqrt(n * offset^2)."""
        a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
        off = [v + 10.0 for v in a]
        df = _mk(spark, [(1, i, v) for i, v in enumerate(a + a + off)])
        rows = discords(
            df, key="user_id", order="ts", value="value",
            n=N, w=W, c=C, rare_words=8, top=3,
        ).collect()
        by_win = {r["window_id"]: r for r in rows}
        assert by_win[2]["nn_dist"] == pytest.approx(
            (N * 100.0) ** 0.5, abs=1e-6
        )
        # the twin windows' NN distance is 0 (each other)
        for wid in (0, 1):
            if wid in by_win:
                assert by_win[wid]["nn_dist"] == 0.0
