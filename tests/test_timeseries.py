"""Unit tests for operators.timeseries (rolling z-score, EWMA) and the
retrieval term-statistics operators (top_terms, repetition_metrics)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators import ewma, rolling_zscore
from symtseries_spark.operators.retrieval import repetition_metrics, top_terms


def _series(spark, values, key=1):
    return spark.createDataFrame(
        [Row(k=key, i=i, v=float(v)) for i, v in enumerate(values)]
    )


class TestRollingZscore:
    def test_matches_manual(self, spark):
        vals = [1.0, 2.0, 4.0, 8.0, 16.0]
        out = rolling_zscore(
            _series(spark, vals), key="k", order=["i"], value="v", window=3
        ).orderBy("i").collect()
        for r in out:
            lo = max(0, r.i - 2)
            frame = vals[lo : r.i + 1]
            n = len(frame)
            mu = sum(frame) / n
            var = sum(x * x for x in frame) / n - mu * mu
            assert r.n_window == n
            if var > 0:
                assert r.zscore == pytest.approx(
                    (vals[r.i] - mu) / math.sqrt(var), abs=1e-4
                )

    def test_flat_window_null(self, spark):
        out = rolling_zscore(
            _series(spark, [5.0, 5.0, 5.0]), key="k", order=["i"], value="v",
            window=3,
        ).collect()
        assert all(r.zscore is None for r in out)

    def test_window_validation(self, spark):
        with pytest.raises(ValueError):
            rolling_zscore(
                _series(spark, [1.0]), key="k", order=["i"], value="v", window=1
            )

    def test_partition_isolation(self, spark):
        df = _series(spark, [1.0, 100.0], key=1).union(
            _series(spark, [1.0, 1.0], key=2)
        )
        out = {
            (r.k, r.i): r.n_window
            for r in rolling_zscore(
                df, key="k", order=["i"], value="v", window=4
            ).collect()
        }
        assert out[(1, 0)] == 1 and out[(2, 1)] == 2


class TestEwma:
    def test_matches_recursion(self, spark):
        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
        alpha, window = 0.25, 3
        out = ewma(
            _series(spark, vals), key="k", order=["i"], value="v",
            alpha=alpha, window=window,
        ).orderBy("i").collect()
        for r in out:
            frame = vals[max(0, r.i - window + 1) : r.i + 1]
            acc = frame[0]
            for x in frame[1:]:
                acc = alpha * x + (1 - alpha) * acc
            assert r.ewma == pytest.approx(acc, abs=1e-6)

    def test_window_one_is_identity(self, spark):
        vals = [2.0, 7.0, 1.0]
        out = ewma(
            _series(spark, vals), key="k", order=["i"], value="v",
            alpha=0.5, window=1,
        ).orderBy("i").collect()
        assert [r.ewma for r in out] == vals

    def test_alpha_validation(self, spark):
        with pytest.raises(ValueError):
            ewma(_series(spark, [1.0]), key="k", order=["i"], value="v",
                 alpha=0.0, window=4)


class TestEwmaStream:
    def test_state_carries_across_batches(self, spark):
        """Two micro-batches must produce the same EWMA as the batch
        recursion over the concatenated series (state = one double)."""
        import tempfile
        import uuid

        from symtseries_spark.streaming import ewma_stream

        alpha = 0.25
        rows = [(1, i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9])]
        rows += [(2, i, float(v)) for i, v in enumerate([2, 7, 1])]
        df = spark.createDataFrame(rows, "k long, i long, v double")
        import glob as globmod
        import os

        in_dir = tempfile.mkdtemp(prefix="ewma_in_")
        stage = tempfile.mkdtemp(prefix="ewma_stage_")
        # batch 0: first half of each series; batch 1: the rest
        df.where("i < 3").coalesce(1).write.parquet(f"{stage}/b0")
        df.where("i >= 3").coalesce(1).write.parquet(f"{stage}/b1")
        for i in range(2):
            part = globmod.glob(f"{stage}/b{i}/part-*.parquet")[0]
            dst = f"{in_dir}/b{i}.parquet"
            os.rename(part, dst)
            os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        stream = spark.readStream.schema(df.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(in_dir)
        ew = ewma_stream(stream, key="k", order=["i"], value="v", alpha=alpha)
        name = f"ewma_t_{uuid.uuid4().hex[:8]}"
        q = (
            ew.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ewma_tc_"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r.k, r.i): r.ewma for r in spark.table(name).collect()
        }
        for key, series in ((1, [3, 1, 4, 1, 5, 9]), (2, [2, 7, 1])):
            acc = None
            for i, x in enumerate(series):
                acc = x if acc is None else alpha * x + (1 - alpha) * acc
                assert got[(key, i)] == pytest.approx(acc, abs=1e-12)


class TestTermStats:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                Row(doc_id=1, text="the cat sat on the mat"),
                Row(doc_id=2, text="the dog sat"),
                Row(doc_id=3, text="cat cat cat"),
            ]
        )

    def test_top_terms(self, spark):
        out = top_terms(self._docs(spark), topk=2, min_len=3).collect()
        assert [(r.term, r.occurrences, r.doc_freq) for r in out] == [
            ("cat", 4, 2),
            ("the", 3, 2),
        ]

    def test_repetition(self, spark):
        rows = {
            r.doc_id: r
            for r in repetition_metrics(self._docs(spark)).collect()
        }
        r3 = rows[3]
        assert r3.n_tokens == 3 and r3.n_distinct == 1
        assert r3.dup_ratio == pytest.approx(2 / 3, abs=1e-6)
        assert r3.top_share == pytest.approx(1.0, abs=1e-6)
        r2 = rows[2]
        assert r2.dup_ratio == 0.0 and r2.top_share == pytest.approx(1 / 3, abs=1e-6)


class TestRollingZscoreStream:
    def test_matches_batch_across_batches(self, spark):
        """Two micro-batches must reproduce the batch rolling_zscore
        exactly (state carries the trailing window across batches)."""
        import glob as globmod
        import math
        import os
        import tempfile
        import uuid

        from symtseries_spark.streaming import rolling_zscore_stream

        rows = [(k, i, float(v)) for k in (1, 2)
                for i, v in enumerate([5, 1, 9, 2, 8, 3, 7, 4])]
        df = spark.createDataFrame(rows, "k long, i long, v double")
        batch = {
            (r.k, r.i): r.zscore
            for r in rolling_zscore(
                df, key="k", order=["i"], value="v", window=4
            ).collect()
        }
        in_dir = tempfile.mkdtemp(prefix="zs_in_")
        stage = tempfile.mkdtemp(prefix="zs_stage_")
        df.where("i < 4").coalesce(1).write.parquet(f"{stage}/b0")
        df.where("i >= 4").coalesce(1).write.parquet(f"{stage}/b1")
        for i in range(2):
            part = globmod.glob(f"{stage}/b{i}/part-*.parquet")[0]
            dst = f"{in_dir}/b{i}.parquet"
            os.rename(part, dst)
            os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        stream = spark.readStream.schema(df.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(in_dir)
        z = rolling_zscore_stream(
            stream, key="k", order=["i"], value="v", window=4
        )
        name = f"zs_t_{uuid.uuid4().hex[:8]}"
        q = (
            z.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="zs_chk_"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {(r.k, r.i): r.zscore for r in spark.table(name).collect()}
        assert set(got) == set(batch)
        for kk, z_stream in got.items():
            z_batch = batch[kk]
            if z_batch is None:
                assert z_stream is None or math.isnan(z_stream)
            else:
                assert round(z_stream, 4) == pytest.approx(z_batch, abs=1e-9)


class TestEwmaNullSkip:
    def test_nulls_skipped_in_frame(self, spark):
        """Documented contract: NULL values drop out of the fold
        (collect_list semantics) rather than poisoning the frame."""
        rows = [(1, 0, 2.0), (1, 1, None), (1, 2, 6.0)]
        df = spark.createDataFrame(rows, "k long, i long, v double")
        out = {
            r.i: r.ewma
            for r in ewma(
                df, key="k", order=["i"], value="v", alpha=0.25, window=3
            ).collect()
        }
        assert out[0] == pytest.approx(2.0)
        # row 1: frame [2.0, NULL] -> fold over [2.0] only
        assert out[1] == pytest.approx(2.0)
        # row 2: frame [2.0, NULL, 6.0] -> 0.25*6 + 0.75*2
        assert out[2] == pytest.approx(0.25 * 6.0 + 0.75 * 2.0)


class TestStlDecompose:
    def test_reconstruction_identity_and_determinism(self, spark):
        from symtseries_spark.operators.timeseries import stl_decompose

        import math

        rows = [
            (1, i, float(10 + 5 * math.sin(i % 24 / 24 * 2 * math.pi) + 0.1 * i))
            for i in range(96)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        dfh = df.withColumn("hh", (F.col("ts") % 24).cast("long"))
        out = stl_decompose(
            dfh, key="user_id", order=["ts"], value="value",
            season="hh", trend_window=12,
        ).collect()
        assert len(out) == 96
        by_ts = {r["ts"]: r for r in out}
        for (uid, ts, v) in rows:
            r = by_ts[ts]
            # additive identity holds to quantization error (3 x 1e-6)
            assert abs(r["trend"] + r["seasonal"] + r["resid"] - v) < 5e-6
        again = stl_decompose(
            dfh, key="user_id", order=["ts"], value="value",
            season="hh", trend_window=12,
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_seasonal_captures_cycle(self, spark):
        """Pure seasonal signal, no trend: the residual should be tiny
        compared to the signal amplitude (seasonal soaks up the cycle)."""
        from symtseries_spark.operators.timeseries import stl_decompose

        import math

        rows = [
            (1, i, float(5 * math.sin((i % 24) / 24 * 2 * math.pi)))
            for i in range(24 * 8)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, value double"
        ).withColumn("hh", (F.col("ts") % 24).cast("long"))
        out = stl_decompose(
            df, key="user_id", order=["ts"], value="value",
            season="hh", trend_window=12,
        ).collect()
        # interior rows (full trend frames): residual well under amplitude
        interior = [r for r in out if 24 <= r["ts"] < 24 * 7]
        rms = (sum(r["resid"] ** 2 for r in interior) / len(interior)) ** 0.5
        assert rms < 1.0  # amplitude is 5


class TestAutocorrelation:
    def test_alternating_series_closed_form(self, spark):
        """x = +1,-1,+1,... (mean 0): the biased estimator gives
        acf_k = (-1)^k * (n-k)/n exactly."""
        from symtseries_spark.operators.timeseries import autocorrelation

        n = 40
        rows = [(1, i, 1.0 if i % 2 == 0 else -1.0) for i in range(n)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = {
            r["lag_k"]: r
            for r in autocorrelation(
                df, key="user_id", order=["ts"], value="value", max_lag=3
            ).collect()
        }
        import pytest as pt

        for k in (1, 2, 3):
            expected = ((-1) ** k) * (n - k) / n
            assert out[k]["acf"] == pt.approx(expected, abs=1e-6)
            assert out[k]["n_pairs"] == n - k

    def test_acf_bounds_on_real_data(self, spark, sf_dir):
        from symtseries_spark.operators.timeseries import autocorrelation
        from symtseries_spark.sources import load

        ev = load(spark, sf_dir, "events")
        out = autocorrelation(
            ev, key="user_id", order=["ts", "event_id"], value="value",
            max_lag=5,
        ).collect()
        assert all(-1.000001 <= r["acf"] <= 1.000001 for r in out)
        n_series = ev.select("user_id").distinct().count()
        assert len(out) == 5 * n_series


class TestHoltWinters:
    def test_gamma_zero_reduces_to_holt(self, spark):
        """With gamma=0 the seasonal slots stay at their zero seed, so
        level/trend follow the plain Holt recursion exactly."""
        from symtseries_spark.operators.timeseries import holt, holt_winters

        rows = [(1, i, float((i * 7) % 13) + 0.25 * i) for i in range(48)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        hw = {
            r["ts"]: (r["level"], r["trend"])
            for r in holt_winters(
                df, key="user_id", order=["ts"], value="value",
                alpha=0.5, beta=0.3, gamma=0.0, season=4, window=16,
            ).collect()
        }
        h = {
            r["ts"]: (r["level"], r["trend"])
            for r in holt(
                df, key="user_id", order=["ts"], value="value",
                alpha=0.5, beta=0.3, window=16,
            ).collect()
        }
        assert hw == h

    def test_null_rows_advance_phase_but_skip_fold(self, spark):
        """A NULL value row is dropped from the fold's value list but
        KEEPS its row position, so it advances the seasonal phase
        j = row_number % season (the docstring's contract, mirroring
        the SQL twin's unfiltered row_number + FILTERed list)."""
        import math

        from symtseries_spark.operators.timeseries import holt_winters

        a, b, g, season, window = 0.5, 0.3, 0.2, 4, 8
        xs = [5.0, 7.0, None, 4.0, 9.0, None, 6.0, 8.0, 3.0, 10.0]
        rows = [(1, i, xs[i]) for i in range(len(xs))]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, value double"
        )
        got = {
            r["ts"]: (r["level"], r["trend"], r["season_adj"], r["forecast"])
            for r in holt_winters(
                df, key="user_id", order=["ts"], value="value",
                alpha=a, beta=b, gamma=g, season=season, window=window,
            ).collect()
        }

        def qz(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        for i in range(len(xs)):
            # phase from the OVERALL row index — NULL rows counted
            j_i = i % season
            frame = [
                (xs[p], p % season)
                for p in range(max(0, i - (window - 1)), i + 1)
                if xs[p] is not None
            ]
            assert frame, "fixture keeps every frame non-empty"
            lv, tr = frame[0][0], 0.0
            ss = [0.0] * season
            for x, j in frame[1:]:
                l1 = a * (x - ss[j]) + (1 - a) * (lv + tr)
                t1 = b * (l1 - lv) + (1 - b) * tr
                ss[j] = g * (x - l1) + (1 - g) * ss[j]
                lv, tr = l1, t1
            exp = (
                qz(lv), qz(tr), qz(ss[j_i]),
                qz(lv + tr + ss[(j_i + 1) % season]),
            )
            assert got[i] == pytest.approx(exp, abs=1e-12), f"row {i}"

    def test_seasonal_beats_holt_on_periodic_signal(self, spark):
        """On a pure period-4 signal the HW one-step forecast error is
        far below Holt's once the seasonal slots have been visited."""
        from symtseries_spark.operators.timeseries import holt, holt_winters

        cycle = [10.0, 0.0, 5.0, -5.0]
        rows = [(1, i, cycle[i % 4]) for i in range(64)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        common = dict(key="user_id", order=["ts"], value="value")
        hw = {r["ts"]: r["forecast"] for r in holt_winters(
            df, alpha=0.3, beta=0.1, gamma=0.8, season=4, window=32, **common
        ).collect()}
        ho = {r["ts"]: r["forecast"] for r in holt(
            df, alpha=0.3, beta=0.1, window=32, **common
        ).collect()}
        actual = {i: cycle[(i + 1) % 4] for i in range(63)}
        hw_err = sum(abs(hw[i] - actual[i]) for i in range(40, 63))
        ho_err = sum(abs(ho[i] - actual[i]) for i in range(40, 63))
        assert hw_err < ho_err * 0.5

    def test_deterministic(self, spark, sf_dir):
        from symtseries_spark.operators.timeseries import holt_winters
        from symtseries_spark.sources import load

        ev = load(spark, sf_dir, "events")
        common = dict(
            key="user_id", order=["ts", "event_id"], value="value",
            alpha=0.5, beta=0.3, gamma=0.2, season=8, window=32,
        )
        a = sorted(map(tuple, holt_winters(ev, **common).collect()))
        b = sorted(map(tuple, holt_winters(ev, **common).collect()))
        assert a == b


class TestChangepoint:
    def test_finds_level_shift(self, spark):
        from symtseries_spark.operators.timeseries import changepoint

        vals = [0.0] * 10 + [10.0] * 10
        r = changepoint(
            _series(spark, vals), key="k", order=["i"], value="v"
        ).collect()
        assert len(r) == 1
        row = r[0]
        assert row.n == 20
        assert row.split_i == 10  # split after the last 0.0
        assert row.sse_split == pytest.approx(0.0, abs=1e-6)
        # no-split SSE of a half-0 half-10 series: n * var = 20 * 25
        assert row.sse_none == pytest.approx(500.0, abs=1e-4)
        assert row.gain == pytest.approx(500.0, abs=1e-4)

    def test_nulls_dropped_and_short_series_omitted(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.timeseries import changepoint

        df = spark.createDataFrame(
            [
                Row(k=1, i=0, v=1.0),
                Row(k=1, i=1, v=None),
                Row(k=1, i=2, v=1.0),
                Row(k=1, i=3, v=9.0),
                Row(k=2, i=0, v=5.0),  # n=1 -> no candidate split
            ],
            "k int, i int, v double",
        )
        out = {r.k: r for r in changepoint(
            df, key="k", order=["i"], value="v"
        ).collect()}
        assert set(out) == {1}
        assert out[1].n == 3  # null dropped before indexing
        assert out[1].split_i == 2

    def test_monotone_ramp_prefers_middle(self, spark):
        from symtseries_spark.operators.timeseries import changepoint

        vals = [float(x) for x in range(21)]
        row = changepoint(
            _series(spark, vals), key="k", order=["i"], value="v"
        ).collect()[0]
        # symmetric ramp: best two-mean split is dead center, and the
        # (sse, i) tiebreak keeps it deterministic
        assert row.split_i in (10, 11)
        assert row.gain > 0


class TestZipfFit:
    def test_power_law_slope_near_minus_one(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.retrieval import zipf_fit

        # term i occurs floor(600/i) times -> ideal Zipf slope -1
        words = []
        for i in range(1, 31):
            words += [f"w{i:02d}"] * (600 // i)
        df = spark.createDataFrame(
            [Row(doc_id=0, lang="en", text=" ".join(words))]
        )
        row = zipf_fit(df, top_v=30).collect()[0]
        assert row.lang == "en"
        assert row.n_terms == 30
        assert -1.1 < row.zipf_slope < -0.9
        assert row.zipf_intercept > 0

    def test_uniform_corpus_flat_slope(self, spark):
        from pyspark.sql import Row

        from symtseries_spark.operators.retrieval import zipf_fit

        text = " ".join(
            f"t{i}" for _ in range(5) for i in range(20)
        )  # all freqs equal
        df = spark.createDataFrame([Row(doc_id=0, lang="xx", text=text)])
        row = zipf_fit(df, top_v=20).collect()[0]
        assert abs(row.zipf_slope) < 1e-9

    def test_top_v_guard(self, spark):
        import pytest as _pt
        from pyspark.sql import Row

        from symtseries_spark.operators.retrieval import zipf_fit

        df = spark.createDataFrame([Row(doc_id=0, lang="en", text="a b")])
        with _pt.raises(ValueError):
            zipf_fit(df, top_v=2)


class TestStlStrength:
    def _strength(self, spark, vals):
        import math

        from pyspark.sql import Row

        from symtseries_spark.operators.timeseries import (
            stl_decompose,
            stl_strength,
        )

        df = spark.createDataFrame(
            [
                Row(k=1, i=i, hh=i % 4, v=float(v))
                for i, v in enumerate(vals)
            ]
        )
        stl = stl_decompose(
            df, key="k", order=["i"], value="v", season="hh", trend_window=4
        )
        return stl_strength(stl, key="k").collect()[0]

    def test_ramp_is_trend_dominated(self, spark):
        row = self._strength(spark, [float(x) for x in range(40)])
        assert row.n == 40
        assert row.trend_strength > 0.95
        # the ramp has no cycle: seasonal leg explains ~nothing
        assert (
            row.seasonal_strength is None
            or row.seasonal_strength < row.trend_strength
        )

    def test_pure_cycle_is_seasonal_dominated(self, spark):
        cyc = [0.0, 5.0, 0.0, -5.0] * 12
        row = self._strength(spark, cyc)
        assert row.seasonal_strength > 0.9
        assert row.seasonal_strength > (row.trend_strength or 0.0)


class TestChangepointSegments:
    def test_two_shifts_found(self, spark):
        from symtseries_spark.operators.timeseries import changepoint_segments

        vals = [0.0] * 10 + [5.0] * 10 + [9.0] * 10
        rows = changepoint_segments(
            _series(spark, vals), key="k", order=["i"], value="v"
        ).collect()
        by = {(r.level, r.side): r for r in rows}
        root = by[(1, "root")]
        assert root.split_i in (10, 20)
        # the OTHER shift is recovered by the level-2 pass on the
        # segment that still contains it
        lvl2_splits = {r.split_i for r in rows if r.level == 2}
        assert {10, 20} - {root.split_i} <= lvl2_splits
        # every emitted gain is the sse drop of its own segment
        for r in rows:
            assert r.gain == pytest.approx(
                r.sse_before - r.sse_after, abs=2e-6
            )
            assert r.gain >= -1e-9

    def test_homogeneous_segment_gains_nothing(self, spark):
        from symtseries_spark.operators.timeseries import changepoint_segments

        vals = [0.0] * 12 + [100.0] * 12
        rows = changepoint_segments(
            _series(spark, vals), key="k", order=["i"], value="v"
        ).collect()
        by = {(r.level, r.side): r for r in rows}
        assert by[(1, "root")].split_i == 12
        # both halves are constant: re-splitting explains nothing
        for side in ("left", "right"):
            assert by[(2, side)].gain == pytest.approx(0.0, abs=1e-6)

    def test_tiny_segments_emit_no_row(self, spark):
        from symtseries_spark.operators.timeseries import changepoint_segments

        # n=3, root split isolates a 1-point segment -> that side absent
        rows = changepoint_segments(
            _series(spark, [0.0, 0.0, 9.0]), key="k", order=["i"], value="v"
        ).collect()
        sides = {(r.level, r.side) for r in rows}
        assert (1, "root") in sides
        assert (2, "right") not in sides  # [9.0] alone cannot split


class TestPageHinkley:
    def test_drift_alarms_stationary_does_not(self, spark):
        from symtseries_spark.operators.timeseries import page_hinkley

        flat = [50.0 + (1.0 if i % 2 else -1.0) for i in range(30)]
        drift = [50.0] * 15 + [90.0] * 15
        df = _series(spark, flat, key=1).union(_series(spark, drift, key=2))
        out = page_hinkley(
            df, key="k", order=["i"], value="v", delta=5.0, lam=100.0
        )
        rows = out.collect()
        flat_alarms = [r.alarm for r in rows if r.k == 1]
        drift_alarms = [r.alarm for r in rows if r.k == 2]
        assert not any(flat_alarms)
        assert any(drift_alarms)
        # PH is nonnegative by construction
        assert all(r.ph >= 0 for r in rows)

    def test_lam_guard(self, spark):
        import pytest as _pt

        from symtseries_spark.operators.timeseries import page_hinkley

        with _pt.raises(ValueError):
            page_hinkley(
                _series(spark, [1.0]), key="k", order=["i"], value="v",
                delta=1.0, lam=0.0,
            )
