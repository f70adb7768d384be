"""Unit tests for the deterministic HyperLogLog sketch and the
median/MAD robust z-score, against Python references."""

import hashlib
import math
import statistics

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators.sketches import (
    hll_alpha,
    hll_estimate,
    hll_rank_width,
    hll_registers,
)
from symtseries_spark.operators.timeseries import mad_zscore


def py_hll(values, p):
    m = 1 << p
    regs = {}
    width = hll_rank_width(p)
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket = h % m
        w = h >> p
        rank = width - w.bit_length() + 1 if w > 0 else width + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = hll_alpha(m) * m * m / s
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return regs, m * math.log(m / zeros)
    return regs, raw


class TestHll:
    def test_registers_match_python(self, spark):
        vals = [f"value-{i}" for i in range(200)]
        df = spark.createDataFrame([Row(v=v) for v in vals])
        regs = {
            r.bucket: r.max_rank
            for r in hll_registers(df, col="v", p=6).collect()
        }
        exp_regs, _ = py_hll(vals, 6)
        assert regs == exp_regs

    def test_estimate_accuracy_and_parity(self, spark):
        n = 1000
        vals = [f"item-{i}" for i in range(n)]
        df = spark.createDataFrame([Row(v=v) for v in vals])
        out = hll_estimate(hll_registers(df, col="v", p=9), p=9).first()
        _, exp_est = py_hll(vals, 9)
        assert out.hll_est == pytest.approx(exp_est, abs=1e-3)
        # within ~3 standard errors (1.04/sqrt(512) ~ 4.6%)
        assert abs(out.hll_est - n) / n < 0.15

    def test_duplicates_do_not_inflate(self, spark):
        df = spark.createDataFrame(
            [Row(v=f"x-{i % 50}") for i in range(5000)]
        )
        out = hll_estimate(hll_registers(df, col="v", p=9), p=9).first()
        assert abs(out.hll_est - 50) / 50 < 0.2

    def test_merge_by_max(self, spark):
        """Registers from two shards merged by max == registers of the
        union — the property that makes HLL scale."""
        a = [f"a-{i}" for i in range(300)]
        b = [f"b-{i}" for i in range(300)] + a[:100]
        df_a = spark.createDataFrame([Row(v=v) for v in a])
        df_b = spark.createDataFrame([Row(v=v) for v in b])
        ra = hll_registers(df_a, col="v", p=6)
        rb = hll_registers(df_b, col="v", p=6)
        merged = (
            ra.unionAll(rb)
            .groupBy("bucket")
            .agg(F.max("max_rank").alias("max_rank"))
        )
        union_df = spark.createDataFrame([Row(v=v) for v in set(a) | set(b)])
        direct = hll_registers(union_df, col="v", p=6)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_p_validation(self, spark):
        df = spark.createDataFrame([Row(v="x")])
        with pytest.raises(ValueError):
            hll_registers(df, col="v", p=3)


class TestLinearTrend:
    def test_matches_closed_form(self, spark):
        from symtseries_spark.operators import linear_trend

        # y = 3 + 2i with noise-free values -> exact slope/intercept
        rows = [Row(k=1, i=i, v=float(3 + 2 * (i + 1))) for i in range(10)]
        rows += [Row(k=2, i=i, v=5.0) for i in range(4)]  # flat
        rows += [Row(k=3, i=0, v=9.0)]  # single point -> NULLs
        df = spark.createDataFrame(rows)
        out = {r.k: r for r in linear_trend(
            df, key="k", order=["i"], value="v"
        ).collect()}
        assert out[1].slope == pytest.approx(2.0)
        assert out[1].intercept == pytest.approx(3.0)
        assert out[2].slope == pytest.approx(0.0)
        assert out[2].intercept == pytest.approx(5.0)
        assert out[3].slope is None and out[3].intercept is None

    def test_matches_numpy_on_noise(self, spark):
        import numpy as np

        from symtseries_spark.operators import linear_trend

        rng = np.random.RandomState(7)
        vals = (0.5 * np.arange(1, 51) + rng.normal(0, 2, 50)).tolist()
        df = spark.createDataFrame(
            [Row(k=1, i=i, v=float(v)) for i, v in enumerate(vals)]
        )
        r = linear_trend(df, key="k", order=["i"], value="v").first()
        slope, intercept = np.polyfit(np.arange(1, 51), vals, 1)
        assert r.slope == pytest.approx(slope, abs=1e-5)
        assert r.intercept == pytest.approx(intercept, abs=1e-5)

    def test_null_values_keep_time_axis(self, spark):
        from symtseries_spark.operators import linear_trend

        # y defined at indices 1,2,4 (index 3 null): fit uses i=1,2,4
        rows = [
            Row(k=1, i=0, v=2.0),
            Row(k=1, i=1, v=4.0),
            Row(k=1, i=2, v=None),
            Row(k=1, i=3, v=8.0),
        ]
        df = spark.createDataFrame(rows, "k long, i long, v double")
        r = linear_trend(df, key="k", order=["i"], value="v").first()
        assert r.n == 3
        assert r.slope == pytest.approx(2.0)  # exact fit y = 2i


def py_mad(frame, x):
    med = statistics.median(frame)
    mad = statistics.median([abs(v - med) for v in frame])
    if mad == 0:
        return None
    return 0.6745 * (x - med) / mad


class TestMadZscore:
    def _series(self, spark, values):
        return spark.createDataFrame(
            [Row(k=1, i=i, v=float(v)) for i, v in enumerate(values)]
        )

    def test_matches_python_oracle(self, spark):
        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 50.0]
        out = mad_zscore(
            self._series(spark, vals), key="k", order=["i"], value="v",
            window=5,
        ).orderBy("i").collect()
        for r in out:
            frame = vals[max(0, r.i - 4) : r.i + 1]
            exp = py_mad(frame, vals[r.i])
            assert r.n_window == len(frame)
            if exp is None:
                assert r.rzscore is None
            else:
                assert r.rzscore == pytest.approx(exp, abs=1e-4)

    def test_robust_to_earlier_spike(self, spark):
        """A huge earlier outlier must NOT mask a later moderate
        anomaly (the failure mode of mean/sigma z-scores)."""
        from symtseries_spark.operators import rolling_zscore

        vals = [5.0, 5.1, 4.9, 5.0, 1000.0, 5.05, 4.95, 5.0, 5.1, 20.0]
        df = self._series(spark, vals)
        mad = {
            r.i: r.rzscore
            for r in mad_zscore(
                df, key="k", order=["i"], value="v", window=8
            ).collect()
        }
        cls = {
            r.i: r.zscore
            for r in rolling_zscore(
                df, key="k", order=["i"], value="v", window=8
            ).collect()
        }
        # the 20.0 at i=9: robust score flags it hard...
        assert mad[9] is not None and abs(mad[9]) > 3.5
        # ...while the sigma-based score is drowned by the 1000.0 still
        # inside the frame
        assert cls[9] is not None and abs(cls[9]) < 1.0

    def test_flat_mad_null(self, spark):
        out = mad_zscore(
            self._series(spark, [5.0, 5.0, 5.0, 7.0]), key="k", order=["i"],
            value="v", window=3,
        ).orderBy("i").collect()
        assert out[1].rzscore is None  # frame [5,5] -> MAD 0

    def test_window_validation(self, spark):
        with pytest.raises(ValueError):
            mad_zscore(
                self._series(spark, [1.0]), key="k", order=["i"], value="v",
                window=1,
            )


class TestMadStream:
    def test_stream_equals_batch_across_batches(self, spark):
        """Two micro-batches must reproduce the batch operator's scores
        over the concatenated series (state = last window-1 values)."""
        import glob as globmod
        import os
        import tempfile
        import uuid

        from symtseries_spark.streaming import mad_zscore_stream

        win = 4
        rows = [(1, i, float(v)) for i, v in
                enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
        rows += [(2, i, float(v)) for i, v in enumerate([7, 7, 7, 70])]
        df = spark.createDataFrame(rows, "k long, i long, v double")
        in_dir = tempfile.mkdtemp(prefix="mads_in_")
        stage = tempfile.mkdtemp(prefix="mads_stage_")
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
        ms = mad_zscore_stream(stream, key="k", order=["i"], value="v",
                               window=win)
        name = f"mads_t_{uuid.uuid4().hex[:8]}"
        q = (
            ms.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="mads_tc_"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {(r.k, r.i): (r.n_window, r.rzscore)
               for r in spark.table(name).collect()}
        series = {1: [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0],
                  2: [7.0, 7.0, 7.0, 70.0]}
        for k, vals in series.items():
            for i, x in enumerate(vals):
                frame = vals[max(0, i - win + 1): i + 1]
                exp = py_mad(frame, x)
                n, rz = got[(k, i)]
                assert n == len(frame)
                if exp is None:
                    # flat-MAD sentinel: NaN, or NULL after the Arrow
                    # boundary's NaN->null conversion
                    assert rz is None or rz != rz
                else:
                    assert rz == pytest.approx(exp, abs=1e-12)
