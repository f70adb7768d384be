"""Streaming parity: the reference's own metamorphic property — feeding a
window value-by-value equals batch encoding (src/symtseries.c:816-850) —
lifted to Structured Streaming: sliding_sax_stream over a file stream
must equal batch sliding_sax over the same rows."""

from __future__ import annotations

import math
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark import pykernel as pk
from symtseries_spark.operators import sliding_sax
from symtseries_spark.streaming import sliding_sax_stream
from symtseries_spark.streaming.sliding import _encode_windows

N, W, C = 8, 4, 8


class TestEncodeWindowsKernel:
    def test_matches_pykernel_random(self):
        rng = np.random.default_rng(42)
        vals = rng.normal(size=200)
        # inject missing/infinite values like the reference's property test
        vals[rng.random(200) < 0.08] = math.nan
        vals[rng.random(200) < 0.04] = math.inf
        vals[rng.random(200) < 0.04] = -math.inf
        words = _encode_windows(vals, N, W, C)
        for i, word in enumerate(words):
            window = list(vals[i : i + N])
            assert word == pk.encode(window, W, C), f"window {i}"

    def test_partial_prefix(self):
        history = [math.nan] * N + [1.0, 2.0, 3.0]
        words = _encode_windows(np.array(history), N, W, C)[-3:]
        win = pk.SlidingWindow(N, W, C)
        expected = [win.append(v) for v in [1.0, 2.0, 3.0]]
        assert words == expected


@pytest.mark.slow
class TestStreamingParity:
    def test_stream_equals_batch(self, spark, sf_dir):
        from symtseries_spark.sources import load

        events = (
            load(spark, sf_dir, "events")
            .where(F.col("user_id") < 20)
            .select("user_id", "ts", "event_id", "value")
        )
        schema = events.schema
        in_dir = tempfile.mkdtemp(prefix="sax_stream_in_")
        chk_dir = tempfile.mkdtemp(prefix="sax_stream_chk_")
        try:
            # two files -> two micro-batches; per-key arrival order across
            # batches follows file order, matching the batch sort because
            # the split is on the order column
            split = events.agg(F.expr("percentile(ts, 0.5)")).collect()[0][0]
            events.where(F.col("ts") <= split).coalesce(1).write.parquet(
                f"{in_dir}/b0"
            )
            events.where(F.col("ts") > split).coalesce(1).write.parquet(
                f"{in_dir}/b1"
            )
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{in_dir}/b*")
            )
            words = sliding_sax_stream(
                stream,
                key="user_id",
                order=["ts", "event_id"],
                value="value",
                n=N,
                w=W,
                c=C,
            )
            q = (
                words.writeStream.format("memory")
                .queryName("sax_stream_out")
                .outputMode("append")
                .option("checkpointLocation", chk_dir)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            got = {
                (r.user_id, r.event_id): r.sax_word
                for r in spark.sql("SELECT * FROM sax_stream_out").collect()
            }
            expected = {
                (r.user_id, r.event_id): r.sax_word
                for r in sliding_sax(
                    events,
                    key="user_id",
                    order=["ts", "event_id"],
                    value="value",
                    n=N,
                    w=W,
                    c=C,
                ).collect()
            }
            assert len(got) == len(expected) > 0
            mismatches = {
                k: (got[k], expected[k]) for k in expected if got[k] != expected[k]
            }
            assert not mismatches, list(mismatches.items())[:5]
        finally:
            shutil.rmtree(in_dir, ignore_errors=True)
            shutil.rmtree(chk_dir, ignore_errors=True)
