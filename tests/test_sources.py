"""iSAX-bucketed storage layout: partitioned write + pruned read."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from symtseries_spark import pykernel as pk
from symtseries_spark.operators import tumbling_sax
from symtseries_spark.sources import load, read_words_bucket, write_words_bucketed

PARAMS = dict(n=16, w=4, c=8)


class TestBucketedLayout:
    def test_roundtrip_and_partition_pruning(self, spark, sf_dir):
        words = tumbling_sax(
            load(spark, sf_dir, "events"),
            key="user_id", order=["ts", "event_id"], value="value", **PARAMS,
        )
        out_dir = tempfile.mkdtemp(prefix="sax_bucketed_")
        try:
            write_words_bucketed(words, out_dir, c=8, coarse_c=2)
            # pick a pattern whose bucket is non-empty
            some_word = words.limit(1).collect()[0].sax_word
            got = read_words_bucket(spark, out_dir, some_word, c=8, coarse_c=2)
            expected = {
                (r.series_key, r.window_id): r.sax_word
                for r in words.collect()
                if pk.coarsen(r.sax_word, 8, 2) == pk.coarsen(some_word, 8, 2)
            }
            actual = {
                (r.series_key, r.window_id): r.sax_word for r in got.collect()
            }
            assert actual == expected and len(actual) > 0
            # the filter must land on the partition column, not the rows
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "PartitionFilters" in plan
            assert "isax_bucket" in plan.split("PartitionFilters")[1][:200]
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


class TestMultilevelLayout:
    def test_two_level_pruning_and_equivalence(self, spark, sf_dir):
        """The nested c=2/c=4 layout must (a) prune with PartitionFilters
        on BOTH level columns and (b) return exactly the rows the flat
        coarse filter at the finest level would (breakpoint nesting:
        l1 equality implies l0 equality)."""
        from symtseries_spark.functions.sax import sax_coarsen
        from symtseries_spark.sources import (
            read_words_multilevel,
            write_words_multilevel,
        )

        words = tumbling_sax(
            load(spark, sf_dir, "events"),
            key="user_id", order=["ts", "event_id"], value="value", **PARAMS,
        )
        out_dir = tempfile.mkdtemp(prefix="sax_ml_")
        try:
            write_words_multilevel(words, out_dir, c=8, levels=(2, 4))
            some_word = words.limit(1).collect()[0].sax_word
            got = read_words_multilevel(
                spark, out_dir, some_word, c=8, levels=(2, 4)
            )
            expected = {
                (r.series_key, r.window_id): r.sax_word
                for r in words.where(
                    sax_coarsen(F.col("sax_word"), 8, 4)
                    == pk.coarsen(some_word, 8, 4)
                ).collect()
            }
            actual = {
                (r.series_key, r.window_id): r.sax_word for r in got.collect()
            }
            assert actual == expected and len(actual) > 0
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "PartitionFilters" in plan
            pf = plan.split("PartitionFilters")[1][:300]
            assert "isax_l0" in pf and "isax_l1" in pf
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_levels_must_increase(self, spark, sf_dir):
        from symtseries_spark.sources import write_words_multilevel

        words = tumbling_sax(
            load(spark, sf_dir, "events").where(F.col("user_id") < 3),
            key="user_id", order=["ts", "event_id"], value="value", **PARAMS,
        )
        with pytest.raises(ValueError):
            write_words_multilevel(words, "/tmp/unused", c=8, levels=(4, 2))
        with pytest.raises(ValueError):
            write_words_multilevel(words, "/tmp/unused", c=8, levels=(2, 8))


class TestLoadSeries:
    def test_csv_and_json_roundtrip(self, spark, sf_dir):
        import shutil as _shutil
        import tempfile as _tempfile

        from symtseries_spark.operators import tumbling_sax
        from symtseries_spark.sources import load_series

        events = load(spark, sf_dir, "events").where(F.col("user_id") < 10).select(
            "user_id", "ts", "event_id", "value"
        )
        ddl = "user_id long, ts long, event_id long, value double"
        base = _tempfile.mkdtemp(prefix="src_fmt_")
        try:
            events.coalesce(1).write.option("header", "true").csv(f"{base}/csv")
            events.coalesce(1).write.json(f"{base}/json")
            expected = {
                (r.series_key, r.window_id): r.sax_word
                for r in tumbling_sax(
                    events, key="user_id", order=["ts", "event_id"],
                    value="value", **PARAMS,
                ).collect()
            }
            for fmt in ("csv", "json"):
                df = load_series(spark, f"{base}/{fmt}", fmt=fmt, schema=ddl)
                got = {
                    (r.series_key, r.window_id): r.sax_word
                    for r in tumbling_sax(
                        df, key="user_id", order=["ts", "event_id"],
                        value="value", **PARAMS,
                    ).collect()
                }
                assert got == expected and len(got) > 0, fmt
            with pytest.raises(ValueError):
                load_series(spark, base, fmt="csv")  # schema required
            with pytest.raises(ValueError):
                load_series(spark, base, fmt="orc2")
        finally:
            _shutil.rmtree(base, ignore_errors=True)


class TestBucketedTables:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        """Two tables bucketed+sorted on the join key must join with NO
        Exchange and NO Sort on either side (the co-located-join layout
        a 100 TB deployment stores its fact tables in)."""
        from symtseries_spark.sources import load, write_bucketed_table

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        orders = load(spark, sf_dir, "orders")
        lineitem = load(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed_table(
            orders, "b_orders", key="o_orderkey", num_buckets=4
        )
        write_bucketed_table(
            lineitem, "b_lineitem", key="o_orderkey", num_buckets=4
        )
        try:
            j = spark.table("b_orders").join(
                spark.table("b_lineitem"), "o_orderkey"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            n = j.count()
            expect = (
                load(spark, sf_dir, "orders")
                .join(
                    load(spark, sf_dir, "lineitem"),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
                .count()
            )
            assert n == expect
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


class TestWriteCompacted:
    def test_file_count_and_range_clustering(self, spark, tmp_path):
        import glob

        from pyspark.sql import functions as F

        from symtseries_spark.sources import write_compacted

        df = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        path = str(tmp_path / "compact")
        n_files = write_compacted(
            df, path, target_rows_per_file=2500, order_cols=["k"]
        )
        assert n_files == 4
        parts = glob.glob(f"{path}/part-*.parquet")
        assert len(parts) == 4
        # range clustering: per-file key bands must not overlap
        import pyarrow.parquet as pq

        bands = []
        for p in parts:
            t = pq.read_table(p, columns=["k"])["k"]
            bands.append((t[0].as_py(), t[-1].as_py(), len(t)))
        bands.sort()
        for (lo1, hi1, _), (lo2, hi2, _) in zip(bands, bands[1:]):
            assert hi1 < lo2
        # similarly sized files (range partitioner is sample-based; allow slack)
        sizes = sorted(b[2] for b in bands)
        assert sizes[0] > 1000 and sizes[-1] < 5000
        # round-trip
        assert spark.read.parquet(path).count() == 10_000

    def test_invalid_target_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from symtseries_spark.sources import write_compacted

        with _pytest.raises(ValueError):
            write_compacted(
                spark.range(5), str(tmp_path / "x"), target_rows_per_file=0
            )
