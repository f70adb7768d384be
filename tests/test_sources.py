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


class TestWriteZordered:
    def test_zorder_key_matches_python_morton(self, spark):
        from pyspark.sql import functions as F

        from symtseries_spark.sources import zorder_key

        def py_morton(vals, bits):
            z = 0
            for i, v in enumerate(vals):
                v &= (1 << bits) - 1
                for j in range(bits):
                    z |= ((v >> j) & 1) << (j * len(vals) + i)
            return z

        df = spark.createDataFrame(
            [(a, b) for a in [0, 1, 5, 63, 255] for b in [0, 2, 7, 100]],
            "a long, b long",
        )
        out = df.select(
            "a", "b", zorder_key([F.col("a"), F.col("b")], bits=8).alias("z")
        ).collect()
        for r in out:
            assert r.z == py_morton([r.a, r.b], 8), (r.a, r.b)

    def test_second_column_predicate_prunes_files(self, spark, tmp_path):
        """On a (u, d) grid, a predicate on the SECOND column alone must
        have tight per-file bands under Z-order (every file is a curve
        tile) where single-column range clustering leaves d spanning the
        full domain in every file."""
        import glob

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from symtseries_spark.sources import write_compacted, write_zordered

        grid = spark.range(0, 64 * 64).select(
            (F.col("id") % 64).alias("u"), (F.col("id") / 64).cast("long").alias("d")
        )
        zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
        nz = write_zordered(
            grid, zpath, cluster_cols=["u", "d"], target_rows_per_file=256,
            bits=6,
        )
        write_compacted(
            grid, rpath, target_rows_per_file=256, order_cols=["u"]
        )
        assert nz == 16

        def candidates(path, lo, hi):
            n = 0
            for p in glob.glob(f"{path}/part-*.parquet"):
                d = pq.read_table(p, columns=["d"])["d"].to_pylist()
                if min(d) <= hi and max(d) >= lo:
                    n += 1
            return n

        z_cand = candidates(zpath, 10, 13)
        r_cand = candidates(rpath, 10, 13)
        assert r_cand == 16          # u-range layout: every file has all d
        assert z_cand < r_cand / 2   # curve tiles: most files skipped
        # layout is a pure reordering
        got = sorted(
            (r.u, r.d) for r in spark.read.parquet(zpath).collect()
        )
        assert got == sorted((r.u, r.d) for r in grid.collect())

    def test_bit_budget_validation(self, spark, tmp_path):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from symtseries_spark.sources import zorder_key

        with _pytest.raises(ValueError):
            zorder_key([F.col("a")], bits=8)
        with _pytest.raises(ValueError):
            zorder_key([F.col("a"), F.col("b")], bits=32)
