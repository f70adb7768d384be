"""Operator-level tests: the windowed operators and codegen-path distance
variants must match the pure-Python reference on randomized data,
including NaN/±Inf mixes that the DuckDB oracle (clean testdata) never
exercises."""

import math
import random

import pytest
from pyspark.sql import functions as F

from symtseries_spark import pykernel as pk
from symtseries_spark.functions.sax import sax_mindist_to_literal, sax_word_mindist
from symtseries_spark.operators import (
    allpairs_within,
    sliding_sax,
    tumbling_sax,
    whole_series_sax,
)

NAN = float("nan")
INF = float("inf")


def _series(rng, n, dirty=True):
    out = []
    for _ in range(n):
        r = rng.random()
        if dirty and r < 0.08:
            out.append(NAN)
        elif dirty and r < 0.12:
            out.append(INF if rng.random() < 0.5 else -INF)
        else:
            out.append(rng.uniform(-50, 50))
    return out


@pytest.fixture(scope="module")
def long_df(spark):
    rng = random.Random(99)
    rows = []
    for key in range(8):
        for seq, v in enumerate(_series(rng, rng.choice([5, 17, 40, 64]))):
            rows.append((key, seq, v))
    return (
        spark.createDataFrame(rows, "key int, seq int, v double"),
        rows,
    )


def test_sliding_matches_pykernel_replay(spark, long_df):
    df, rows = long_df
    n, w, c = 8, 4, 8
    got = {
        (r["key"], r["seq"]): r["sax_word"]
        for r in sliding_sax(df, key="key", order="seq", value="v", n=n, w=w, c=c).collect()
    }
    by_key: dict[int, list] = {}
    for key, seq, v in sorted(rows):
        by_key.setdefault(key, []).append((seq, v))
    for key, series in by_key.items():
        win = pk.SlidingWindow(n, w, c)
        for seq, v in series:
            expected = win.append(v)
            assert got[(key, seq)] == expected, (key, seq, got[(key, seq)], expected)


def test_sliding_full_windows_only(spark, long_df):
    df, rows = long_df
    got = sliding_sax(
        df, key="key", order="seq", value="v", n=8, w=4, c=8, emit_partial=False
    )
    counts = {r["key"]: r["cnt"] for r in got.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    by_key: dict[int, int] = {}
    for key, seq, v in rows:
        by_key[key] = by_key.get(key, 0) + 1
    for key, total in by_key.items():
        expected = max(0, total - 7)
        assert counts.get(key, 0) == expected


def test_tumbling_matches_pykernel(spark, long_df):
    df, rows = long_df
    n, w, c = 8, 2, 5
    got = {
        (r["series_key"], r["window_id"]): r["sax_word"]
        for r in tumbling_sax(df, key="key", order="seq", value="v", n=n, w=w, c=c).collect()
    }
    by_key: dict[int, list] = {}
    for key, seq, v in sorted(rows):
        by_key.setdefault(key, []).append(v)
    expected_count = 0
    for key, series in by_key.items():
        for wid in range(len(series) // n):
            chunk = series[wid * n : (wid + 1) * n]
            assert got[(key, wid)] == pk.encode(chunk, w, c), (key, wid)
            expected_count += 1
    assert len(got) == expected_count


def test_whole_series_matches_pykernel(spark, long_df):
    df, rows = long_df
    w, c = 4, 8
    got = {
        r["series_key"]: (r["n"], r["sax_word"])
        for r in whole_series_sax(df, key="key", order="seq", value="v", w=w, c=c).collect()
    }
    by_key: dict[int, list] = {}
    for key, seq, v in sorted(rows):
        by_key.setdefault(key, []).append(v)
    for key, series in by_key.items():
        usable = (len(series) // w) * w
        if usable < w:
            assert key not in got
            continue
        assert got[key][0] == usable
        assert got[key][1] == pk.encode(series[:usable], w, c)


def test_codegen_mindist_variants_match_pykernel(spark):
    rng = random.Random(5)
    for c in (3, 8, 16):
        alphabet = [pk.letter_of(i, c) for i in range(c)] + ["#"]
        w = 6
        pairs = [
            (
                "".join(rng.choice(alphabet) for _ in range(w)),
                "".join(rng.choice(alphabet) for _ in range(w)),
                w * rng.choice([1, 3]),
            )
            for _ in range(120)
        ]
        df = spark.createDataFrame(pairs, "wa string, wb string, n int")
        got = df.select(
            "wa", "wb", "n",
            sax_word_mindist(F.col("wa"), F.col("wb"), w=w, c=c, n=F.col("n")).alias("m"),
        ).collect()
        for r in got:
            exp = pk.mindist_parts(
                pk.parse(r["wa"], c), pk.parse(r["wb"], c), c=c, n_a=r["n"], n_b=r["n"]
            )
            assert abs(r["m"]["dist"] - exp[0]) < 1e-9
            assert abs(r["m"]["above"] - exp[1]) < 1e-9
            assert abs(r["m"]["below"] - exp[2]) < 1e-9

        pattern = "".join(rng.choice(alphabet) for _ in range(w))
        got2 = df.select(
            "wa", "n",
            sax_mindist_to_literal(
                F.col("wa"), pk.parse(pattern, c), c=c, n=F.col("n")
            ).alias("m"),
        ).collect()
        for r in got2:
            exp = pk.mindist_parts(
                pk.parse(r["wa"], c), pk.parse(pattern, c), c=c, n_a=r["n"], n_b=r["n"]
            )
            assert abs(r["m"]["dist"] - exp[0]) < 1e-9
            assert abs(r["m"]["above"] - exp[1]) < 1e-9
            assert abs(r["m"]["below"] - exp[2]) < 1e-9


def test_allpairs_matches_bruteforce(spark):
    rng = random.Random(21)
    c, w, n = 4, 4, 16
    alphabet = [pk.letter_of(i, c) for i in range(c)]
    words = [(k, "".join(rng.choice(alphabet) for _ in range(w)), n) for k in range(30)]
    df = spark.createDataFrame(words, "series_key int, sax_word string, n int")
    delta = 1.5
    got = {
        (r["key_a"], r["key_b"]): r["mindist"]
        for r in allpairs_within(df, w=w, c=c, delta=delta).collect()
    }
    expected = {}
    for ka, wa, na in words:
        for kb, wb, nb in words:
            if ka < kb:
                d = pk.mindist(pk.parse(wa, c), pk.parse(wb, c), c=c, n_a=na, n_b=nb)
                if d <= delta:
                    expected[(ka, kb)] = d
    assert set(got) == set(expected)
    for k, d in got.items():
        assert abs(d - expected[k]) < 1e-9


@pytest.mark.parametrize("dirty", [False, True])
def test_euclidean_refine_matches_bruteforce_and_lower_bound(spark, dirty):
    """Prune-then-refine: exact_dist must equal the Python-computed
    z-normalized Euclidean distance — including on NaN/Inf-dirty series
    the clean-testdata oracle never exercises. On complete series the
    (scaled) mindist candidate bound must never exceed it (the
    lower-bound law the reference states at include/symtseries.h:5-7).
    With missing values the law intentionally does NOT hold: '#' frames
    substitute the furthest letter (pessimistic, src/symtseries.c:612-620)
    while the exact distance skips non-finite positions, so dirty series
    only check the brute-force equality."""
    from symtseries_spark.operators import euclidean_refine, tumbling_values

    rng = random.Random(7)
    n, w, c = 16, 4, 8
    rows = []
    for key in range(10):
        for seq, v in enumerate(_series(rng, n, dirty=dirty)):
            rows.append((key, seq, v))
    df = spark.createDataFrame(rows, "key int, seq int, v double")

    words = tumbling_sax(df, key="key", order="seq", value="v", n=n, w=w, c=c)
    pairs = allpairs_within(
        words, w=w, c=c, delta=1e9, key_col="series_key", n_col=None
    )
    vals = tumbling_values(df, key="key", order="seq", value="v", n=n)
    scale = (n / w) ** 0.5
    refined = euclidean_refine(
        pairs.select("key_a", "key_b", (F.col("mindist") * scale).alias("lb")),
        vals.select("series_key", "vals"),
    ).collect()

    def znorm(vs):
        fin = [x for x in vs if math.isfinite(x)]
        mu, std = pk.mu_std(fin)
        if std < 1e-2:
            return [0.0 if math.isfinite(x) else x for x in vs]
        return [(x - mu) / std if math.isfinite(x) else x for x in vs]

    series = {}
    for key, seq, v in rows:
        series.setdefault(key, []).append(v)
    zs = {k: znorm(v) for k, v in series.items()}

    assert len(refined) == 10 * 9 // 2
    for r in refined:
        za, zb = zs[r["key_a"]], zs[r["key_b"]]
        exp = math.sqrt(
            sum(
                (x - y) ** 2
                for x, y in zip(za, zb)
                if math.isfinite(x) and math.isfinite(y)
            )
        )
        assert abs(r["exact_dist"] - exp) < 1e-9, (r, exp)
        if not dirty:
            # f32 LUT + frame aggregation tolerance, as in test_properties
            assert r["lb"] <= r["exact_dist"] + 1e-4, (r, exp)


class TestSlidingChunked:
    def test_chunked_equals_plain(self, spark, sf_dir):
        """Overlap-replicated chunk parallelism must be output-identical
        to the single-partition-per-series plan."""
        from pyspark.sql import functions as F
        from symtseries_spark.operators import sliding_sax
        from symtseries_spark.operators.windows import sliding_sax_chunked
        from symtseries_spark.sources import load

        events = load(spark, sf_dir, "events").where(F.col("user_id") < 15)
        kwargs = dict(
            key="user_id", order=["ts", "event_id"], value="value",
            n=8, w=4, c=8,
        )
        plain = {
            (r.user_id, r.event_id): r.sax_word
            for r in sliding_sax(events, **kwargs).collect()
        }
        for chunk in (16, 64):  # chunk smaller than series length -> real splits
            chunked = {
                (r.user_id, r.event_id): r.sax_word
                for r in sliding_sax_chunked(events, chunk=chunk, **kwargs).collect()
            }
            assert chunked == plain, chunk
        # emit_partial=False parity
        plain_full = {
            (r.user_id, r.event_id): r.sax_word
            for r in sliding_sax(events, emit_partial=False, **kwargs).collect()
        }
        chunked_full = {
            (r.user_id, r.event_id): r.sax_word
            for r in sliding_sax_chunked(
                events, chunk=16, emit_partial=False, **kwargs
            ).collect()
        }
        assert chunked_full == plain_full

    def test_chunk_validates(self, spark, sf_dir):
        import pytest as _pytest
        from symtseries_spark.operators.windows import sliding_sax_chunked
        from symtseries_spark.sources import load

        with _pytest.raises(ValueError):
            sliding_sax_chunked(
                load(spark, sf_dir, "events"),
                key="user_id", order=["ts"], value="value",
                n=8, w=4, c=8, chunk=4,
            )


class TestNullHandling:
    def test_null_values_behave_as_nan(self, spark):
        """NULL measurements must behave exactly like the reference's NaN
        inputs (missing) in every windowed operator."""
        import math
        from pyspark.sql import Row
        from pyspark.sql import functions as F
        from symtseries_spark import pykernel as pk
        from symtseries_spark.operators import sliding_sax, tumbling_sax

        vals = [1.0, None, 3.0, 10.0, None, None, 2.0, 5.0]
        rows = [Row(k=1, seq=i, v=v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, seq long, v double")

        got = {
            r.seq: r.sax_word
            for r in sliding_sax(
                df, key="k", order="seq", value="v", n=4, w=2, c=4
            ).collect()
        }
        win = pk.SlidingWindow(4, 2, 4)
        for i, v in enumerate(vals):
            expected = win.append(math.nan if v is None else v)
            assert got[i] == expected, i

        tumb = tumbling_sax(
            df, key="k", order="seq", value="v", n=4, w=2, c=4
        ).collect()
        by_win = {r.window_id: r.sax_word for r in tumb}
        assert by_win[0] == pk.encode([1.0, math.nan, 3.0, 10.0], 2, 4)
        assert by_win[1] == pk.encode([math.nan, math.nan, 2.0, 5.0], 2, 4)


class TestNumerosityReduce:
    def test_runs_collapse_and_reconstruct(self, spark):
        from pyspark.sql import functions as F

        from symtseries_spark.operators.windows import numerosity_reduce

        rows = [
            (1, 0, "AA"), (1, 1, "AA"), (1, 2, "AB"), (1, 3, "AA"),
            (1, 4, "AA"), (1, 5, "AA"),
            (2, 0, "CC"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, sax_word string"
        ).withColumn("event_id", F.col("ts") + 100)
        out = sorted(
            map(
                tuple,
                numerosity_reduce(
                    df, key="user_id", order=["ts", "event_id"],
                    id_col="event_id",
                ).collect(),
            )
        )
        assert out == [
            (1, 100, "AA", 2),
            (1, 102, "AB", 1),
            (1, 103, "AA", 3),
            (2, 100, "CC", 1),
        ]
        # run lengths reconstruct the original row count
        assert sum(r[3] for r in out) == len(rows)
