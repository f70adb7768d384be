"""Windowed SAX word extraction over long-form series tables.

Input shape is always the production-long form ``(key, order, value)``
— e.g. the testdata ``events`` table as ``(user_id, ts, value)``.

Scale notes (the 100 TB contract):

* Each operator shuffles **once**, on the series key — the same hash
  partitioning a 1000-executor cluster would use; no driver-side
  collection anywhere.
* The per-row state after windowing is an ``array<double>`` of length
  n <= 4096 (reference cap) that immediately collapses to a <=2048-char
  word, so shuffle width is bounded and small.
* Skew: series keys with pathological row counts can be salted upstream;
  AQE skew-join handling covers the join consumers downstream.
* All expressions are JVM-side (no Python UDFs) — see functions/sax.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import BREAKPOINTS, LETTERS, MISSING, STAT_EPS, validate_params
from ..functions.sax import is_finite, sax_encode

_NAN = float("nan")
_INF = float("inf")


def _value_as_double(value: str | Column) -> Column:
    # NULL measurements behave like the reference's NaN ("missing") inputs
    col = F.col(value) if isinstance(value, str) else value
    return F.coalesce(col.cast("double"), F.lit(_NAN))


def sliding_sax(
    df: DataFrame,
    *,
    key: str | list[str],
    order: str | list[str],
    value: str,
    n: int,
    w: int,
    c: int,
    out: str = "sax_word",
    emit_partial: bool = True,
) -> DataFrame:
    """Per-row sliding-window SAX word: for every event, the word over the
    last ``n`` values of its series — the batch twin of the reference's
    emit-on-every-append window (src/symtseries.c:481-492).

    Partial windows (the first n-1 rows of each series) are NaN-padded at
    the *front*, yielding leading '#' frames exactly like the reference's
    NaN-prefilled ring buffer (src/symtseries.c:313-315); pass
    ``emit_partial=False`` to keep only full windows.
    """
    validate_params(n, w, c)
    f = n // w
    key_cols = [key] if isinstance(key, str) else list(key)
    order_cols = [order] if isinstance(order, str) else list(order)
    base = Window.partitionBy(*key_cols).orderBy(*order_cols)
    full = base.rowsBetween(-(n - 1), 0)

    # Implementation note: this is NOT the array collect_list + sax_encode
    # form — Spark evaluates higher-order array functions interpreted,
    # which costs ~1ms/row. Instead each PAA frame is its own window
    # aggregate over a row sub-frame and the bucketing is a CASE chain.
    # CRITICAL plan shape: the raw window aggregates are materialized as
    # columns in their OWN projection before the letter arithmetic —
    # Spark does not common-subexpression-eliminate repeated window
    # expressions, so inlining them into the CASE chain multiplies the
    # WindowExec work ~9x (observed _we0.._we89 for w=4, c=8). Split this
    # way, WindowExec computes exactly 2w+2 running aggregates in one
    # sorted pass and the letter CASEs run codegen'd over plain columns.
    v = _value_as_double(value)
    vf = F.when(is_finite(v), v)  # stats see only finite values
    vn = F.when(~F.isnan(v), v)  # frames skip NaN but keep ±Inf
    stage = df.withColumn("__vf", vf).withColumn("__vn", vn)

    aggs = {
        "__mu": F.avg("__vf").over(full),
        "__sigma": F.coalesce(F.stddev_pop("__vf").over(full), F.lit(0.0)),
    }
    for j in range(w):
        lo = j * f - (n - 1)  # frame j in window offsets (0 = current row)
        frame = base.rowsBetween(lo, lo + f - 1)
        aggs[f"__s{j}"] = F.sum("__vn").over(frame)
        aggs[f"__c{j}"] = F.count("__vn").over(frame)
    if not emit_partial:
        aggs["__cnt"] = F.count(F.lit(1)).over(full)
    stage = stage.withColumns(aggs)

    mu, sigma = F.col("__mu"), F.col("__sigma")
    letters = []
    for j in range(w):
        s, cnt = F.col(f"__s{j}"), F.col(f"__c{j}")
        z = F.when(sigma < STAT_EPS, F.lit(0.0)).otherwise(
            (s - cnt * mu) / (cnt * sigma)
        )
        bucket = F.when(z < BREAKPOINTS[c][0], LETTERS[0])
        for i, b in enumerate(BREAKPOINTS[c][1:], start=1):
            bucket = bucket.when(z < b, LETTERS[i])
        bucket = bucket.otherwise(LETTERS[c - 1])
        letters.append(
            F.when((cnt == 0) | F.isnan(s), MISSING)
            .when(s == F.lit(_INF), LETTERS[c - 1])
            .when(s == F.lit(-_INF), LETTERS[0])
            .otherwise(bucket)
        )

    result = stage.withColumn(out, F.concat(*letters))
    if not emit_partial:
        result = result.where(F.col("__cnt") == n)
    return result.drop("__vf", "__vn", "__cnt", *aggs.keys())


def sliding_sax_chunked(
    df: DataFrame,
    *,
    key: str,
    order: str | list[str],
    value: str,
    n: int,
    w: int,
    c: int,
    chunk: int = 65536,
    out: str = "sax_word",
    emit_partial: bool = True,
) -> DataFrame:
    """:func:`sliding_sax` with intra-series parallelism for very long
    series. Plain ``sliding_sax`` partitions by the series key, so ONE
    multi-billion-row series serializes onto one task; this variant
    splits each series into ``chunk``-row chunks and replicates the
    n-1 rows before each boundary into the next chunk (overlap-aware
    parallel sliding window), then runs the same window plan partitioned
    by (key, chunk). Identical output, two shuffles instead of one —
    use when max series length >> chunk.
    """
    validate_params(n, w, c)
    if chunk < n:
        raise ValueError("chunk must be >= n")
    order_cols = [order] if isinstance(order, str) else list(order)
    rn = F.row_number().over(Window.partitionBy(key).orderBy(*order_cols)) - 1
    staged = df.withColumn("__rn", rn)
    # rows in the last n-1 positions of a chunk also serve the next
    # chunk's lookback; emit 1 or 2 (chunk_id, is_owner) assignments
    own = F.floor(F.col("__rn") / chunk).cast("long")
    needs_copy = (F.col("__rn") % chunk) >= (chunk - (n - 1))
    assignments = F.when(
        needs_copy,
        F.array(
            F.struct(own.alias("cid"), F.lit(True).alias("owner")),
            F.struct((own + 1).alias("cid"), F.lit(False).alias("owner")),
        ),
    ).otherwise(F.array(F.struct(own.alias("cid"), F.lit(True).alias("owner"))))
    exploded = staged.withColumn("__a", F.explode(assignments)).select(
        "*", F.col("__a.cid").alias("__cid"), F.col("__a.owner").alias("__owner")
    ).drop("__a")

    inner = sliding_sax(
        exploded,
        key=[key, "__cid"],
        order=["__rn"],
        value=value,
        n=n,
        w=w,
        c=c,
        out=out,
        emit_partial=True,
    )
    result = inner.where(F.col("__owner")).drop("__cid", "__owner")
    if not emit_partial:
        result = result.where(F.col("__rn") >= n - 1)
    return result.drop("__rn")


def tumbling_values(
    df: DataFrame,
    *,
    key: str,
    order: str | list[str],
    value: str,
    n: int,
    out: str = "vals",
    keep_partial: bool = False,
) -> DataFrame:
    """Non-overlapping windows of ``n`` consecutive rows per series key ->
    ``(series_key, window_id, vals: array<double>)`` in series order —
    the raw-series companion of :func:`tumbling_sax`, used by
    exact-distance refinement (:func:`..operators.search.euclidean_refine`).

    One shuffle (partitionBy key for row_number) + a map-side-combinable
    groupBy on (key, window_id); the per-group state is bounded by the
    reference's n <= 4096 cap. Partial trailing windows are dropped by
    default; with ``keep_partial=True`` they are NaN-padded at the back.
    """
    order_cols = [order] if isinstance(order, str) else list(order)
    rn = F.row_number().over(Window.partitionBy(key).orderBy(*order_cols))
    with_id = df.select(
        F.col(key).alias("series_key"),
        ((rn - 1) / n).cast("long").alias("window_id"),
        ((rn - 1) % n).alias("pos"),
        _value_as_double(value).alias("v"),
    )
    grouped = with_id.groupBy("series_key", "window_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("vals")
    )
    if keep_partial:
        vals = F.concat(
            F.col("vals"),
            F.array_repeat(F.lit(_NAN), F.lit(n) - F.size("vals")),
        )
    else:
        grouped = grouped.where(F.size("vals") == n)
        vals = F.col("vals")
    return grouped.select("series_key", "window_id", vals.alias(out))


def tumbling_sax(
    df: DataFrame,
    *,
    key: str,
    order: str | list[str],
    value: str,
    n: int,
    w: int,
    c: int,
    out: str = "sax_word",
    keep_partial: bool = False,
) -> DataFrame:
    """Non-overlapping windows of ``n`` consecutive rows per series key ->
    one row ``(key, window_id, sax_word)`` per window.

    One shuffle (partitionBy key for row_number) + a map-side-combinable
    groupBy on (key, window_id). Partial trailing windows are dropped by
    default (their length is not a multiple of w); with
    ``keep_partial=True`` they are NaN-padded at the *back* to n values.
    """
    validate_params(n, w, c)
    return tumbling_values(
        df, key=key, order=order, value=value, n=n, keep_partial=keep_partial
    ).select(
        "series_key", "window_id", sax_encode(F.col("vals"), w, c).alias(out)
    )


def whole_series_sax(
    df: DataFrame,
    *,
    key: str,
    order: str | list[str],
    value: str,
    w: int,
    c: int,
    out: str = "sax_word",
) -> DataFrame:
    """One SAX word per series over its entire history, plus the series
    length ``n`` (needed for mindist compression scaling).

    Series whose length is not a multiple of ``w`` are truncated to the
    largest multiple (engine extension; the reference would reject them,
    src/symtseries.c:515-521). Series shorter than ``w`` are dropped.

    Scale design: fully long-form/relational — NO per-series array is
    ever materialized, so a series of any length (billions of points)
    streams through bounded per-row state. Plan: one sort-shuffle on the
    series key for positions, a map-side-combinable groupBy for the w
    frame partials, a broadcast-able stats join, and a w-row collect per
    series for the final word (w <= 2048 by the reference cap).
    """
    validate_params(w * 2, w, c)
    order_cols = [order] if isinstance(order, str) else list(order)
    win = Window.partitionBy(key).orderBy(*order_cols)
    v = _value_as_double(value)
    positioned = df.select(
        F.col(key).alias("series_key"),
        (F.row_number().over(win) - 1).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy(key)).alias("series_len"),
        F.when(is_finite(v), v).alias("__vf"),
        F.when(~F.isnan(v), v).alias("__vn"),
    )
    usable = (F.floor(F.col("series_len") / w) * w).cast("long")
    truncated = positioned.where(
        (F.col("series_len") >= w) & (F.col("pos") < usable)
    ).withColumn("frame_id", (F.col("pos") / (usable / w)).cast("int"))

    frames = truncated.groupBy("series_key", "frame_id").agg(
        F.sum("__vn").alias("fsum"),
        F.count("__vn").alias("fcnt"),
    )
    stats = truncated.groupBy("series_key").agg(
        F.avg("__vf").alias("mu"),
        F.coalesce(F.stddev_pop("__vf"), F.lit(0.0)).alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )

    s, cnt = F.col("fsum"), F.col("fcnt")
    z = F.when(F.col("sigma") < STAT_EPS, F.lit(0.0)).otherwise(
        (s - cnt * F.col("mu")) / (cnt * F.col("sigma"))
    )
    bucket = F.when(z < BREAKPOINTS[c][0], LETTERS[0])
    for i, b in enumerate(BREAKPOINTS[c][1:], start=1):
        bucket = bucket.when(z < b, LETTERS[i])
    bucket = bucket.otherwise(LETTERS[c - 1])
    letter = (
        F.when((cnt == 0) | F.isnan(s), MISSING)
        .when(s == F.lit(_INF), LETTERS[c - 1])
        .when(s == F.lit(-_INF), LETTERS[0])
        .otherwise(bucket)
    )
    lettered = frames.join(stats, "series_key").select(
        "series_key", "n", "frame_id", letter.alias("letter")
    )
    return lettered.groupBy("series_key", "n").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("frame_id", "letter"))),
                lambda x: x["letter"],
            ),
        ).alias(out)
    ).select("series_key", F.col("n").cast("int").alias("n"), out)


def numerosity_reduce(
    words: DataFrame,
    *,
    key: str,
    order: str | list[str],
    id_col: str,
    word_col: str = "sax_word",
) -> DataFrame:
    """Numerosity reduction: collapse RUNS of consecutive identical SAX
    words per series -> ``(key, start_<id>, word, run_length)``.

    The standard SAX-stream preprocessing step (Lin & Keogh's
    numerosity reduction): overlapping sliding windows emit long runs
    of the same word over smooth stretches; downstream word-based
    algorithms (VSM bags, discord candidate sets, motif streams) want
    one row per run, not per window. Run boundaries are where the
    lagged word differs (first row of a series always starts a run);
    run ids are the running sum of boundary flags — two chained window
    expressions over ONE partitioning, then a map-side-combinable
    groupBy on (key, run id): the same single-shuffle shape as
    sliding_sax itself.
    """
    order_cols = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(key).orderBy(*order_cols)
    lagged = F.lag(F.col(word_col)).over(w)
    chg = F.when(
        lagged.isNull() | (lagged != F.col(word_col)), 1
    ).otherwise(0)
    run = F.sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = (
        words.select(
            F.col(key),
            *[F.col(o) for o in order_cols],
            F.col(id_col),
            F.col(word_col),
            run.alias("__run"),
        )
        .groupBy(key, "__run")
        .agg(
            F.min_by(id_col, F.struct(*order_cols)).alias(f"start_{id_col}"),
            F.min(word_col).alias(word_col),
            F.count(F.lit(1)).alias("run_length"),
        )
    )
    return grouped.select(key, f"start_{id_col}", word_col, "run_length")
