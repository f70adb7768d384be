"""Event-time tumbling SAX words with watermark-based late-data handling.

An ENGINE EXTENSION beyond the reference: symtseries is positional-only
(arrival order, no timestamps — SURVEY.md §2.3), so this operator adds
the Spark-idiomatic event-time story: group by ``F.window(ts, duration)``
per series, tolerate late rows up to the watermark, and emit one SAX
word per (series, time window) when the watermark passes — the standard
Structured Streaming windowed-aggregation pattern, with the SAX encoder
as the aggregate's finishing expression.

Scale notes: state per open window is one in-progress list bounded by
the window's row count; the groupBy is the same (key, window) hash
shuffle as the batch twin, and the encoder is the shared JVM-side
expression — nothing here is Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import validate_params
from ..functions.sax import sax_encode


def tumbling_sax_event_time(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    value: str,
    duration: str,
    w: int,
    c: int,
    watermark: str | None = None,
    out: str = "sax_word",
) -> DataFrame:
    """SAX word per (series key, event-time tumbling window) ->
    ``(series_key, window_start, window_end, n, sax_word)``.

    ``ts`` must be a TIMESTAMP column; pass ``watermark`` (e.g.
    ``"10 minutes"``) on a streaming input to bound state and admit late
    rows up to that delay (required for append-mode sinks). Rows inside
    the window are ordered by event time; the window's row count is
    truncated to the largest multiple of ``w`` (windows with fewer than
    ``w`` rows are dropped), mirroring ``whole_series_sax``.
    """
    validate_params(w * 2, w, c)
    if not events.isStreaming:
        # batch path: long-form relational plan (no per-window arrays, no
        # interpreted HOF encode — 25 s -> ~2 s at sf0.1). Streaming can't
        # use it (event-time window functions + chained aggregations are
        # unsupported on streams), so the stream path keeps the single
        # collect_list aggregation. Both paths are tested equal.
        return _event_windows_batch(
            events, key=key, ts=ts, value=value, duration=duration,
            w=w, c=c, out=out,
        )
    if watermark is not None:
        events = events.withWatermark(ts, watermark)
    grouped = (
        events.groupBy(
            F.col(key).alias("series_key"), F.window(F.col(ts), duration)
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts).alias("t"), F.col(value).alias("v")))
            ).alias("tv")
        )
    )
    vals: Column = F.transform(F.col("tv"), lambda s: s["v"].cast("double"))
    usable = (F.floor(F.size(vals) / w) * w).cast("int")
    truncated = F.slice(vals, 1, usable)
    return grouped.where(F.size("tv") >= w).select(
        "series_key",
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.size(truncated).alias("n"),
        sax_encode(truncated, w, c).alias(out),
    )


def _event_windows_batch(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    value: str,
    duration: str,
    w: int,
    c: int,
    out: str,
) -> DataFrame:
    """Batch twin of the streaming aggregation: identical output via the
    long-form plan of ``operators.windows.whole_series_sax`` keyed by
    (series, event-time window)."""
    from ..operators.windows import whole_series_sax

    windowed = events.select(
        F.col(key),
        F.window(F.col(ts), duration).alias("__win"),
        F.col(ts).alias("__t"),
        F.col(value).alias("__v"),
    ).select(
        F.struct(
            F.col(key).alias("k"),
            F.col("__win.start").alias("ws"),
            F.col("__win.end").alias("we"),
        ).alias("__key"),
        "__t",
        "__v",
    )
    words = whole_series_sax(
        windowed, key="__key", order=["__t", "__v"], value="__v", w=w, c=c,
        out=out,
    )
    return words.select(
        F.col("series_key.k").alias("series_key"),
        F.col("series_key.ws").alias("window_start"),
        F.col("series_key.we").alias("window_end"),
        "n",
        out,
    )
