"""Streaming gap-based sessionization via Structured Streaming's native
``session_window`` — the stream twin of ``operators.joins.sessionize``.

Semantics parity (tested, not assumed): ``session_window`` merges
TOUCHING per-event windows — an event exactly ``gap`` after the
previous one joins its session — which is precisely batch
``sessionize``'s ``diff > gap`` split rule. The two implementations
therefore share one oracle, exact-gap ties included
(tests/test_joins.py::TestSessionWindowParity).

Scale shape: state per open session is just the merged window bounds
plus the aggregation buffers (count/sum here); the state store evicts a
session as soon as the watermark passes its end, so state is bounded by
the number of keys active within one watermark horizon — independent of
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_rollup_stream"]


def session_rollup_stream(
    stream: DataFrame,
    *,
    key: str,
    ts: str,
    value: str,
    gap: str,
    watermark: str,
) -> DataFrame:
    """Per-key gap sessions over an event-time stream ->
    ``(key, session_start, session_end, n_events, sum_value)``.

    Append-mode compatible: a session row is emitted exactly once, when
    the watermark passes its end (start + trailing gap), i.e. when no
    future event can merge into it. ``gap`` / ``watermark`` are interval
    strings ("45 minutes"); the watermark bounds how late an event may
    arrive and still extend its session.
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("__sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("__sw.start").alias("session_start"),
            F.col("__sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
