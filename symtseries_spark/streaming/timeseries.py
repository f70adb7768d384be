"""Stateful streaming time-series operators.

``ewma_stream`` is the op where streaming structurally beats batch: the
recursion ``y = alpha * x + (1 - alpha) * y_prev`` runs from the START
of each series, so a batch engine needs an O(series) prefix fold per row
(quadratic work, unbounded frame) while the stream carries ONE double of
keyed state per series and does O(1) work per event. Same
arrival-order/state conventions as ``sliding.sliding_sax_stream``:
rows are processed in (order-columns) order within each micro-batch and
in arrival order across batches; state is checkpointed by the streaming
engine.

The fold itself is one multiply-add chain in a fixed order, so any
engine that replays the same recursion (e.g. a SQL prefix fold) gets
bit-identical doubles — emitted values are rounded, state carries the
unrounded accumulator.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ._util import coalesce_chunks

__all__ = [
    "cusum_stream",
    "ewma_stream",
    "holt_stream",
    "holt_winters_stream",
    "mad_zscore_stream",
    "rolling_zscore_stream",
]


def cusum_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    target: float,
    slack: float,
    out: str = "cusum",
) -> DataFrame:
    """Streaming one-sided CUSUM drift monitor: per event, the running
    ``C = max(0, C + (x - target - slack))`` of its series — ONE double
    of keyed state, O(1) per event. The batch twin
    (:func:`operators.timeseries.cusum`) computes the same statistic via
    the prefix-sum identity; the stream runs the recursion directly,
    which is what a production drift monitor wants (alarm on arrival,
    no reprocessing). Same arrival-order/null-skip/quantize-downstream
    conventions as :func:`ewma_stream`; the oracle replays the exact
    recursion as a seed-0 list fold. Rows BEFORE the first non-null
    value of their series emit NULL (matching the batch twin, whose
    cumulative sum over an empty frame is NULL) — the state carries a
    ``seen`` flag so the convention survives micro-batch boundaries.

    NaN parity caveat (same as ``rolling_zscore_stream``): past the
    Arrow boundary NULL and NaN data are indistinguishable, so the
    handler skips both; the batch twin's window sum keeps a literal NaN
    (only NULL drops) and poisons the prefix. Series with NaN DATA
    values diverge from the batch twin; real streams carry none."""
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField(out, DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("acc", DoubleType()),
            StructField("seen", BooleanType()),
        ]
    )
    cols = [key, *order, value]
    shift = float(target) + float(slack)

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc, seen = (state.get[0], bool(state.get[1])) if state.exists else (
            0.0,
            False,
        )
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            outs = []
            # NULL/NaN values are skipped from the fold (mirrors the
            # batch operator, whose window sum drops nulls); the row
            # still emits the running statistic — except BEFORE the
            # first valid value, where the batch twin's empty-frame
            # cumulative sum is NULL, so the stream emits None too.
            for x in vals:
                x = float(x)
                if x == x:  # not NaN
                    acc = max(0.0, acc + (x - shift))
                    seen = True
                outs.append(acc if seen else None)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    out: pd.array(outs, dtype="Float64"),
                }
            )
        state.update((float(acc), bool(seen)))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def holt_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    alpha: float,
    beta: float,
    out_level: str = "level",
    out_trend: str = "trend",
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.holt`` run UNBOUNDED:
    per-series double-exponential smoothing

    ``l' = alpha * x + (1 - alpha) * (l + t)``
    ``t' = beta * (l' - l) + (1 - beta) * t``

    seeded ``(first value, 0)``, emitting one row per event with the
    running (unrounded) level and trend. State = TWO doubles per series
    — the op's whole point: a batch engine replays an O(series) prefix
    fold per row, the stream does O(1) multiply-adds per event. Same
    arrival-order, null-skip, and quantize-downstream conventions as
    :func:`ewma_stream`; the fold arithmetic is the exact expression
    shape of the batch operator, so engines agree bit-for-bit.

    NaN parity caveat (same as ``rolling_zscore_stream``): past the
    Arrow boundary NULL and NaN data are indistinguishable, so the
    handler skips both; the batch twin's ``collect_list`` keeps a
    literal NaN (only NULL drops) and poisons its folds. Series with
    NaN DATA values diverge from the batch twin."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("holt_stream needs 0 < alpha <= 1")
    if not 0.0 <= beta <= 1.0:
        raise ValueError("holt_stream needs 0 <= beta <= 1")
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField(out_level, DoubleType()),
            StructField(out_trend, DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("l", DoubleType()), StructField("t", DoubleType())]
    )
    cols = [key, *order, value]
    a = float(alpha)
    na = 1.0 - a
    b = float(beta)
    nb = 1.0 - b

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lt = tuple(state.get) if state.exists else None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            levels, trends = [], []
            # NULL/NaN values are SKIPPED from the fold (mirrors the
            # batch operator's collect_list null-drop); the row still
            # emits the running level/trend of the non-null prefix.
            for x in vals:
                x = float(x)
                if x == x:  # not NaN
                    if lt is None:
                        lt = (x, 0.0)
                    else:
                        l0, t0 = lt
                        # identical expression shape to the batch fold:
                        # l' recomputed inside the trend update
                        lt = (
                            a * x + na * (l0 + t0),
                            b * ((a * x + na * (l0 + t0)) - l0) + nb * t0,
                        )
                levels.append(lt[0] if lt is not None else None)
                trends.append(lt[1] if lt is not None else None)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    out_level: pd.array(levels, dtype="Float64"),
                    out_trend: pd.array(trends, dtype="Float64"),
                }
            )
        if lt is not None:
            state.update((float(lt[0]), float(lt[1])))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """Per-series recursive EWMA over a stream: emits one row per input
    event with the running ``y = alpha * x + (1 - alpha) * y`` seeded by
    the series' first value. State = one unrounded double per series.
    Values are emitted UNROUNDED — quantize downstream with
    ``operators.quantize`` (floor(x*10^d + 0.5)/10^d), which is
    engine-portable; ``F.round``'s HALF_UP ties can disagree with other
    engines' ``round()`` at the last kept digit."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("ewma_stream needs 0 < alpha <= 1")
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField(out, DoubleType()),
        ]
    )
    state_schema = StructType([StructField("acc", DoubleType())])
    cols = [key, *order, value]
    a = float(alpha)
    b = 1.0 - a

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc = state.get[0] if state.exists else None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            outs = []
            # NULL/NaN values are SKIPPED from the fold (they would
            # permanently poison the accumulator otherwise) — the row is
            # still emitted, carrying the running EWMA of the non-null
            # prefix. Mirrors the batch operator, whose collect_list
            # drops nulls (operators/timeseries.py ewma docstring).
            for x in vals:
                x = float(x)
                if x == x:  # not NaN
                    acc = x if acc is None else a * x + b * acc
                outs.append(acc)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    out: pd.array(outs, dtype="Float64"),
                }
            )
        if acc is not None:
            state.update((float(acc),))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def mad_zscore_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    window: int,
    out: str = "rzscore",
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.mad_zscore``: per event,
    the trailing-``window`` median/MAD robust z-score of its series.
    State = the last ``window - 1`` RAW values per key (NaN markers
    kept, so the frame's row positions match the batch window exactly);
    the frame's non-NaN values feed exact sorted-median arithmetic —
    the same sort + (a+b)/2 + 0.6745 scaling as the batch operator, so
    clean series match it bit-for-bit. Emits UNROUNDED scores (NaN for
    flat-MAD frames; quantize + NULL-convert downstream).

    NaN parity caveat (same as ``rolling_zscore_stream``): past the
    Arrow boundary NULL and NaN data are indistinguishable, so the
    frame filter drops both; the batch twin's ``collect_list`` keeps a
    literal NaN (only NULL drops) and its sorted-median arithmetic
    propagates it. Series with NaN DATA values diverge from the batch
    twin; real event streams carry none."""
    import numpy as np

    if window < 2:
        raise ValueError("mad_zscore_stream needs window >= 2")
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField("n_window", LongType()),
            StructField(out, DoubleType()),
        ]
    )
    state_schema = StructType([StructField("buf", ArrayType(DoubleType()))])
    cols = [key, *order, value]

    def _median(sorted_vals: "np.ndarray") -> float:
        n = len(sorted_vals)
        half = n // 2
        if n % 2 == 1:
            return float(sorted_vals[half])
        return (float(sorted_vals[half - 1]) + float(sorted_vals[half])) / 2.0

    def handle(key_tuple, pdfs, state) -> "Iterator[pd.DataFrame]":
        buf = list(state.get[0]) if state.exists else []
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            hist = buf + [float(v) for v in vals]
            ns, scores = [], []
            for j in range(len(buf), len(hist)):
                frame = np.asarray(
                    hist[max(0, j - window + 1) : j + 1], dtype="float64"
                )
                frame = frame[~np.isnan(frame)]
                ns.append(len(frame))
                x = hist[j]
                if len(frame) == 0 or x != x:
                    scores.append(np.nan)
                    continue
                sv = np.sort(frame, kind="stable")
                med = _median(sv)
                sd = np.sort(np.abs(frame - med), kind="stable")
                mad = _median(sd)
                scores.append(
                    0.6745 * (x - med) / mad if mad > 0 else np.nan
                )
            buf = hist[-(window - 1):]
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    "n_window": pd.array(ns, dtype="int64"),
                    out: scores,
                }
            )
        state.update((buf,))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rolling_zscore_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    window: int,
    out: str = "zscore",
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.rolling_zscore``: per
    event, the trailing-``window`` z-score of its series. State = the
    last ``window - 1`` raw values per key (bounded, like the sliding
    SAX ring). Sums accumulate in index order (numpy cumsum) so the
    moments are bit-identical to the batch plan's sequential JVM window
    folds — same convention as ``sliding._seqsum``. Emits the UNROUNDED
    z (NaN for flat windows; round + NULL-convert downstream with
    ``F.round``/``nanvl`` to mirror SQL semantics).

    NaN parity caveat: NaN DATA values are indistinguishable from the
    warm-up padding here and are excluded from the moments, while the
    batch operator lets a NaN poison its frames (NULL z but counted
    n_window). Series with NaN data diverge from the batch twin on
    n_window; real event streams carry no NaN values."""
    import math

    import numpy as np

    if window < 2:
        raise ValueError("rolling_zscore_stream needs window >= 2")
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField("n_window", LongType()),
            StructField(out, DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("buf", ArrayType(DoubleType()))]
    )
    cols = [key, *order, value]

    def _seqsum(a: np.ndarray, axis: int) -> np.ndarray:
        return np.cumsum(a, axis=axis).take(-1, axis=axis)

    def handle(key_tuple, pdfs, state) -> "Iterator[pd.DataFrame]":
        buf = list(state.get[0]) if state.exists else []
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            hist = np.concatenate([np.asarray(buf, dtype="float64"), vals])
            pad = window - 1
            padded = np.concatenate([np.full(pad, np.nan), hist])
            frames = np.lib.stride_tricks.sliding_window_view(padded, window)
            frames = frames[len(hist) - len(vals):]  # new rows only
            finite = ~np.isnan(frames)
            n = finite.sum(axis=1).astype("float64")
            fv = np.where(finite, frames, 0.0)
            s1 = _seqsum(fv, axis=1)
            s2 = _seqsum(fv * fv, axis=1)
            mu = s1 / n
            var = s2 / n - mu * mu
            x = vals
            with np.errstate(invalid="ignore", divide="ignore"):
                z = np.where(var > 0, (x - mu) / np.sqrt(var), np.nan)
            buf = [float(v) for v in hist[-(window - 1):]]
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    "n_window": n.astype("int64"),
                    out: z,
                }
            )
        state.update((buf,))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def holt_winters_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    alpha: float,
    beta: float,
    gamma: float,
    season: int,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.holt_winters`` run
    UNBOUNDED: per-series additive Holt-Winters with keyed state of
    ``2 + season`` doubles plus the seasonal phase counter — O(season)
    state per series, O(1) multiply-adds per event, where the batch
    engine replays an O(prefix) fold per row.

    The seasonal phase advances with EVERY arriving row (null-valued
    rows hold the fold but consume their phase slot, mirroring the
    batch operator's row_number phase); the update expressions are the
    exact trees of the batch fold, so engines agree bit-for-bit. Emits
    the running (unrounded) ``level``, ``trend``, ``season_adj`` (this
    row's phase slot), and one-step ``forecast``; callers quantize
    downstream. Same NaN caveat as :func:`holt_stream`.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("holt_winters_stream needs 0 < alpha <= 1")
    if not 0.0 <= beta <= 1.0 or not 0.0 <= gamma <= 1.0:
        raise ValueError("holt_winters_stream needs beta, gamma in [0, 1]")
    if season < 2:
        raise ValueError("holt_winters_stream needs season >= 2")
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("season_adj", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("l", DoubleType()),
            StructField("t", DoubleType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("phase", LongType()),
        ]
    )
    cols = [key, *order, value]
    a, na = float(alpha), 1.0 - float(alpha)
    b, nb = float(beta), 1.0 - float(beta)
    g, ng = float(gamma), 1.0 - float(gamma)
    m = int(season)

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            l0, t0, s, phase = state.get
            s = list(s)
            st = (l0, t0) if l0 is not None else None
        else:
            st, s, phase = None, [0.0] * m, 0
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            levels, trends, seas, fores = [], [], [], []
            for x in vals:
                x = float(x)
                j = phase % m
                if x == x:  # not NaN/NULL
                    if st is None:
                        st = (x, 0.0)
                    else:
                        l0, t0 = st
                        sj = s[j]
                        # identical expression trees to the batch fold
                        # (l' recomputed inline in trend and seasonal)
                        st = (
                            a * (x - sj) + na * (l0 + t0),
                            b * ((a * (x - sj) + na * (l0 + t0)) - l0)
                            + nb * t0,
                        )
                        s[j] = (
                            g * (x - (a * (x - sj) + na * (l0 + t0)))
                            + ng * sj
                        )
                phase += 1
                if st is None:
                    levels.append(None)
                    trends.append(None)
                    seas.append(None)
                    fores.append(None)
                else:
                    levels.append(st[0])
                    trends.append(st[1])
                    seas.append(s[j])
                    fores.append(st[0] + st[1] + s[(j + 1) % m])
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    "level": pd.array(levels, dtype="Float64"),
                    "trend": pd.array(trends, dtype="Float64"),
                    "season_adj": pd.array(seas, dtype="Float64"),
                    "forecast": pd.array(fores, dtype="Float64"),
                }
            )
        if st is not None:
            state.update((float(st[0]), float(st[1]), list(s), int(phase)))
        elif phase:
            state.update((None, None, list(s), int(phase)))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def twap_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    ts: str,
    value: str,
) -> DataFrame:
    """Running time-weighted average through a REAL stream: per series,
    keyed state is four doubles (previous timestamp/value, weighted
    sum, duration sum) — O(1) per event. Each event closes the
    interval opened by its predecessor, then emits the TWAP over all
    CLOSED intervals so far (first event emits NULL, no interval yet)
    -> ``(key, order..., n_intervals, twap)``, twap UNROUNDED
    (quantize downstream, same contract as ewma_stream).

    NULL/NaN previous values contribute duration but no weighted mass
    (Spark's ``sum`` skips NULL products) — exactly the batch
    operator's semantics; the oracle replays the same running prefix
    with lag + running window sums."""
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField("n_intervals", LongType()),
            StructField("twap", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pts", DoubleType()),
            StructField("pv", DoubleType()),
            StructField("wsum", DoubleType()),
            StructField("tsum", DoubleType()),
            StructField("n", DoubleType()),
        ]
    )
    cols = list(dict.fromkeys([key, *order, ts, value]))

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pts, pv, wsum, tsum, n = state.get
        else:
            pts = pv = None
            wsum = tsum = n = 0.0
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            tvals = pdf[ts].astype("float64").to_numpy()
            vvals = pdf[value].astype("float64").to_numpy()
            twaps, counts = [], []
            for t, x in zip(tvals, vvals):
                t = float(t)
                if pts is not None:
                    dt = t - pts
                    tsum += dt
                    n += 1.0
                    if pv == pv:  # previous value not NaN
                        wsum += pv * dt
                twaps.append(wsum / tsum if tsum > 0 else None)
                counts.append(int(n))
                pts, pv = t, float(x)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    "n_intervals": pd.array(counts, dtype="Int64"),
                    "twap": pd.array(twaps, dtype="Float64"),
                }
            )
        if pts is not None:
            state.update(
                (float(pts), float(pv), float(wsum), float(tsum), float(n))
            )

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def page_hinkley_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    delta: float,
    lam: float,
    round_to: int = 6,
) -> DataFrame:
    """Page-Hinkley drift monitor as a REAL stream: keyed state is
    (count, integer value sum, integer statistic, integer running
    min) —
    O(1) per event, the recursion the batch twin replaces with
    stacked window passes. The statistic runs in the batch operator's
    EXACT INTEGER MICRO-UNITS (value and running mean floor-quantized
    once to micro counts, then pure int64 sums/min), so stream state
    ≡ batch windows row for row with no float-accumulation drift.
    NULL/NaN values update nothing and emit the running PH unchanged
    (NULL before the first real value)."""
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField("ph", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )
    # LongType state: the counters ARE exact int64 micro-units — a
    # DoubleType schema would silently lose integer precision past
    # 2^53 on an unbounded stream, defeating the whole integer-units
    # design.
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sx", LongType()),
            StructField("sraw", LongType()),
            StructField("minm", LongType()),
        ]
    )
    cols = [key, *order, value]
    scale = float(10 ** round_to)
    delta_int = int(round(float(delta) * scale))
    lam_int = int(round(float(lam) * scale))

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            n, sx_int, m_int, min_int = state.get
        else:
            n = sx_int = m_int = 0
            min_int = None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            phs, alarms = [], []
            for x in vals:
                x = float(x)
                if x == x:  # not NaN
                    n += 1
                    v_int = int(math.floor(x * scale + 0.5))
                    sx_int += v_int
                    mean_int = (2 * sx_int + n) // (2 * n)
                    m_int += v_int - mean_int - delta_int
                    min_int = (
                        m_int if min_int is None else min(min_int, m_int)
                    )
                if n > 0:
                    ph_int = m_int - min_int
                    phs.append(ph_int / scale)
                    alarms.append(ph_int > lam_int)
                else:
                    phs.append(None)
                    alarms.append(None)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    "ph": pd.array(phs, dtype="Float64"),
                    "alarm": pd.array(alarms, dtype="boolean"),
                }
            )
        if n > 0:
            state.update((int(n), int(sx_int), int(m_int), int(min_int)))

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ohlc_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    ts: str,
    value: str,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Running OHLC bar through a REAL stream: keyed state is ONE open
    bar (bucket id + open/high/low/close/volume — six numbers), O(1)
    per event; a new time bucket closes the previous bar and opens a
    fresh one (arrival order == event-time order, the replay-stream
    contract shared by every stream twin here). Emits the RUNNING bar
    per event -> ``(key, order..., day, open, high, low, close,
    volume)`` — the oracle replays the same prefix with running
    first/max/min window frames per (key, bucket)."""
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField("day", LongType()),
            StructField("open", DoubleType()),
            StructField("high", DoubleType()),
            StructField("low", DoubleType()),
            StructField("close", DoubleType()),
            StructField("volume", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("day", DoubleType()),
            StructField("o", DoubleType()),
            StructField("h", DoubleType()),
            StructField("l", DoubleType()),
            StructField("c", DoubleType()),
            StructField("n", DoubleType()),
        ]
    )
    cols = list(dict.fromkeys([key, *order, ts, value]))

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            day, o, h, l, c, n = state.get
            day, n = int(day), int(n)
        else:
            day = None
            o = h = l = c = None
            n = 0
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            tvals = pdf[ts].astype("int64").to_numpy()
            vvals = pdf[value].astype("float64").to_numpy()
            out = {k: [] for k in ("day", "o", "h", "l", "c", "n")}
            for t, x in zip(tvals, vvals):
                d = int(t) // bucket_us
                x = float(x)
                if d != day:
                    day, o, h, l, c, n = d, x, x, x, x, 1
                else:
                    h, l, c, n = max(h, x), min(l, x), x, n + 1
                out["day"].append(day)
                out["o"].append(o)
                out["h"].append(h)
                out["l"].append(l)
                out["c"].append(c)
                out["n"].append(n)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{oc_: pdf[oc_].to_numpy() for oc_ in order},
                    "day": pd.array(out["day"], dtype="Int64"),
                    "open": pd.array(out["o"], dtype="Float64"),
                    "high": pd.array(out["h"], dtype="Float64"),
                    "low": pd.array(out["l"], dtype="Float64"),
                    "close": pd.array(out["c"], dtype="Float64"),
                    "volume": pd.array(out["n"], dtype="Int64"),
                }
            )
        if day is not None:
            state.update(
                (float(day), float(o), float(h), float(l), float(c), float(n))
            )

    return (
        events.select(*cols)
        .groupBy(key)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
