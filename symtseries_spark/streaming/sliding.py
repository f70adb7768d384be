"""Structured Streaming parity for the reference's sliding window.

The reference IS a streaming operator: per-element append into a ring
buffer with emit-on-every-event and NaN padding while partially full
(src/symtseries.c:481-492, 301-323). This module reproduces those
semantics with ``applyInPandasWithState``:

* keyed state = the last ``n`` values per series (the ring buffer;
  <= 4096 doubles by the reference's own cap, so state size is bounded),
* one output row per input event carrying the current word,
* arrival-order semantics — the reference has no event time or late-data
  concept, so rows are processed in (order-columns) order *within* each
  micro-batch and in arrival order across batches; watermarking would be
  an extension, not parity.

Checkpointing of the state (the reference's ``serialize_sax``,
lua/lua_sax.c:293-342) comes free from the streaming checkpoint dir.

Scale notes: state is partitioned by series key across executors —
identical to the batch shuffle key. The per-batch encode is vectorized
with numpy (one O(batch * n) pass per series, Arrow-transferred); the
word computation itself reuses the same breakpoint tables as the batch
path, so batch ≡ streaming by construction (the reference's own
metamorphic test, src/symtseries.c:816-850).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ._util import coalesce_chunks
from ..constants import BREAKPOINTS, LETTERS, MISSING, STAT_EPS, validate_params


def _seqsum(a: np.ndarray, axis: int) -> np.ndarray:
    """Left-to-right sequential float sum. numpy's ``.sum`` uses pairwise
    summation (block size 128), which can differ from the batch path's
    sequential JVM fold by an ulp — enough to flip a letter when a
    z-value sits exactly on a breakpoint. cumsum accumulates in index
    order, so streaming words match the batch plan bit-for-bit (masked
    positions contribute +0.0, which is exact)."""
    return np.cumsum(a, axis=axis).take(-1, axis=axis)


def _encode_windows(history: np.ndarray, n: int, w: int, c: int) -> list[str]:
    """Words for every suffix window of ``history`` (length >= n), i.e.
    for positions n-1 .. len-1. Vectorized: one strided view + per-frame
    nan-aware means; matches pykernel.encode exactly."""
    f = n // w
    windows = np.lib.stride_tricks.sliding_window_view(history, n)  # (m, n)
    finite = np.isfinite(windows)
    cnt = finite.sum(axis=1)
    vals = np.where(finite, windows, 0.0)
    mu = np.where(cnt > 0, _seqsum(vals, axis=1) / np.maximum(cnt, 1), 0.0)
    ssd = _seqsum(np.where(finite, (windows - mu[:, None]) ** 2, 0.0), axis=1)
    std = np.where(cnt > 0, np.sqrt(ssd / np.maximum(cnt, 1)), 0.0)

    frames = windows.reshape(-1, w, f)
    nonnan = ~np.isnan(frames)
    fcnt = nonnan.sum(axis=2)
    with np.errstate(invalid="ignore"):
        fsum = _seqsum(np.where(nonnan, frames, 0.0), axis=2)
        # ±Inf in a frame: np.where(...,0.0).sum keeps inf; Inf + -Inf -> nan
        has_pinf = np.logical_and(nonnan, np.isposinf(frames)).any(axis=2)
        has_ninf = np.logical_and(nonnan, np.isinf(frames) & (frames < 0)).any(axis=2)
    breaks = np.array(BREAKPOINTS[c])
    letters = np.empty((frames.shape[0], w), dtype="U1")
    flat_std = std[:, None]
    flat_mu = mu[:, None]
    z = np.where(
        flat_std < STAT_EPS,
        0.0,
        np.where(fcnt > 0, (fsum - fcnt * flat_mu), 0.0)
        / np.where(fcnt > 0, fcnt * np.where(flat_std < STAT_EPS, 1.0, flat_std), 1.0),
    )
    bucket_ix = (z[:, :, None] >= breaks[None, None, :]).sum(axis=2)
    letter_arr = np.array(list(LETTERS[:c]))
    letters = letter_arr[np.clip(bucket_ix, 0, c - 1)]
    letters = np.where((fcnt == 0) | (has_pinf & has_ninf), MISSING, letters)
    letters = np.where(has_pinf & ~has_ninf, LETTERS[c - 1], letters)
    letters = np.where(has_ninf & ~has_pinf, LETTERS[0], letters)
    return ["".join(row) for row in letters]


def sliding_sax_stream(
    events: DataFrame,
    *,
    key: str,
    order: list[str],
    value: str,
    n: int,
    w: int,
    c: int,
    out: str = "sax_word",
) -> DataFrame:
    """Streaming twin of :func:`..operators.windows.sliding_sax`: for
    every incoming event, emit ``(key, *order, value, word)`` where word
    covers the last ``n`` values of that series (NaN-padded while the
    series is shorter than ``n``)."""
    validate_params(n, w, c)
    key_field = events.schema[key]
    order_fields = [events.schema[o] for o in order]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType),
            *[StructField(f.name, f.dataType) for f in order_fields],
            StructField(value, DoubleType()),
            StructField(out, StringType()),
        ]
    )
    state_schema = StructType([StructField("buf", ArrayType(DoubleType()))])
    cols = [key, *order, value]

    def handle(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else [math.nan] * n
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(order, kind="mergesort")
            vals = (
                pdf[value].astype("float64").to_numpy(na_value=math.nan).copy()
            )
            history = np.concatenate([np.asarray(buf, dtype="float64"), vals])
            words = _encode_windows(history, n, w, c)[-len(vals):]
            # plain Python floats: the JVM-side state unpickler rejects
            # numpy scalars
            buf = [float(x) for x in history[-n:]]
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    out: words,
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
