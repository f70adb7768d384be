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
    DoubleType,
    StructField,
    StructType,
)

__all__ = ["ewma_stream"]


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
    Values are emitted UNROUNDED — round downstream with ``F.round`` so
    rounding semantics (half away from zero) match SQL engines rather
    than Python's banker's rounding."""
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
        for pdf in pdfs:
            pdf = pdf.sort_values(order, kind="mergesort")
            vals = pdf[value].astype("float64").to_numpy()
            outs = []
            for x in vals:
                x = float(x)
                acc = x if acc is None else a * x + b * acc
                outs.append(acc)
            yield pd.DataFrame(
                {
                    key_field.name: pdf[key].to_numpy(),
                    **{o: pdf[o].to_numpy() for o in order},
                    value: vals,
                    out: outs,
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
