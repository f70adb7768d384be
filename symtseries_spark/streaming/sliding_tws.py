"""Spark 4 ``transformWithStateInPandas`` variant of the sliding-SAX
stream — same semantics as :mod:`.sliding` (emit one word per event,
arrival order, NaN-padded partial windows), expressed with the newer
StatefulProcessor API (typed state variables, init/close lifecycle).

Both variants are kept deliberately: ``applyInPandasWithState`` is the
stable API, ``transformWithStateInPandas`` is where Structured Streaming
state management is heading (state TTL, multiple state variables, timer
support); the parity test runs the same metamorphic check against both.

NOTE: the TWS runtime requires ``google.protobuf`` (its driver-worker
protocol), which this container does not ship — the parity test
skips when the import is unavailable; on a standard Spark 4 cluster
(protobuf is a Spark dependency) it runs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..constants import validate_params
from .sliding import _encode_windows


def sliding_sax_stream_tws(
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
    """``transformWithStateInPandas`` twin of
    :func:`.sliding.sliding_sax_stream` (see there for semantics)."""
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

    class SlidingSaxProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._buf = handle.getValueState("buf", state_schema)

        def handleInputRows(
            self, key_tuple, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            existing = self._buf.get() if self._buf.exists() else None
            buf = list(existing[0]) if existing else [math.nan] * n
            for pdf in rows:
                pdf = pdf.sort_values(order, kind="mergesort")
                vals = (
                    pdf[value].astype("float64").to_numpy(na_value=math.nan).copy()
                )
                history = np.concatenate(
                    [np.asarray(buf, dtype="float64"), vals]
                )
                words = _encode_windows(history, n, w, c)[-len(vals):]
                buf = [float(x) for x in history[-n:]]
                yield pd.DataFrame(
                    {
                        key_field.name: pdf[key].to_numpy(),
                        **{o: pdf[o].to_numpy() for o in order},
                        value: vals,
                        out: words,
                    }
                )
            self._buf.update((buf,))

        def close(self) -> None:
            pass

    return (
        events.select(key, *order, value)
        .groupBy(key)
        .transformWithStateInPandas(
            SlidingSaxProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
    )
