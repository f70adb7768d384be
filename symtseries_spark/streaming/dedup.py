"""Streaming exact deduplication: first-seen-wins over an unbounded
document stream — the ingest-time twin of
:func:`..operators.dedup.exact_dedup_map`.

State is keyed by the 60-bit content hash and holds only the canonical
(first-arriving) doc id, so state size is O(distinct contents) ids — the
minimum any exact streaming dedup can hold — and it is checkpointed/
restored by Structured Streaming. Arrival order defines the canonical
document (the batch operator's min-id rule coincides with it when ids
are assigned in arrival order).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from ._util import coalesce_chunks
from ..functions.text import doc_hash60, normalized_text

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_hash", LongType()),
        StructField("canonical_id", LongType()),
        StructField("is_duplicate", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("canonical_id", LongType())])


def streaming_exact_dedup(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per incoming document emit
    ``(doc_id, content_hash, canonical_id, is_duplicate)`` where the
    canonical id is the first document ever seen (across micro-batches,
    checkpoint-durable) with the same normalized content."""
    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        doc_hash60(normalized_text(F.col(text_col))).alias("content_hash"),
    )

    def handle(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        content_hash = key[0]
        canonical = state.get[0] if state.exists else None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values("doc_id")
            ids = [int(x) for x in pdf["doc_id"]]
            out_canon, out_dup = [], []
            for doc_id in ids:
                if canonical is None:
                    canonical = doc_id
                out_canon.append(canonical)
                out_dup.append(doc_id != canonical)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "content_hash": [content_hash] * len(ids),
                    "canonical_id": out_canon,
                    "is_duplicate": out_dup,
                }
            )
        if canonical is not None:
            state.update((int(canonical),))

    return hashed.groupBy("content_hash").applyInPandasWithState(
        handle,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
