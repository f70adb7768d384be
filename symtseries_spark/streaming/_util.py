"""Shared helpers for applyInPandasWithState handlers."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def coalesce_chunks(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
    """Merge a group's Arrow chunks into ONE frame before processing.

    applyInPandasWithState splits a key's micro-batch input into chunks
    of ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, and chunk
    order follows upstream partition interleaving — NOT the caller's
    sort columns. Any order-sensitive handler (recursions, first-seen
    scans) must therefore sort the WHOLE batch, not each chunk: coalesce
    first, sort once. Memory equals the key's batch slice, which the
    handler was going to traverse anyway. Returns None for an empty
    iterator (e.g. timeout-only invocations).
    """
    chunks = list(pdfs)
    if not chunks:
        return None
    if len(chunks) == 1:
        return chunks[0]
    return pd.concat(chunks, ignore_index=True)
