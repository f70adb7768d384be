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
    StringType,
    StructField,
    StructType,
)

from pyspark.sql.types import ArrayType

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

_SHARD_EXACT_STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("canonicals", ArrayType(LongType())),
    ]
)


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_state: int | None = None,
) -> DataFrame:
    """Per incoming document emit
    ``(doc_id, content_hash, canonical_id, is_duplicate)`` where the
    canonical id is the first document ever seen (across micro-batches,
    checkpoint-durable) with the same normalized content.

    ``shard_state``: with None (default) state is keyed per content
    hash — one long per distinct content, the unbounded-scale layout.
    With an integer N, hashes are HASH-SHARDED into N state keys and
    each shard keeps a {content_hash -> canonical} map: the per-batch
    Python handler runs N times instead of once per distinct content
    seen in the batch (the streaming-MinHash shard rule — r13 profile:
    the per-key handler round-trips, not the state store, were the
    micro-batch floor). Output is IDENTICAL in both modes (exact hash
    keys in the shard map, batch rows processed in the same doc_id
    order), so the same oracle gates both. Stay with None when
    distinct-content cardinality per shard would grow without bound.
    """
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

    if shard_state is None:
        return hashed.groupBy("content_hash").applyInPandasWithState(
            handle,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def handle_shard(key, pdfs, state: GroupState):
        if state.exists:
            hs, cs = state.get
            claim = dict(zip(hs, cs))
        else:
            claim = {}
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            # doc_id order: within a batch the smallest id claims the
            # content first — exactly the per-key handler's sort
            whole = whole.sort_values("doc_id")
            out_ids, out_hash, out_canon, out_dup = [], [], [], []
            for doc_id, h in zip(whole["doc_id"], whole["content_hash"]):
                doc_id, h = int(doc_id), int(h)
                c = claim.get(h)
                if c is None:
                    c = doc_id
                    claim[h] = c
                out_ids.append(doc_id)
                out_hash.append(h)
                out_canon.append(c)
                out_dup.append(doc_id != c)
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "content_hash": out_hash,
                    "canonical_id": out_canon,
                    "is_duplicate": out_dup,
                }
            )
        state.update(
            (
                [int(k) for k in claim.keys()],
                [int(v) for v in claim.values()],
            )
        )

    sharded = hashed.withColumn(
        "__shard", F.abs(F.hash("content_hash")) % shard_state
    )
    return sharded.groupBy("__shard").applyInPandasWithState(
        handle_shard,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_SHARD_EXACT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SPAN_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
        StructField("span", StringType()),
        StructField("is_dropped", BooleanType()),
    ]
)

_SPAN_STATE_SCHEMA = StructType(
    [StructField("first_doc", LongType()), StructField("first_pos", LongType())]
)

_SHARD_SPAN_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("first_docs", ArrayType(LongType())),
        StructField("first_poss", ArrayType(LongType())),
    ]
)


def streaming_span_dedup(
    docs: DataFrame,
    *,
    span_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = False,
    shard_state: int | None = None,
) -> DataFrame:
    """Streaming first-occurrence SPAN dedup — the ingest-time twin of
    :func:`..operators.dedup.span_dedup`: per incoming document, every
    non-overlapping ``span_tokens``-token span is emitted with
    ``is_dropped`` = "this exact span text was seen before" (earlier
    micro-batch, or earlier (doc_id, pos) within one — checkpoint-
    durable, first-seen-wins).

    By default state is keyed by the span TEXT itself (not a hash),
    so collisions cannot mis-drop — exactly the batch operator's
    grouping key — and holds one ``(first_doc, first_pos)`` pair per
    distinct span: O(distinct spans) state, the minimum any exact
    span dedup can carry. ``hash_spans=True`` keys the state by the
    128-bit md5 of the span instead (the batch twin's knob): long
    boilerplate spans then cost 32 state-key bytes rather than their
    full text, and the span text is carried only in the output rows.
    ``shard_state``: with an integer N, state keys are HASH-SHARDED
    into N shards, each keeping a {span_key -> (first_doc, first_pos)}
    map — the per-batch Python handler then runs N times instead of
    once per distinct span in the batch (the streaming-MinHash shard
    rule; r13 profile measured the per-key handler round-trips as the
    micro-batch floor, ~4s/batch at 14k distinct spans). Rows are
    processed in the same (doc_id, pos) order and the shard map keys
    are the exact span keys, so output is IDENTICAL in both modes —
    the same oracle gates both. Stay with None when distinct-span
    cardinality per shard would grow without bound."""
    if span_tokens < 1:
        raise ValueError("streaming_span_dedup needs span_tokens >= 1")
    from ..functions.text import tokens

    toks = tokens(F.col(text_col))
    n_sp = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_sp - 1),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(
                F.slice(toks, i * span_tokens + 1, span_tokens), " "
            ).alias("span"),
        ),
    )
    ex = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.when(n_sp > 0, spans).otherwise(
            F.array().cast("array<struct<pos:long,span:string>>")
        )).alias("s"),
    ).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.span").alias("span")
    )

    if hash_spans:
        ex = ex.withColumn("__k", F.md5(F.col("span")))
    else:
        ex = ex.withColumn("__k", F.col("span"))

    def handle(key, pdfs, state: GroupState):
        first = tuple(state.get) if state.exists else None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(["doc_id", "pos"])
            docs_, poss, dropped = [], [], []
            for doc_id, pos in zip(pdf["doc_id"], pdf["pos"]):
                if first is None:
                    first = (int(doc_id), int(pos))
                    dropped.append(False)
                else:
                    dropped.append((int(doc_id), int(pos)) != first)
                docs_.append(int(doc_id))
                poss.append(int(pos))
            yield pd.DataFrame(
                {
                    "doc_id": docs_,
                    "pos": poss,
                    "span": list(pdf["span"]),
                    "is_dropped": dropped,
                }
            )
        if first is not None:
            state.update((int(first[0]), int(first[1])))

    if shard_state is None:
        return ex.groupBy("__k").applyInPandasWithState(
            handle,
            outputStructType=_SPAN_OUT_SCHEMA,
            stateStructType=_SPAN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def handle_shard(key, pdfs, state: GroupState):
        if state.exists:
            ks, fd, fp = state.get
            first_of = dict(zip(ks, zip(fd, fp)))
        else:
            first_of = {}
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            # (doc_id, pos) order: the first-seen rule within a batch —
            # exactly the per-key handler's sort
            whole = whole.sort_values(["doc_id", "pos"])
            docs_, poss, spans_, dropped = [], [], [], []
            for doc_id, pos, span, k in zip(
                whole["doc_id"], whole["pos"], whole["span"], whole["__k"]
            ):
                doc_id, pos = int(doc_id), int(pos)
                f = first_of.get(k)
                if f is None:
                    first_of[k] = (doc_id, pos)
                    dropped.append(False)
                else:
                    dropped.append((doc_id, pos) != f)
                docs_.append(doc_id)
                poss.append(pos)
                spans_.append(span)
            yield pd.DataFrame(
                {
                    "doc_id": docs_,
                    "pos": poss,
                    "span": spans_,
                    "is_dropped": dropped,
                }
            )
        state.update(
            (
                list(first_of.keys()),
                [int(v[0]) for v in first_of.values()],
                [int(v[1]) for v in first_of.values()],
            )
        )

    sharded = ex.withColumn("__shard", F.abs(F.hash("__k")) % shard_state)
    return sharded.groupBy("__shard").applyInPandasWithState(
        handle_shard,
        outputStructType=_SPAN_OUT_SCHEMA,
        stateStructType=_SHARD_SPAN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_LINE_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("line_no", LongType()),
        StructField("line", StringType()),
        StructField("is_dropped", BooleanType()),
    ]
)

_LINE_STATE_SCHEMA = StructType(
    [StructField("first_doc", LongType()), StructField("first_line", LongType())]
)

_SHARD_LINE_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("first_docs", ArrayType(LongType())),
        StructField("first_lines", ArrayType(LongType())),
    ]
)


def streaming_line_dedup(
    docs: DataFrame,
    *,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_lines: bool = False,
    shard_state: int | None = None,
) -> DataFrame:
    """Streaming first-occurrence LINE dedup — the ingest-time twin of
    :func:`..operators.dedup.line_dedup` (C4's keep-one-line rule):
    per incoming document, every non-empty line is emitted with
    ``is_dropped`` = "this exact line was seen before" (earlier
    micro-batch, or earlier (doc_id, line_no) within one —
    checkpoint-durable, first-seen-wins; coincides with the batch
    min-(doc_id, line_no) rule under id-ordered arrival).

    State holds one ``(first_doc, first_line)`` pair per distinct
    line — O(distinct lines), the minimum any exact keep-one can
    carry. ``hash_lines=True`` keys it by the 128-bit md5 instead of
    the line text (the hash_spans convention): boilerplate lines cost
    32 state-key bytes, text rides only in output rows.

    ``shard_state``: hash-shard the state keys into N shards, one
    {line_key -> (first_doc, first_line)} map per shard — same rule,
    same output-identity argument as :func:`streaming_span_dedup`."""
    if not sep:
        raise ValueError("streaming_line_dedup needs a non-empty separator")
    import re as _re

    parts = F.split(F.col(text_col), _re.escape(sep))
    ex = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(parts).alias("__p0", "line"),
        )
        .where(F.col("line") != "")
        .select(
            "doc_id",
            (F.col("__p0") + 1).cast("long").alias("line_no"),
            "line",
        )
    )
    if hash_lines:
        ex = ex.withColumn("__k", F.md5(F.col("line")))
    else:
        ex = ex.withColumn("__k", F.col("line"))

    def handle(key, pdfs, state: GroupState):
        first = tuple(state.get) if state.exists else None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            pdf = whole.sort_values(["doc_id", "line_no"])
            docs_, nos, dropped = [], [], []
            for doc_id, no in zip(pdf["doc_id"], pdf["line_no"]):
                if first is None:
                    first = (int(doc_id), int(no))
                    dropped.append(False)
                else:
                    dropped.append((int(doc_id), int(no)) != first)
                docs_.append(int(doc_id))
                nos.append(int(no))
            yield pd.DataFrame(
                {
                    "doc_id": docs_,
                    "line_no": nos,
                    "line": list(pdf["line"]),
                    "is_dropped": dropped,
                }
            )
        if first is not None:
            state.update((int(first[0]), int(first[1])))

    if shard_state is None:
        return ex.groupBy("__k").applyInPandasWithState(
            handle,
            outputStructType=_LINE_OUT_SCHEMA,
            stateStructType=_LINE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def handle_shard(key, pdfs, state: GroupState):
        if state.exists:
            ks, fd, fl = state.get
            first_of = dict(zip(ks, zip(fd, fl)))
        else:
            first_of = {}
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            # (doc_id, line_no) order: the first-seen rule within a
            # batch — exactly the per-key handler's sort
            whole = whole.sort_values(["doc_id", "line_no"])
            docs_, nos, lines_, dropped = [], [], [], []
            for doc_id, no, line, k in zip(
                whole["doc_id"], whole["line_no"], whole["line"], whole["__k"]
            ):
                doc_id, no = int(doc_id), int(no)
                f = first_of.get(k)
                if f is None:
                    first_of[k] = (doc_id, no)
                    dropped.append(False)
                else:
                    dropped.append((doc_id, no) != f)
                docs_.append(doc_id)
                nos.append(no)
                lines_.append(line)
            yield pd.DataFrame(
                {
                    "doc_id": docs_,
                    "line_no": nos,
                    "line": lines_,
                    "is_dropped": dropped,
                }
            )
        state.update(
            (
                list(first_of.keys()),
                [int(v[0]) for v in first_of.values()],
                [int(v[1]) for v in first_of.values()],
            )
        )

    sharded = ex.withColumn("__shard", F.abs(F.hash("__k")) % shard_state)
    return sharded.groupBy("__shard").applyInPandasWithState(
        handle_shard,
        outputStructType=_LINE_OUT_SCHEMA,
        stateStructType=_SHARD_LINE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
