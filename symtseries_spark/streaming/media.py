"""Streaming perceptual near-dup gate for media — the ingest-time
twin of :func:`..operators.multimodal.dhash_pairs`, the way
``streaming_minhash_dedup`` twins the batch MinHash join.

Design: the dHash is a pure scan-stage JVM projection
(``media_dhash``), so it runs on a streaming DataFrame unchanged — no
streaming aggregation needed. Each payload then explodes into its
``bands`` (band, chunk) rows with EXACTLY the batch operator's chunk
arithmetic (``shiftright % 2^width``, last band takes the remaining
bits), and ``applyInPandasWithState`` keyed by the bucket tracks one
claimant per occupied bucket: ``(smallest media_id ever seen, its
full dhash)``. An arriving payload is flagged a near-duplicate iff
ANY of its buckets holds an earlier claimant whose full hash is
within ``max_hamming`` (the ``bit_count(xor)`` refine runs in the
handler against the stored claimant hash — exact, not bucket-equality
-approximate).

Bounded-state tradeoff, stated honestly: the batch join emits ALL
pairs within the radius; this gate compares each arrival only to its
buckets' CLAIMANTS (state is one (long, long) per occupied bucket —
the production footprint). A payload within radius of some earlier
non-claimant but outside radius of every claimant passes the gate.
With micro-batches replayed in id order the rule is exactly
"the bucket's global-min id, if within radius" — a plain SQL oracle
reproduces it bit-for-bit, which is what the registered query gates.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..operators.multimodal import media_dhash
from ._util import coalesce_chunks

__all__ = ["streaming_dhash_dedup"]

_OUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("band", LongType()),
        StructField("dup_of", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("claimant", LongType()),
        StructField("claimant_dhash", LongType()),
    ]
)

_SHARD_STATE_SCHEMA = StructType(
    [
        StructField("bands", ArrayType(LongType())),
        StructField("chunks", ArrayType(LongType())),
        StructField("claimants", ArrayType(LongType())),
        StructField("claimant_dhashes", ArrayType(LongType())),
    ]
)


def streaming_dhash_dedup(
    media: DataFrame,
    *,
    max_hamming: int,
    bands: int,
    rows: int = 7,
    cols: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
    shard_state: int | None = None,
) -> DataFrame:
    """Per incoming payload emit one row PER BAND:
    ``(media_id, band, dup_of)`` where ``dup_of`` is the bucket's
    earlier claimant id if the claimant's full dhash is within
    ``max_hamming`` (NULL otherwise — including when this payload
    claims the bucket). Downstream ``min(dup_of) GROUP BY media_id``
    gives the gate verdict. Claimancy is smallest-id-wins regardless
    of hamming (the deterministic rule the oracle replays); ids are
    assumed assigned in arrival order, as in the sibling stream
    dedups.

    ``shard_state``: with an integer N, buckets are HASH-SHARDED into
    N state keys, each shard keeping a {(band, chunk) -> (claimant,
    dhash)} map — the per-batch Python handler runs N times instead of
    once per occupied bucket (the streaming-MinHash shard rule; the
    r13 stream profile measured per-key handler round-trips as the
    addBatch floor). Exact (band, chunk) keys in the shard map and the
    same media_id batch order make output IDENTICAL in both modes."""
    if max_hamming < 0:
        raise ValueError("streaming_dhash_dedup needs max_hamming >= 0")
    if bands <= max_hamming:
        raise ValueError("pigeonhole exactness needs bands > max_hamming")
    nbits = rows * (cols - 1)
    per = nbits // bands
    if per < 1:
        raise ValueError("bands exceed the bit width")

    h = media_dhash(
        media, rows=rows, cols=cols, id_col=id_col, payload_col=payload_col
    )
    chunks = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band"),
                        (
                            F.shiftright(F.col("dhash"), b * per)
                            % F.lit(
                                1
                                << (
                                    per
                                    if b < bands - 1
                                    else nbits - (bands - 1) * per
                                )
                            )
                        ).alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("s"),
    ).select(
        "media_id",
        "dhash",
        F.col("s.band").alias("band"),
        F.col("s.chunk").alias("chunk"),
    )

    def handle(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        if state.exists:
            claimant, chash = (int(v) for v in state.get)
        else:
            claimant, chash = None, None
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            whole = whole.sort_values("media_id")
            out_ids: list[int] = []
            out_dup: list[int | None] = []
            for mid, dh in zip(whole["media_id"], whole["dhash"]):
                mid, dh = int(mid), int(dh)
                if (
                    claimant is not None
                    and claimant < mid
                    and bin(chash ^ dh).count("1") <= max_hamming
                ):
                    out_dup.append(claimant)
                else:
                    out_dup.append(None)
                if claimant is None or mid < claimant:
                    claimant, chash = mid, dh
                out_ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "band": [band] * len(out_ids),
                    "dup_of": pd.array(out_dup, dtype="Int64"),
                }
            )
        if claimant is not None:
            state.update((int(claimant), int(chash)))

    if shard_state is None:
        return chunks.groupBy("band", "chunk").applyInPandasWithState(
            handle,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def handle_shard(key, pdfs, state: GroupState):
        if state.exists:
            bs, cs, cl, ch = state.get
            claim = {
                (int(b), int(c)): (int(m), int(d))
                for b, c, m, d in zip(bs, cs, cl, ch)
            }
        else:
            claim = {}
        whole = coalesce_chunks(pdfs)
        if whole is not None:
            # bucket-then-id order: within each bucket the smaller id
            # claims first, exactly like the per-bucket handler
            whole = whole.sort_values(["band", "chunk", "media_id"])
            out_ids: list[int] = []
            out_bands: list[int] = []
            out_dup: list[int | None] = []
            for band, chunk, mid, dh in zip(
                whole["band"], whole["chunk"], whole["media_id"], whole["dhash"]
            ):
                bucket = (int(band), int(chunk))
                mid, dh = int(mid), int(dh)
                got = claim.get(bucket)
                if (
                    got is not None
                    and got[0] < mid
                    and bin(got[1] ^ dh).count("1") <= max_hamming
                ):
                    out_dup.append(got[0])
                else:
                    out_dup.append(None)
                if got is None or mid < got[0]:
                    claim[bucket] = (mid, dh)
                out_ids.append(mid)
                out_bands.append(bucket[0])
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "band": out_bands,
                    "dup_of": pd.array(out_dup, dtype="Int64"),
                }
            )
        state.update(
            (
                [k[0] for k in claim.keys()],
                [k[1] for k in claim.keys()],
                [v[0] for v in claim.values()],
                [v[1] for v in claim.values()],
            )
        )

    sharded = chunks.withColumn(
        "__shard", F.abs(F.hash("band", "chunk")) % shard_state
    )
    return sharded.groupBy("__shard").applyInPandasWithState(
        handle_shard,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_SHARD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
