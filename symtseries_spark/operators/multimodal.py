"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched Pandas UDFs (``mapInPandas``).

Image/audio/video libraries are NOT available in this environment, so
the decode step is stubbed: :func:`decode_media` raises
``NotImplementedError`` unless the optional library import succeeds,
and :func:`fake_decode_features` provides a deterministic stand-in
(md5-derived) so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end.

Scale notes:

* Payloads stay on executors: every operator is ``mapInPandas`` over the
  scan, no shuffle, no driver collection. Arrow moves binary columns
  zero-copy between JVM and Python.
* Batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — for multi-MB media payloads set it low (e.g. 64) to bound executor
  memory; metadata-only transforms should instead push down column
  pruning so payload bytes are never read (parquet column skipping).
* ``frame_sample`` fans out rows (one per frame); downstream grouping
  re-shuffles by ``media_id`` only if asked — sampling itself is
  pipeline-local.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("content_length", LongType()),
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the ``documents`` table into the media schema (payload =
    UTF-8 bytes of the text). Stands in for a real binary source (object
    store of images/audio); downstream operators only see the schema."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col("text")).cast("long").alias("content_length"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def byte_histogram(
    media: DataFrame, *, bins: int = 16, payload_col: str = "payload"
) -> DataFrame:
    """Per-payload byte-value histogram -> exploded rows
    ``(media_id, bin, cnt)`` with 256/``bins``-wide buckets; empty
    payloads produce no rows. The cheap content fingerprint used for
    corrupt-file triage and format drift detection."""
    if 256 % bins:
        raise ValueError("bins must divide 256")
    width = 256 // bins
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("bin", IntegerType()),
            StructField("cnt", LongType()),
        ]
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bin_ix, counts = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    continue
                import numpy as np

                arr = np.frombuffer(payload, dtype=np.uint8) // width
                binned = np.bincount(arr, minlength=bins)
                for b in range(bins):
                    if binned[b]:
                        ids.append(mid)
                        bin_ix.append(b)
                        counts.append(int(binned[b]))
            yield pd.DataFrame(
                {"media_id": ids, "bin": bin_ix, "cnt": counts}
            ).astype({"media_id": "int64", "bin": "int32", "cnt": "int64"})

    return media.select("media_id", payload_col).mapInPandas(hist, out_schema)


def frame_sample(
    media: DataFrame,
    *,
    frame_size: int,
    every_n: int = 1,
    payload_col: str = "payload",
) -> DataFrame:
    """Split each payload into fixed-size frames and keep every
    ``every_n``-th -> ``(media_id, frame_no, frame)``. The video
    frame-sampling plan shape: decode would replace the byte slicing,
    everything else (fan-out, ordering, batching) is identical."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                total = (len(payload) + frame_size - 1) // frame_size
                for fno in range(0, total, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    payloads.append(
                        bytes(payload[fno * frame_size : (fno + 1) * frame_size])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": payloads}
            ).astype({"media_id": "int64", "frame_no": "int32"})

    return media.select("media_id", payload_col).mapInPandas(frames, out_schema)


def resize_media(
    media: DataFrame,
    *,
    factor: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Downsample each payload by keeping every ``factor``-th byte ->
    ``(media_id, orig_len, new_len, thumb)``. The image-resize plan
    shape: a real deployment swaps the byte stride for PIL's
    ``Image.resize`` inside the same Arrow-batched ``mapInPandas``
    (schema, batching, and partitioning identical); the stride variant
    is fully deterministic, so the plumbing itself is oracle-checked.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("orig_len", LongType()),
            StructField("new_len", LongType()),
            StructField("thumb", BinaryType()),
        ]
    )

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, olens, nlens, thumbs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                t = bytes(payload[::factor])
                ids.append(mid)
                olens.append(len(payload))
                nlens.append(len(t))
                thumbs.append(t)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "orig_len": olens,
                    "new_len": nlens,
                    "thumb": thumbs,
                }
            ).astype({"media_id": "int64", "orig_len": "int64", "new_len": "int64"})

    return media.select("media_id", payload_col).mapInPandas(shrink, out_schema)


FEATURE_DIM = 8

_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder's feature vector:
    md5-seeded pseudo-features in [0, 1). Replace with the real
    decode+embed once PIL/torchvision/librosa are available."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_media(
    media: DataFrame, *, allow_fake: bool = False, payload_col: str = "payload"
) -> DataFrame:
    """Decode payloads to feature vectors -> ``(media_id, kind, features)``.

    Real decoding needs PIL (images) / soundfile (audio), which this
    container does not ship; without them this raises
    ``NotImplementedError`` unless ``allow_fake=True`` selects the
    deterministic fake featurizer. The Spark plan (mapInPandas, Arrow
    batches, schema) is production-shaped either way.
    """
    try:  # pragma: no cover - not installed in this environment
        import PIL  # noqa: F401

        has_decoder = True
    except ImportError:
        has_decoder = False
    if not has_decoder and not allow_fake:
        raise NotImplementedError(
            "media decoding requires PIL/soundfile (not available); "
            "pass allow_fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(bytes(p)) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", payload_col).mapInPandas(
        decode, _DECODE_SCHEMA
    )


def media_dhash(
    media: DataFrame,
    *,
    rows: int = 7,
    cols: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual difference-hash (dHash — the standard cheap
    image-dedup fingerprint: grid-sample brightness, hash the sign of
    horizontal gradients) over the opaque payload ->
    ``(media_id, dhash)`` with ``rows x (cols-1)`` bits packed into a
    BIGINT (default 7x8 = 56 bits, sign-safe).

    The "brightness" grid samples ``rows*cols`` bytes at evenly
    spaced offsets — on a real image this runs AFTER the decode/resize
    step (the grid is the resized luma plane); on the text stand-in
    payload it is a deterministic byte-gradient fingerprint with the
    same algebra, so the Spark-side plumbing (hex extraction, bit
    packing, banded pair join) is real and oracle-checked.

    All JVM expressions (hex + substring + conv), zero Python; empty
    payloads are dropped. Scale shape: pure scan-stage projection."""
    if rows < 1 or cols < 2:
        raise ValueError("media_dhash needs rows >= 1, cols >= 2")
    if rows * (cols - 1) > 62:
        raise ValueError("dhash must fit in a signed 64-bit integer")
    df, row_words = _dhash_row_words(
        media, rows=rows, cols=cols, id_col=id_col,
        payload_col=payload_col,
    )
    acc = F.lit(0).cast("long")
    for r, word in enumerate(row_words):
        acc = acc + word * F.lit(1 << (r * (cols - 1)))
    return df.select("media_id", acc.alias("dhash"))


def _dhash_row_words(
    media: DataFrame, *, rows: int, cols: int, id_col: str,
    payload_col: str,
):
    """Shared dHash sampling: grid-sample ``rows*cols`` payload bytes
    at evenly spaced offsets, compare horizontal neighbours, and pack
    each row's ``cols-1`` gradient bits into one long. Returns
    ``(filtered_df, [row_word_col, ...])`` — callers pack the words
    into a single BIGINT (media_dhash) or keep them as an array (the
    wide variant)."""
    n = rows * cols
    df = media.where(F.octet_length(F.col(payload_col)) > 0).select(
        F.col(id_col).alias("media_id"),
        F.hex(F.col(payload_col)).alias("__h"),
        F.octet_length(F.col(payload_col)).cast("long").alias("__l"),
    )

    def byte(j: int):
        # evenly spaced 0-based byte offset floor(j*len/n), read from
        # the hex string (2 chars per byte, 1-based substring)
        return F.expr(
            f"cast(conv(substring(__h, "
            f"2 * cast(({j} * __l) div {n} as int) + 1, 2), 16, 10) "
            f"as bigint)"
        )

    samples = [byte(j) for j in range(n)]
    row_words = []
    for r in range(rows):
        acc = F.lit(0).cast("long")
        for c in range(cols - 1):
            bit = (
                samples[r * cols + c] > samples[r * cols + c + 1]
            ).cast("long")
            acc = acc + bit * F.lit(1 << c)
        row_words.append(acc)
    return df, row_words


def media_dhash_wide(
    media: DataFrame,
    *,
    rows: int = 13,
    cols: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Multi-word dHash -> ``(media_id, dhash_rows: array<bigint>)``
    with one ``cols-1``-bit word PER GRID ROW (default 13x8 = 104
    bits). Same sampling algebra as :func:`media_dhash`, but the bit
    width is no longer capped by a single BIGINT — this is the 100 TB
    answer to "I need a wider hamming radius": pigeonhole banding
    needs ``bands > max_hamming``, and chunk width = bits/bands must
    stay >= ~log2(corpus) or the bucket join degenerates, so a wide
    RADIUS demands a wide HASH. Rows double as the bands (each row
    word is one band chunk), so 13 rows support radius <= 12 at 8-bit
    chunks. All JVM expressions, scan-stage projection."""
    if rows < 1 or cols < 2:
        raise ValueError("media_dhash_wide needs rows >= 1, cols >= 2")
    if cols - 1 > 62:
        raise ValueError("a dhash row word must fit in a signed long")
    df, row_words = _dhash_row_words(
        media, rows=rows, cols=cols, id_col=id_col,
        payload_col=payload_col,
    )
    return df.select("media_id", F.array(*row_words).alias("dhash_rows"))


def dhash_pairs(
    media: DataFrame,
    *,
    max_hamming: int,
    bands: int = 4,
    rows: int = 7,
    cols: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate media pairs by dHash hamming distance ->
    ``(media_a, media_b, hamming)`` with ``hamming <= max_hamming``.

    Exact (no false negatives): the hash's ``rows*(cols-1)`` bits
    split into ``bands`` chunks; two hashes within ``max_hamming``
    must share at least one chunk VERBATIM when
    ``bands > max_hamming`` (pigeonhole), so candidates come from a
    bucketed equi-join on (band, chunk) — never all-pairs — and the
    refine is one ``bit_count(a XOR b)``. The SimHash banding scheme
    applied to the perceptual-hash modality.

    Scale shape — the banding arithmetic is the whole game: each band
    chunk carries ``nbits // bands`` bits, i.e. ``2^(nbits // bands)``
    distinct bucket values per band. Pigeonhole exactness forces
    ``bands > max_hamming``, so a WIDE radius on a narrow hash makes
    chunks tiny (56 bits at radius 12 -> 14 bands of 4 bits = 16
    values/band: two random hashes then collide in >= 1 band with
    probability ~0.6 and the "bucketed" join degenerates to all-pairs
    in disguise). Keep chunks >= 8 bits (56 bits supports radius <= 6
    at 7 bands); for a wider radius widen the HASH (rows x cols), not
    the band count. ``max_bucket`` is the fail-fast for the residual
    risk (skewed content — near-constant payloads piling into one
    bucket): ONE map-side-combinable count over the (band, chunk)
    index raises BEFORE the quadratic self-join is attempted, the
    ``seg_cap`` convention of the fuzzy family. ``None`` costs
    nothing."""
    if max_hamming < 0:
        raise ValueError("dhash_pairs needs max_hamming >= 0")
    if bands <= max_hamming:
        raise ValueError(
            "pigeonhole exactness needs bands > max_hamming"
        )
    nbits = rows * (cols - 1)
    per = nbits // bands
    if per < 1:
        raise ValueError("bands exceed the bit width")
    from ..cache import persist_tracked

    # MATERIALIZE the hash before the self-join: the dhash column is a
    # ~500-node expression (63 hex-substring byte extracts), and both
    # join sides plus the banding fan-out would otherwise re-evaluate
    # it per use (the same rule as jl_recall's projection persist).
    h = persist_tracked(
        media_dhash(
            media, rows=rows, cols=cols, id_col=id_col,
            payload_col=payload_col,
        )
    )
    chunks = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("dhash"), b * per)
                            % F.lit(
                                1 << (per if b < bands - 1
                                      else nbits - (bands - 1) * per)
                            )
                        ).alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("s"),
    ).select(
        "media_id", "dhash",
        F.col("s.band").alias("band"), F.col("s.chunk").alias("chunk"),
    )
    if max_bucket is not None:
        hot = (
            chunks.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        if hot is not None and hot > max_bucket:
            raise ValueError(
                f"dhash_pairs: a (band, chunk) bucket holds {hot} "
                f"hashes (> max_bucket={max_bucket}); the candidate "
                f"self-join would be quadratic in that population. "
                f"Either the corpus shares near-constant payloads, or "
                f"the banding is too coarse ({bands} bands of "
                f"{per} bits = {1 << per} values/band) — widen the "
                f"hash (rows x cols) to keep chunks >= 8 bits at this "
                f"radius, or raise max_bucket if the quadratic cost "
                f"is intended."
            )
    a = chunks.select(
        F.col("media_id").alias("media_a"),
        F.col("dhash").alias("__ha"),
        "band", "chunk",
    )
    b = chunks.select(
        F.col("media_id").alias("media_b"),
        F.col("dhash").alias("__hb"),
        "band", "chunk",
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "__ha", "__hb")
        .distinct()
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.select("media_a", "media_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def dhash_pairs_wide(
    media: DataFrame,
    *,
    max_hamming: int,
    rows: int = 13,
    cols: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs on the multi-word dHash
    (:func:`media_dhash_wide`) -> ``(media_a, media_b, hamming)``,
    ``hamming <= max_hamming``. The grid ROWS are the bands: two
    hashes within ``max_hamming`` differ in at most ``max_hamming``
    row words, so they share a row VERBATIM when
    ``rows > max_hamming`` (pigeonhole — exact, no false negatives).
    Candidates come from the bucketed equi-join on
    ``(band, row_word)``; the refine sums per-word
    ``bit_count(xor)`` via one zip_with/aggregate fold.

    This is the scale-correct home of WIDE radii: each band chunk is
    ``cols-1`` bits (default 8 -> 256 values/band), and growing the
    radius grows ``rows`` — the hash widens instead of the chunks
    thinning (contrast :func:`dhash_pairs`, whose single-BIGINT hash
    caps ``bands * chunk_bits`` at 62). ``max_bucket`` fail-fasts the
    self-join exactly as in :func:`dhash_pairs`."""
    if max_hamming < 0:
        raise ValueError("dhash_pairs_wide needs max_hamming >= 0")
    if rows <= max_hamming:
        raise ValueError(
            "pigeonhole exactness needs rows > max_hamming"
        )
    from ..cache import persist_tracked

    # Same materialize-before-self-join rule as dhash_pairs: the
    # row-word array is a wide sampled expression, evaluated once.
    h = persist_tracked(
        media_dhash_wide(
            media, rows=rows, cols=cols, id_col=id_col,
            payload_col=payload_col,
        )
    )
    chunks = h.select(
        "media_id",
        "dhash_rows",
        F.posexplode("dhash_rows").alias("band", "chunk"),
    )
    if max_bucket is not None:
        hot = (
            chunks.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        if hot is not None and hot > max_bucket:
            raise ValueError(
                f"dhash_pairs_wide: a (band, row_word) bucket holds "
                f"{hot} hashes (> max_bucket={max_bucket}); the "
                f"candidate self-join would be quadratic in that "
                f"population. Widen the grid columns (chunk bits = "
                f"cols-1 = {cols - 1}, {1 << (cols - 1)} values/band) "
                f"to track log2(corpus), or raise max_bucket if the "
                f"quadratic cost is intended."
            )
    a = chunks.select(
        F.col("media_id").alias("media_a"),
        F.col("dhash_rows").alias("__ha"),
        "band", "chunk",
    )
    b = chunks.select(
        F.col("media_id").alias("media_b"),
        F.col("dhash_rows").alias("__hb"),
        "band", "chunk",
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "__ha", "__hb")
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with(
            "__ha", "__hb",
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.select("media_a", "media_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def frame_dedup_pairs(
    media: DataFrame,
    *,
    frame_size: int,
    every_n: int = 1,
    max_hamming: int,
    bands: int = 7,
    rows: int = 7,
    cols: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_bucket: int | None = None,
) -> DataFrame:
    """Keyframe-level near-duplicate detection across media — the
    video-pipeline op "which clips share (almost) the same frames at
    the same offsets": payloads are sliced into ``frame_size`` frames
    (every ``every_n``-th kept, :func:`frame_sample`'s geometry, but
    all-JVM substring slicing — no Python), each frame gets the packed
    dHash, and aligned frames (same ``frame_no``) within
    ``max_hamming`` are counted per media pair ->
    ``(media_a, media_b, n_matched, n_frames_a, n_frames_b)``
    (all-integer report; divide off-line for a match fraction).

    Scale shape: the candidate equi-join keys on
    ``(frame_no, band, chunk)`` — the frame offset rides IN the bucket
    key, so two media only meet where they could actually match, and
    bucket occupancy is per-offset, not corpus-wide. Pigeonhole-exact
    (``bands > max_hamming``); ``max_bucket`` fail-fasts hot buckets
    (the seg_cap convention). Frames are composite-keyed
    ``media_id * 2^20 + frame_no`` through the shared hash projection
    and decomposed after."""
    if frame_size < 1 or every_n < 1:
        raise ValueError("frame_dedup_pairs needs frame_size/every_n >= 1")
    if bands <= max_hamming:
        raise ValueError("pigeonhole exactness needs bands > max_hamming")
    nbits = rows * (cols - 1)
    per = nbits // bands
    if per < 1:
        raise ValueError("bands exceed the bit width")
    from ..cache import persist_tracked

    n_fr = F.ceil(
        F.octet_length(F.col(payload_col)) / F.lit(frame_size)
    ).cast("int")
    frames = (
        media.where(F.octet_length(F.col(payload_col)) > 0)
        .select(
            F.col(id_col).alias("__mid"),
            F.explode(F.sequence(F.lit(0), n_fr - 1)).alias("frame_no"),
            F.col(payload_col).alias("__pl"),
        )
        .where(F.col("frame_no") % every_n == 0)
        .select(
            (
                F.col("__mid") * F.lit(1 << 20) + F.col("frame_no")
            ).alias("fid"),
            F.expr(
                f"substring(__pl, frame_no * {frame_size} + 1, "
                f"{frame_size})"
            ).alias("payload"),
        )
    )
    h = persist_tracked(
        media_dhash(
            frames, rows=rows, cols=cols, id_col="fid",
            payload_col="payload",
        ).select(
            (F.col("media_id") / F.lit(1 << 20)).cast("long").alias("mid"),
            (F.col("media_id") % F.lit(1 << 20)).cast("int").alias(
                "frame_no"
            ),
            "dhash",
        )
    )
    n_frames = h.groupBy("mid").agg(F.count(F.lit(1)).alias("nf"))
    chunks = h.select(
        "mid",
        "frame_no",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("dhash"), b * per)
                            % F.lit(
                                1 << (per if b < bands - 1
                                      else nbits - (bands - 1) * per)
                            )
                        ).alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("s"),
    ).select(
        "mid", "frame_no", "dhash",
        F.col("s.band").alias("band"), F.col("s.chunk").alias("chunk"),
    )
    if max_bucket is not None:
        hot = (
            chunks.groupBy("frame_no", "band", "chunk")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        if hot is not None and hot > max_bucket:
            raise ValueError(
                f"frame_dedup_pairs: a (frame_no, band, chunk) bucket "
                f"holds {hot} frames (> max_bucket={max_bucket}); the "
                f"candidate self-join would be quadratic in that "
                f"population — widen the hash or raise max_bucket."
            )
    a = chunks.select(
        F.col("mid").alias("media_a"), "frame_no",
        F.col("dhash").alias("__ha"), "band", "chunk",
    )
    b = chunks.select(
        F.col("mid").alias("media_b"), "frame_no",
        F.col("dhash").alias("__hb"), "band", "chunk",
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    matched = (
        a.join(b, ["frame_no", "band", "chunk"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "frame_no", "__ha", "__hb")
        .distinct()
        .where(ham <= max_hamming)
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    fa = n_frames.select(
        F.col("mid").alias("media_a"), F.col("nf").alias("n_frames_a")
    )
    fb = n_frames.select(
        F.col("mid").alias("media_b"), F.col("nf").alias("n_frames_b")
    )
    return matched.join(fa, "media_a").join(fb, "media_b").select(
        "media_a", "media_b", "n_matched", "n_frames_a", "n_frames_b"
    )
