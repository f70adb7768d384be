"""DuckDB oracle SQL for the multimodal operators.

The documents table is pure ASCII, so UTF-8 payload bytes equal
codepoints and the byte-level operators are exactly expressible in SQL
(``ord(substr(...))``); the fake decoder's md5-derived features are
reproduced from hex digit pairs.
"""

from __future__ import annotations

from .operators.multimodal import FEATURE_DIM


def byte_histogram_sql(*, bins: int, table: str = "documents") -> str:
    width = 256 // bins
    return f"""
WITH chars AS (
  SELECT doc_id AS media_id,
         unnest(range(1, len(text) + 1)) AS i, text
  FROM {table}
)
SELECT media_id,
       CAST(floor(ord(substr(text, CAST(i AS INT), 1)) / {width}) AS INT) AS bin,
       count(*) AS cnt
FROM chars
GROUP BY 1, 2
"""


def frame_sample_sql(
    *, frame_size: int, every_n: int, table: str = "documents"
) -> str:
    return f"""
WITH framed AS (
  SELECT doc_id AS media_id,
         unnest(range(0, CAST(ceil(len(text) * 1.0 / {frame_size}) AS BIGINT))) AS f,
         text
  FROM {table}
)
SELECT media_id, CAST(f AS INT) AS frame_no,
       substr(text, CAST(f * {frame_size} + 1 AS INT), {frame_size}) AS frame_text
FROM framed
WHERE f % {every_n} = 0
"""


def decode_features_sql(*, table: str = "documents") -> str:
    return f"""
WITH feats AS (
  SELECT doc_id AS media_id, 'text' AS kind,
         unnest(range(0, {FEATURE_DIM})) AS fi, md5(text) AS h
  FROM {table}
)
SELECT media_id, kind, CAST(fi AS INT) AS fi,
       CAST('0x' || substr(h, CAST(fi * 2 + 1 AS INT), 2) AS INT) / 255.0 AS feature
FROM feats
"""


def resize_media_sql(*, factor: int, table: str = "documents") -> str:
    """Oracle for multimodal.resize_media: byte-stride downsample of the
    ASCII payload, reassembled with an ordered string_agg."""
    return f"""
WITH chars AS (
  SELECT doc_id AS media_id, len(text) AS orig_len,
         unnest(range(0, len(text))) AS i, text
  FROM {table}
)
SELECT media_id, CAST(orig_len AS BIGINT) AS orig_len,
       CAST(count(*) AS BIGINT) AS new_len,
       string_agg(substr(text, CAST(i + 1 AS INT), 1), '' ORDER BY i) AS thumb_text
FROM chars
WHERE i % {factor} = 0
GROUP BY media_id, orig_len
"""


def _dhash_expr(*, rows: int, cols: int, text: str = "text") -> str:
    """56-bit dHash as one SQL expression over the ASCII payload (byte
    at 0-based offset p == ord(substr(text, p+1, 1)))."""
    n = rows * cols

    def byte(j: int) -> str:
        return (
            f"ord(substr({text}, CAST(({j} * l) // {n} AS INT) + 1, 1))"
        )

    terms = []
    k = 0
    for r in range(rows):
        for c in range(cols - 1):
            terms.append(
                f"(CASE WHEN {byte(r * cols + c)} > "
                f"{byte(r * cols + c + 1)} THEN CAST({1 << k} AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)"
            )
            k += 1
    return " + ".join(terms)


def _dhash_row_expr(r: int, *, cols: int, n: int, text: str = "text") -> str:
    """One grid row's ``cols-1`` gradient bits packed into a BIGINT —
    the per-row word of multimodal.media_dhash_wide."""

    def byte(j: int) -> str:
        return (
            f"ord(substr({text}, CAST(({j} * l) // {n} AS INT) + 1, 1))"
        )

    terms = [
        f"(CASE WHEN {byte(r * cols + c)} > "
        f"{byte(r * cols + c + 1)} THEN CAST({1 << c} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for c in range(cols - 1)
    ]
    return " + ".join(terms)


def dhash_pairs_wide_sql(
    *,
    max_hamming: int,
    rows: int = 13,
    cols: int = 9,
    table: str = "documents",
    twin_mod: int | None = None,
    twin_off: int = 0,
    twin_min_len: int = 63,
) -> str:
    """Oracle for multimodal.dhash_pairs_wide: per-row words as
    columns, rows-as-bands bucket join, summed bit_count(xor) refine;
    same planted-twin replay as dhash_pairs_sql."""
    n = rows * cols
    word_cols = ", ".join(
        f"({_dhash_row_expr(r, cols=cols, n=n)}) AS r{r}"
        for r in range(rows)
    )
    band_rows = ", ".join(f"({b})" for b in range(rows))
    chunk = " ".join(
        f"WHEN u.band = {b} THEN r{b}" for b in range(rows)
    )
    ham = " + ".join(
        f"bit_count(xor(a.r{r}, b.r{r}))" for r in range(rows)
    )
    plant = (
        f"""
  UNION ALL
  SELECT doc_id + {twin_off} AS media_id,
         '~' || substr(text, 2, len(text) - 1) AS text,
         CAST(len(text) AS BIGINT) AS l
  FROM {table}
  WHERE doc_id % {twin_mod} = 0 AND len(text) >= {twin_min_len}"""
        if twin_mod is not None
        else ""
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(len(text) AS BIGINT) AS l
  FROM {table} WHERE len(text) > 0{plant}
), h AS (
  SELECT media_id, {word_cols} FROM m
), c AS (
  SELECT media_id, u.band, (CASE {chunk} END) AS chunk,
         {", ".join(f"r{r}" for r in range(rows))}
  FROM h, (VALUES {band_rows}) u(band)
)
SELECT media_a, media_b, hamming FROM (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         CAST(({ham}) AS INT) AS hamming
  FROM c a JOIN c b
    ON a.band = b.band AND a.chunk = b.chunk
   AND a.media_id < b.media_id)
WHERE hamming <= {max_hamming}
"""


def dhash_probe_sql(
    *,
    probe_id: int,
    max_hamming: int,
    rows: int = 13,
    cols: int = 9,
    table: str = "documents",
    twin_mod: int | None = None,
    twin_off: int = 0,
    twin_min_len: int = 63,
) -> str:
    """Oracle for sources.read_dhash_probe over a
    sources.write_dhash_index of the planted-twin corpus: banding
    cannot change the result (pigeonhole-exact), so the twin is the
    brute-force hamming between the probe's per-row words and every
    other media's."""
    n = rows * cols
    word_cols = ", ".join(
        f"({_dhash_row_expr(r, cols=cols, n=n)}) AS r{r}"
        for r in range(rows)
    )
    ham = " + ".join(
        f"bit_count(xor(h.r{r}, p.r{r}))" for r in range(rows)
    )
    plant = (
        f"""
  UNION ALL
  SELECT doc_id + {twin_off} AS media_id,
         '~' || substr(text, 2, len(text) - 1) AS text,
         CAST(len(text) AS BIGINT) AS l
  FROM {table}
  WHERE doc_id % {twin_mod} = 0 AND len(text) >= {twin_min_len}"""
        if twin_mod is not None
        else ""
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(len(text) AS BIGINT) AS l
  FROM {table} WHERE len(text) > 0{plant}
), h AS (
  SELECT media_id, {word_cols} FROM m
), p AS (
  SELECT * FROM h WHERE media_id = {probe_id}
)
SELECT h.media_id, CAST(({ham}) AS INT) AS hamming
FROM h, p
WHERE h.media_id <> {probe_id} AND ({ham}) <= {max_hamming}
ORDER BY hamming, h.media_id
"""


def frame_dedup_sql(
    *,
    frame_size: int,
    every_n: int,
    max_hamming: int,
    rows: int = 7,
    cols: int = 9,
    table: str = "documents",
    twin_mod: int | None = None,
    twin_off: int = 0,
    twin_min_len: int = 63,
) -> str:
    """Oracle for multimodal.frame_dedup_pairs: same frame slicing,
    same per-frame packed dHash, brute-force aligned-frame hamming
    (banding cannot change the result — pigeonhole-exact)."""
    plant = (
        f"""
  UNION ALL
  SELECT doc_id + {twin_off} AS media_id,
         '~' || substr(text, 2, len(text) - 1) AS text
  FROM {table}
  WHERE doc_id % {twin_mod} = 0 AND len(text) >= {twin_min_len}"""
        if twin_mod is not None
        else ""
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text
  FROM {table} WHERE len(text) > 0{plant}
), fr AS (
  SELECT media_id, CAST(f AS INT) AS frame_no,
         substr(text, CAST(f * {frame_size} + 1 AS INT), {frame_size})
           AS ftext
  FROM (
    SELECT media_id, text,
           unnest(range(0,
             CAST(ceil(len(text) * 1.0 / {frame_size}) AS BIGINT))) AS f
    FROM m)
  WHERE f % {every_n} = 0
), ft AS (
  SELECT media_id, frame_no, ftext AS text,
         CAST(len(ftext) AS BIGINT) AS l
  FROM fr
), h AS (
  SELECT media_id, frame_no,
         ({_dhash_expr(rows=rows, cols=cols)}) AS dhash
  FROM ft
), p AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b,
         count(*) AS n_matched
  FROM h a
  JOIN h b ON a.frame_no = b.frame_no AND a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
  GROUP BY 1, 2
), nf AS (
  SELECT media_id, count(*) AS nf FROM h GROUP BY 1
)
SELECT p.media_a, p.media_b, CAST(p.n_matched AS BIGINT) AS n_matched,
       CAST(fa.nf AS BIGINT) AS n_frames_a,
       CAST(fb.nf AS BIGINT) AS n_frames_b
FROM p
JOIN nf fa ON fa.media_id = p.media_a
JOIN nf fb ON fb.media_id = p.media_b
"""


def dhash_sql(*, rows: int = 7, cols: int = 9, table: str = "documents") -> str:
    """Oracle for multimodal.media_dhash (payload = UTF-8 text bytes)."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(len(text) AS BIGINT) AS l
  FROM {table} WHERE len(text) > 0
)
SELECT media_id, ({_dhash_expr(rows=rows, cols=cols)}) AS dhash FROM m
"""


def dhash_stream_dedup_sql(
    *,
    max_hamming: int,
    bands: int,
    rows: int = 7,
    cols: int = 9,
    table: str = "documents",
    twin_mod: int | None = None,
    twin_off: int = 0,
    twin_min_len: int = 63,
) -> str:
    """Oracle for streaming.media.streaming_dhash_dedup under
    id-ordered replay: each (band, chunk) bucket's claimant is its
    global-min media_id, and a payload's per-band ``dup_of`` is that
    claimant iff it is earlier AND its full dhash is within
    ``max_hamming``; the verdict is min over bands. Same planted
    near-twins as dhash_pairs_sql."""
    nbits = rows * (cols - 1)
    per = nbits // bands
    band_rows = ", ".join(f"({b})" for b in range(bands))
    widths = {
        b: (per if b < bands - 1 else nbits - (bands - 1) * per)
        for b in range(bands)
    }
    chunk = " ".join(
        f"WHEN u.band = {b} THEN (dhash >> {b * per}) % {1 << widths[b]}"
        for b in range(bands)
    )
    plant = (
        f"""
  UNION ALL
  SELECT doc_id + {twin_off} AS media_id,
         '~' || substr(text, 2, len(text) - 1) AS text,
         CAST(len(text) AS BIGINT) AS l
  FROM {table}
  WHERE doc_id % {twin_mod} = 0 AND len(text) >= {twin_min_len}"""
        if twin_mod is not None
        else ""
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(len(text) AS BIGINT) AS l
  FROM {table} WHERE len(text) > 0{plant}
), h AS (
  SELECT media_id, ({_dhash_expr(rows=rows, cols=cols)}) AS dhash FROM m
), c AS (
  SELECT media_id, dhash, u.band,
         (CASE {chunk} END) AS chunk
  FROM h, (VALUES {band_rows}) u(band)
), cl AS (
  SELECT band, chunk, min(media_id) AS claimant
  FROM c GROUP BY band, chunk
), per_band AS (
  SELECT c.media_id,
         CASE WHEN cl.claimant < c.media_id
              AND bit_count(xor(c.dhash, hc.dhash)) <= {max_hamming}
         THEN cl.claimant END AS dup_of
  FROM c
  JOIN cl ON c.band = cl.band AND c.chunk = cl.chunk
  JOIN h hc ON hc.media_id = cl.claimant
)
SELECT media_id, min(dup_of) AS dup_of,
       min(dup_of) IS NOT NULL AS is_duplicate
FROM per_band GROUP BY media_id
"""


def dhash_pairs_sql(
    *,
    max_hamming: int,
    bands: int = 4,
    rows: int = 7,
    cols: int = 9,
    table: str = "documents",
    twin_mod: int | None = None,
    twin_off: int = 0,
    twin_min_len: int = 63,
) -> str:
    """Oracle for multimodal.dhash_pairs: same banded chunks, same
    bit_count(xor) refine. ``twin_mod`` replays the registered
    query's planted near-twins: a 1-byte perturbation of every
    ``twin_mod``-th doc (len >= ``twin_min_len`` keeps each dhash
    sample offset unique, so the twin flips at most one bit)."""
    nbits = rows * (cols - 1)
    per = nbits // bands
    band_rows = ", ".join(f"({b})" for b in range(bands))
    widths = {
        b: (per if b < bands - 1 else nbits - (bands - 1) * per)
        for b in range(bands)
    }
    chunk = " ".join(
        f"WHEN u.band = {b} THEN (dhash >> {b * per}) % {1 << widths[b]}"
        for b in range(bands)
    )
    plant = (
        f"""
  UNION ALL
  SELECT doc_id + {twin_off} AS media_id,
         '~' || substr(text, 2, len(text) - 1) AS text,
         CAST(len(text) AS BIGINT) AS l
  FROM {table}
  WHERE doc_id % {twin_mod} = 0 AND len(text) >= {twin_min_len}"""
        if twin_mod is not None
        else ""
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(len(text) AS BIGINT) AS l
  FROM {table} WHERE len(text) > 0{plant}
), h AS (
  SELECT media_id, ({_dhash_expr(rows=rows, cols=cols)}) AS dhash FROM m
), c AS (
  SELECT media_id, dhash, u.band,
         (CASE {chunk} END) AS chunk
  FROM h, (VALUES {band_rows}) u(band)
)
SELECT media_a, media_b, hamming FROM (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
  FROM c a JOIN c b
    ON a.band = b.band AND a.chunk = b.chunk
   AND a.media_id < b.media_id)
WHERE hamming <= {max_hamming}
"""
