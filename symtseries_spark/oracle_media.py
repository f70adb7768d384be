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
