"""DuckDB oracle SQL for the text-analysis and dedup operators.

Mirrors :mod:`symtseries_spark.functions.text` and
:mod:`symtseries_spark.operators.dedup` with independent SQL (DuckDB list
lambdas + plain joins). Shared constants (hash construction, MinHash
coefficients, marker lists) are injected as literals so both engines
compute identical integers.
"""

from __future__ import annotations

from .functions.text import (
    BPE_REGEX,
    EN_STOPWORDS,
    HASH_PRIME,
    LANG_MARKERS,
)
from .operators.dedup import minhash_coefficients

# ---------------------------------------------------------------------------
# shared expression fragments


def hash60(expr: str) -> str:
    """DuckDB mirror of functions.text.doc_hash60."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def tokens_expr(text: str = "text") -> str:
    return (
        f"list_filter(string_split_regex(lower({text}), '[^a-z0-9]+'), "
        f"t -> t != '')"
    )


def shingles_expr(k: int, text: str = "text") -> str:
    """Distinct word-k-shingles as a DuckDB list expression."""
    toks = tokens_expr(text)
    return (
        f"list_distinct(list_transform("
        f"range(1, len({toks}) - {k} + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')))"
    )


def normalized_expr(text: str = "text") -> str:
    return f"trim(regexp_replace(lower({text}), '\\s+', ' ', 'g'))"


def _str_list(items: list[str]) -> str:
    return "[" + ", ".join(f"'{s}'" for s in items) + "]"


# ---------------------------------------------------------------------------
# text analysis


def text_quality_sql(*, table: str = "documents") -> str:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    digit_ratio, space_ratio, quality_score, bpe_tokens, lang_pred,
    fingerprint) — mirrors quality_metrics + lang_id +
    bpe_token_count + rolling_fingerprint."""
    toks = "toks"
    langs = list(LANG_MARKERS)
    marker_counts = ",\n         ".join(
        f"len(list_filter({toks}, t -> list_contains({_str_list(LANG_MARKERS[lang])}, t))) AS s_{lang}"
        for lang in langs
    )
    # first-listed language wins ties: CASE in list order, >= all others
    lang_branches = []
    for lang in langs:
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{other}" for other in langs if other != lang
        ]
        lang_branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_case = "CASE " + " ".join(lang_branches) + " ELSE 'und' END"

    score = (
        "CASE WHEN n_tokens > 0 THEN "
        "least(stopword_ratio_raw * 4, 1.0) * 0.4 "
        "+ (CASE WHEN avg_len_raw >= 3 AND avg_len_raw <= 10 THEN 0.4 ELSE 0.0 END) "
        "+ (CASE WHEN digit_ratio_raw < 0.3 THEN 0.2 ELSE 0.0 END) "
        "ELSE 0.0 END"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text, {tokens_expr()} AS {toks} FROM {table}
), m AS (
  SELECT doc_id,
         len(text) AS n_chars,
         len({toks}) AS n_tokens,
         CASE WHEN len({toks}) > 0
              THEN len(array_to_string({toks}, '')) * 1.0 / len({toks})
              ELSE 0.0 END AS avg_len_raw,
         CASE WHEN len({toks}) > 0
              THEN len(list_filter({toks}, t -> list_contains({_str_list(EN_STOPWORDS)}, t))) * 1.0 / len({toks})
              ELSE 0.0 END AS stopword_ratio_raw,
         CASE WHEN len(text) > 0
              THEN len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text)
              ELSE 0.0 END AS digit_ratio_raw,
         CASE WHEN len(text) > 0
              THEN len(regexp_replace(text, '[^ ]', '', 'g')) * 1.0 / len(text)
              ELSE 0.0 END AS space_ratio_raw,
         len(regexp_extract_all(lower(text), '{BPE_REGEX}')) AS bpe_tokens,
         {marker_counts},
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform({toks}, t -> {hash60('t')} % {HASH_PRIME})),
           (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
  FROM base
)
SELECT doc_id, n_chars, n_tokens,
       round(avg_len_raw, 4) AS avg_token_len,
       round(stopword_ratio_raw, 4) AS stopword_ratio,
       round(digit_ratio_raw, 4) AS digit_ratio,
       round(space_ratio_raw, 4) AS space_ratio,
       round({score}, 4) AS quality_score,
       bpe_tokens,
       {lang_case} AS lang_pred,
       fingerprint
FROM m
"""


def split_sql(
    fractions: dict[str, float], *, salt: str = "split", table: str = "documents"
) -> str:
    """Mirror of operators.pipeline.split_assignment — thresholds use the
    SAME Python float accumulation so boundary hashes land identically."""
    salted_key = f"'{salt}' || CAST(doc_id AS VARCHAR)"
    u = f"({hash60(salted_key)} % 1000000) / 1000000.0"
    items = list(fractions.items())
    acc = 0.0
    branches = []
    for name, frac in items[:-1]:
        acc += frac
        branches.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{items[-1][0]}' END"
    return f"SELECT doc_id, {case} AS split FROM {table}"


def length_buckets_sql(*, bucket_tokens: int, table: str = "documents") -> str:
    toks = f"len(regexp_extract_all(lower(text), '{BPE_REGEX}'))"
    return f"""
SELECT CAST(floor({toks} * 1.0 / {bucket_tokens}) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       CAST(sum({toks}) AS BIGINT) AS total_tokens
FROM {table}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# dedup


def exact_dedup_sql(*, table: str = "documents") -> str:
    return f"""
WITH hashed AS (
  SELECT doc_id, {hash60(normalized_expr())} AS content_hash FROM {table}
), canon AS (
  SELECT content_hash, min(doc_id) AS canonical_id FROM hashed GROUP BY 1
)
SELECT h.doc_id, h.content_hash, c.canonical_id,
       h.doc_id != c.canonical_id AS is_duplicate
FROM hashed h JOIN canon c USING (content_hash)
"""


def shingle_cte(k: int, *, table: str = "documents") -> str:
    return (
        f"SELECT doc_id, unnest({shingles_expr(k)}) AS shingle FROM {table}"
    )


def jaccard_pairs_sql(
    *,
    k: int,
    threshold: float,
    table: str = "documents",
    max_shingle_freq: int | None = None,
) -> str:
    """SQL twin of ``operators.dedup.jaccard_pairs`` — with the same
    hot-shingle cap: shingles shared by more than ``max_shingle_freq``
    docs are dropped BEFORE sizes/common, exactly like the operator's
    window-count filter."""
    if max_shingle_freq is not None:
        sh_cte = f"""SELECT doc_id, shingle FROM (
  SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS __f
  FROM ({shingle_cte(k, table=table)})
) WHERE __f <= {max_shingle_freq}"""
    else:
        sh_cte = shingle_cte(k, table=table)
    return f"""
WITH sh AS ({sh_cte}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common c
JOIN sizes sa ON c.doc_a = sa.doc_id
JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) >= {threshold}
"""


def stratified_sample_sql(
    *,
    stratum: str,
    fraction: float,
    salt: str = "sample",
    table: str = "documents",
) -> str:
    """Oracle for pipeline.stratified_sample: exact floor(frac*n) rows
    per stratum by salted-hash rank."""
    h = hash60(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT doc_id, {stratum},
         row_number() OVER (PARTITION BY {stratum} ORDER BY {h}, doc_id) AS rn,
         count(*) OVER (PARTITION BY {stratum}) AS n
  FROM {table}
)
SELECT doc_id, {stratum} FROM r
WHERE rn <= floor({fraction} * n)
ORDER BY {stratum}, doc_id
"""


def pack_shards_sql(
    *, shard_tokens: int, group: str, table: str = "documents"
) -> str:
    """Oracle for pipeline.pack_shards: token-offset sharding in id
    order within each group."""
    return f"""
WITH t AS (
  SELECT {group}, doc_id,
         len(regexp_extract_all(lower(text), '{BPE_REGEX}')) AS tk
  FROM {table}
), c AS (
  SELECT {group}, doc_id, tk,
         sum(tk) OVER (PARTITION BY {group} ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - tk AS tokens_before
  FROM t
)
SELECT {group}, CAST(floor(tokens_before / {shard_tokens}.0) AS BIGINT) AS shard_id,
       count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_id, max(doc_id) AS last_id
FROM c GROUP BY {group}, shard_id ORDER BY {group}, shard_id
"""


def tfidf_top_terms_sql(*, topk: int, table: str = "documents") -> str:
    """Oracle for retrieval.tfidf_top_terms (same expression shape:
    tf * ln(n / df), integer-to-double division on both engines)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_expr()}) AS term FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(n.n / dft.df), 6) AS tfidf
  FROM tf JOIN dft USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= {topk}
"""


def bm25_topk_sql(
    *,
    terms: list[str],
    topk: int,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """Oracle for retrieval.bm25_topk — identical expression shape
    (literal values, association order) so doubles agree to the ulp."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln(1.0 + (n - CAST(df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * CAST(tf{i} AS DOUBLE) * {k1 + 1.0}"
        f" / (CAST(tf{i} AS DOUBLE) + {k1} * ({1.0 - b} + {b} * dl / avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH base AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {tokens_expr()} AS toks FROM {table})
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl,
         {df_cols}
  FROM base
)
SELECT doc_id, round({parts}, 6) AS score
FROM base, stats
ORDER BY score DESC, doc_id LIMIT {topk}
"""


def minhash_sig_cte(
    *, k: int, num_hashes: int, seed: int, table: str = "documents"
) -> str:
    coeffs = minhash_coefficients(num_hashes, seed)
    aggs = ",\n         ".join(
        f"min(({a} * h + {b}) % {HASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    return f"""
  SELECT doc_id, {aggs}
  FROM (
    SELECT doc_id, {hash60('shingle')} % {HASH_PRIME} AS h
    FROM ({shingle_cte(k, table=table)})
  )
  GROUP BY doc_id
"""


def minhash_lsh_pairs_sql(
    *,
    k: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    seed: int,
    table: str = "documents",
) -> str:
    r = num_hashes // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, concat_ws('_', {cols}) AS band_key FROM sigs".format(
            b=b, cols=", ".join(f"m{b * r + j}" for j in range(r))
        )
        for b in range(bands)
    )
    eq_sum = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
WITH sigs AS ({minhash_sig_cte(k=k, num_hashes=num_hashes, seed=seed, table=table)}),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(({eq_sum}) * 1.0 / {num_hashes}, 4) AS est_jaccard
FROM cand c
JOIN sigs sa ON c.doc_a = sa.doc_id
JOIN sigs sb ON c.doc_b = sb.doc_id
WHERE round(({eq_sum}) * 1.0 / {num_hashes}, 4) >= {threshold}
"""


def lsh_probe_sql(
    *,
    k: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    seed: int,
    probe_doc_id: int = 0,
    probe_prefix: str = "relisted ",
    table: str = "documents",
) -> str:
    """Oracle for sources.write_lsh_index + read_lsh_probe: the probe
    is ``probe_prefix || text`` of ``probe_doc_id``; candidates are
    corpus docs sharing >= 1 band with the probe, refined by exact
    signature-agreement Jaccard at ``threshold``."""
    r = num_hashes // bands
    pfx = probe_prefix.replace("'", "''")
    probe_table = (
        f"(SELECT doc_id, '{pfx}' || text AS text FROM {table} "
        f"WHERE doc_id = {probe_doc_id}) pd"
    )

    def band_selects(src: str) -> str:
        return " UNION ALL ".join(
            "SELECT doc_id, {b} AS band_id, concat_ws('_', {cols}) AS band_key FROM {src}".format(
                b=b,
                cols=", ".join(f"m{b * r + j}" for j in range(r)),
                src=src,
            )
            for b in range(bands)
        )

    eq_sum = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
WITH sigs AS ({minhash_sig_cte(k=k, num_hashes=num_hashes, seed=seed, table=table)}),
probe AS ({minhash_sig_cte(k=k, num_hashes=num_hashes, seed=seed, table=probe_table)}),
db AS ({band_selects('sigs')}),
pb AS ({band_selects('probe')}),
cand AS (
  SELECT DISTINCT db.doc_id
  FROM db JOIN pb ON db.band_id = pb.band_id AND db.band_key = pb.band_key
)
SELECT c.doc_id,
       round(({eq_sum}) * 1.0 / {num_hashes}, 4) AS est_jaccard
FROM cand c
JOIN sigs sa ON c.doc_id = sa.doc_id
CROSS JOIN probe sb
WHERE round(({eq_sum}) * 1.0 / {num_hashes}, 4) >= {threshold}
"""


def minhash_stream_dedup_sql(
    *,
    k: int,
    num_hashes: int,
    bands: int,
    seed: int,
    table: str = "documents",
) -> str:
    """Oracle for the STREAMING minhash dedup: a doc's dup_of is the
    smallest earlier doc sharing at least one LSH band (id order ==
    arrival order in the replay)."""
    r = num_hashes // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, concat_ws('_', {cols}) AS band_key FROM sigs".format(
            b=b, cols=", ".join(f"m{b * r + j}" for j in range(r))
        )
        for b in range(bands)
    )
    return f"""
WITH sigs AS ({minhash_sig_cte(k=k, num_hashes=num_hashes, seed=seed, table=table)}),
bands AS ({band_selects})
SELECT a.doc_id, min(b.doc_id) AS dup_of,
       min(b.doc_id) IS NOT NULL AS is_duplicate
FROM bands a LEFT JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key
 AND b.doc_id < a.doc_id
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


def simhash_cte(*, bits: int, table: str = "documents") -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    sim = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
  SELECT doc_id, {sim} AS simhash FROM (
    SELECT doc_id, {votes}
    FROM (
      SELECT doc_id, {hash60('tok')} AS h
      FROM (SELECT doc_id, unnest({tokens_expr()}) AS tok FROM {table})
    )
    GROUP BY doc_id
  )
"""


def simhash_sql(*, bits: int, table: str = "documents") -> str:
    return f"SELECT doc_id, simhash FROM ({simhash_cte(bits=bits, table=table)})"


def simhash_pairs_sql(
    *, bits: int, max_hamming: int, chunks: int, table: str = "documents"
) -> str:
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS chunk_id, "
        f"(simhash >> {i * width}) & {mask} AS chunk_val FROM sims"
        for i in range(chunks)
    )
    return f"""
WITH sims AS ({simhash_cte(bits=bits, table=table)}),
chunked AS ({chunk_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                  b.doc_id AS doc_b, b.simhash AS sim_b
  FROM chunked a JOIN chunked b
    ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


def kgram_hashes_expr(k: int, text: str = "text") -> str:
    """POSITIONAL word k-gram hashes (mirror of
    functions.text.kgram_hashes): hash60(gram) % HASH_PRIME, order and
    multiplicity kept. range(1, n) is empty for n <= 1, matching the
    Spark side's short-doc guard."""
    toks = tokens_expr(text)
    gram = f"array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')"
    return (
        f"list_transform(range(1, len({toks}) - {k} + 2), "
        f"i -> {hash60(gram)} % 2147483647)"
    )


def winnow_cte(k: int, w: int, *, table: str = "documents") -> str:
    """``(doc_id, fp)`` exploded winnowing fingerprints — mirror of
    operators.dedup.winnow_table: min hash of each w-window over the
    positional k-gram hash sequence, distinct per doc."""
    return f"""SELECT doc_id, unnest(fps) AS fp FROM (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - {w} + 2),
             p -> list_min(list_slice(h, p, p + {w - 1})))) AS fps
  FROM (SELECT doc_id, {kgram_hashes_expr(k)} AS h FROM {table})
)"""


def winnow_docs_sql(*, k: int, w: int, table: str = "documents") -> str:
    """Oracle for the exploded winnow_table driver query."""
    return f"SELECT doc_id, fp FROM ({winnow_cte(k, w, table=table)})"


def winnow_pairs_sql(
    *,
    k: int,
    w: int,
    min_shared: int,
    table: str = "documents",
    max_fp_freq: int | None = None,
) -> str:
    """Oracle for operators.dedup.winnow_pairs — same hot-fingerprint
    cap (window count before sizes/shared), same overlap ratio."""
    if max_fp_freq is not None:
        fp_cte = f"""SELECT doc_id, fp FROM (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS __f
  FROM ({winnow_cte(k, w, table=table)})
) WHERE __f <= {max_fp_freq}"""
    else:
        fp_cte = winnow_cte(k, w, table=table)
    return f"""
WITH fp AS ({fp_cte}),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared}
)
SELECT doc_a, doc_b, n_shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
       round(n_shared * 1.0 / least(sa.n_fp, sb.n_fp), 4) AS overlap
FROM shared s
JOIN sizes sa ON s.doc_a = sa.doc_id
JOIN sizes sb ON s.doc_b = sb.doc_id
"""


def containment_pairs_sql(
    *,
    k: int,
    threshold: float,
    table: str = "documents",
    max_shingle_freq: int | None = None,
) -> str:
    """Oracle for operators.dedup.containment_pairs — asymmetric overlap
    over the same distinct-shingle inverted index as jaccard_pairs_sql."""
    if max_shingle_freq is not None:
        sh_cte = f"""SELECT doc_id, shingle FROM (
  SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS __f
  FROM ({shingle_cte(k, table=table)})
) WHERE __f <= {max_shingle_freq}"""
    else:
        sh_cte = shingle_cte(k, table=table)
    return f"""
WITH sh AS ({sh_cte}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(n_common * 1.0 / sa.n_sh, 4) AS cont_a,
       round(n_common * 1.0 / sb.n_sh, 4) AS cont_b
FROM common c
JOIN sizes sa ON c.doc_a = sa.doc_id
JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE greatest(round(n_common * 1.0 / sa.n_sh, 4),
               round(n_common * 1.0 / sb.n_sh, 4)) >= {threshold}
"""


def boilerplate_sql(*, k: int, min_df: int, table: str = "documents") -> str:
    """Oracle for retrieval.boilerplate_metrics (same positional gram
    hashes, same distinct-doc frequency threshold)."""
    return f"""
WITH grams AS (
  SELECT doc_id, unnest(h) AS gh
  FROM (SELECT doc_id, {kgram_hashes_expr(k)} AS h FROM {table})
), freq AS (
  SELECT gh FROM grams GROUP BY gh
  HAVING count(DISTINCT doc_id) >= {min_df}
), per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         count(f.gh) AS n_boiler
  FROM grams g LEFT JOIN freq f ON g.gh = f.gh
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_boiler, 0) AS n_boiler,
       round(CASE WHEN coalesce(p.n_grams, 0) > 0
                  THEN p.n_boiler * 1.0 / p.n_grams ELSE 0.0 END, 4)
         AS boiler_ratio
FROM {table} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def top_terms_sql(*, topk: int, min_len: int = 3, table: str = "documents") -> str:
    """Oracle for retrieval.top_terms (exact corpus heavy hitters)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_expr()}) AS term FROM {table}
)
SELECT term, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
FROM tok WHERE length(term) >= {min_len}
GROUP BY term ORDER BY occurrences DESC, term LIMIT {topk}
"""


def repetition_sql(*, table: str = "documents") -> str:
    """Oracle for retrieval.repetition_metrics (same ratio expressions)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_expr()}) AS term FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
       round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(tf) AS DOUBLE), 6)
         AS dup_ratio,
       round(CAST(max(tf) AS DOUBLE) / CAST(sum(tf) AS DOUBLE), 6)
         AS top_share
FROM tf GROUP BY doc_id
"""


def exact_substring_sql(
    *, window_tokens: int, table: str = "documents"
) -> str:
    """Oracle for dedup.exact_substring_stats: same stride-1 token
    windows, same unique-owner counting, same ratio/rounding."""
    k = window_tokens
    return f"""
WITH t AS (
  SELECT doc_id, {tokens_expr()} AS toks FROM {table}
), win AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - {k} + 2),
                i -> array_to_string(toks[i : i + {k} - 1], ' '))) AS w
  FROM t
), per_doc AS (
  SELECT doc_id, greatest(len(toks) - {k} + 1, 0) AS n_windows FROM t
), g AS (
  SELECT w, count(*) AS c, min(doc_id) AS owner FROM win GROUP BY w
), uniq AS (
  SELECT owner AS doc_id, count(*) AS n_uniq FROM g WHERE c = 1
  GROUP BY owner
)
SELECT p.doc_id,
       CAST(p.n_windows AS BIGINT) AS n_windows,
       CAST(p.n_windows - coalesce(u.n_uniq, 0) AS BIGINT)
         AS n_dup_windows,
       CASE WHEN p.n_windows > 0
            THEN round((p.n_windows - coalesce(u.n_uniq, 0)) * 1.0
                       / p.n_windows, 6)
            ELSE 0.0 END AS dup_frac
FROM per_doc p LEFT JOIN uniq u ON p.doc_id = u.doc_id
"""


def exact_substring_dedup_sql(
    *, window_tokens: int, table: str = "documents"
) -> str:
    """Oracle for dedup.exact_substring_dedup: same stride-1 windows,
    same min-(doc_id, pos) canonical pick, same token-coverage cut,
    same position-ordered rebuild."""
    k = window_tokens
    return f"""
WITH t AS (
  SELECT doc_id, {tokens_expr()} AS toks FROM {table}
), tok AS (
  SELECT doc_id, CAST(i AS INT) AS tpos, toks[CAST(i AS INT)] AS tok
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t)
), win AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         array_to_string(toks[CAST(i AS INT) : CAST(i AS INT) + {k} - 1],
                         ' ') AS w
  FROM (SELECT doc_id, toks,
               unnest(range(1, len(toks) - {k} + 2)) AS i FROM t)
), marked AS (
  SELECT doc_id, p,
         row_number() OVER (PARTITION BY w ORDER BY doc_id, p) AS r,
         count(*) OVER (PARTITION BY w) AS c
  FROM win
), covered AS (
  SELECT DISTINCT doc_id, CAST(unnest(range(p, p + {k})) AS INT) AS tpos
  FROM marked WHERE c > 1 AND r > 1
), kept AS (
  SELECT tok.doc_id, tok.tpos, tok.tok
  FROM tok ANTI JOIN covered
    ON tok.doc_id = covered.doc_id AND tok.tpos = covered.tpos
), keptagg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY tpos) AS clean_text
  FROM kept GROUP BY doc_id
), n_tok AS (
  SELECT doc_id, len(toks) AS n_tokens FROM t
)
SELECT d.doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_tokens, 0) - coalesce(n_kept, 0) AS BIGINT)
         AS n_removed,
       coalesce(clean_text, '') AS clean_text
FROM {table} d
LEFT JOIN n_tok ON d.doc_id = n_tok.doc_id
LEFT JOIN keptagg ON d.doc_id = keptagg.doc_id
"""


def dup_source_matrix_sql(*, table: str = "documents") -> str:
    """Oracle for dedup.dup_source_matrix: same hash, same per-source
    counts, same pair identity (C(c,2) within, ca*cb across)."""
    return f"""
WITH per AS (
  SELECT {hash60(normalized_expr())} AS h, source AS src,
         count(*) AS c
  FROM {table} GROUP BY 1, 2
)
SELECT a.src AS source_a, b.src AS source_b,
       CAST(sum(CASE WHEN a.src = b.src THEN a.c * (a.c - 1) / 2
                ELSE a.c * b.c END) AS BIGINT) AS dup_pairs
FROM per a JOIN per b ON a.h = b.h AND a.src <= b.src
GROUP BY 1, 2
HAVING sum(CASE WHEN a.src = b.src THEN a.c * (a.c - 1) / 2
           ELSE a.c * b.c END) > 0
"""


def line_dedup_sql(*, sep: str, table: str = "documents") -> str:
    """Oracle for dedup.line_dedup — identical line split (literal
    separator), first-occurrence keep-one, position-ordered rebuild."""
    s = sep.replace("'", "''")
    return f"""
WITH ex AS (
  SELECT doc_id, CAST(i AS INT) AS line_no, parts[CAST(i AS INT)] AS line
  FROM (
    SELECT doc_id, string_split(text, '{s}') AS parts,
           unnest(range(1, len(string_split(text, '{s}')) + 1)) AS i
    FROM {table})
  WHERE parts[CAST(i AS INT)] <> ''
), marked AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (
           PARTITION BY line ORDER BY doc_id, line_no) AS r
  FROM ex
), alla AS (
  SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY doc_id
), keptagg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, '{s}' ORDER BY line_no) AS clean_text
  FROM marked WHERE r = 1 GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(n_lines, 0) - coalesce(n_kept, 0) AS BIGINT)
         AS n_dropped,
       coalesce(clean_text, '') AS clean_text
FROM {table} d
LEFT JOIN alla ON d.doc_id = alla.doc_id
LEFT JOIN keptagg ON d.doc_id = keptagg.doc_id
"""


def gopher_repetition_sql(
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    table: str = "documents",
) -> str:
    """Oracle for retrieval.gopher_repetition: same word n-grams (list
    slice + space join), same (tf DESC, gram ASC) top pick, same
    char-mass and position-fraction expressions, same rounding."""
    ns = sorted(set(top_ns) | set(dup_ns))
    n_values = ", ".join(f"({n})" for n in ns)
    top_cols = ",\n       ".join(
        f"round(coalesce(max(CASE WHEN a.n = {n} THEN a.top_mass END), 0)"
        f" * 1.0 / t.total_chars, 6) AS top{n}_frac"
        for n in top_ns
    )
    dup_cols = ",\n       ".join(
        f"round(coalesce(max(CASE WHEN a.n = {n} THEN a.dup_frac END),"
        f" 0.0), 6) AS dup{n}_frac"
        for n in dup_ns
    )
    return f"""
WITH t AS (
  SELECT doc_id, {tokens_expr()} AS toks,
         length(array_to_string({tokens_expr()}, '')) AS total_chars
  FROM {table}
), g AS (
  SELECT doc_id, u.n AS n,
         unnest(list_transform(range(1, len(toks) - u.n + 2),
                i -> array_to_string(toks[i : i + u.n - 1], ' '))) AS g
  FROM t, (VALUES {n_values}) u(n)
), pg AS (
  SELECT doc_id, n, g, count(*) AS tf FROM g GROUP BY doc_id, n, g
), ranked AS (
  SELECT doc_id, n, g, tf,
         row_number() OVER (PARTITION BY doc_id, n
                            ORDER BY tf DESC, g) AS r
  FROM pg
), a AS (
  SELECT pg.doc_id, pg.n,
         max(CASE WHEN ranked.r = 1
                  THEN ranked.tf * (length(ranked.g) - (pg.n - 1)) END)
           AS top_mass,
         sum(CASE WHEN pg.tf > 1 THEN pg.tf ELSE 0 END) * 1.0
           / sum(pg.tf) AS dup_frac
  FROM pg JOIN ranked
    ON pg.doc_id = ranked.doc_id AND pg.n = ranked.n AND pg.g = ranked.g
  GROUP BY pg.doc_id, pg.n
)
SELECT t.doc_id, len(t.toks) AS n_tokens, t.total_chars,
       {top_cols},
       {dup_cols}
FROM t LEFT JOIN a ON t.doc_id = a.doc_id
WHERE t.total_chars > 0
GROUP BY t.doc_id, len(t.toks), t.total_chars
"""


def bloom_prefilter_sql(*, m_bits: int, k: int, table: str = "documents") -> str:
    """Oracle for the bloom_build/bloom_probe pipeline over duplicate
    content hashes: same md5-salted bit positions, same 32-bit words, so
    filter bits AND false positives match the Spark side exactly."""

    def pos(expr: str, i: int) -> str:
        return (
            f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || ':{i}'), 1, 15)"
            f" AS BIGINT) % {m_bits}"
        )

    def pos_list(expr: str) -> str:
        return "[" + ", ".join(pos(expr, i) for i in range(k)) + "]"

    mask = "CAST(pow(2, pos % 32) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT doc_id, {hash60(normalized_expr())} AS h FROM {table}
), dup AS (
  SELECT h FROM d GROUP BY h HAVING count(*) > 1
), bpos AS (
  SELECT unnest({pos_list('h')}) AS pos FROM dup
), sparse AS (
  SELECT pos // 32 AS word_idx, bit_or({mask}) AS word
  FROM bpos GROUP BY 1
), probe AS (
  SELECT doc_id, unnest({pos_list('h')}) AS pos FROM d
)
SELECT p.doc_id,
       min(CASE WHEN (s.word & CAST(pow(2, p.pos % 32) AS BIGINT))
                     = CAST(pow(2, p.pos % 32) AS BIGINT)
                THEN 1 ELSE 0 END) = 1 AS bloom_hit
FROM probe p LEFT JOIN sparse s ON s.word_idx = p.pos // 32
GROUP BY p.doc_id
"""


def cms_terms_sql(
    *,
    width: int,
    depth: int,
    topk: int,
    min_len: int = 3,
    table: str = "documents",
) -> str:
    """Oracle for cms_build + cms_estimate over the exact top terms:
    identical md5-salted counter addressing, pure integer arithmetic."""

    def col_id(term: str, row: str) -> str:
        return (
            f"CAST('0x' || substr(md5({term} || '#' || CAST({row} AS VARCHAR)),"
            f" 1, 15) AS BIGINT) % {width}"
        )

    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_expr()}) AS term FROM {table}
), rows AS (SELECT unnest(range({depth})) AS row_id),
cms AS (
  SELECT row_id, col_id, count(*) AS cnt FROM (
    SELECT r.row_id, {col_id('tok.term', 'r.row_id')} AS col_id
    FROM tok, rows r
  ) GROUP BY row_id, col_id
), top AS (
  SELECT term, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
  FROM tok WHERE length(term) >= {min_len}
  GROUP BY term ORDER BY occurrences DESC, term LIMIT {topk}
), probe AS (
  SELECT top.term, top.occurrences, top.doc_freq,
         r.row_id, {col_id('top.term', 'r.row_id')} AS col_id
  FROM top, rows r
)
SELECT p.term, p.occurrences, p.doc_freq,
       min(coalesce(c.cnt, 0)) AS cms_est
FROM probe p LEFT JOIN cms c ON p.row_id = c.row_id AND p.col_id = c.col_id
GROUP BY p.term, p.occurrences, p.doc_freq
"""


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: decontamination, chunking, scrubbing, LM scoring


def contamination_sql(
    *, k: int, bench_mod: int, min_matches: int = 1, table: str = "documents"
) -> str:
    """Mirror of operators.decontam.benchmark_contamination with the
    benchmark carved out as ``doc_id % bench_mod == 0``."""
    sh = shingles_expr(k)
    return f"""
WITH s AS (SELECT doc_id, unnest({sh}) AS shingle FROM {table}),
bench AS (SELECT DISTINCT shingle FROM s WHERE doc_id % {bench_mod} = 0),
corp AS (SELECT * FROM s WHERE doc_id % {bench_mod} != 0),
agg AS (
  SELECT corp.doc_id,
         count(bench.shingle) AS matched_shingles,
         count(*) AS total_shingles
  FROM corp LEFT JOIN bench USING (shingle)
  GROUP BY corp.doc_id)
SELECT doc_id, matched_shingles, total_shingles,
       floor((CAST(matched_shingles AS DOUBLE) / CAST(total_shingles AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS contamination
FROM agg WHERE matched_shingles >= {min_matches}
"""


def chunk_sql(*, chunk_tokens: int, stride: int, table: str = "documents") -> str:
    """Mirror of operators.pipeline.chunk_documents (1-based list_slice
    == Spark's slice(arr, start, length) on the same offsets)."""
    toks = tokens_expr()
    lo = f"chunk_id * {stride} + 1"
    hi = f"chunk_id * {stride} + {chunk_tokens}"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
c AS (SELECT doc_id, toks,
             unnest(range(0, ((len(toks) - 1) // {stride}) + 1)) AS chunk_id
      FROM t2)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS start_token,
       CAST(len(list_slice(toks, {lo}, {hi})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, {lo}, {hi}), ' ') AS chunk_text
FROM c
"""


def scrub_sql(
    *,
    patterns: dict[str, str],
    replacement: str = "<scrubbed>",
    table: str = "documents",
) -> str:
    """Mirror of operators.pipeline.pattern_scrub. Patterns must stay in
    the Java-regex/RE2 common subset (the operator's documented
    contract); counts use the original text, redaction chains in dict
    order, and DuckDB needs the explicit 'g' flag to match Spark's
    replace-all regexp_replace."""
    hits = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS {name}_hits"
        for name, p in patterns.items()
    )
    scrub = "text"
    for p in patterns.values():
        scrub = f"regexp_replace({scrub}, '{p}', '{replacement}', 'g')"
    return f"""
SELECT doc_id,
       {hits},
       {scrub} AS scrubbed_text,
       CAST(length(text) - length({scrub}) AS BIGINT) AS chars_removed
FROM {table}
"""


def unigram_logprob_sql(*, table: str = "documents") -> str:
    """Mirror of operators.retrieval.unigram_logprob. Both engines fold
    the per-token ln(tf/total) sum in document token order (explode and
    unnest preserve it), so the quantized mean is engine-stable."""
    toks = tokens_expr()
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM {table}),
vocab AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM vocab)
SELECT doc_id, count(*) AS n_tokens,
       floor(avg(ln(tf / total)) * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
FROM tok JOIN vocab USING (term) CROSS JOIN tot
GROUP BY doc_id
"""


def vocab_coverage_sql(*, vocab_size: int, table: str = "documents") -> str:
    """Mirror of operators.pipeline.vocab_coverage (rank ties break on
    the term string on both engines, so the fitted vocab is identical)."""
    toks = tokens_expr()
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM {table}),
vocab AS (SELECT term FROM (
    SELECT term, count(*) AS tf FROM tok GROUP BY term
    ORDER BY tf DESC, term LIMIT {vocab_size})),
agg AS (
  SELECT tok.doc_id, count(*) AS n_tokens,
         count(*) FILTER (vocab.term IS NULL) AS oov_tokens
  FROM tok LEFT JOIN vocab USING (term) GROUP BY tok.doc_id)
SELECT doc_id, n_tokens, oov_tokens,
       floor((CAST(oov_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS oov_ratio
FROM agg
"""


def mixture_sample_sql(
    *,
    rates: dict[str, float],
    default_rate: float,
    salt: str = "mixture",
    table: str = "documents",
) -> str:
    """Mirror of operators.pipeline.mixture_sample — rate literals repr'd
    from the SAME Python floats so keep thresholds land identically."""
    salted_key = f"'{salt}' || CAST(doc_id AS VARCHAR)"
    u = f"({hash60(salted_key)} % 1000000) / 1000000.0"
    branches = " ".join(
        f"WHEN '{name}' THEN {rate!r}" for name, rate in rates.items()
    )
    case = f"CASE source {branches} ELSE {default_rate!r} END"
    return f"SELECT doc_id, lang, source FROM {table} WHERE {u} < {case}"


def global_order_sql(
    *, salt: str = "order", table: str = "documents"
) -> str:
    """Mirror of operators.pipeline.global_order_index — the oracle IS
    the single-task form the operator decomposes (shard prefix order +
    in-shard order == global hash order)."""
    h = hash60(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY {h}, doc_id) - 1 AS BIGINT)
         AS train_order
FROM {table}
"""


def incremental_dedup_sql(*, table: str = "documents") -> str:
    """Mirror of operators.dedup.incremental_dedup with the corpus split
    at the floored median doc_id (existing: doc_id < m; incoming: >= m)
    — floor matches the driver query's Python int() of Spark's
    interpolated percentile."""
    h = hash60(normalized_expr())
    return f"""
WITH m AS (SELECT CAST(floor(quantile_cont(doc_id, 0.5)) AS BIGINT) AS mid
           FROM {table}),
hashed AS (SELECT doc_id, {h} AS content_hash FROM {table}),
seen AS (SELECT DISTINCT content_hash FROM hashed, m WHERE doc_id < mid),
fresh AS (
  SELECT i.doc_id, i.content_hash
  FROM hashed i CROSS JOIN m LEFT JOIN seen s USING (content_hash)
  WHERE i.doc_id >= m.mid AND s.content_hash IS NULL)
SELECT min(doc_id) AS doc_id, content_hash
FROM fresh GROUP BY content_hash
"""


def hll_distinct_sql(*, p: int = 9, table: str = "documents") -> str:
    """Mirror of sketches.hll_registers + hll_estimate over the
    normalized document text: identical bucket/rank integer math, exact
    integer harmonic sum (2^(61-p-rank) lifted terms — lift exponent is
    rank width + 1, not a constant), same alpha literal
    and small-range correction."""
    from .operators.sketches import hll_alpha, hll_rank_width

    m = 1 << p
    width = hll_rank_width(p)
    lift = width + 1
    am2 = repr(hll_alpha(m) * m * m)
    scale = float(1 << lift)
    h = hash60(normalized_expr())
    return f"""
WITH h AS (SELECT {h} AS h FROM {table}
           WHERE {normalized_expr()} IS NOT NULL),
r AS (
  SELECT h % {m} AS bucket,
         max(CASE WHEN (h >> {p}) > 0
                  THEN {width} - length(bin(h >> {p})) + 1
                  ELSE {width + 1} END) AS max_rank
  FROM h GROUP BY bucket
),
a AS (
  SELECT count(*) AS n_buckets_used,
         CAST(sum(1::BIGINT << ({lift} - max_rank)) AS BIGINT) AS s_used
  FROM r
),
e AS (
  SELECT n_buckets_used,
         CAST({m} - n_buckets_used AS DOUBLE) AS zeros,
         CAST({am2} AS DOUBLE) * CAST({scale!r} AS DOUBLE) /
           CAST(s_used + ({m} - n_buckets_used) * (1::BIGINT << {lift}) AS DOUBLE)
           AS raw
  FROM a
)
SELECT n_buckets_used,
       floor((CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                   THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / zeros)
                   ELSE raw END) * 1e4 + 0.5) / 1e4 AS hll_est
FROM e
"""


def bigram_logprob_sql(*, table: str = "documents") -> str:
    """Mirror of operators.retrieval.bigram_logprob (add-one-smoothed
    bigram LM; context counts from the pair table, V = distinct vocab)."""
    toks = tokens_expr()
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
pr AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS pair
  FROM t WHERE len(toks) >= 2),
pc AS (SELECT pair, count(*) AS n_pair FROM pr GROUP BY pair),
ctx AS (SELECT split_part(pair, ' ', 1) AS w1, sum(n_pair) AS n_ctx
        FROM pc GROUP BY 1),
vv AS (SELECT count(DISTINCT term) AS v
       FROM (SELECT unnest(toks) AS term FROM t)),
scored AS (
  SELECT p.doc_id, count(*) AS n_pairs,
         avg(ln((c.n_pair + CAST(1.0 AS DOUBLE)) / (x.n_ctx + vv.v))) AS alp
  FROM pr p
  JOIN pc c ON p.pair = c.pair
  JOIN ctx x ON split_part(p.pair, ' ', 1) = x.w1
  CROSS JOIN vv
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(s.n_pairs, 0) AS n_pairs,
       floor(s.alp * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
FROM {table} d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


def pmi_bigrams_sql(
    *, topk: int, min_count: int = 2, table: str = "documents"
) -> str:
    """Mirror of operators.retrieval.pmi_bigrams (same closed-form float
    over exact integer counts — bit-identical by construction)."""
    toks = tokens_expr()
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
pairs AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS pair
  FROM t WHERE len(toks) >= 2),
pc AS (SELECT pair, count(*) AS n_pair FROM pairs GROUP BY pair),
uni AS (SELECT unnest(toks) AS term FROM t),
uc AS (SELECT term, count(*) AS n_term FROM uni GROUP BY term),
tb AS (SELECT sum(n_pair) AS b FROM pc),
tt AS (SELECT sum(n_term) AS tcnt FROM uc)
SELECT split_part(pair, ' ', 1) AS w1, split_part(pair, ' ', 2) AS w2,
       n_pair,
       floor(ln((n_pair / b) / ((u1.n_term / tcnt) * (u2.n_term / tcnt)))
             * 1000000.0 + 0.5) / 1000000.0 AS pmi
FROM pc CROSS JOIN tb CROSS JOIN tt
JOIN uc u1 ON u1.term = split_part(pair, ' ', 1)
JOIN uc u2 ON u2.term = split_part(pair, ' ', 2)
WHERE n_pair >= {min_count}
ORDER BY pmi DESC, w1, w2
LIMIT {topk}
"""


def dsir_logweights_sql(
    *,
    n_buckets: int = 1024,
    target_col: str = "lang",
    target_value: str = "en",
    table: str = "documents",
) -> str:
    """Twin of operators.pipeline.dsir_logweights: hashed-unigram
    bucket features, add-one-smoothed target/raw bucket models,
    per-doc sum of ln(p_target/p_raw) quantized to 1e-6. The division
    tree mirrors the Spark expression exactly so the per-token log
    ratios are bit-identical; only the per-doc sum order differs,
    which the quantization absorbs."""
    toks = tokens_expr()
    b = float(n_buckets)
    return f"""
WITH tok AS (
  SELECT doc_id, {target_col} = '{target_value}' AS is_tgt,
         unnest({toks}) AS term
  FROM {table}
), tb AS (
  SELECT doc_id, is_tgt, {hash60('term')} % {n_buckets} AS bucket FROM tok
), counts AS (
  SELECT bucket, count(*) AS cr, count(*) FILTER (is_tgt) AS ct
  FROM tb GROUP BY bucket
), tot AS (
  SELECT CAST(sum(cr) AS DOUBLE) AS nr, CAST(sum(ct) AS DOUBLE) AS nt
  FROM counts
), tbl AS (
  SELECT bucket,
         ln(((ct + 1.0) / (nt + {b!r})) / ((cr + 1.0) / (nr + {b!r}))) AS lr
  FROM counts CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_tokens,
       floor(sum(lr) * 1000000.0 + 0.5) / 1000000.0 AS dsir_logweight
FROM tb JOIN tbl USING (bucket)
GROUP BY doc_id
"""


def source_cap_sql(*, per_source: int = 10, table: str = "documents") -> str:
    """Twin of operators.pipeline.source_cap (the oracle ranks within
    source directly — the operator's salted two-stage plan is a
    lossless shuffle-geometry rewrite with identical output)."""
    toks = "toks"
    score = (
        "CASE WHEN len(toks) > 0 THEN "
        "least(CASE WHEN len(toks) > 0 THEN "
        f"len(list_filter(toks, t -> list_contains({_str_list(EN_STOPWORDS)}, t)))"
        " * 1.0 / len(toks) ELSE 0.0 END * 4, 1.0) * 0.4 "
        "+ (CASE WHEN (CASE WHEN len(toks) > 0 THEN "
        "len(array_to_string(toks, '')) * 1.0 / len(toks) ELSE 0.0 END) >= 3 "
        "AND (CASE WHEN len(toks) > 0 THEN "
        "len(array_to_string(toks, '')) * 1.0 / len(toks) ELSE 0.0 END) <= 10 "
        "THEN 0.4 ELSE 0.0 END) "
        "+ (CASE WHEN (CASE WHEN len(text) > 0 THEN "
        "len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text) "
        "ELSE 0.0 END) < 0.3 THEN 0.2 ELSE 0.0 END) "
        "ELSE 0.0 END"
    )
    return f"""
WITH base AS (
  SELECT doc_id, source, text, {tokens_expr()} AS {toks} FROM {table}
), s AS (
  SELECT doc_id, source, round({score}, 4) AS quality_score FROM base
), r AS (
  SELECT doc_id, source, quality_score,
         row_number() OVER (
           PARTITION BY source ORDER BY quality_score DESC, doc_id
         ) AS src_rank
  FROM s
)
SELECT doc_id, source, src_rank, quality_score
FROM r WHERE src_rank <= {per_source}
"""


def novelty_scores_sql(*, k: int = 3, table: str = "documents") -> str:
    """Twin of operators.decontam.novelty_scores: shingle
    first-occurrence table, per-doc novel/total counts, quantized
    double-cast ratio."""
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_expr(k)}) AS shingle FROM {table}
), first AS (
  SELECT shingle, min(doc_id) AS fd FROM sh GROUP BY shingle
), agg AS (
  SELECT doc_id, count(*) AS total_shingles,
         count(*) FILTER (fd = doc_id) AS novel_shingles
  FROM sh JOIN first USING (shingle)
  GROUP BY doc_id
)
SELECT doc_id, total_shingles, novel_shingles,
       floor((CAST(novel_shingles AS DOUBLE) / CAST(total_shingles AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS novelty_ratio
FROM agg
"""


def corpus_filter3_sql(
    *,
    min_novelty: float,
    per_source: int = 10,
    novelty_k: int = 3,
    n_buckets: int = 1024,
    target_col: str = "lang",
    target_value: str = "en",
    table: str = "documents",
) -> str:
    """Twin of the q_docs_corpus_filter3 composition: source-cap
    membership, novelty floor, and top-half per-token DSIR rank."""
    cap = source_cap_sql(per_source=per_source, table=table)
    nov = novelty_scores_sql(k=novelty_k, table=table)
    ds = dsir_logweights_sql(
        n_buckets=n_buckets, target_col=target_col,
        target_value=target_value, table=table,
    )
    return f"""
WITH cap AS ({cap}),
nov AS ({nov}),
ds AS ({ds}),
pt AS (
  SELECT doc_id,
         floor(dsir_logweight / n_tokens * 1000000.0 + 0.5) / 1000000.0
           AS dsir_pt
  FROM ds
), rk AS (
  SELECT doc_id, dsir_pt,
         row_number() OVER (ORDER BY dsir_pt DESC, doc_id) AS dsir_rank,
         count(*) OVER () AS total
  FROM pt
)
SELECT cap.doc_id, cap.source, cap.src_rank, nov.novelty_ratio,
       rk.dsir_pt, rk.dsir_rank
FROM cap JOIN nov USING (doc_id) JOIN rk USING (doc_id)
WHERE nov.novelty_ratio >= {min_novelty!r}
  AND rk.dsir_rank <= floor(total / 2)
"""


def char_entropy_sql(*, table: str = "documents") -> str:
    """Twin of operators.retrieval.char_entropy: exact character
    histogram via 1-based string indexing, per-doc Shannon entropy in
    nats, quantized 1e-6."""
    return f"""
WITH ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(text) + 1), i -> text[i]))
           AS ch
  FROM {table}
), counts AS (
  SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
), tot AS (
  -- CAST: DuckDB's sum(BIGINT) is HUGEINT, which lands in pandas as
  -- float (54.0) and dtype-mismatches Spark's int64 under a strict
  -- comparator
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         count(*) AS distinct_chars
  FROM counts GROUP BY doc_id
)
SELECT doc_id, first(n_chars) AS n_chars,
       first(distinct_chars) AS distinct_chars,
       floor(sum(-(CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))
                 * ln(CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS char_entropy
FROM counts JOIN tot USING (doc_id)
GROUP BY doc_id
"""


def token_fertility_sql(*, table: str = "documents") -> str:
    """Twin of q_docs_token_fertility: per-lang chars-per-BPE-token and
    BPE-tokens-per-whitespace-word, sums quantized after the divide."""
    return f"""
WITH m AS (
  SELECT lang,
         CAST(len(text) AS DOUBLE) AS chars,
         CAST(len(regexp_extract_all(lower(text), '{BPE_REGEX}'))
              AS DOUBLE) AS bpe,
         CAST(len({tokens_expr()}) AS DOUBLE) AS words
  FROM {table}
)
SELECT lang, count(*) AS n_docs,
       floor(sum(chars) / sum(bpe) * 1000000.0 + 0.5) / 1000000.0
         AS chars_per_token,
       floor(sum(bpe) / sum(words) * 1000000.0 + 0.5) / 1000000.0
         AS tokens_per_word
FROM m WHERE bpe > 0
GROUP BY lang
"""


def zipf_fit_sql(
    *,
    top_v: int = 100,
    group_col: str = "lang",
    table: str = "documents",
) -> str:
    """Twin of operators.retrieval.zipf_fit: same token expression,
    (freq DESC, term) rank tiebreak, closed-form OLS on ln/ln with the
    UNQUANTIZED slope feeding the intercept (mirroring the Spark
    expression tree), both outputs floor-quantized."""
    return f"""
WITH tk AS (
  SELECT {group_col} AS grp, unnest({tokens_expr()}) AS term FROM {table}
), fr AS (
  SELECT grp, term, count(*) AS freq FROM tk GROUP BY grp, term
), rk AS (
  SELECT grp, freq,
         row_number() OVER (PARTITION BY grp ORDER BY freq DESC, term)
           AS rank
  FROM fr
), pt AS (
  SELECT grp, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
  FROM rk WHERE rank <= {top_v}
), ag AS (
  SELECT grp, count(*) AS n_terms,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM pt GROUP BY grp
), fit AS (
  SELECT grp, n_terms, CAST(n_terms AS DOUBLE) AS n, sx, sy, sxx, sxy,
         CASE WHEN n_terms >= 3
                   AND (CAST(n_terms AS DOUBLE) * sxx - sx * sx) <> 0
              THEN (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)
         END AS slope_raw
  FROM ag
)
SELECT grp AS {group_col}, n_terms,
       floor(slope_raw * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
       floor((sy - slope_raw * sx) / n * 1000000.0 + 0.5) / 1000000.0
         AS zipf_intercept
FROM fit
"""


def hll_grouped_sql(
    *, group: str, col: str, p: int = 9, table: str = "events"
) -> str:
    """Twin of sketches.hll_grouped: the hll_distinct_sql register /
    estimate math keyed by a group column, joined to the exact
    count-distinct, with the relative error computed from the
    QUANTIZED estimate exactly as the Spark side does."""
    from .operators.sketches import hll_alpha, hll_rank_width

    m = 1 << p
    width = hll_rank_width(p)
    lift = width + 1
    am2 = repr(hll_alpha(m) * m * m)
    scale = float(1 << lift)
    h = hash60(f"CAST({col} AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT {group} AS grp, {h} AS h FROM {table} WHERE {col} IS NOT NULL
), r AS (
  SELECT grp, h % {m} AS bucket,
         max(CASE WHEN (h >> {p}) > 0
                  THEN {width} - length(bin(h >> {p})) + 1
                  ELSE {width + 1} END) AS max_rank
  FROM h GROUP BY grp, bucket
), a AS (
  SELECT grp, count(*) AS n_buckets_used,
         CAST(sum(1::BIGINT << ({lift} - max_rank)) AS BIGINT) AS s_used
  FROM r GROUP BY grp
), e AS (
  SELECT grp, n_buckets_used,
         CAST({m} - n_buckets_used AS DOUBLE) AS zeros,
         CAST({am2} AS DOUBLE) * CAST({scale!r} AS DOUBLE) /
           CAST(s_used + ({m} - n_buckets_used) * (1::BIGINT << {lift})
                AS DOUBLE) AS raw
  FROM a
), q AS (
  SELECT grp, n_buckets_used,
         floor((CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                     THEN CAST({m} AS DOUBLE)
                          * ln(CAST({m} AS DOUBLE) / zeros)
                     ELSE raw END) * 1e4 + 0.5) / 1e4 AS hll_est
  FROM e
), x AS (
  SELECT {group} AS grp, count(DISTINCT {col}) AS exact_distinct
  FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
)
SELECT x.grp AS {group}, exact_distinct, n_buckets_used, hll_est,
       floor(abs(hll_est - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE) * 1e4 + 0.5) / 1e4
         AS rel_err
FROM x JOIN q USING (grp)
"""


def hybrid_rrf_topk_sql(
    *,
    terms: list[str],
    query_vec_id: int,
    n_leg: int,
    k: int,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    dim: int = 64,
    table: str = "documents",
    vec_table: str = "embeddings",
) -> str:
    """Oracle for retrieval.hybrid_rrf_topk: BM25 leg with the exact
    bm25_topk_sql expression shape, cosine leg with oracle_vec's fold,
    ranks over the 6-decimal rounded leg scores, reciprocal-rank fusion
    over integer ranks."""
    from .oracle_vec import cosine_expr

    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln(1.0 + (n - CAST(df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * CAST(tf{i} AS DOUBLE) * {k1 + 1.0}"
        f" / (CAST(tf{i} AS DOUBLE) + {k1} * ({1.0 - b} + {b} * dl / avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH base AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {tokens_expr()} AS toks FROM {table}
        WHERE doc_id != {query_vec_id})
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl,
         {df_cols}
  FROM base
), lex AS (
  SELECT doc_id, r_lex FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round({parts}, 6) DESC, doc_id)
             AS r_lex
    FROM base, stats)
  WHERE r_lex <= {n_leg}
), qv AS (
  SELECT embedding AS q FROM {vec_table} WHERE vec_id = {query_vec_id}
), sem AS (
  SELECT doc_id, r_sem FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (
             ORDER BY round({cosine_expr('embedding', 'q', dim)}, 6)
               DESC, vec_id) AS r_sem
    FROM {vec_table}, qv
    WHERE vec_id != {query_vec_id})
  WHERE r_sem <= {n_leg}
)
SELECT doc_id,
       coalesce(r_lex, 0) AS r_lex,
       coalesce(r_sem, 0) AS r_sem,
       round(coalesce(1.0 / ({rrf_k} + r_lex), 0.0)
             + coalesce(1.0 / ({rrf_k} + r_sem), 0.0), 6) AS rrf_score
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf_score DESC, doc_id
LIMIT {k}
"""


def hot_ngram_coverage_sql(
    *, k: int, min_df: int, table: str = "documents"
) -> str:
    """Oracle for dedup.hot_ngram_coverage — same distinct-per-doc
    shingle spine, df >= min_df hot set, per-doc membership fraction."""
    return f"""
WITH sh AS ({shingle_cte(k, table=table)}
), hot AS (
  SELECT shingle FROM (
    SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
  WHERE df >= {min_df}
), tot AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), hcnt AS (
  SELECT s.doc_id, count(*) AS h FROM sh s JOIN hot USING (shingle)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       coalesce(n, 0) AS n_grams,
       coalesce(h, 0) AS n_hot,
       CASE WHEN coalesce(n, 0) > 0
            THEN round(CAST(coalesce(h, 0) AS DOUBLE)
                       / CAST(n AS DOUBLE), 6)
            ELSE 0.0 END AS hot_cov
FROM {table} d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN hcnt ON d.doc_id = hcnt.doc_id
"""


def quality_score_cte(*, table: str = "documents") -> str:
    """``(doc_id, q_score)`` subquery: the quality_metrics composite
    rounded to 4 decimals — the same score/rounding text_quality_sql
    emits, reduced to the canonical-pick key that quality-weighted
    dedup keep ranks on."""
    score = (
        "CASE WHEN n_tokens > 0 THEN "
        "least(stopword_ratio_raw * 4, 1.0) * 0.4 "
        "+ (CASE WHEN avg_len_raw >= 3 AND avg_len_raw <= 10 THEN 0.4 ELSE 0.0 END) "
        "+ (CASE WHEN digit_ratio_raw < 0.3 THEN 0.2 ELSE 0.0 END) "
        "ELSE 0.0 END"
    )
    return f"""
  SELECT doc_id, round({score}, 4) AS q_score FROM (
    SELECT doc_id,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN len(array_to_string(toks, '')) * 1.0 / len(toks)
                ELSE 0.0 END AS avg_len_raw,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, t -> list_contains({_str_list(EN_STOPWORDS)}, t))) * 1.0 / len(toks)
                ELSE 0.0 END AS stopword_ratio_raw,
           CASE WHEN len(text) > 0
                THEN len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text)
                ELSE 0.0 END AS digit_ratio_raw
    FROM (SELECT doc_id, text, {tokens_expr()} AS toks FROM {table}))
"""


def _bpe_chain_ctes(*, n_merges: int, table: str) -> list[str]:
    """The shared v0/p{k}/m{k}/v{k} merge-learning CTE chain (all
    MATERIALIZED — DuckDB's default CTE inlining makes the unrolled
    chain exponential). ``v{n_merges}`` is omitted: learners stop at
    the last decision; appliers rebuild the rewrite on their own
    relation from the m{k} scalars."""
    ctes = [
        f"""v0 AS MATERIALIZED (
  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS repr, cnt FROM (
    SELECT w, count(*) AS cnt FROM (
      SELECT unnest({tokens_expr()}) AS w FROM {table}) GROUP BY w)
)"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"v{k - 1}"
        ctes.append(
            f"""p{k} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT syms, cnt, unnest(range(1, len(syms))) AS i FROM (
      SELECT string_split(trim(repr), '  ') AS syms, cnt FROM {prev}))
  GROUP BY 1, 2
), m{k} AS MATERIALIZED (
  SELECT l, r, c FROM p{k}
  WHERE c = (SELECT max(c) FROM p{k})
  ORDER BY l, r LIMIT 1
)"""
        )
        if k < n_merges:
            ctes.append(
                f"""v{k} AS MATERIALIZED (
  SELECT replace(repr,
           ' ' || (SELECT l FROM m{k}) || '  '
               || (SELECT r FROM m{k}) || ' ',
           ' ' || (SELECT l FROM m{k})
               || (SELECT r FROM m{k}) || ' ') AS repr,
         cnt
  FROM {prev}
)"""
            )
    return ctes


def bpe_merges_sql(*, n_merges: int, table: str = "documents") -> str:
    """Oracle for pipeline.bpe_merges: the identical word-frequency
    table, spaced-symbol string encoding, max-count/lexicographic-min
    pair selection, and literal-``replace`` greedy merge application,
    unrolled as one CTE chain per merge."""
    ctes = _bpe_chain_ctes(n_merges=n_merges, table=table)
    finals = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, c AS pair_count"
        f" FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


def bpe_apply_stats_sql(*, n_merges: int, table: str = "documents") -> str:
    """Oracle for pipeline.bpe_apply_stats: learn the merge chain with
    the shared CTEs, then re-apply it to every corpus token as nested
    literal replaces (scalar subqueries on the m{k} decisions) and
    aggregate per document. Docs with zero tokens report (0, 0, 0,
    0.0) via the left join."""
    ctes = _bpe_chain_ctes(n_merges=n_merges, table=table)
    expr = "regexp_replace(w, '(.)', ' \\1 ', 'g')"
    for k in range(1, n_merges + 1):
        expr = (
            f"replace({expr},\n"
            f"  ' ' || (SELECT l FROM m{k}) || '  '"
            f" || (SELECT r FROM m{k}) || ' ',\n"
            f"  ' ' || (SELECT l FROM m{k})"
            f" || (SELECT r FROM m{k}) || ' ')"
        )
    ctes.append(
        f"""ap AS (
  SELECT doc_id, len(w) AS base,
         len(string_split(trim({expr}), '  ')) AS sym
  FROM (SELECT doc_id, unnest({tokens_expr()}) AS w FROM {table})
), agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(base) AS BIGINT) AS n_base_symbols,
         CAST(sum(sym) AS BIGINT) AS n_symbols
  FROM ap GROUP BY doc_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT d.doc_id,
       coalesce(n_tokens, 0) AS n_tokens,
       coalesce(n_base_symbols, 0) AS n_base_symbols,
       coalesce(n_symbols, 0) AS n_symbols,
       CASE WHEN coalesce(n_symbols, 0) > 0
            THEN round(CAST(n_base_symbols AS DOUBLE)
                       / CAST(n_symbols AS DOUBLE), 6)
            ELSE 0.0 END AS compression
FROM {table} d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""
    )


def span_dedup_sql(*, span_tokens: int, table: str = "documents") -> str:
    """Oracle for dedup.span_dedup — identical span cutting,
    first-occurrence window, and position-ordered rebuild."""
    s = span_tokens
    return f"""
WITH ex AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(
           list_slice(toks, (i - 1) * {s} + 1, (i - 1) * {s} + {s}), ' ')
           AS span
  FROM (
    SELECT doc_id, toks,
           unnest(range(1,
             CAST(ceil(len(toks) * 1.0 / {s}) AS BIGINT) + 1)) AS i
    FROM (SELECT doc_id, {tokens_expr()} AS toks FROM {table}))
), marked AS (
  SELECT doc_id, pos, span,
         row_number() OVER (
           PARTITION BY span ORDER BY doc_id, pos) AS r
  FROM ex
), alla AS (
  SELECT doc_id, count(*) AS n_spans FROM ex GROUP BY doc_id
), keptagg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY pos) AS clean_text
  FROM marked WHERE r = 1 GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n_spans, 0) AS n_spans,
       coalesce(n_spans, 0) - coalesce(n_kept, 0) AS n_dropped,
       coalesce(clean_text, '') AS clean_text
FROM {table} d
LEFT JOIN alla ON d.doc_id = alla.doc_id
LEFT JOIN keptagg ON d.doc_id = keptagg.doc_id
"""


def suffix_array_sql(
    *, table: str = "documents", max_tokens: int | None = None
) -> str:
    """Oracle for operators.suffix.suffix_ranks: materialize every
    suffix as its space-joined token string and dense_rank the strings.
    Word-lex == byte-lex because the separator (0x20) sorts below every
    token character ([a-z0-9]) — the same argument the Spark side's
    vocab ordering rests on. Identical whole-tail suffixes (planted
    mirrors) tie under dense_rank exactly as the prefix-doubling ranks
    tie at the doubling cap."""
    toks = tokens_expr()
    if max_tokens is not None:
        toks = f"list_slice({toks}, 1, {max_tokens})"
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM {table}
), p AS (
  SELECT doc_id, CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
         toks
  FROM t
), s AS (
  SELECT doc_id, pos, array_to_string(toks[pos:], ' ') AS suf FROM p
)
SELECT doc_id, pos,
       CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT) AS sa_rank
FROM s
"""


def longest_dup_span_sql(
    *, table: str = "documents", max_tokens: int | None = None
) -> str:
    """Oracle for operators.suffix.longest_dup_span — deliberately NOT
    a suffix array: enumerate EVERY (pos, length) token window, group
    by text, keep the longest ones seen at least twice. An independent
    O(sum len^2) formulation only an oracle can afford, so the SA+LCP
    machinery is checked against a different algorithm entirely."""
    toks = tokens_expr()
    if max_tokens is not None:
        toks = f"list_slice({toks}, 1, {max_tokens})"
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM {table}
), p1 AS (
  SELECT doc_id, toks,
         CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos
  FROM t
), w AS (
  SELECT array_to_string(
           toks[pos : pos + CAST(L AS INT) - 1], ' ') AS span_text,
         CAST(L AS INT) AS len_words
  FROM (
    SELECT doc_id, toks, pos,
           unnest(range(1, len(toks) - pos + 2)) AS L
    FROM p1)
), g AS (
  SELECT span_text, len_words, CAST(count(*) AS BIGINT) AS occurrences
  FROM w GROUP BY 1, 2 HAVING count(*) >= 2
), m AS (
  SELECT max(len_words) AS ml FROM g
)
SELECT span_text, len_words, occurrences FROM g, m WHERE len_words = m.ml
"""


def bm25_at_rest_sql(
    *,
    terms: list[str],
    topk: int,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """Oracle for sources.read_postings_topk over
    sources.write_postings_index: the postings formulation of BM25 —
    per-(doc, matched-term) rows, df from the matched postings, exact
    BIGINT (n, sum_dl) stats with avgdl as ONE division, per-doc parts
    folded in SORTED TERM ORDER (list_reduce over list(part ORDER BY
    term) mirrors the probe's array_sort + left fold), identical
    literal/association order throughout so doubles agree to the ulp.
    Only documents matching ≥ 1 query term can appear (the inverted-
    index contract)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tok AS (
  SELECT doc_id, toks, len(toks) AS dl
  FROM (SELECT doc_id, {tokens_expr()} AS toks FROM {table})
), post AS (
  SELECT doc_id, t.term AS term,
         CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
  FROM tok, unnest(toks) AS t(term)
  WHERE t.term IN ({tl})
  GROUP BY doc_id, t.term
), dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY term
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM tok
), parts AS (
  SELECT p.doc_id, p.term,
         (ln(1.0 + (CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
          * CAST(p.tf AS DOUBLE) * {k1 + 1.0}
          / (CAST(p.tf AS DOUBLE)
             + {k1} * ({1.0 - b} + {b} * CAST(p.dl AS DOUBLE)
                       / (CAST(s.sum_dl AS DOUBLE)
                          / CAST(s.n AS DOUBLE))))) AS part
  FROM post p JOIN dfreq d USING (term), stats s
)
SELECT doc_id,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(part ORDER BY term)), (x, y) -> x + y), 6) AS score
FROM parts GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {topk}
"""


def phrase_at_rest_sql(*, table: str = "documents") -> str:
    """Oracle for sources.read_phrase_match with the registered probe
    derivation (phrase = the lowest-id document's first two tokens):
    positional-postings adjacency as list_intersect of P1 with
    (P2 − 1), occurrence count per matching document."""
    return f"""
WITH tok AS (
  SELECT doc_id, {tokens_expr()} AS toks FROM {table}
), ph AS (
  SELECT toks[1] AS t1, toks[2] AS t2 FROM tok
  WHERE doc_id = (SELECT min(doc_id) FROM tok)
), tp AS (
  SELECT doc_id, term, CAST(i AS INT) AS pos FROM (
    SELECT doc_id, unnest(toks) AS term,
           unnest(range(1, len(toks) + 1)) AS i
    FROM tok)
), p1 AS (
  SELECT doc_id, list_sort(list(pos)) AS ps
  FROM tp, ph WHERE term = ph.t1 GROUP BY doc_id
), p2 AS (
  SELECT doc_id, list_sort(list(pos - 1)) AS ps
  FROM tp, ph WHERE term = ph.t2 GROUP BY doc_id
)
SELECT p1.doc_id,
       CAST(len(list_intersect(p1.ps, p2.ps)) AS BIGINT) AS n_occurrences
FROM p1 JOIN p2 USING (doc_id)
WHERE len(list_intersect(p1.ps, p2.ps)) > 0
"""
