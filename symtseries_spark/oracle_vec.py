"""DuckDB oracle SQL for the embedding similarity-search operators.

Mirrors :mod:`symtseries_spark.operators.simsearch` with explicit
``list_reduce`` arithmetic (same left-to-right accumulation order as
Spark's ``aggregate``) so rounded cosines agree bit-for-bit.
"""

from __future__ import annotations

from .operators.simsearch import hyperplanes


def _dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def cosine_expr(a: str, b: str, dim: int) -> str:
    return (
        f"({_dot(a, b, dim)} / "
        f"(sqrt({_dot(a, a, dim)}) * sqrt({_dot(b, b, dim)})))"
    )


def _plane_lit(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def bucket_expr(vec: str, planes: list[list[float]], dim: int) -> str:
    terms = [
        f"(CASE WHEN {_dot(vec, _plane_lit(p), dim)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def cosine_topk_sql(
    *, query_id: int, k: int, dim: int, table: str = "embeddings"
) -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM {table} WHERE vec_id = {query_id})
SELECT vec_id, round({cosine_expr('embedding', 'qv', dim)}, 6) AS cos
FROM {table}, q
WHERE vec_id != {query_id}
ORDER BY cos DESC, vec_id
LIMIT {k}
"""


def knn_join_sql(
    *, max_query_id: int, k: int, dim: int, table: str = "embeddings"
) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM {table}
  WHERE vec_id < {max_query_id}
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({cosine_expr('v.embedding', 'q.qv', dim)}, 6) AS cos
  FROM {table} v, q
  WHERE v.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def ann_lsh_topk_sql(
    *,
    query_id: int,
    k: int,
    num_planes: int,
    seed: int,
    dim: int,
    probe_hamming: int = 0,
    table: str = "embeddings",
) -> str:
    planes = hyperplanes(num_planes, dim, seed)
    bucket = bucket_expr("embedding", planes, dim)
    probe = (
        "bucket = qbucket"
        if probe_hamming == 0
        else f"bit_count(xor(CAST(bucket AS BIGINT), CAST(qbucket AS BIGINT))) <= {probe_hamming}"
    )
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM {table}
), q AS (
  SELECT embedding AS qv, bucket AS qbucket FROM bucketed
  WHERE vec_id = {query_id}
)
SELECT vec_id, round({cosine_expr('embedding', 'qv', dim)}, 6) AS cos
FROM bucketed, q
WHERE {probe} AND vec_id != {query_id}
ORDER BY cos DESC, vec_id
LIMIT {k}
"""


def embedding_near_dup_lsh_sql(
    *,
    threshold: float,
    num_planes: int,
    seed: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    planes = hyperplanes(num_planes, dim, seed)
    bucket = bucket_expr("embedding", planes, dim)
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM {table}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cosine_expr('a.embedding', 'b.embedding', dim)}, 6) AS cos
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({cosine_expr('a.embedding', 'b.embedding', dim)}, 6) >= {threshold}
"""


def embedding_near_dup_sql(
    *, threshold: float, dim: int, table: str = "embeddings"
) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cosine_expr('a.embedding', 'b.embedding', dim)}, 6) AS cos
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE round({cosine_expr('a.embedding', 'b.embedding', dim)}, 6) >= {threshold}
"""


def near_dup_recall_sql(
    *,
    threshold: float,
    num_planes: int,
    seed: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of the emb_near_dup_recall audit: brute-force exact pairs
    (truth) FULL OUTER JOINed with the LSH pairs, aggregated to one
    (n_exact, n_lsh, n_hit, recall) row. Composes the two pair
    builders as CTEs."""
    ex = embedding_near_dup_sql(threshold=threshold, dim=dim, table=table)
    ls = embedding_near_dup_lsh_sql(
        threshold=threshold, num_planes=num_planes, seed=seed, dim=dim,
        table=table,
    )
    return f"""
WITH ex AS ({ex}), ls AS ({ls}),
j AS (
  SELECT ex.vec_a IS NOT NULL AS in_ex, ls.vec_a IS NOT NULL AS in_ls
  FROM ex FULL OUTER JOIN ls
    ON ex.vec_a = ls.vec_a AND ex.vec_b = ls.vec_b
)
SELECT CAST(coalesce(sum(CASE WHEN in_ex THEN 1 END), 0) AS BIGINT)
         AS n_exact,
       CAST(coalesce(sum(CASE WHEN in_ls THEN 1 END), 0) AS BIGINT)
         AS n_lsh,
       CAST(coalesce(sum(CASE WHEN in_ex AND in_ls THEN 1 END), 0)
         AS BIGINT) AS n_hit,
       CASE WHEN coalesce(sum(CASE WHEN in_ex THEN 1 END), 0) > 0
            THEN round(
              CAST(coalesce(sum(CASE WHEN in_ex AND in_ls THEN 1 END), 0)
                   AS DOUBLE)
              / coalesce(sum(CASE WHEN in_ex THEN 1 END), 0), 6)
            ELSE 1.0 END AS recall
FROM j
"""


def mmr_rerank_sql(
    *,
    query_id: int,
    n_candidates: int,
    k: int,
    dim: int,
    lam: float = 0.5,
    table: str = "embeddings",
) -> str:
    """Mirror of operators.simsearch.mmr_rerank: same rounded rel/sim
    inputs, same greedy (score desc, vec_id tie-break), same floor
    quantization of the output score — as a recursive CTE."""
    lm = f"CAST({lam} AS DOUBLE)"
    nl = f"CAST({1.0 - lam} AS DOUBLE)"
    return f"""
WITH RECURSIVE
q AS (SELECT embedding AS qv FROM {table} WHERE vec_id = {query_id}),
cand AS (
  SELECT vec_id, round({cosine_expr('embedding', 'qv', dim)}, 6) AS rel,
         embedding AS v
  FROM {table}, q WHERE vec_id != {query_id}
  ORDER BY rel DESC, vec_id LIMIT {n_candidates}
),
sim AS (
  SELECT a.vec_id AS sa, b.vec_id AS sb,
         round({cosine_expr('a.v', 'b.v', dim)}, 6) AS s
  FROM cand a JOIN cand b ON a.vec_id != b.vec_id
),
sel AS (
  SELECT 1 AS it,
         [(SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 1)] AS ids,
         [(SELECT {lm} * rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1)]
           AS scores
  UNION ALL
  SELECT it + 1, list_append(ids, pick.vec_id),
         list_append(scores, pick.score)
  FROM sel, LATERAL (
    SELECT c.vec_id,
           {lm} * c.rel - {nl} * (SELECT max(s.s) FROM sim s
                                  WHERE s.sa = c.vec_id
                                    AND list_contains(ids, s.sb)) AS score
    FROM cand c WHERE NOT list_contains(ids, c.vec_id)
    ORDER BY score DESC, c.vec_id LIMIT 1
  ) pick
  WHERE it < {k}
)
SELECT CAST(r AS INTEGER) AS rank, sc.ids[r] AS vec_id,
       floor(sc.scores[r] * 1000000.0 + 0.5) / 1000000.0 AS mmr_score
FROM (SELECT ids, scores FROM sel ORDER BY it DESC LIMIT 1) sc,
     LATERAL (SELECT unnest(range(1, len(sc.ids) + 1)) AS r) t
ORDER BY rank
"""


def int8_quant_sql(
    *, dim: int, round_to: int = 8, table: str = "embeddings"
) -> str:
    """Mirror of operators.pq.int8_quantize_stats: same floor(x + 0.5)
    quantization, clamp, and seed-0 sequential folds."""
    q = float(10 ** round_to)
    xd = "CAST(v[i] AS DOUBLE)"
    absmax = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> abs({xd}))), "
        f"(a, x) -> greatest(a, x))"
    )
    code = f"least(greatest(floor({xd} / scale + 0.5), -127), 127)"
    code_sum = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST({code} AS BIGINT))), (a, c) -> a + c)"
    )
    err = f"({xd} - {code} * scale)"
    mse = (
        f"(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> {err} * {err})), (a, e) -> a + e) / {dim})"
    )
    return f"""
WITH s AS (
  SELECT vec_id, embedding AS v,
         {absmax} / CAST(127.0 AS DOUBLE) AS scale
  FROM {table}
)
SELECT vec_id,
       CASE WHEN scale > 0
            THEN floor(scale * {q} + 0.5) / {q} ELSE 0.0 END AS scale,
       CASE WHEN scale > 0 THEN {code_sum} ELSE 0 END AS code_sum,
       CASE WHEN scale > 0
            THEN floor({mse} * {q} + 0.5) / {q} ELSE 0.0 END AS mse
FROM s
"""


def _sub_sq_l2(a: str, b: str, sub_d: int) -> str:
    """Squared L2 over a sub_d-dim slice pair, seed-0 sequential fold —
    the exact op order of operators.pq (zip_with + aggregate)."""
    diff = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {sub_d + 1}), "
        f"i -> {diff} * {diff})), (x, y) -> x + y)"
    )


def pq_topk_sql(
    *,
    query_id: int,
    k: int,
    m: int,
    ks: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Oracle for operators.pq.pq_topk: same seed codebook (ks lowest-id
    vectors), same (d2, code) tie-break, same ADC rounding."""
    sub_d = dim // m
    slice_ = f"list_slice(ve, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})"
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM {table}
), seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve
  FROM v ORDER BY vec_id LIMIT {ks}
), subs AS (SELECT unnest(range({m})) AS sub_id),
cb AS (
  SELECT code, s.sub_id, {slice_} AS centroid
  FROM seeds, subs s
), sv AS (
  SELECT vec_id, s.sub_id, {slice_} AS sub
  FROM v, subs s
), assign AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT sv.vec_id, sv.sub_id, cb.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub_id
             ORDER BY {_sub_sq_l2('sv.sub', 'cb.centroid', sub_d)}, cb.code
           ) AS rn
    FROM sv JOIN cb ON sv.sub_id = cb.sub_id
  ) WHERE rn = 1
), q AS (
  SELECT sub_id, sub AS qsub FROM sv WHERE vec_id = {query_id}
), lut AS (
  SELECT cb.sub_id, cb.code,
         {_sub_sq_l2('cb.centroid', 'q.qsub', sub_d)} AS pd
  FROM cb JOIN q ON cb.sub_id = q.sub_id
), adc AS (
  SELECT a.vec_id, round(sum(l.pd), 4) AS adc
  FROM assign a JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code
  WHERE a.vec_id <> {query_id}
  GROUP BY a.vec_id
)
SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT {k}
"""


def ivfpq_topk_sql(
    *,
    query_id: int,
    k: int,
    m: int,
    ks: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of operators.pq.ivfpq_topk: the seed-only IVF probe CTEs
    (ivf_recall_sql's) composed with pq_topk_sql's codebook/assign/LUT
    chain, ADC restricted to the probed-list candidates."""
    sub_d = dim // m
    slice_ = f"list_slice(ve, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})"
    assign_d2 = _sq_l2_expr("v.ve", "ls.centroid", dim)
    probe_d2 = _sq_l2_expr("ls.centroid", "q.qv", dim)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM {table}
), ls AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         ve AS centroid
  FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT {num_lists})
), q AS (
  SELECT ve AS qv FROM v WHERE vec_id = {query_id}
), assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, ls.list_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {assign_d2}, ls.list_id) AS r
    FROM v, ls)
  WHERE r = 1
), probe AS (
  SELECT list_id FROM (
    SELECT ls.list_id,
           row_number() OVER (ORDER BY {probe_d2}, ls.list_id) AS r
    FROM ls, q)
  WHERE r <= {nprobe}
), cand AS (
  SELECT a.vec_id FROM assigned a JOIN probe p ON a.list_id = p.list_id
), cseeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve
  FROM v ORDER BY vec_id LIMIT {ks}
), subs AS (SELECT unnest(range({m})) AS sub_id),
cb AS (
  SELECT code, s.sub_id, {slice_} AS centroid
  FROM cseeds, subs s
), sv AS (
  SELECT vec_id, s.sub_id, {slice_} AS sub
  FROM v, subs s
), assign AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT sv.vec_id, sv.sub_id, cb.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub_id
             ORDER BY {_sub_sq_l2('sv.sub', 'cb.centroid', sub_d)}, cb.code
           ) AS rn
    FROM sv JOIN cb ON sv.sub_id = cb.sub_id
  ) WHERE rn = 1
), qs AS (
  SELECT sub_id, sub AS qsub FROM sv WHERE vec_id = {query_id}
), lut AS (
  SELECT cb.sub_id, cb.code,
         {_sub_sq_l2('cb.centroid', 'qs.qsub', sub_d)} AS pd
  FROM cb JOIN qs ON cb.sub_id = qs.sub_id
), adc AS (
  SELECT a.vec_id, round(sum(l.pd), 4) AS adc
  FROM assign a
  JOIN cand c ON a.vec_id = c.vec_id
  JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code
  WHERE a.vec_id <> {query_id}
  GROUP BY a.vec_id
)
SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT {k}
"""


def ivf_batch_topk_sql(
    *,
    query_mod: int,
    query_rem: int,
    k: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of operators.simsearch.ivf_topk_batch: query set =
    ``vec_id % query_mod == query_rem``, per-query nprobe lists by
    centroid distance, exact squared-L2 rerank, top-k per query."""
    assign_d2 = _sq_l2_expr("v.ve", "ls.centroid", dim)
    probe_d2 = _sq_l2_expr("ls.centroid", "q.qv", dim)
    cand_d2 = _sq_l2_expr("v.ve", "p.qv", dim)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM {table}
), ls AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         ve AS centroid
  FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT {num_lists})
), q AS (
  SELECT vec_id AS query_id, ve AS qv FROM v
  WHERE vec_id % {query_mod} = {query_rem}
), assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, ls.list_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {assign_d2}, ls.list_id) AS r
    FROM v, ls)
  WHERE r = 1
), probe AS (
  SELECT query_id, qv, list_id FROM (
    SELECT q.query_id, q.qv, ls.list_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {probe_d2}, ls.list_id) AS r
    FROM q, ls)
  WHERE r <= {nprobe}
), cand AS (
  SELECT p.query_id, v.vec_id, {cand_d2} AS d2
  FROM assigned a
  JOIN probe p ON a.list_id = p.list_id
  JOIN v ON v.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, round(d2, 4) AS d2 FROM (
  SELECT query_id, vec_id, d2,
         row_number() OVER (
           PARTITION BY query_id ORDER BY d2, vec_id) AS r
  FROM cand)
WHERE r <= {k}
"""


def ivfpq_residual_topk_sql(
    *,
    query_id: int,
    k: int,
    m: int,
    ks: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of operators.pq.ivfpq_residual_topk: ivfpq_topk_sql's CTE
    chain with codes trained on ``v - centroid(list(v))`` residuals
    and a per-probed-list LUT built from the per-list query
    residual."""
    sub_d = dim // m
    assign_d2 = _sq_l2_expr("v.ve", "ls.centroid", dim)
    probe_d2 = _sq_l2_expr("ls.centroid", "q.qv", dim)

    def residual(a: str, b: str) -> str:
        return (
            f"list_transform(range(1, {dim + 1}), "
            f"i -> CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        )

    rslice = f"list_slice(rv, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})"
    qslice = (
        f"list_slice(qr, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})"
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM {table}
), ls AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         ve AS centroid
  FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT {num_lists})
), q AS (
  SELECT ve AS qv FROM v WHERE vec_id = {query_id}
), assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, ls.list_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {assign_d2}, ls.list_id) AS r
    FROM v, ls)
  WHERE r = 1
), res AS (
  SELECT v.vec_id, a.list_id,
         {residual('v.ve', 'ls.centroid')} AS rv
  FROM v
  JOIN assigned a ON v.vec_id = a.vec_id
  JOIN ls ON a.list_id = ls.list_id
), probe AS (
  SELECT list_id, centroid FROM (
    SELECT ls.list_id, ls.centroid,
           row_number() OVER (ORDER BY {probe_d2}, ls.list_id) AS r
    FROM ls, q)
  WHERE r <= {nprobe}
), cseeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT {ks})
), subs AS (SELECT unnest(range({m})) AS sub_id),
cb AS (
  SELECT code, s.sub_id,
         list_slice(rv, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})
           AS centroid
  FROM cseeds, subs s
), sv AS (
  SELECT vec_id, s.sub_id, {rslice} AS sub
  FROM res, subs s
), assign AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT sv.vec_id, sv.sub_id, cb.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub_id
             ORDER BY {_sub_sq_l2('sv.sub', 'cb.centroid', sub_d)}, cb.code
           ) AS rn
    FROM sv JOIN cb ON sv.sub_id = cb.sub_id
  ) WHERE rn = 1
), qres AS (
  SELECT p.list_id, {residual('q.qv', 'p.centroid')} AS qr
  FROM probe p, q
), qsubs AS (
  SELECT list_id, s.sub_id, {qslice} AS qsub
  FROM qres, subs s
), lut AS (
  SELECT qs.list_id, cb.sub_id, cb.code,
         {_sub_sq_l2('cb.centroid', 'qs.qsub', sub_d)} AS pd
  FROM cb JOIN qsubs qs ON cb.sub_id = qs.sub_id
), adc AS (
  SELECT a2.vec_id, round(sum(l.pd), 4) AS adc
  FROM assign a2
  JOIN assigned aa ON a2.vec_id = aa.vec_id
  JOIN probe p ON aa.list_id = p.list_id
  JOIN lut l ON l.list_id = aa.list_id
             AND a2.sub_id = l.sub_id AND a2.code = l.code
  WHERE a2.vec_id <> {query_id}
  GROUP BY a2.vec_id
)
SELECT vec_id, adc FROM adc ORDER BY adc, vec_id LIMIT {k}
"""


def _sq_l2_expr(a: str, b: str, dim: int) -> str:
    """Mirror of simsearch._sq_l2: left-to-right fold of (a[i]-b[i])²."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), "
        f"(x, y) -> x + y)"
    )


def _recall_tail_sql(k: int) -> str:
    """Shared approx-vs-exact recall tail: expects CTEs ``q(query_id)``,
    ``approx(query_id, cand_id)`` (rank already applied) and
    ``exact(query_id, neighbor_id)`` to be in scope."""
    return f"""
, a_cnt AS (
  SELECT query_id, count(*) AS n_approx FROM approx GROUP BY query_id
), h_cnt AS (
  SELECT a.query_id, count(*) AS n_hit
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.cand_id = e.neighbor_id
  GROUP BY a.query_id
)
SELECT q.query_id,
       coalesce(n_approx, 0) AS n_approx,
       coalesce(n_hit, 0) AS n_hit,
       round(CAST(coalesce(n_hit, 0) AS DOUBLE)
             / CAST({k} AS DOUBLE), 6) AS recall
FROM q
LEFT JOIN a_cnt ON q.query_id = a_cnt.query_id
LEFT JOIN h_cnt ON q.query_id = h_cnt.query_id
"""


def _exact_topk_cte(*, max_query_id: int, k: int, dim: int, table: str) -> str:
    """knn_join mirror as an ``exact(query_id, neighbor_id)`` CTE body."""
    return f"""
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT eq.query_id, v.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY eq.query_id
             ORDER BY round({cosine_expr('v.embedding', 'eq.qv', dim)}, 6)
               DESC, v.vec_id) AS r
    FROM {table} v, (
      SELECT vec_id AS query_id, embedding AS qv FROM {table}
      WHERE vec_id < {max_query_id}) eq
    WHERE v.vec_id != eq.query_id
      AND {_dot('v.embedding', 'v.embedding', dim)} > 0
      AND {_dot('eq.qv', 'eq.qv', dim)} > 0)
  WHERE r <= {k}
)"""


def ann_lsh_recall_sql(
    *,
    max_query_id: int,
    k: int,
    num_planes: int,
    seed: int,
    dim: int,
    probe_hamming: int = 0,
    table: str = "embeddings",
) -> str:
    """Twin of simsearch.ann_lsh_recall: LSH approximate top-k per panel
    query vs exact top-k, joined into (query_id, n_approx, n_hit,
    recall)."""
    planes = hyperplanes(num_planes, dim, seed)
    bucket = bucket_expr("embedding", planes, dim)
    probe = (
        "b.bucket = q.qbucket"
        if probe_hamming == 0
        else (
            f"bit_count(xor(CAST(b.bucket AS BIGINT), "
            f"CAST(q.qbucket AS BIGINT))) <= {probe_hamming}"
        )
    )
    return f"""
WITH bucketed AS (
  SELECT vec_id AS cand_id, embedding, {bucket} AS bucket FROM {table}
), q AS (
  SELECT cand_id AS query_id, embedding AS qv, bucket AS qbucket
  FROM bucketed WHERE cand_id < {max_query_id}
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, b.cand_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({cosine_expr('b.embedding', 'q.qv', dim)}, 6)
               DESC, b.cand_id) AS r
    FROM bucketed b, q
    WHERE {probe} AND b.cand_id != q.query_id)
  WHERE r <= {k}
), {_exact_topk_cte(max_query_id=max_query_id, k=k, dim=dim, table=table)}
{_recall_tail_sql(k)}
"""


def ivf_recall_sql(
    *,
    max_query_id: int,
    k: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of simsearch.ivf_recall (seed-only quantizer,
    ivf_index(refine=False)): centroids are the num_lists lowest-id raw
    vectors, assignment/probe are argmin over the same left-to-right
    squared-L2 fold with (d2, list_id) tie order — no cross-engine mean
    arithmetic anywhere."""
    assign_d2 = _sq_l2_expr("v.embedding", "s.centroid", dim)
    probe_d2 = _sq_l2_expr("s.centroid", "q.qv", dim)
    return f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM {table}
        ORDER BY vec_id LIMIT {num_lists})
), assigned AS (
  SELECT vec_id, embedding, list_id FROM (
    SELECT v.vec_id, v.embedding, s.list_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {assign_d2}, s.list_id) AS r
    FROM {table} v, seeds s)
  WHERE r = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM {table}
  WHERE vec_id < {max_query_id}
), probe AS (
  SELECT query_id, list_id FROM (
    SELECT q.query_id, s.list_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {probe_d2}, s.list_id) AS r
    FROM seeds s, q)
  WHERE r <= {nprobe}
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT p.query_id, a.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY round({cosine_expr('a.embedding', 'q.qv', dim)}, 6)
               DESC, a.vec_id) AS r
    FROM assigned a
    JOIN probe p ON a.list_id = p.list_id
    JOIN q ON q.query_id = p.query_id
    WHERE a.vec_id != p.query_id)
  WHERE r <= {k}
), {_exact_topk_cte(max_query_id=max_query_id, k=k, dim=dim, table=table)}
{_recall_tail_sql(k)}
"""


def _kmeans_ctes(*, k: int, dim: int, iters: int, table: str) -> str:
    """CTE chain mirroring operators.cluster.kmeans_assign, ending in
    ``kassign(vec_id, embedding, cluster, d2)``.

    Parity contract (see cluster.py module docstring): seed centroids
    are the k lowest-id vectors; every distance is the shared
    left-to-right squared-L2 fold; argmin ties break ``(d2, cluster)``;
    each Lloyd mean is floor-quantized to 1e-6 before reuse, so both
    engines iterate over bit-identical centroids."""
    parts = [
        f"""seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM {table} ORDER BY vec_id LIMIT {k}))"""
    ]
    prev = "seeds"
    for t in range(iters):
        d2 = _sq_l2_expr("v.embedding", "c.centroid", dim)
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT v.vec_id, v.embedding, c.cluster,
           row_number() OVER (
             PARTITION BY v.vec_id ORDER BY {d2}, c.cluster) AS r
    FROM {table} v, {prev} c) WHERE r = 1)"""
        )
        parts.append(
            f"""m{t} AS (
  SELECT cluster, i,
         floor(avg(CAST(embedding[i] AS DOUBLE)) * 1000000.0 + 0.5)
           / 1000000.0 AS m
  FROM a{t}, range(1, {dim + 1}) t(i) GROUP BY cluster, i)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT s.cluster, coalesce(mm.cen, s.centroid) AS centroid
  FROM seeds s LEFT JOIN (
    SELECT cluster, list(m ORDER BY i) AS cen FROM m{t} GROUP BY cluster
  ) mm USING (cluster))"""
        )
        prev = f"c{t}"
    d2f = _sq_l2_expr("v.embedding", "c.centroid", dim)
    parts.append(
        f"""kassign AS (
  SELECT vec_id, embedding, cluster,
         floor(d2 * 1000000.0 + 0.5) / 1000000.0 AS d2 FROM (
    SELECT v.vec_id, v.embedding, c.cluster, {d2f} AS d2,
           row_number() OVER (
             PARTITION BY v.vec_id ORDER BY {d2f}, c.cluster) AS r
    FROM {table} v, {prev} c) WHERE r = 1)"""
    )
    return ",\n".join(parts)


def kmeans_assign_sql(
    *, k: int, dim: int, iters: int = 2, table: str = "embeddings"
) -> str:
    """Twin of operators.cluster.kmeans_assign (minus the vector
    payload column, which the query projects away)."""
    return f"""
WITH {_kmeans_ctes(k=k, dim=dim, iters=iters, table=table)}
SELECT vec_id, cluster, d2 FROM kassign
"""


def semdedup_keep_sql(
    *,
    k: int,
    dim: int,
    threshold: float,
    iters: int = 2,
    table: str = "embeddings",
) -> str:
    """Twin of operators.cluster.semdedup_keep: within-cluster pairs on
    the k-means partition, drop ids with a lower-id >=threshold
    quantized-cosine twin, keep the rest."""
    cos = cosine_expr("a.embedding", "b.embedding", dim)
    return f"""
WITH {_kmeans_ctes(k=k, dim=dim, iters=iters, table=table)},
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM kassign a JOIN kassign b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE floor({cos} * 1000000.0 + 0.5) / 1000000.0 >= {threshold!r}
)
SELECT k.vec_id, k.cluster
FROM kassign k LEFT JOIN dropped d ON k.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""


def _pca_ctes(*, dim: int, iters: int, table: str) -> tuple[str, str]:
    """(CTE chain, final v name) for the power iteration — shared by
    pca_power_sql and abtt_topk_sql."""
    q = "floor({expr} * 1000000.0 + 0.5) / 1000000.0"
    e1 = "[" + ", ".join("1.0" if i == 0 else "0.0" for i in range(dim)) + "]"

    def s_expr(vname: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {dim + 1}), "
            f"i -> (CAST(e.embedding[i] AS DOUBLE) - mu.mu[i]) * {vname}.v[i])), "
            f"(a, b) -> a + b)"
        )

    parts = [
        f"""mu AS (
  SELECT list(m ORDER BY i) AS mu FROM (
    SELECT i, {q.format(expr=f'avg(CAST(embedding[i] AS DOUBLE))')} AS m
    FROM {table}, range(1, {dim + 1}) t(i) GROUP BY i))""",
        f"v0 AS (SELECT {e1} AS v)",
    ]
    for t in range(iters):
        parts.append(
            f"""st{t} AS (
  SELECT e.embedding, mu.mu, {s_expr(f'v{t}')} AS s
  FROM {table} e CROSS JOIN mu CROSS JOIN v{t})"""
        )
        parts.append(
            f"""u{t} AS (
  SELECT list(u ORDER BY i) AS u FROM (
    SELECT i,
           {q.format(expr='sum(s * (CAST(embedding[i] AS DOUBLE) - mu[i]))')} AS u
    FROM st{t}, range(1, {dim + 1}) t(i) GROUP BY i))"""
        )
        nrm = (
            "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(u, y -> y * y)), (a, b) -> a + b))"
        )
        parts.append(
            f"""v{t + 1} AS (
  SELECT list_transform(u, x -> {q.format(expr=f'x / {nrm}')}) AS v
  FROM u{t})"""
        )
    return ",\n".join(parts), f"v{iters}"


def pca_power_sql(*, dim: int, iters: int = 3, table: str = "embeddings") -> str:
    """Twin of operators.cluster.pca_power_scores: quantized per-dim
    mean, v0 = e1, ``iters`` power steps with each per-dim sum and the
    normalized iterate floor-quantized to 1e-6, then per-vector
    centered projection — every fold left-to-right like the Spark
    expression, so both engines see bit-identical (mu, v)."""
    ctes, vf = _pca_ctes(dim=dim, iters=iters, table=table)
    s_final = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> (CAST(e.embedding[i] AS DOUBLE) - mu.mu[i]) * {vf}.v[i])), "
        f"(a, b) -> a + b)"
    )
    return f"""
WITH {ctes}
SELECT e.vec_id,
       floor({s_final} * 1000000.0 + 0.5) / 1000000.0 AS pc1
FROM {table} e CROSS JOIN mu CROSS JOIN {vf}
"""


def abtt_topk_sql(
    *,
    query_id: int,
    k: int,
    dim: int,
    iters: int = 3,
    table: str = "embeddings",
) -> str:
    """Twin of operators.cluster.abtt_topk: whiten with the shared
    power-iteration (mu, v) — x' = (x-mu) - ((x-mu).v) v — then exact
    cosine top-k in the whitened space, quantized 1e-6, (cos DESC, id)
    order."""
    ctes, vf = _pca_ctes(dim=dim, iters=iters, table=table)
    s_proj = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> (CAST(e.embedding[i] AS DOUBLE) - mu.mu[i]) * {vf}.v[i])), "
        f"(a, b) -> a + b)"
    )
    wdot = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> w.wx[i] * q.qx[i])), (a, b) -> a + b)"
    )
    wnorm = (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> w.wx[i] * w.wx[i])), (a, b) -> a + b))"
    )
    qnorm = (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        f"i -> q.qx[i] * q.qx[i])), (a, b) -> a + b))"
    )
    return f"""
WITH {ctes},
wv AS (
  SELECT e.vec_id,
         list_transform(range(1, {dim + 1}),
           i -> (CAST(e.embedding[i] AS DOUBLE) - mu.mu[i]) - s * {vf}.v[i])
           AS wx
  FROM (SELECT e.vec_id, e.embedding, {s_proj} AS s
        FROM {table} e CROSS JOIN mu CROSS JOIN {vf}) e
  CROSS JOIN mu CROSS JOIN {vf}
), q AS (
  SELECT wx AS qx FROM wv WHERE vec_id = {query_id}
)
SELECT vec_id,
       floor({wdot} / ({wnorm} * {qnorm}) * 1000000.0 + 0.5) / 1000000.0
         AS cos
FROM wv w CROSS JOIN q
WHERE vec_id != {query_id}
ORDER BY cos DESC, vec_id
LIMIT {k}
"""


def truncated_dim_recall_sql(
    *,
    max_query_id: int,
    k: int,
    trunc_dim: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of simsearch.truncated_dim_recall: the approx leg is
    cosine_expr over only the first trunc_dim components (the same
    prefix fold as the Spark slice), the exact leg is the shared
    full-dim knn CTE. Rows whose PREFIX has zero norm are excluded
    from both roles (the operator's zero-norm guard: prefix cosine
    would be 0/0)."""
    return f"""
WITH b AS (
  SELECT vec_id, embedding FROM {table}
  WHERE {_dot('embedding', 'embedding', trunc_dim)} > 0
), q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM b WHERE vec_id < {max_query_id}
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, v.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({cosine_expr('v.embedding', 'q.qv', trunc_dim)}, 6)
               DESC, v.vec_id) AS r
    FROM b v, q
    WHERE v.vec_id != q.query_id)
  WHERE r <= {k}
), {_exact_topk_cte(max_query_id=max_query_id, k=k, dim=dim, table=table)}
{_recall_tail_sql(k)}
"""


def pq_recall_sql(
    *,
    max_query_id: int,
    k: int,
    m: int,
    ks: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of operators.pq.pq_recall: pq_topk_sql's codebook/assign
    CTEs generalized to the query panel, with an exact full-dim
    squared-L2 leg (both legs same metric) and the shared recall
    tail."""
    sub_d = dim // m
    slice_ = f"list_slice(ve, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})"
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM {table}
), seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve
  FROM v ORDER BY vec_id LIMIT {ks}
), subs AS (SELECT unnest(range({m})) AS sub_id),
cb AS (
  SELECT code, s.sub_id, {slice_} AS centroid
  FROM seeds, subs s
), sv AS (
  SELECT vec_id, s.sub_id, {slice_} AS sub
  FROM v, subs s
), assign AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT sv.vec_id, sv.sub_id, cb.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub_id
             ORDER BY {_sub_sq_l2('sv.sub', 'cb.centroid', sub_d)}, cb.code
           ) AS rn
    FROM sv JOIN cb ON sv.sub_id = cb.sub_id
  ) WHERE rn = 1
), qs AS (
  SELECT vec_id AS query_id, sub_id, sub AS qsub
  FROM sv WHERE vec_id < {max_query_id}
), lut AS (
  SELECT qs.query_id, cb.sub_id, cb.code,
         {_sub_sq_l2('cb.centroid', 'qs.qsub', sub_d)} AS pd
  FROM cb JOIN qs ON cb.sub_id = qs.sub_id
), adc AS (
  SELECT l.query_id, a.vec_id, round(sum(l.pd), 4) AS adc
  FROM assign a JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code
  WHERE a.vec_id <> l.query_id
  GROUP BY l.query_id, a.vec_id
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc, vec_id) AS r
    FROM adc)
  WHERE r <= {k}
), q AS (
  SELECT vec_id AS query_id FROM v WHERE vec_id < {max_query_id}
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT eq.query_id, v.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY eq.query_id
             ORDER BY round({_sq_l2_expr('v.ve', 'eq.qv', dim)}, 6),
               v.vec_id) AS r
    FROM v, (
      SELECT vec_id AS query_id, ve AS qv FROM v
      WHERE vec_id < {max_query_id}) eq
    WHERE v.vec_id != eq.query_id)
  WHERE r <= {k}
)
{_recall_tail_sql(k)}
"""


def ivfpq_recall_sql(
    *,
    max_query_id: int,
    k: int,
    m: int,
    ks: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of operators.pq.ivfpq_recall: pq_recall_sql's panel
    codebook/assign/LUT chain with ivfpq_topk_sql's seed-IVF probe
    CTEs generalized per query, ADC restricted to probed-list
    candidates, exact full-dim leg and the shared recall tail."""
    sub_d = dim // m
    slice_ = f"list_slice(ve, s.sub_id * {sub_d} + 1, (s.sub_id + 1) * {sub_d})"
    assign_d2 = _sq_l2_expr("v.ve", "ls.centroid", dim)
    probe_d2 = _sq_l2_expr("ls.centroid", "eq.qv", dim)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM {table}
), ls AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         ve AS centroid
  FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT {num_lists})
), qpanel AS (
  SELECT vec_id AS query_id, ve AS qv FROM v
  WHERE vec_id < {max_query_id}
), ivf_assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT v.vec_id, ls.list_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {assign_d2}, ls.list_id) AS r
    FROM v, ls)
  WHERE r = 1
), ivf_probe AS (
  SELECT query_id, list_id FROM (
    SELECT eq.query_id, ls.list_id,
           row_number() OVER (
             PARTITION BY eq.query_id
             ORDER BY {probe_d2}, ls.list_id) AS r
    FROM ls, qpanel eq)
  WHERE r <= {nprobe}
), cand AS (
  SELECT p.query_id, a.vec_id
  FROM ivf_assigned a JOIN ivf_probe p ON a.list_id = p.list_id
), seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve
  FROM v ORDER BY vec_id LIMIT {ks}
), subs AS (SELECT unnest(range({m})) AS sub_id),
cb AS (
  SELECT code, s.sub_id, {slice_} AS centroid
  FROM seeds, subs s
), sv AS (
  SELECT vec_id, s.sub_id, {slice_} AS sub
  FROM v, subs s
), assign AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT sv.vec_id, sv.sub_id, cb.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub_id
             ORDER BY {_sub_sq_l2('sv.sub', 'cb.centroid', sub_d)}, cb.code
           ) AS rn
    FROM sv JOIN cb ON sv.sub_id = cb.sub_id
  ) WHERE rn = 1
), qs AS (
  SELECT vec_id AS query_id, sub_id, sub AS qsub
  FROM sv WHERE vec_id < {max_query_id}
), lut AS (
  SELECT qs.query_id, cb.sub_id, cb.code,
         {_sub_sq_l2('cb.centroid', 'qs.qsub', sub_d)} AS pd
  FROM cb JOIN qs ON cb.sub_id = qs.sub_id
), adc AS (
  SELECT l.query_id, a.vec_id, round(sum(l.pd), 4) AS adc
  FROM assign a
  JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code
  JOIN cand c ON c.query_id = l.query_id AND c.vec_id = a.vec_id
  WHERE a.vec_id <> l.query_id
  GROUP BY l.query_id, a.vec_id
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc, vec_id) AS r
    FROM adc)
  WHERE r <= {k}
), q AS (
  SELECT vec_id AS query_id FROM v WHERE vec_id < {max_query_id}
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT eq.query_id, v.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY eq.query_id
             ORDER BY round({_sq_l2_expr('v.ve', 'eq.qv', dim)}, 6),
               v.vec_id) AS r
    FROM v, qpanel eq
    WHERE v.vec_id != eq.query_id)
  WHERE r <= {k}
)
{_recall_tail_sql(k)}
"""


def knn_label_accuracy_sql(
    *,
    max_query_id: int,
    k: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of simsearch.knn_label_accuracy: the shared exact-knn CTE,
    a label vote, and the (votes desc, label asc) argmax."""
    return f"""
WITH {_exact_topk_cte(max_query_id=max_query_id, k=k, dim=dim, table=table)},
votes AS (
  SELECT e.query_id, v.label AS nl, count(*) AS nv
  FROM exact e JOIN {table} v ON v.vec_id = e.neighbor_id
  GROUP BY e.query_id, v.label
), pick AS (
  SELECT query_id, nl AS pred_label, nv AS n_votes FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY nv DESC, nl) AS rk
    FROM votes) WHERE rk = 1
)
SELECT q.vec_id AS query_id, q.label AS own_label,
       p.pred_label, p.n_votes,
       p.pred_label = q.label AS is_correct
FROM {table} q JOIN pick p ON p.query_id = q.vec_id
WHERE q.vec_id < {max_query_id}
"""


def kmeans_silhouette_sql(
    *, k: int, dim: int, iters: int = 2, table: str = "embeddings"
) -> str:
    """Twin of operators.cluster.kmeans_silhouette: the shared k-means
    CTE chain's FITTED centroid relation, per-point (d2, cluster)
    ranking for own/runner-up, quantized a/b feeding the ratio."""
    cent = "seeds" if iters == 0 else f"c{iters - 1}"
    d2 = _sq_l2_expr("v.embedding", "c.centroid", dim)
    return f"""
WITH {_kmeans_ctes(k=k, dim=dim, iters=iters, table=table)},
alld AS (
  SELECT v.vec_id, c.cluster, {d2} AS d2,
         row_number() OVER (
           PARTITION BY v.vec_id ORDER BY {d2}, c.cluster) AS r
  FROM {table} v, {cent} c
), ab AS (
  SELECT o.vec_id, o.cluster,
         floor(o.d2 * 1000000.0 + 0.5) / 1000000.0 AS a,
         floor(u.d2 * 1000000.0 + 0.5) / 1000000.0 AS b
  FROM (SELECT * FROM alld WHERE r = 1) o
  JOIN (SELECT * FROM alld WHERE r = 2) u USING (vec_id)
), s AS (
  SELECT cluster, a, b,
         CASE WHEN greatest(a, b) > 0
              THEN floor((b - a) / greatest(a, b) * 1000000.0 + 0.5)
                     / 1000000.0
              ELSE 0.0 END AS sil
  FROM ab
)
SELECT cluster, count(*) AS n,
       floor(avg(sil) * 1000000.0 + 0.5) / 1000000.0 AS mean_sil,
       floor(avg(a) * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
       floor(avg(b) * 1000000.0 + 0.5) / 1000000.0 AS mean_b
FROM s GROUP BY cluster
"""


def int8_recall_sql(
    *,
    max_query_id: int,
    k: int,
    dim: int,
    table: str = "embeddings",
) -> str:
    """Twin of operators.pq.int8_recall: the int8_quant_sql
    dequantization materialized as a list column, asymmetric cosine
    against the full-precision panel behind a positive-norm predicate
    (zero vectors excluded before the division, as in the ANSI Spark
    plan), shared exact CTE and recall tail."""
    xd = "CAST(v[i] AS DOUBLE)"
    absmax = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> abs({xd}))), "
        f"(a, x) -> greatest(a, x))"
    )
    code = f"least(greatest(floor({xd} / scale + 0.5), -127), 127)"
    cos = cosine_expr("b.dv", "q.qv", dim)
    return f"""
WITH sc AS (
  SELECT vec_id, embedding AS v,
         {absmax} / CAST(127.0 AS DOUBLE) AS scale
  FROM {table}
), dq AS (
  SELECT vec_id,
         CASE WHEN scale > 0
              THEN list_transform(range(1, {dim + 1}), i -> {code} * scale)
              ELSE list_transform(range(1, {dim + 1}), i -> 0.0)
         END AS dv
  FROM sc
), q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM {table} WHERE vec_id < {max_query_id}
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, b.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({cos}, 6) DESC, b.vec_id) AS r
    FROM dq b, q
    WHERE b.vec_id != q.query_id
      AND {_dot('b.dv', 'b.dv', dim)} > 0
      AND {_dot('q.qv', 'q.qv', dim)} > 0)
  WHERE r <= {k}
), {_exact_topk_cte(max_query_id=max_query_id, k=k, dim=dim, table=table)}
{_recall_tail_sql(k)}
"""


def _jl_proj_list(vec: str, signs: list[list[int]]) -> str:
    """JL projection of ``vec`` as a DuckDB list literal-expression:
    each component is the same left-assoc ``0.0 ± x[1] ± x[2] ...`` sum
    (coefficient-free, zero multiplications) the Spark operator folds,
    so projected components match bit-for-bit."""
    comps = []
    for row in signs:
        s = "CAST(0 AS DOUBLE)"
        for i, sg in enumerate(row):
            op = "+" if sg > 0 else "-"
            s += f" {op} CAST({vec}[{i + 1}] AS DOUBLE)"
        comps.append("(" + s + ")")
    return "[" + ", ".join(comps) + "]"


def jl_recall_sql(
    *,
    max_query_id: int,
    k: int,
    out_dim: int,
    dim: int,
    tag: str = "jl",
    table: str = "embeddings",
) -> str:
    """Twin of simsearch.jl_recall: project every vector through the
    shared driver-side literal sign matrix (simsearch.jl_signs — both
    engines consume the identical literals), score cosine in the
    projected space, and compare the per-query top-k against the shared
    full-dim exact CTE."""
    from .operators.simsearch import jl_signs

    signs = jl_signs(out_dim, dim, tag)
    return f"""
WITH p0 AS (
  SELECT vec_id, {_jl_proj_list('embedding', signs)} AS pv FROM {table}
), p AS (
  SELECT vec_id, pv FROM p0 WHERE {_dot('pv', 'pv', out_dim)} > 0
), q AS (
  SELECT vec_id AS query_id, pv AS qv FROM p WHERE vec_id < {max_query_id}
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, v.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({cosine_expr('v.pv', 'q.qv', out_dim)}, 6)
               DESC, v.vec_id) AS r
    FROM p v, q
    WHERE v.vec_id != q.query_id)
  WHERE r <= {k}
), {_exact_topk_cte(max_query_id=max_query_id, k=k, dim=dim, table=table)}
{_recall_tail_sql(k)}
"""


def _kcenter_chain_ctes(*, k: int, dim: int, table: str) -> list[str]:
    """The shared p{i}/d{i} pick-traversal CTE chain (min-id seed,
    then k-1 incremental ``md := least(md, round(d2, 6))`` updates,
    each ending in a (md DESC, vec_id) top-1 pick). Both
    kcenter_coreset_sql and kcenter_assign_sql COMPOSE from this list
    (the same pattern as the BPE chain builder) — neither
    string-splits the other's rendered SQL."""
    ctes = [
        f"""p1 AS MATERIALIZED (
  SELECT vec_id, embedding FROM {table}
  WHERE vec_id = (SELECT min(vec_id) FROM {table})
)""",
        f"""d1 AS MATERIALIZED (
  SELECT e.vec_id, e.embedding,
         round({_sq_l2_expr('e.embedding', 'p1.embedding', dim)}, 6) AS md
  FROM {table} e, p1 WHERE e.vec_id != p1.vec_id
)""",
    ]
    for i in range(2, k + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT vec_id, embedding, md FROM d{i - 1}
  ORDER BY md DESC, vec_id LIMIT 1
)"""
        )
        if i < k:
            ctes.append(
                f"""d{i} AS MATERIALIZED (
  SELECT d.vec_id, d.embedding,
         least(d.md,
               round({_sq_l2_expr('d.embedding', 'p.embedding', dim)}, 6))
           AS md
  FROM d{i - 1} d, p{i} p WHERE d.vec_id != p.vec_id
)"""
            )
    return ctes


def kcenter_coreset_sql(
    *, k: int, dim: int, table: str = "embeddings"
) -> str:
    """Twin of cluster.kcenter_coreset: the shared
    :func:`_kcenter_chain_ctes` traversal, then one UNION ALL of the
    pick rows (rank, vec_id, coverage radius)."""
    ctes = _kcenter_chain_ctes(k=k, dim=dim, table=table)
    finals = "\nUNION ALL\n".join(
        ["SELECT 1 AS pick_rank, vec_id, 0.0 AS min_dist FROM p1"]
        + [
            f"SELECT {i} AS pick_rank, vec_id, md AS min_dist FROM p{i}"
            for i in range(2, k + 1)
        ]
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


def kcenter_assign_sql(
    *, k: int, dim: int, table: str = "embeddings"
) -> str:
    """Twin of cluster.kcenter_assign composed over the shared
    :func:`_kcenter_chain_ctes` traversal: the same packed-BIGINT
    nearest-pick key (micro-quantized d2 * 100 + rank), integer
    least, per-rank integer stats. The rank spine is a VALUES list of
    ranks 1..k LEFT JOINed against the aggregate, mirroring the Spark
    operator's meta left join, so picks with ZERO assigned vectors
    (duplicate-vector / k >= distinct edge cases) still emit their
    n_assigned=0 row — the contract pinned by
    tests/test_cluster.py::test_tie_goes_to_lower_rank. Same packing
    validity window as the operator (pick_rank < 100; exact while
    d2 < 2^53 / 1e8)."""
    if k < 1:
        raise ValueError("kcenter_assign_sql needs k >= 1")
    if k >= 100:
        raise ValueError("pick_rank packs into 2 decimal digits (< 100)")
    cte_block = ",\n".join(_kcenter_chain_ctes(k=k, dim=dim, table=table))
    key_terms = ", ".join(
        f"CAST(floor({_sq_l2_expr('e.embedding', f'p{i}.embedding', dim)}"
        f" * 1000000.0 + 0.5) AS BIGINT) * 100 + {i}"
        for i in range(1, k + 1)
    )
    least_expr = f"least({key_terms})" if k > 1 else f"({key_terms})"
    pick_tables = ", ".join(f"p{i}" for i in range(1, k + 1))
    id_case = " ".join(
        f"WHEN r.pick_rank = {i} THEN (SELECT vec_id FROM p{i})"
        for i in range(1, k + 1)
    )
    ranks_values = ", ".join(f"({i})" for i in range(1, k + 1))
    return f"""WITH {cte_block},
asg AS MATERIALIZED (
  SELECT key % 100 AS pick_rank, (key - key % 100) / 100 AS microd
  FROM (SELECT ({least_expr}) AS key FROM {table} e, {pick_tables})
), agg AS (
  SELECT pick_rank, count(*) AS n_assigned,
         CAST(sum(CAST(microd AS BIGINT)) AS BIGINT) AS s,
         CAST(max(CAST(microd AS BIGINT)) AS BIGINT) AS mx
  FROM asg GROUP BY pick_rank
), ranks AS (
  SELECT * FROM (VALUES {ranks_values}) t(pick_rank)
)
SELECT CAST(r.pick_rank AS INTEGER) AS pick_rank,
       (CASE {id_case} END) AS pick_id,
       COALESCE(a.n_assigned, 0) AS n_assigned,
       CASE WHEN COALESCE(a.n_assigned, 0) > 0
            THEN round(CAST(a.s AS DOUBLE) / 1000000.0 / a.n_assigned, 6)
            ELSE 0.0 END AS mean_d2,
       CASE WHEN COALESCE(a.n_assigned, 0) > 0
            THEN round(CAST(a.mx AS DOUBLE) / 1000000.0, 6)
            ELSE 0.0 END AS max_d2
FROM ranks r LEFT JOIN agg a ON r.pick_rank = a.pick_rank
"""


def _kmpar_cand_ctes(
    *,
    k: int,
    dim: int,
    ell: int | None = None,
    rounds: int = 3,
    salt: str = "kmpar",
    table: str = "embeddings",
) -> str:
    """CTE chain twinning operators.cluster._parallel_candidates
    (Bahmani et al.
    2012 k-means|| oversampling): same lowest-id first center, same
    integer-micro-unit d2/phi (exact BIGINT sums — float-order
    immune), same md5-rational u, same ``u * phi < ell * d2``
    single-multiply-per-side selection test, same final
    nearest-center weights with (d2, cluster) tie order. CTEs are
    MATERIALIZED: the round chain re-references each center set, and
    DuckDB's default CTE inlining would unroll it exponentially."""
    ell = 2 * k if ell is None else ell
    m = 1 << 20
    parts = [
        f"""c0 AS MATERIALIZED (
  SELECT vec_id AS cluster,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM {table} ORDER BY vec_id LIMIT 1)"""
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        d2 = _sq_l2_expr("v.embedding", "c.centroid", dim)
        parts.append(
            f"""a{r} AS MATERIALIZED (
  SELECT v.vec_id,
         CAST(floor(min({d2}) * 1000000.0 + 0.5) AS BIGINT) AS d2i
  FROM {table} v, {prev} c GROUP BY v.vec_id)"""
        )
        parts.append(
            f"""p{r} AS (SELECT sum(d2i) AS phi FROM a{r})"""
        )
        u = (
            f"(CAST((CAST('0x' || substr(md5(CAST(a.vec_id AS VARCHAR) "
            f"|| ':{salt}:{r}'), 1, 15) AS BIGINT) % {m}) + 1 AS DOUBLE) "
            f"/ {float(m + 1)!r})"
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT cluster, centroid FROM {prev}
  UNION ALL
  SELECT a.vec_id AS cluster,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM a{r} a, p{r} p, {table} e
  WHERE e.vec_id = a.vec_id
    AND {u} * CAST(p.phi AS DOUBLE)
        < {float(ell)!r} * CAST(a.d2i AS DOUBLE))"""
        )
        prev = f"c{r}"
    d2f = _sq_l2_expr("v.embedding", "c.centroid", dim)
    parts.append(
        f"""fin AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY v.vec_id ORDER BY {d2f}, c.cluster) AS rn
    FROM {table} v, {prev} c) WHERE rn = 1)"""
    )
    parts.append(
        f"""w AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS weight
  FROM fin GROUP BY cluster)"""
    )
    parts.append(
        f"""cand AS MATERIALIZED (
  SELECT c.cluster, c.centroid, w.weight
  FROM {prev} c JOIN w USING (cluster))"""
    )
    return ",\n".join(parts)



def kmeans_parallel_init_sql(
    *,
    k: int,
    dim: int,
    ell: int | None = None,
    rounds: int = 3,
    salt: str = "kmpar",
    table: str = "embeddings",
) -> str:
    """Twin of operators.cluster.kmeans_parallel_init — the weighted
    candidate projection of :func:`_kmpar_cand_ctes`."""
    ctes = _kmpar_cand_ctes(
        k=k, dim=dim, ell=ell, rounds=rounds, salt=salt, table=table
    )
    return f"""
WITH {ctes}
SELECT cluster AS vec_id, weight FROM cand
"""


def kmeans_parallel_assign_sql(
    *,
    k: int,
    dim: int,
    ell: int | None = None,
    rounds: int = 3,
    recluster_iters: int = 2,
    salt: str = "kmpar",
    table: str = "embeddings",
) -> str:
    """Twin of operators.cluster.kmeans_parallel_assign: candidates
    (shared CTE chain), k-seed weighted Lloyd recluster (means =
    sum(w*x)/sum(w), floor-quantized to 1e-6 per round, lost cluster
    falls back to its seed), final corpus assignment with (d2,
    cluster) tie order and 1e-6-quantized d2."""
    parts = [
        _kmpar_cand_ctes(
            k=k, dim=dim, ell=ell, rounds=rounds, salt=salt, table=table
        )
    ]
    parts.append(
        f"""s0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY cluster) - 1 AS cluster, centroid
  FROM (SELECT cluster, centroid FROM cand ORDER BY cluster LIMIT {k}))"""
    )
    prev = "s0"
    for t in range(recluster_iters):
        d2 = _sq_l2_expr("p.centroid", "c.centroid", dim)
        parts.append(
            f"""ra{t} AS MATERIALIZED (
  SELECT __cid, __w, __v, cluster FROM (
    SELECT p.cluster AS __cid, CAST(p.weight AS DOUBLE) AS __w,
           p.centroid AS __v, c.cluster,
           row_number() OVER (
             PARTITION BY p.cluster ORDER BY {d2}, c.cluster) AS r
    FROM cand p, {prev} c) WHERE r = 1)"""
        )
        parts.append(
            f"""rm{t} AS (
  SELECT cluster, i,
         floor((sum(__w * __v[i]) / sum(__w)) * 1000000.0 + 0.5)
           / 1000000.0 AS m
  FROM ra{t}, range(1, {dim + 1}) t(i) GROUP BY cluster, i)"""
        )
        parts.append(
            f"""rc{t} AS MATERIALIZED (
  SELECT s.cluster, coalesce(mm.cen, s.centroid) AS centroid
  FROM s0 s LEFT JOIN (
    SELECT cluster, list(m ORDER BY i) AS cen FROM rm{t} GROUP BY cluster
  ) mm USING (cluster))"""
        )
        prev = f"rc{t}"
    d2f = _sq_l2_expr("v.embedding", "c.centroid", dim)
    parts.append(
        f"""kfin AS (
  SELECT vec_id, cluster,
         floor(d2 * 1000000.0 + 0.5) / 1000000.0 AS d2 FROM (
    SELECT v.vec_id, c.cluster, {d2f} AS d2,
           row_number() OVER (
             PARTITION BY v.vec_id ORDER BY {d2f}, c.cluster) AS rn
    FROM {table} v, {prev} c) WHERE rn = 1)"""
    )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT vec_id, cluster, d2 FROM kfin
"""
