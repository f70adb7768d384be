"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine is the exactness baseline; random-hyperplane LSH is
the scale path (bucket-join candidate generation, exact rerank inside
buckets). Both are deterministic — hyperplanes derive from a seeded RNG
shared with the SQL oracle — so the driver's DuckDB gate checks them
value-for-value like every other operator.

Scale notes (100 TB contract):

* Cosine is a pure column expression (``zip_with`` + ``aggregate``) —
  no Python in the loop. For very wide vectors a Pandas-UDF matmul
  variant would win on constant factors; at d=64 the JVM expression is
  already memory-bound on the scan.
* Query sets are broadcast; the big side never shuffles for scoring.
* Brute-force all-pairs is quadratic by definition and flagged as the
  baseline; ``ann_lsh_topk``/``embedding_near_dup_lsh`` shard the same
  computation by LSH bucket, turning it into an equi-join whose cost
  follows bucket occupancy.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product of two ``array<double>`` columns —
    accumulation order matches the SQL oracle's ``list_reduce``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return dot(ad, bd) / (norm(ad) * norm(bd))


def hyperplanes(num_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes (uniform [-1, 1), seeded) —
    shared with the SQL oracle."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(num_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id: bit p is 1 iff dot(vec, plane_p) >= 0."""
    vd = vec.cast("array<double>")
    bucket: Column = F.lit(0)
    for p, plane in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vd, lit) >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def cosine_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k nearest to the vector with ``query_id`` ->
    ``(vec_id, cos)`` ordered by (cos desc, vec_id). The single query row
    is broadcast; scoring happens inside the scan stage."""
    # the broadcast query row's norm is computed once (it used to be
    # re-folded per corpus row); corpus rows still pay dot + own norm
    q = vectors.where(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    scored = vectors.where(F.col(id_col) != query_id).crossJoin(
        F.broadcast(q)
    )
    vd = F.col(vec_col).cast("array<double>")
    return (
        scored.select(
            F.col(id_col).alias("vec_id"),
            F.round(
                dot(vd, F.col("__qv")) / (norm(vd) * F.col("__qn")), 6
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def mmr_rerank(
    vectors: DataFrame,
    *,
    query_id: int,
    n_candidates: int,
    k: int,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking of the brute-force top
    ``n_candidates`` for one query -> ``(rank, vec_id, mmr_score)``:
    greedily pick ``k`` results maximizing
    ``lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)``
    (first pick = ``lam * rel``; ties break on vec_id) — the standard
    relevance-vs-diversity rerank between retrieval and a RAG prompt.

    Scale shape: relevance top-N is the DISTRIBUTED leg (broadcast query
    row, scan-stage scoring, TakeOrderedAndProject — the corpus never
    shuffles); the N×N candidate similarity matrix and the O(k·N) greedy
    run on the collected candidate set, which is bounded by the
    PLAN-TIME constant ``n_candidates`` (the same bounded-side-collect
    contract as :func:`knn_join_vectorized`'s query side — never
    corpus-sized). Determinism: rel and sim are rounded to 6 decimals
    before the greedy, score arithmetic is plain IEEE doubles on those
    rounded inputs, and the output score is floor-quantized — the DuckDB
    twin (oracle_vec.mmr_rerank_sql) replays the identical selection.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("mmr_rerank needs 0 <= lam <= 1")
    if not 2 <= k <= n_candidates:
        raise ValueError("mmr_rerank needs 2 <= k <= n_candidates")
    cand = cosine_topk(
        vectors, query_id=query_id, k=n_candidates,
        id_col=id_col, vec_col=vec_col,
    )
    cvecs = cand.join(
        vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
        ),
        "vec_id",
    )
    # ONE action against the distributed plan: collect the candidate
    # snapshot (id, rel, vector) — ≤ n_candidates rows — then derive
    # BOTH rel and the pairwise sims from that single snapshot, so a
    # concurrently-changing source table cannot make the rel dict and
    # the sim matrix diverge mid-greedy. The pair cosines still run
    # through the SAME Spark `cosine` expression (on a local DataFrame
    # built from the snapshot), keeping the arithmetic bit-identical to
    # the oracle's replay.
    spark = vectors.sparkSession
    snap_rows = cvecs.select("vec_id", "cos", "__v").collect()
    snap = spark.createDataFrame(
        snap_rows, cvecs.select("vec_id", "cos", "__v").schema
    )
    a = snap.select(F.col("vec_id").alias("__a"), F.col("__v").alias("__va"))
    b = snap.select(F.col("vec_id").alias("__b"), F.col("__v").alias("__vb"))
    pair_rows = (
        a.join(F.broadcast(b), F.col("__a") != F.col("__b"))
        .select(
            "__a",
            "__b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("__s"),
        )
        .collect()
    )
    # rel comes from the candidate snapshot itself, NOT the pair join —
    # a single-candidate result set has no pairs but must still rank
    rel: dict[int, float] = {r["vec_id"]: r["cos"] for r in snap_rows}
    sim: dict[tuple[int, int], float] = {}
    for r in pair_rows:
        sim[(r["__a"], r["__b"])] = r["__s"]
    remaining = sorted(rel)
    selected: list[tuple[int, float]] = []
    lam = float(lam)
    for _ in range(min(k, len(remaining))):
        best = None
        for c in remaining:
            penalty = max(
                (sim[(c, s)] for s, _ in selected), default=0.0
            )
            score = lam * rel[c] - (1.0 - lam) * penalty
            if best is None or score > best[1] or (
                score == best[1] and c < best[0]
            ):
                best = (c, score)
        selected.append(best)
        remaining.remove(best[0])
    out = [
        (i + 1, vid, math.floor(score * 1e6 + 0.5) / 1e6)
        for i, (vid, score) in enumerate(selected)
    ]
    return spark.createDataFrame(
        out, "rank int, vec_id long, mmr_score double"
    )


def knn_join(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbors for every query row ->
    ``(query_id, neighbor_id, cos, rank)``.

    Broadcast the query set, score in the scan stage, per-query top-k via
    ranked window — the shuffle moves only (query_id, candidate) rows.
    """
    # norms and double-casts computed ONCE per row on each side of the
    # broadcast join (Catalyst keeps per-side Projects below the join),
    # so a (row, query) pair costs one dot fold instead of three — the
    # same measured-2x prenorm trade as embedding_near_dup_lsh
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    scored = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .withColumn("__n", norm(F.col("__v")))
        .crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        # zero-norm rows are excluded BEFORE the division: ANSI Spark
        # raises on 0/0, and a NaN cosine would sort first desc anyway.
        # Mirrored as `dot(x, x) > 0` in oracle_vec._exact_topk_cte.
        .where((F.col("__n") > 0) & (F.col("__qn") > 0))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__v"), F.col("__qv"))
                / (F.col("__n") * F.col("__qn")),
                6,
            ).alias("cos"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
    )
    return scored.withColumn("rank", rank).where(F.col("rank") <= k)


def knn_join_vectorized(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized twin of :func:`knn_join` — the constant-factor
    scale path: the (small) query set ships to every task as a
    normalized numpy matrix, each Arrow batch of vectors scores against
    it with ONE BLAS matmul, and only the per-batch top-k survive into
    the final ranked reduction (so the shuffle carries <= k rows per
    query per batch, not the full score matrix).

    Results match :func:`knn_join` to float64 round-off (BLAS reorders
    the additions), so this variant is for throughput, not for the
    bit-exact oracle gate.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    q_rows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    ).collect()
    q_ids = np.array([r.qid for r in q_rows], dtype=np.int64)
    Q = np.array([r.qv for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            C = Mn @ Qn.T  # (batch, num_queries)
            C[ids[:, None] == q_ids[None, :]] = -np.inf  # self-matches
            take = min(k, C.shape[0])
            top = np.argpartition(-C, take - 1, axis=0)[:take]  # per query
            qix = np.repeat(np.arange(len(q_ids)), take)
            nix = top.T.ravel()
            yield pd.DataFrame(
                {
                    "query_id": q_ids[qix],
                    "neighbor_id": ids[nix],
                    "cos": C[nix, qix],
                }
            )[lambda d: np.isfinite(d["cos"])]

    partial = vectors.select(id_col, vec_col).mapInPandas(score, out_schema)
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
    )
    return (
        partial.withColumn("cos", F.round("cos", 6))
        .withColumn("rank", rank)
        .where(F.col("rank") <= k)
    )


def ann_lsh_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    num_planes: int,
    seed: int = 13,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket filter, then exact
    cosine rerank inside the query's bucket -> ``(vec_id, cos)``.

    The bucket predicate prunes the scan to ~|data| / 2^num_planes rows
    before any scoring; recall comes from bucket collision probability
    (1 - theta/pi per plane). ``probe_hamming > 0`` enables multiprobe:
    buckets within that many sign flips of the query's bucket also
    qualify (near-boundary neighbors live there), trading scan fraction
    ~C(num_planes, h)/2^num_planes for recall — still deterministic and
    oracle-mirrorable (bit_count(xor(...)) predicate).
    """
    return _ann_lsh(
        vectors, query_id=query_id, k=k, num_planes=num_planes, seed=seed,
        dim=dim, id_col=id_col, vec_col=vec_col, probe_hamming=0,
    )


def ann_lsh_multiprobe_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    num_planes: int,
    probe_hamming: int = 1,
    seed: int = 13,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multiprobe variant of :func:`ann_lsh_topk` (see there)."""
    return _ann_lsh(
        vectors, query_id=query_id, k=k, num_planes=num_planes, seed=seed,
        dim=dim, id_col=id_col, vec_col=vec_col, probe_hamming=probe_hamming,
    )


def _ann_lsh(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    num_planes: int,
    seed: int,
    dim: int,
    id_col: str,
    vec_col: str,
    probe_hamming: int,
) -> DataFrame:
    planes = hyperplanes(num_planes, dim, seed)
    # prenorm: see embedding_near_dup_lsh — one dot fold per probed pair
    with_bucket = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("__n", norm(F.col("__v")))
    q = with_bucket.where(F.col("vec_id") == query_id).select(
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        F.col("bucket").alias("qbucket"),
    )
    near = (
        F.bit_count(
            F.col("bucket").bitwiseXOR(F.col("qbucket")).cast("long")
        )
        <= probe_hamming
    )
    return (
        with_bucket.crossJoin(F.broadcast(q))
        .where(near & (F.col("vec_id") != query_id))
        .select(
            "vec_id",
            F.round(
                dot(F.col("__v"), F.col("__qv"))
                / (F.col("__n") * F.col("__qn")),
                6,
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def _sq_l2(a: Column, b: Column) -> Column:
    """Sequential-sum squared L2 distance between two array<double> cols."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_lists(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest-centroid assignment, fully scan-stage: the centroid
    relation is packed into ONE array cell (a 1-row aggregate —
    kilobytes), broadcast, and each vector computes its argmin with an
    ``array_min`` over a ``transform`` of that array — a per-row loop,
    not a plan-time unrolled literal tree (BASELINE.md: giant literal
    trees go 4x slower), and NOT a |rows| x num_lists fan-out + per-id
    re-aggregation (the r11 shape: its ``groupBy(id)`` re-shuffled the
    corpus WITH its vector payload on every assignment — guide §2.3's
    "shuffle keys, not payloads" violated by the assignment itself).
    Tie order matches the old ``min_by`` exactly: ``array_min`` over
    ``struct(d2, list_id)`` compares lexicographically."""
    vd = F.col(vec_col).cast("array<double>")
    crow = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("list_id"), F.col("centroid")))
        ).alias("__cl")
    )
    best = F.array_min(
        F.transform(
            F.col("__cl"),
            lambda c: F.struct(
                _sq_l2(vd, c["centroid"]).alias("__d2"),
                c["list_id"].alias("list_id"),
            ),
        )
    )
    return (
        vectors.crossJoin(F.broadcast(crow))
        .withColumn("__best", best)
        .select(
            F.col(id_col),
            F.col("__best.list_id").alias("list_id"),
            F.col(vec_col),
        )
    )


def ivf_index(
    vectors: DataFrame,
    *,
    num_lists: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantizer: seed centroids = the
    ``num_lists`` lowest-id vectors, refined with ONE Lloyd step
    (per-dimension mean of assigned vectors), then every vector assigned
    to its nearest centroid -> (assigned DataFrame with ``list_id``,
    centroid DataFrame ``(list_id, centroid)``). At scale the assignment
    is the partition/sort key for data at rest, exactly like the iSAX
    bucket column.

    The corpus stays distributed; the centroid relation (num_lists
    rows) is MATERIALIZED via the bounded-collect convention
    (cluster._materialize_small, r12.3) and re-broadcast as a local
    relation — the lazy chain re-evaluated seed scan + provisional
    assignment + Lloyd mean once per downstream reference (the
    IVF/PQ recall family's plans carried 16-38 corpus scans). No
    num_lists x dim literal expression tree (the previous form; see
    _assign_lists). The Lloyd means use one map-side-combinable groupBy
    with dim bounded aggregation state per list.

    Deterministic by construction (no RNG, fixed iteration count,
    struct-ordered argmin ties), so the driver gate oracle-checks
    :func:`ivf_topk` at full probe (== exact top-k); partial-probe
    recall is property-tested against brute force.
    """
    from symtseries_spark.operators.cluster import _materialize_small

    seeds = _materialize_small(
        vectors.orderBy(id_col)
        .limit(num_lists)
        .select(
            # unpartitioned window is BOUNDED: runs over the
            # num_lists-row seed table, never the corpus
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("list_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
    )
    if not refine:
        # seed-only quantizer: centroids are raw data vectors, so a SQL
        # twin needs NO cross-engine mean arithmetic — the parity-safe
        # variant the oracle-gated recall query uses (a Lloyd mean's
        # summation order differs between engines; sub-ulp drift there
        # could flip an argmin assignment)
        assigned = _assign_lists(vectors, seeds, id_col=id_col, vec_col=vec_col)
        return assigned, seeds
    provisional = _assign_lists(vectors, seeds, id_col=id_col, vec_col=vec_col)
    vd = F.col(vec_col).cast("array<double>")
    means = (
        provisional.select("list_id", vd.alias("__v"))
        .groupBy("list_id")
        .agg(*[F.avg(F.element_at("__v", i + 1)).alias(f"__m{i}") for i in range(dim)])
        .select(
            "list_id",
            F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias("centroid"),
        )
    )
    # every list contains at least its own seed vector, but keep the seed
    # as a fallback so an empty list can never produce a NULL centroid
    refined = _materialize_small(
        seeds.select("list_id", F.col("centroid").alias("__seed"))
        .join(means, "list_id", "left")
        .select(
            "list_id", F.coalesce("centroid", "__seed").alias("centroid")
        )
    )
    assigned = _assign_lists(vectors, refined, id_col=id_col, vec_col=vec_col)
    return assigned, refined


def ivf_topk_batch(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Batched IVF search — the production shape: a whole QUERY BATCH
    rides one plan instead of one plan per query. ``queries`` is any
    (id, vector) frame (an incoming ingest batch, a training shard);
    output is ``(query_id, vec_id, d2)``, top-``k`` per query by
    squared L2.

    Scale shape: probe selection is queries x broadcast centroids
    with a per-query ``row_number`` window (partitioned by query —
    never a global sort); the candidate join broadcasts the
    ``|queries| x nprobe`` probe table (each row carrying its query
    vector) against the assignment table, so the corpus is scanned
    ONCE for the whole batch and the scan fraction stays
    ~``nprobe/num_lists`` per query. Adding queries adds broadcast
    rows and rerank arithmetic — no new corpus passes, no per-query
    driver loop. Seed-only quantizer (``refine=False``) for
    cross-engine parity, same as the recall-audit rows."""
    if k < 1 or nprobe < 1:
        raise ValueError("ivf_topk_batch needs k >= 1 and nprobe >= 1")
    assigned, centroids = ivf_index(
        vectors, num_lists=num_lists, dim=dim, id_col=id_col,
        vec_col=vec_col, refine=False,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    scored = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "__qv",
        "list_id",
        _sq_l2(F.col("centroid"), F.col("__qv")).alias("__d2"),
    )
    wp = Window.partitionBy("query_id").orderBy("__d2", "list_id")
    probe = (
        scored.withColumn("__r", F.row_number().over(wp))
        .where(F.col("__r") <= nprobe)
        .select("query_id", "__qv", "list_id")
    )
    cand = (
        assigned.join(F.broadcast(probe), "list_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            _sq_l2(
                F.col(vec_col).cast("array<double>"), F.col("__qv")
            ).alias("__d2"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy("__d2", "vec_id")
    return (
        cand.withColumn("__r", F.row_number().over(wk))
        .where(F.col("__r") <= k)
        .select(
            "query_id", "vec_id", F.round("__d2", round_to).alias("d2")
        )
    )


def ivf_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    num_lists: int,
    nprobe: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroid lists nearest
    to the query, exact cosine rerank inside them -> ``(vec_id, cos)``.
    Probe selection is a broadcast join of the (tiny) centroid table
    against the query vector — no driver round-trip; the probed-list
    filter is a broadcast semi-join on ``list_id``, which dynamic
    partition pruning turns into a partition-pruned scan when
    assignments are stored partitioned by ``list_id``. At
    ``nprobe == num_lists`` the result is exactly the brute-force top-k
    (every list scanned), which is what the driver's DuckDB oracle
    checks; partial probe trades recall for scan fraction
    ~nprobe/num_lists."""
    assigned, centroids = ivf_index(
        vectors, num_lists=num_lists, dim=dim, id_col=id_col, vec_col=vec_col
    )
    q = vectors.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv")
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "list_id",
            _sq_l2(F.col("centroid"), F.col("__qv").cast("array<double>")).alias("__d2"),
        )
        .orderBy("__d2", "list_id")
        .limit(nprobe)
        .select("list_id")
    )
    # prenorm both sides of the rerank (one dot fold per probed row)
    qn = q.select(
        F.col("__qv").cast("array<double>").alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    cand = (
        assigned.join(F.broadcast(probe), "list_id")
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("__vd"),
        )
        .withColumn("__n", norm(F.col("__vd")))
    )
    return (
        cand.crossJoin(F.broadcast(qn))
        .select(
            "vec_id",
            F.round(
                dot(F.col("__vd"), F.col("__qv"))
                / (F.col("__n") * F.col("__qn")),
                6,
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def embedding_near_dup(
    vectors: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 50_000,
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold over all pairs
    -> ``(vec_a, vec_b, cos)``.

    **TEST/VALIDATION ONLY — O(n²) by construction.** This is the
    exactness baseline used to measure the recall of the scale path;
    do NOT run it on production-sized tables. The canonical near-dup
    operator is :func:`embedding_near_dup_lsh` (bucketed equi-join,
    cost follows bucket occupancy), which is the one a 100 TB pipeline
    should call.

    ``max_rows`` is the quarantine gate: the operator counts the input
    up front (for a parquet scan this is footer metadata, no data read)
    and raises ``ValueError`` above the bound instead of launching an
    O(n²) job — so the registered validation query can never be billed
    at a scale where the baseline stops being a baseline. Pass a larger
    ``max_rows`` explicitly to accept the quadratic cost on purpose.

    Per-pair work is a single dot product: each row's norm is computed
    ONCE before the join (the same double value the per-pair formula
    would produce, so the oracle still agrees bit-for-bit), and the probe
    side is repartitioned so the nested-loop join runs one task per core
    instead of inheriting the scan's (often single) partitioning.
    """
    n_rows = vectors.count()
    if n_rows > max_rows:
        raise ValueError(
            f"embedding_near_dup is the O(n²) exactness baseline and is "
            f"quarantined above max_rows={max_rows} (input has {n_rows} "
            f"rows) — use embedding_near_dup_lsh for production scale, "
            f"or pass max_rows explicitly to accept the quadratic cost"
        )
    base = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__norm", norm(F.col("__v")))
    parallelism = vectors.sparkSession.sparkContext.defaultParallelism
    a = base.select(
        F.col("vid").alias("vec_a"), F.col("__v").alias("__va"),
        F.col("__norm").alias("__na"),
    ).repartition(parallelism)
    b = base.select(
        F.col("vid").alias("vec_b"), F.col("__v").alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_near_dup_lsh(
    vectors: DataFrame,
    *,
    threshold: float,
    num_planes: int,
    seed: int = 13,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed near-dup pairs: candidates share a hyperplane bucket
    (equi-join), verified with exact cosine. Misses cross-bucket pairs by
    design — the standard recall/cost trade; lower ``num_planes`` or add
    multiprobe for higher recall.

    Pair-verification cost model: in-bucket candidate volume is
    O(sum C(bucket, 2)), so per-pair arithmetic is the hot loop. Each
    row's norm and double-cast are computed ONCE before the join (same
    doubles the per-pair formula would produce — oracle-identical), so
    a pair costs one dot fold instead of three: measured 2x end-to-end
    (3.9-4.6s -> 1.8-2.5s warm at sf0.1). Measured dead end, for the
    record: replacing the fold with a 64-term unrolled element_at
    addition chain (identical accumulation order) is SLOWER than the
    interpreted fold (6.2-6.9s vs 4.0s warm) — the fold's single array
    traversal beats codegen'd per-element bounds-checked lookups; and
    putting the array<double> cast inside the unrolled chain
    re-evaluates it per element, a ~50x cliff."""
    planes = hyperplanes(num_planes, dim, seed)
    with_bucket = vectors.select(
        F.col(id_col).alias("vid"),
        # cast to double ONCE per row, before the fan-out — the unrolled
        # pair dot must never pay a per-element array cast
        F.col(vec_col).cast("array<double>").alias("__v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("__n", norm(F.col("__v")))
    a = with_bucket.select(
        F.col("vid").alias("vec_a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"), "bucket",
    )
    b = with_bucket.select(
        F.col("vid").alias("vec_b"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"), "bucket",
    )
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= threshold)
        .distinct()
    )


def _recall_vs_exact(
    q_ids: DataFrame, approx: DataFrame, exact: DataFrame, *, k: int
) -> DataFrame:
    """Join an approximate per-query top-k against the exact one ->
    ``(query_id, n_approx, n_hit, recall)`` with ``recall = n_hit / k``.
    All three inputs are per-query small (≤ k rows each), so the joins
    are broadcast-sized regardless of corpus size.

    ``approx`` feeds BOTH the count and the hit legs, and its lineage
    is each caller's whole approximate-search pipeline — so it is
    persisted here (r12; ≤ panel*k rows) to run that pipeline once,
    not twice, in every recall query. The per-query count legs are
    explicitly BROADCAST into the panel join: they are panel-bounded
    by construction, and without the hint the tiny cached relation's
    coalesced (single-partition) output drags the probe side through
    an ENSURE_REQUIREMENTS single-partition exchange."""
    from ..cache import persist_tracked

    approx = persist_tracked(approx)
    a_cnt = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    h_cnt = (
        approx.join(
            F.broadcast(
                exact.select(
                    "query_id", F.col("neighbor_id").alias("cand_id")
                )
            ),
            ["query_id", "cand_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        q_ids.join(F.broadcast(a_cnt), "query_id", "left")
        .join(F.broadcast(h_cnt), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_approx", F.lit(0)).alias("n_approx"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.lit(float(k)),
                6,
            ).alias("recall"),
        )
    )


def ann_lsh_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    num_planes: int,
    seed: int = 13,
    dim: int = 64,
    probe_hamming: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the LSH approximate top-k vs the exact top-k, for the
    query panel ``id < max_query_id`` -> ``(query_id, n_approx, n_hit,
    recall)`` — approximation quality as a FIRST-CLASS query result, not
    just a property test (r3 verdict item #8).

    Both legs are the registered operators' own plans: the approximate
    leg is the multi-query generalization of :func:`ann_lsh_topk`
    (bucket/multiprobe predicate against a broadcast query panel, exact
    cosine rerank inside the probed buckets); the exact leg is
    :func:`knn_join`. Deterministic end to end (seeded planes, rounded
    cosines, (cos desc, id) rank ties), so the DuckDB twin
    (oracle_vec.ann_lsh_recall_sql) reproduces it hash-exactly."""
    planes = hyperplanes(num_planes, dim, seed)
    # prenorm: see embedding_near_dup_lsh — one dot fold per probed pair
    with_bucket = vectors.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("__n", norm(F.col("__v")))
    q = with_bucket.where(F.col("cand_id") < max_query_id).select(
        F.col("cand_id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__n").alias("__qn"),
        F.col("bucket").alias("qbucket"),
    )
    near = (
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket")).cast("long"))
        <= probe_hamming
    )
    scored = (
        with_bucket.join(
            F.broadcast(q), near & (F.col("cand_id") != F.col("query_id"))
        )
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("__v"), F.col("__qv"))
                / (F.col("__n") * F.col("__qn")),
                6,
            ).alias("cos"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("cand_id")
        )
    )
    approx = scored.withColumn("__r", rank).where(F.col("__r") <= k)
    exact = knn_join(
        vectors,
        vectors.where(F.col(id_col) < max_query_id),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
    )
    return _recall_vs_exact(
        q.select("query_id"), approx.select("query_id", "cand_id"), exact, k=k
    )


def ivf_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    num_lists: int,
    nprobe: int,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of PARTIAL-probe IVF vs the exact top-k for the query
    panel ``id < max_query_id`` -> ``(query_id, n_approx, n_hit,
    recall)`` — the driver-visible recall record for the IVF leg (the
    full-probe query proves exactness; this one quantifies the
    recall/scan-fraction trade at ``nprobe < num_lists``).

    Uses the seed-only quantizer (``ivf_index(refine=False)``): the
    centroids are raw data vectors, so the DuckDB twin can reproduce the
    assignment with zero cross-engine mean arithmetic (a Lloyd mean's
    summation order differs between engines and sub-ulp drift could flip
    an argmin). The probe/rerank plan is ivf_topk's own: per-query
    nearest-``nprobe`` centroid selection against a broadcast panel,
    candidate filter by probed list_id, exact cosine rerank."""
    assigned, centroids = ivf_index(
        vectors,
        num_lists=num_lists,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        refine=False,
    )
    q = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    probe_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy("__d2", "list_id")
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "list_id",
            _sq_l2(F.col("centroid"), F.col("__qv")).alias("__d2"),
        )
        .withColumn("__pr", probe_rank)
        .where(F.col("__pr") <= nprobe)
        .select("query_id", "list_id")
    )
    qn = q.withColumn("__qn", norm(F.col("__qv"))).select(
        "query_id", "__qv", "__qn"
    )
    cand = (
        assigned.select(
            "list_id",
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).cast("array<double>").alias("__vd"),
        )
        .withColumn("__n", norm(F.col("__vd")))
        .join(F.broadcast(probe), "list_id")
        .join(F.broadcast(qn), "query_id")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("__vd"), F.col("__qv"))
                / (F.col("__n") * F.col("__qn")),
                6,
            ).alias("cos"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("cand_id")
        )
    )
    approx = cand.withColumn("__r", rank).where(F.col("__r") <= k)
    exact = knn_join(
        vectors,
        vectors.where(F.col(id_col) < max_query_id),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
    )
    return _recall_vs_exact(
        q.select("query_id"), approx.select("query_id", "cand_id"), exact, k=k
    )


def truncated_dim_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    trunc_dim: int,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: DataFrame | None = None,
) -> DataFrame:
    """Recall@k of TRUNCATED-dimension cosine search vs the full-dim
    exact top-k, for the query panel ``id < max_query_id`` ->
    ``(query_id, n_approx, n_hit, recall)`` — the Matryoshka-style
    (Kusupati et al. 2022) dimension/quality trade, driver-visible
    like the LSH/IVF recall reports.

    The approximate leg scores candidates on only the FIRST
    ``trunc_dim`` components (cosine renormalized over the prefix) —
    the at-scale play where a prefix scan reads ``trunc_dim/dim`` of
    the vector bytes (with Parquet column-of-arrays this is a cheaper
    decode; with a materialized prefix column it is true byte-level
    pruning, the sources-layout story). The exact leg is
    :func:`knn_join`'s full-dim plan. Deterministic: both legs round
    cosines to 6 decimals and rank with the (cos desc, id) tiebreak,
    and the truncated dot folds the same left-to-right prefix order as
    the oracle's unrolled expression.
    """
    if not 1 <= trunc_dim <= dim:
        raise ValueError("truncated_dim_recall needs 1 <= trunc_dim <= dim")
    if k < 1:
        raise ValueError("truncated_dim_recall needs k >= 1")
    v = F.col(vec_col).cast("array<double>")
    # Zero-norm guard (the knn_join convention): an all-zero PREFIX of
    # a nonzero vector would make the renormalized cosine 0/0 — an
    # ANSI-mode abort — and the exact leg excludes zero-norm rows
    # anyway, so drop them from both roles before the division.
    base = vectors.select(
        F.col(id_col).alias("cand_id"),
        F.slice(v, 1, trunc_dim).alias("__v"),
    ).where(norm(F.col("__v")) > 0)
    q = base.where(F.col("cand_id") < max_query_id).select(
        F.col("cand_id").alias("query_id"), F.col("__v").alias("__qv")
    )
    scored = base.join(
        F.broadcast(q), F.col("cand_id") != F.col("query_id")
    ).select(
        "query_id",
        "cand_id",
        F.round(
            dot(F.col("__v"), F.col("__qv"))
            / (norm(F.col("__v")) * norm(F.col("__qv"))),
            6,
        ).alias("cos"),
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("cand_id")
        )
    )
    approx = scored.withColumn("__r", rank).where(F.col("__r") <= k)
    if exact is None:
        # shared-panel callers (emb_compression_tradeoff) pass the
        # persisted truth once instead of re-folding corpus×panel here
        exact = knn_join(
            vectors,
            vectors.where(F.col(id_col) < max_query_id),
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=id_col,
            query_vec_col=vec_col,
        )
    return _recall_vs_exact(
        q.select("query_id"), approx.select("query_id", "cand_id"), exact, k=k
    )


def knn_label_accuracy(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN majority-vote label prediction for the query panel
    ``id < max_query_id`` -> ``(query_id, own_label, pred_label,
    n_votes, is_correct)`` — the embedding-quality eval a training
    pipeline runs on a labeled probe set: if k nearest neighbors can't
    recover a point's own label, the embedding space isn't separating
    that class. Uses :func:`knn_join`'s broadcast-panel plan (the
    query point itself is excluded), then a label vote with the
    deterministic (votes desc, label asc) tiebreak, so the whole eval
    is oracle-exact. Cost: |panel| x corpus scored in-scan, only
    (query, candidate) rows shuffle."""
    if max_query_id < 1 or k < 1:
        raise ValueError("knn_label_accuracy needs max_query_id/k >= 1")
    nn = knn_join(
        vectors,
        vectors.where(F.col(id_col) < max_query_id),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
    )
    lbl = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__nl")
    )
    votes = (
        nn.join(lbl, "neighbor_id")
        .groupBy("query_id", "__nl")
        .agg(F.count(F.lit(1)).alias("__nv"))
    )
    pick = votes.groupBy("query_id").agg(
        F.min(
            F.struct((-F.col("__nv")).alias("__neg"), F.col("__nl").alias("__lb"))
        ).alias("__p")
    )
    own = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("own_label")
    )
    return own.join(pick, "query_id").select(
        "query_id",
        "own_label",
        F.col("__p.__lb").alias("pred_label"),
        (-F.col("__p.__neg")).alias("n_votes"),
        (F.col("__p.__lb") == F.col("own_label")).alias("is_correct"),
    )


def jl_signs(out_dim: int, dim: int, tag: str = "jl") -> list[list[int]]:
    """Deterministic ±1 Johnson-Lindenstrauss sign matrix, ``out_dim``
    rows of ``dim`` signs. ``s[j][i]`` is +1 iff the 60-bit md5 integer
    of ``"{tag}:{j}:{i}"`` is even — the same engine-independent
    ``int(md5(s)[:15], 16)`` convention as ``functions.text.doc_hash60``,
    but evaluated DRIVER-side with hashlib so the Spark operator and the
    DuckDB oracle consume the identical literal matrix (no per-row
    hashing in either engine; the matrix is out_dim x dim literals)."""
    import hashlib

    def sign(j: int, i: int) -> int:
        h = hashlib.md5(f"{tag}:{j}:{i}".encode()).hexdigest()[:15]
        return 1 if int(h, 16) % 2 == 0 else -1

    return [[sign(j, i) for i in range(dim)] for j in range(out_dim)]


def jl_project(
    vectors: DataFrame,
    *,
    out_dim: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tag: str = "jl",
) -> DataFrame:
    """Random-sign Johnson-Lindenstrauss projection of ``dim``-dim
    vectors down to ``out_dim`` components -> ``(id, jl array<double>)``.

    Each output component is the left-to-right fold ``0.0 + s[1]*x[1]
    + s[2]*x[2] + ...`` with ±1.0 coefficients from :func:`jl_signs`
    (Achlioptas 2003: ±1 entries satisfy the JL lemma with the same
    distortion bounds as Gaussian entries). ``x * ±1.0`` is exact in
    IEEE doubles, so the values are bit-identical to the oracle's
    coefficient-free ``0.0 ± x[1] ± x[2] ...`` left-assoc chain. The
    conventional ``1/sqrt(out_dim)`` scale is deliberately omitted —
    downstream scoring is cosine, which is scale-invariant.

    Form choice (measured, sf0.1 local[8]): the matrix-multiply runs
    as ``transform(literal sign matrix, row -> dot(row, x))`` —
    interpreted higher-order functions, ~8.2 us/row marginal at
    16 x 64 — NOT as out_dim flat codegen'd add-chains, which
    evaluate marginally faster (~6.7 us/row) but pay a ~3 s fixed
    compile/fallback cost PER PLAN for the 1024-term expression
    (5.5 s vs 0.6 s end-to-end on 2k rows; still 2x slower at 200k).
    The opposite trade-off from operators/rank.py's bucket scan,
    where the fold lost — there the flat alternative was small enough
    to stay cheap to compile.

    Scale shape: a pure scan-stage projection (no shuffle, no UDF,
    no per-row hashing — the sign matrix is out_dim x dim literals),
    the narrow transform that makes every downstream ANN join read
    ``out_dim/dim`` of the vector bytes."""
    if not 1 <= out_dim:
        raise ValueError("jl_project needs out_dim >= 1")
    if dim < 1:
        raise ValueError("jl_project needs dim >= 1")
    signs = jl_signs(out_dim, dim, tag)
    mat = F.array(
        *[F.array(*[F.lit(float(s)) for s in row]) for row in signs]
    )
    v = F.col(vec_col).cast("array<double>")
    return vectors.select(
        F.col(id_col),
        F.transform(mat, lambda row: dot(row, v)).alias("jl"),
    )


def jl_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    out_dim: int,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tag: str = "jl",
) -> DataFrame:
    """Recall@k of cosine search in the ``out_dim``-dim JL-projected
    space vs the full-dim exact top-k, for the query panel ``id <
    max_query_id`` -> ``(query_id, n_approx, n_hit, recall)``.

    The data-independent sibling of :func:`truncated_dim_recall`: the
    Matryoshka prefix assumes the embedding model front-loaded the
    information; JL random signs need no such training and mix every
    input dimension into each output — the right at-rest compression
    when the embedding is NOT Matryoshka-trained. Deterministic like
    the other recall legs: cosines rounded to 6 decimals, (cos desc,
    id) tiebreak, fold order matching the oracle's ``list_reduce``."""
    if k < 1:
        raise ValueError("jl_recall needs k >= 1")
    from ..cache import persist_tracked

    # MATERIALIZE the projection before the scoring join: unpersisted,
    # the out_dim x dim add-chain is an inline expression that the join
    # re-evaluates per PAIR per operand use (~6x per pair at k queries
    # — measured 5.9s vs 1.2s for the trunc sibling at sf0.1). At rest
    # this column is written once next to the index (docs/SCALING.md);
    # the persist is the query-time twin of that layout.
    base = persist_tracked(
        jl_project(
            vectors, out_dim=out_dim, dim=dim, id_col=id_col,
            vec_col=vec_col, tag=tag,
        ).select(F.col(id_col).alias("cand_id"), F.col("jl").alias("__v"))
    )
    # Zero-norm guard (the knn_join convention): an all-zero or
    # exactly-cancelling JL projection would make the cosine 0/0 — an
    # ANSI-mode abort — and the exact leg excludes zero-norm rows
    # anyway, so drop them from both roles before the division.
    base = base.where(norm(F.col("__v")) > 0)
    q = base.where(F.col("cand_id") < max_query_id).select(
        F.col("cand_id").alias("query_id"), F.col("__v").alias("__qv")
    )
    scored = base.join(
        F.broadcast(q), F.col("cand_id") != F.col("query_id")
    ).select(
        "query_id",
        "cand_id",
        F.round(
            dot(F.col("__v"), F.col("__qv"))
            / (norm(F.col("__v")) * norm(F.col("__qv"))),
            6,
        ).alias("cos"),
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("cand_id")
        )
    )
    approx = scored.withColumn("__r", rank).where(F.col("__r") <= k)
    exact = knn_join(
        vectors,
        vectors.where(F.col(id_col) < max_query_id),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
    )
    return _recall_vs_exact(
        q.select("query_id"), approx.select("query_id", "cand_id"), exact, k=k
    )
