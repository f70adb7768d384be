"""Product quantization (PQ) for embedding compression + ADC search.

The third leg of the ANN stool next to hyperplane LSH (bucket pruning)
and IVF (coarse partitioning): PQ compresses each vector to ``m`` small
codes (here m bytes-ish), and queries scan the CODES with an
asymmetric-distance (ADC) lookup table instead of the raw floats. At
100 TB the codes table is ~dim*4/m x smaller than the embeddings —
often the difference between an in-cluster scan and an impossible one —
and the ADC probe is one broadcast-LUT join + per-vector partial top-k.

Determinism (what makes this oracle-checkable): codebooks are NOT
k-means — per subspace, the ``ks`` centroids are the subvectors of the
``ks`` lowest-id vectors (the same seed convention as
:func:`simsearch.ivf_index`), assignments break distance ties by code,
and every float reduction is a fixed-order sequential fold, so any
engine replays the identical codes and ADC scores.

Quality note: seed-based codebooks are a placeholder for one-or-more
Lloyd refinement steps (exactly as ``ivf_index`` does for its coarse
quantizer); recall against brute force is property-tested, and the
full-probe/ADC pipeline is what the driver oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .simsearch import _sq_l2

__all__ = ["int8_quantize_stats", "pq_codebook", "pq_encode", "pq_topk"]


def int8_quantize_stats(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 8,
) -> DataFrame:
    """Per-vector symmetric int8 quantization audit — the storage-format
    decision data for an embedding corpus: ``scale = max|v_i| / 127``,
    ``q_i = clamp(floor(v_i / scale + 0.5), -127, 127)``, emitting
    ``(vec_id, scale, code_sum, mse)`` where ``code_sum`` is the integer
    checksum of the codes and ``mse`` the sequential-fold mean squared
    dequantization error. All-zero vectors emit scale 0 / codes 0.

    Int8 cuts the at-rest embedding table 4x (the difference between an
    in-cluster ANN scan and an impossible one at 100 TB); this operator
    is the audit that says whether the corpus tolerates it. Pure
    scan-stage array math — no shuffle, no UDF. Engine-reproducible by
    construction: floor(x + 0.5) quantization (not round()) and
    fixed-order fold, mirrored in oracle_vec.int8_quant_sql."""
    v = F.col(vec_col)
    absmax = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )

    def build(amax: Column) -> Column:
        scale = amax / F.lit(127.0)
        raw = F.transform(
            v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5))
        )
        codes = F.transform(
            raw,
            lambda r: F.least(F.greatest(r, F.lit(-127)), F.lit(127)),
        )
        code_sum = F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c)
        sq = F.zip_with(
            v,
            codes,
            lambda x, q: (x.cast("double") - q * scale)
            * (x.cast("double") - q * scale),
        )
        mse = F.aggregate(sq, F.lit(0.0), lambda a, e: a + e) / F.size(v)
        return F.when(
            amax > 0,
            F.struct(
                scale.alias("scale"),
                code_sum.alias("code_sum"),
                mse.alias("mse"),
            ),
        ).otherwise(
            F.struct(
                F.lit(0.0).alias("scale"),
                F.lit(0).cast("long").alias("code_sum"),
                F.lit(0.0).alias("mse"),
            )
        )

    # bind absmax once (functions/sax.py _let rationale)
    s = F.element_at(F.transform(F.array(absmax), build), 1)
    q = F.lit(float(10 ** round_to))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        (F.floor(s["scale"] * q + F.lit(0.5)) / q).alias("scale"),
        s["code_sum"].alias("code_sum"),
        (F.floor(s["mse"] * q + F.lit(0.5)) / q).alias("mse"),
    )


def _subvectors(vec: Column, *, m: int, dim: int) -> Column:
    """array of m subvectors (each dim/m doubles), subspace order."""
    sub_d = dim // m
    return F.array(
        *[F.slice(vec, j * sub_d + 1, sub_d) for j in range(m)]
    )


def pq_codebook(
    vectors: DataFrame,
    *,
    m: int,
    ks: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace codebook ``(sub_id, code, centroid)``: centroids are
    the subvectors of the ``ks`` lowest-id vectors — deterministic, no
    RNG, same seed convention as the IVF coarse quantizer."""
    if dim % m:
        raise ValueError("dim must be divisible by m")
    seeds = (
        vectors.orderBy(id_col)
        .limit(ks)
        .select(
            # unpartitioned window is BOUNDED: runs over the ks-row
            # seed table (TakeOrderedAndProject), never the corpus
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("code"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    from .cluster import _materialize_small

    # bounded-collect materialization (r12.3): the m x ks codebook is
    # re-referenced by every ADC LUT build and encode pass downstream;
    # lazily chained, each reference re-ran the seed scan (the IVF/PQ
    # recall family's plans carried 16-38 corpus scans)
    return _materialize_small(
        seeds.select(
            "code",
            F.posexplode(_subvectors(F.col("__v"), m=m, dim=dim)).alias(
                "sub_id", "centroid"
            ),
        )
    )


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    *,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each vector its ``m`` codes -> ``(vec_id, codes:
    array<int>)`` (subspace order).

    Shape: posexplode each vector into m subvectors inside the scan
    stage, broadcast-join the (m*ks)-row codebook, argmin per
    (vector, subspace) with ``min_by`` over a (d2, code) struct —
    min_by partially aggregates map-side, so the shuffle carries m rows
    per vector, never the m*ks fan-out.

    ``carry`` (r12) names extra input columns to pass through to the
    output unchanged. Each must be FUNCTIONALLY DEPENDENT on ``id_col``
    (one value per id — e.g. the IVF ``list_id`` of an already-assigned
    row), so adding them to the grouping keys cannot split any group:
    the codes are bit-identical to a carry-free encode of the same rows.
    Callers that would otherwise re-join the output back to the input
    just to recover such a column (a corpus-scale self-join) should
    carry it through instead."""
    expl = vectors.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode(
            _subvectors(F.col(vec_col).cast("array<double>"), m=m, dim=dim)
        ).alias("sub_id", "__sv"),
    )
    scored = expl.join(F.broadcast(codebook), "sub_id").select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        "sub_id",
        "code",
        _sq_l2(F.col("__sv"), F.col("centroid")).alias("__d2"),
    )
    best = scored.groupBy(id_col, *carry, "sub_id").agg(
        F.min_by("code", F.struct("__d2", "code")).alias("code")
    )
    return best.groupBy(id_col, *carry).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_id", "code"))),
            lambda x: x["code"],
        ).alias("codes")
    )


def pq_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    m: int,
    ks: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """ADC top-k: build the codebook + codes, compute the query's
    (m*ks)-entry partial-distance LUT, then score every vector by
    summing its m LUT entries -> ``(vec_id, adc)``, ascending ADC.

    The LUT join is broadcast (m*ks rows); the per-vector sum shuffles
    one row per (vector, subspace) pre-aggregated map-side; the top-k is
    TakeOrderedAndProject. ADC is rounded so last-ulp sum-order noise
    cannot reorder results; ties break on vec_id."""
    codebook = pq_codebook(
        vectors, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        vectors, codebook, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    qsub = (
        vectors.where(F.col(id_col) == query_id)
        .select(
            F.posexplode(
                _subvectors(F.col(vec_col).cast("array<double>"), m=m, dim=dim)
            ).alias("sub_id", "__qv")
        )
    )
    lut = codebook.join(F.broadcast(qsub), "sub_id").select(
        "sub_id", "code", _sq_l2(F.col("centroid"), F.col("__qv")).alias("__pd")
    )
    expl = codes.select(
        F.col(id_col), F.posexplode("codes").alias("sub_id", "code")
    )
    adc = (
        expl.join(F.broadcast(lut), ["sub_id", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("__pd"), round_to).alias("adc"))
    )
    return (
        adc.where(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("vec_id"), "adc")
        .orderBy("adc", "vec_id")
        .limit(k)
    )


def ivfpq_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    m: int,
    ks: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF + PQ composed search — the FAISS ``IndexIVFPQ`` shape in
    its no-residual simplification (codes encode RAW vectors, not
    per-list residuals, so the codebook/codes are trained and written
    ONCE at rest and the ADC LUT is probe-independent): the seed-only
    IVF coarse quantizer (:func:`..simsearch.ivf_index`
    ``refine=False`` — the parity-safe variant) picks the ``nprobe``
    lists nearest the query, candidates are the vectors assigned to
    those lists, and each candidate is scored by summing its ``m``
    ADC LUT entries -> ``(vec_id, adc)`` ascending.

    At-rest layout: assignments partitioned by ``list_id`` turn the
    candidate semi-join into a partition-pruned scan (the
    emb_ivf_at_rest pattern); per query the work is one broadcast
    centroid pass + ~``nprobe/num_lists`` of the code table — never
    the corpus. Deterministic throughout (seed quantizer, (d2, code)
    tie order, rounded ADC), so the oracle replays it exactly."""
    from .simsearch import ivf_index

    if nprobe < 1:
        raise ValueError("ivfpq_topk needs nprobe >= 1")
    assigned, centroids = ivf_index(
        vectors, num_lists=num_lists, dim=dim, id_col=id_col,
        vec_col=vec_col, refine=False,
    )
    q = vectors.where(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("__qv")
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "list_id",
            _sq_l2(F.col("centroid"), F.col("__qv")).alias("__d2"),
        )
        .orderBy("__d2", "list_id")
        .limit(nprobe)
    )
    # encode ONLY the probed candidates: ``assigned`` already carries
    # the vector, so the broadcast list_id filter prunes the corpus in
    # the scan stage BEFORE the subvector explode — the previous shape
    # encoded the whole corpus and then semi-joined the codes back to
    # the candidate ids (a corpus-scale self-join on id, plus
    # num_lists/nprobe x wasted encode work). pq_encode is per-row, so
    # the surviving rows' codes are bit-identical either way.
    cand_vec = assigned.join(
        F.broadcast(probe.select("list_id")), "list_id"
    )
    codebook = pq_codebook(
        vectors, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        cand_vec, codebook, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    qsub = vectors.where(F.col(id_col) == query_id).select(
        F.posexplode(
            _subvectors(F.col(vec_col).cast("array<double>"), m=m, dim=dim)
        ).alias("sub_id", "__qs")
    )
    lut = codebook.join(F.broadcast(qsub), "sub_id").select(
        "sub_id",
        "code",
        _sq_l2(F.col("centroid"), F.col("__qs")).alias("__pd"),
    )
    expl = codes.select(
        F.col(id_col), F.posexplode("codes").alias("sub_id", "code")
    )
    adc = (
        expl.join(F.broadcast(lut), ["sub_id", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("__pd"), round_to).alias("adc"))
    )
    return (
        adc.where(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("vec_id"), "adc")
        .orderBy("adc", "vec_id")
        .limit(k)
    )


def ivfpq_residual_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    m: int,
    ks: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF + PQ with RESIDUAL encoding — the full FAISS ``IndexIVFPQ``
    shape (not :func:`ivfpq_topk`'s no-residual simplification): codes
    quantize ``v - centroid(list(v))``, which concentrates the PQ
    codebook's budget on the within-list displacement instead of the
    absolute position, so the same m x ks code budget buys lower ADC
    distortion. The price is a probe-DEPENDENT LUT: the query residual
    differs per probed list, so the ADC table is ``nprobe x m x ks``
    entries built per query (still tiny — broadcast) instead of the
    probe-independent ``m x ks``.

    Scale shape: residuals are a scan-stage ``zip_with`` subtraction
    against the broadcast centroid table; codebook/codes are trained
    and written once at rest exactly like the raw variant (residuals
    are a deterministic function of the stored assignment); per query
    the work is one broadcast centroid pass + ~``nprobe/num_lists``
    of the code table joined to the broadcast per-list LUT — never
    the corpus. Deterministic throughout (seed quantizer, seed
    codebook over the ks lowest-id residuals, (d2, code) tie order,
    rounded ADC), so the DuckDB oracle replays it exactly."""
    from .simsearch import ivf_index

    if nprobe < 1:
        raise ValueError("ivfpq_residual_topk needs nprobe >= 1")
    assigned, centroids = ivf_index(
        vectors, num_lists=num_lists, dim=dim, id_col=id_col,
        vec_col=vec_col, refine=False,
    )
    vd = F.col(vec_col).cast("array<double>")
    # residuals straight off ``assigned`` — it already carries the
    # vector, so the previous ``vectors JOIN assigned ON id`` was a
    # corpus-scale self-join re-deriving a column the relation had
    # (identical doubles: same source column, same cast, 1:1 rows)
    res = (
        assigned.join(F.broadcast(centroids), "list_id")
        .select(
            F.col(id_col),
            "list_id",
            F.zip_with(
                vd, F.col("centroid"), lambda a, b: a - b
            ).alias("__rv"),
        )
    )
    codebook = pq_codebook(
        res, m=m, ks=ks, dim=dim, id_col=id_col, vec_col="__rv"
    )
    q = vectors.where(F.col(id_col) == query_id).select(
        vd.alias("__qv")
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "list_id",
            "centroid",
            "__qv",
            _sq_l2(F.col("centroid"), F.col("__qv")).alias("__d2"),
        )
        .orderBy("__d2", "list_id")
        .limit(nprobe)
    )
    # per-list query residual -> per-list LUT (nprobe * m * ks rows)
    qres = probe.select(
        "list_id",
        F.posexplode(
            _subvectors(
                F.zip_with(
                    F.col("__qv"), F.col("centroid"), lambda a, b: a - b
                ),
                m=m,
                dim=dim,
            )
        ).alias("sub_id", "__qs"),
    )
    lut = qres.join(F.broadcast(codebook), "sub_id").select(
        "list_id",
        "sub_id",
        "code",
        _sq_l2(F.col("centroid"), F.col("__qs")).alias("__pd"),
    )
    # encode ONLY the probed lists' residuals, carrying list_id through
    # the encode (functionally dependent on id, so the codes are
    # bit-identical) — the previous shape encoded the whole corpus and
    # re-joined ``assigned`` a third time to recover list_id (another
    # corpus-scale self-join on id). The codebook above still trains on
    # the FULL residual table, so codebook/codes values are unchanged.
    codes = pq_encode(
        res.join(F.broadcast(probe.select("list_id")), "list_id"),
        codebook, m=m, dim=dim, id_col=id_col, vec_col="__rv",
        carry=("list_id",),
    )
    expl = codes.select(
        F.col(id_col),
        "list_id",
        F.posexplode("codes").alias("sub_id", "code"),
    )
    adc = (
        expl.join(F.broadcast(lut), ["list_id", "sub_id", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("__pd"), round_to).alias("adc"))
    )
    return (
        adc.where(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("vec_id"), "adc")
        .orderBy("adc", "vec_id")
        .limit(k)
    )


def exact_l2_topk(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The exact full-dim squared-L2 top-k leg shared by the PQ-family
    recall reports -> ``(query_id, neighbor_id)``. Factored out (r12)
    so composite queries that run several recall legs over the SAME
    panel (emb_compression_tradeoff) can compute the truth ONCE,
    persist its ≤ panel*k rows, and pass it to each leg via their
    ``exact=`` parameter instead of re-running the corpus×panel
    distance fold per leg. Expression tree identical to the inline
    form it replaced (same rounding, same (d2, id) tiebreak)."""
    v = F.col(vec_col).cast("array<double>")
    qfull = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), v.alias("__qfv")
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), v.alias("__v"))
        .join(F.broadcast(qfull), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_sq_l2(F.col("__v"), F.col("__qfv")), 6).alias("__d2"),
        )
    )
    e_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy("__d2", "neighbor_id")
    )
    return (
        scored.withColumn("__r", e_rank)
        .where(F.col("__r") <= k)
        .select("query_id", "neighbor_id")
    )


def pq_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    m: int,
    ks: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    exact: DataFrame | None = None,
) -> DataFrame:
    """Recall@k of compressed-domain ADC search vs the EXACT full-dim
    squared-L2 top-k, for the query panel ``id < max_query_id`` ->
    ``(query_id, n_approx, n_hit, recall)`` — the PQ entry in the
    driver-visible recall family (LSH / multiprobe / IVF / truncated-
    dim). Both legs rank the same metric (L2), so the report isolates
    pure quantization loss: how much ranking survives scoring
    ``m`` one-byte codes instead of ``dim`` floats.

    The approximate leg is :func:`pq_topk`'s own plan generalized to a
    panel: the per-query LUT join stays broadcast (panel * m * ks
    rows) and the ADC sum shuffles one pre-aggregated row per
    (query, vector). The exact leg broadcasts the panel's full
    vectors. Deterministic: ADC rounded to ``round_to``, exact d2
    rounded to 6, both ranked with the (score, id) tiebreak."""
    if max_query_id < 1 or k < 1:
        raise ValueError("pq_recall needs max_query_id >= 1 and k >= 1")
    from .simsearch import _recall_vs_exact

    codebook = pq_codebook(
        vectors, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        vectors, codebook, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    qs = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            _subvectors(F.col(vec_col).cast("array<double>"), m=m, dim=dim)
        ).alias("sub_id", "__qv"),
    )
    lut = codebook.join(F.broadcast(qs), "sub_id").select(
        "query_id",
        "sub_id",
        "code",
        _sq_l2(F.col("centroid"), F.col("__qv")).alias("__pd"),
    )
    expl = codes.select(
        F.col(id_col), F.posexplode("codes").alias("sub_id", "code")
    )
    adc = (
        expl.join(F.broadcast(lut), ["sub_id", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("__pd"), round_to).alias("adc"))
    )
    a_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy("adc", id_col)
    )
    approx = (
        adc.withColumn("__r", a_rank)
        .where(F.col("__r") <= k)
        .select("query_id", F.col(id_col).alias("cand_id"))
    )
    v = F.col(vec_col).cast("array<double>")
    qfull = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), v.alias("__qfv")
    )
    if exact is None:
        exact = exact_l2_topk(
            vectors, max_query_id=max_query_id, k=k,
            id_col=id_col, vec_col=vec_col,
        )
    return _recall_vs_exact(qfull.select("query_id"), approx, exact, k=k)


def ivfpq_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    m: int,
    ks: int,
    num_lists: int,
    nprobe: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Recall@k of the COMPOSED IVF+PQ index (:func:`ivfpq_topk`'s
    plan generalized to the query panel ``id < max_query_id``) vs the
    exact full-dim squared-L2 top-k ->
    ``(query_id, n_approx, n_hit, recall)`` — the truth-vs-approx
    audit row every other ANN leg already has (LSH / multiprobe /
    IVF / PQ / JL / truncated-dim). Unlike :func:`pq_recall`, the
    loss here compounds BOTH stages: coarse-probe misses (vectors in
    unprobed lists never reach scoring) and ADC quantization.

    Scale shape inherits both parents: one broadcast centroid pass
    per panel, candidates from the partition-prunable list_id
    semi-join (~nprobe/num_lists of the code table per query), the
    ADC LUT broadcast at panel * m * ks rows. Deterministic
    throughout (seed quantizer, (d2, list_id) probe order, rounded
    ADC, (score, id) tiebreaks)."""
    if max_query_id < 1 or k < 1:
        raise ValueError("ivfpq_recall needs max_query_id >= 1 and k >= 1")
    if nprobe < 1:
        raise ValueError("ivfpq_recall needs nprobe >= 1")
    from .simsearch import _recall_vs_exact, ivf_index

    assigned, centroids = ivf_index(
        vectors, num_lists=num_lists, dim=dim, id_col=id_col,
        vec_col=vec_col, refine=False,
    )
    v = F.col(vec_col).cast("array<double>")
    qfull = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), v.alias("__qfv")
    )
    p_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy("__pd2", "list_id")
    )
    probe = (
        centroids.join(F.broadcast(qfull))
        .select(
            "query_id",
            "list_id",
            _sq_l2(F.col("centroid"), F.col("__qfv")).alias("__pd2"),
        )
        .withColumn("__r", p_rank)
        .where(F.col("__r") <= nprobe)
        .select("query_id", "list_id")
    )
    cand = assigned.join(F.broadcast(probe), "list_id").select(
        "query_id", F.col(id_col)
    )
    codebook = pq_codebook(
        vectors, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        vectors, codebook, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    qs = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            _subvectors(F.col(vec_col).cast("array<double>"), m=m, dim=dim)
        ).alias("sub_id", "__qv"),
    )
    lut = codebook.join(F.broadcast(qs), "sub_id").select(
        "query_id",
        "sub_id",
        "code",
        _sq_l2(F.col("centroid"), F.col("__qv")).alias("__pd"),
    )
    # candidate filter BEFORE the LUT fan-out (r12): joining the
    # exploded codes to the broadcast panel LUT first multiplied the
    # corpus-scale code rows by the whole panel (|corpus| * m * panel
    # intermediate rows) and only then shuffled them against ``cand``
    # to keep ~nprobe/num_lists of them. Joining codes->cand first
    # fans each code row out to only the queries that actually probed
    # its vector's list; the LUT join stays broadcast. Same matched
    # (query, vector, subspace) triples, same sums, same rounding.
    expl = (
        codes.join(cand, id_col)
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.posexplode("codes").alias("sub_id", "code"),
        )
    )
    adc = (
        expl.join(F.broadcast(lut), ["query_id", "sub_id", "code"])
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("__pd"), round_to).alias("adc"))
    )
    a_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy("adc", id_col)
    )
    approx = (
        adc.withColumn("__r", a_rank)
        .where(F.col("__r") <= k)
        .select("query_id", F.col(id_col).alias("cand_id"))
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), v.alias("__v"))
        .join(F.broadcast(qfull), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_sq_l2(F.col("__v"), F.col("__qfv")), 6).alias("__d2"),
        )
    )
    e_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy("__d2", "neighbor_id")
    )
    exact = (
        scored.withColumn("__r", e_rank)
        .where(F.col("__r") <= k)
        .select("query_id", "neighbor_id")
    )
    return _recall_vs_exact(qfull.select("query_id"), approx, exact, k=k)


def int8_recall(
    vectors: DataFrame,
    *,
    max_query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: DataFrame | None = None,
) -> DataFrame:
    """Recall@k of ASYMMETRIC int8 search — corpus vectors stored as
    symmetric int8 codes (scale = max|v|/127, the
    :func:`int8_quantize_stats` format) and scored dequantized against
    FULL-precision queries — vs the exact cosine top-k ->
    ``(query_id, n_approx, n_hit, recall)``. Completes the
    compression-eval family (PQ = 32x, truncated-dim = 4x, int8 = 4x
    with no dimension loss): the report that says whether the 4x
    at-rest saving costs any ranking quality on this corpus.

    Same panel contract as the other recall probes: broadcast 8-query
    panel, rounded cosines, (cos desc, id) ranks, exact leg =
    :func:`.simsearch.knn_join`. The dequantization is scan-stage
    array math (floor(x/scale + 0.5) clamp, identical expression tree
    to the int8 audit), so both engines score bit-identical vectors.
    All-zero vectors dequantize to zeros and are excluded by a
    positive-norm predicate BEFORE the division (ANSI Spark raises on
    0/0 — the cosine is computed under a CASE guard), mirrored as a
    ``dot(x, x) > 0`` WHERE clause in the SQL twin."""
    if max_query_id < 1 or k < 1:
        raise ValueError("int8_recall needs max_query_id >= 1 and k >= 1")
    from .simsearch import _recall_vs_exact, dot, knn_join, norm

    v = F.col(vec_col)
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )

    def build(amax: Column) -> Column:
        scale = amax / F.lit(127.0)
        return F.when(
            amax > 0,
            F.transform(
                v,
                lambda x: F.least(
                    F.greatest(
                        F.floor(x.cast("double") / scale + F.lit(0.5)),
                        F.lit(-127),
                    ),
                    F.lit(127),
                )
                * scale,
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0.0)))

    deq = F.element_at(F.transform(F.array(absmax), build), 1)
    base = vectors.select(F.col(id_col).alias("cand_id"), deq.alias("__v"))
    q = vectors.where(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"),
        v.cast("array<double>").alias("__qv"),
    )
    sq = dot(F.col("__v"), F.col("__v"))
    qq = dot(F.col("__qv"), F.col("__qv"))
    scored = (
        base.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .where((sq > 0) & (qq > 0))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("__v"), F.col("__qv"))
                / (norm(F.col("__v")) * norm(F.col("__qv"))),
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
    if exact is None:
        # exact cosine leg (knn_join) — callers running several recall
        # legs over the same panel pass a shared (persisted) `exact`
        # instead, so the corpus×panel fold runs once, not per leg
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
