"""K-means clustering and SemDeDup-style semantic deduplication over
embedding columns.

The reference library has no clustering surface (it is a SAX kernel,
src/symtseries.c:515-532); these operators extend the engine with the
clustering leg a pretraining-data pipeline runs over document
embeddings — group the corpus into semantic regions, then deduplicate
*within* regions so the quadratic pair search is bounded by cluster
size instead of corpus size (the SemDeDup recipe: Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

Determinism / oracle parity
---------------------------
Everything is deterministic by construction so the driver's DuckDB
oracle can twin it bit-for-bit:

* seed centroids are the ``k`` lowest-id vectors (no RNG);
* every distance is the same left-to-right squared-L2 fold as
  :func:`..operators.simsearch._sq_l2`, so argmin comparisons see
  bit-identical operands in both engines;
* argmin ties break on cluster id (``min_by`` over a
  ``struct(d2, cluster)``, mirroring ``ORDER BY d2, cluster``);
* each Lloyd mean is quantized to 1e-6 (``floor(x*1e6+0.5)/1e6``)
  before it becomes the next iteration's centroid — a grouped mean's
  summation order differs between engines (sub-ulp drift), and an
  unquantized drifting centroid could flip a later argmin. Quantizing
  re-synchronizes the engines after every mean (same lesson as the
  EWMA quantization in operators/timeseries.py).

Scale design (100 TB)
---------------------
The centroid relation is ``k x dim`` doubles — kilobytes — and is
BROADCAST to every assignment; the corpus is never shuffled on a
cluster key during Lloyd iterations (assignment is a map-side
broadcast join + per-row argmin; the mean is one map-side-combinable
groupBy with ``k x dim`` aggregation state). Iteration count is a
fixed small constant, so the whole fit is ``iters + 1`` corpus scans.
At production scale each iteration's assignment would be checkpointed
to break lineage (here the fixed iters=2 keeps the composed plan
small, so the operators stay pure DataFrame transforms the driver can
plan end-to-end). SemDeDup's pair stage self-joins on ``cluster``:
candidate volume is sum_c(|c| choose 2) — bounded by the cluster
granularity knob ``k``, which at web scale is chosen so clusters hold
~1e4 vectors (the paper uses 50k clusters for LAION-440M). That knob,
not code, is the scale lever — identical to the ``num_planes ~
log2(n)`` rule recorded for hyperplane LSH in docs/SCALING.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .simsearch import _sq_l2, dot


def _q6(col: Column) -> Column:
    """Engine-stable 1e-6 quantization (floor-based half-up, the
    repo-wide cross-engine rounding idiom)."""
    return F.floor(col * 1e6 + F.lit(0.5)) / 1e6


def _seed_centroids(
    vectors: DataFrame, *, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """The ``k`` lowest-id vectors as ``(cluster, centroid)`` — the
    deterministic, RNG-free init (same convention as
    :func:`.simsearch.ivf_index` seeds)."""
    return (
        vectors.orderBy(id_col)
        .limit(k)
        .select(
            # unpartitioned window is BOUNDED: k-row seed table only
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cluster"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
    )


def _materialize_small(df: DataFrame) -> DataFrame:
    """Collect a BOUNDED (≤ k rows) relation and rebuild it as a local
    relation (r12.3): the k-means-family fitting loops chain each
    iterate off the previous one lazily, and every downstream
    *reference* re-evaluated the whole chain — emb_semdedup's plan
    carried 40 parquet scans of the corpus, emb_kmeans 12, for
    algorithms that are arithmetically one pass per iteration. The
    collected rows are exactly the doubles Spark computed (the lazy
    plan would have broadcast the same bytes), so downstream results
    are bit-identical; only the evaluation count changes. The collect
    is the repo's bounded driver-action convention (rank boundaries,
    IVF probe lists, BPE merges) — never corpus-scale."""
    spark = df.sparkSession
    return spark.createDataFrame(df.collect(), schema=df.schema)


def _centroids_row(centroids: DataFrame) -> DataFrame:
    """Pack the (cluster, centroid) relation into ONE array cell — a
    1-row aggregate of ``k x dim`` doubles (kilobytes), broadcast so
    per-row distance math runs scan-stage with no corpus shuffle and
    no k-way row fan-out. ``array_sort`` only stabilizes the packed
    order for plan readability; every argmin below is a set-min over
    ``struct(d2, cluster)`` and is order-independent."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cluster"), F.col("centroid")))
        ).alias("__cents")
    )


def _best_struct(vd: Column) -> Column:
    """``struct(d2, cluster)`` argmin of ``vd`` over the packed
    ``__cents`` array — identical tie order (d2, then cluster) to the
    grouped ``min(struct(__d2, cluster))`` it replaces."""
    return F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                _sq_l2(vd, c["centroid"]).alias("__d2"),
                c["cluster"].alias("cluster"),
            ),
        )
    )


def _assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest-centroid assignment -> ``(id, vec, cluster, __d2)``.

    Fully scan-stage (r12): the centroid relation rides in as one
    broadcast array cell (:func:`_centroids_row`) and each row computes
    its own argmin with ``array_min`` over a ``transform`` — the r11
    crossJoin + ``groupBy(id)`` shape re-shuffled the corpus WITH its
    vector payload on every assignment (guide §2.3: shuffle keys, not
    payloads; here nothing shuffles at all). Tie order is unchanged:
    ``array_min`` over ``struct(d2, cluster)`` == the old grouped
    ``min(struct(d2, cluster))``.
    """
    vd = F.col(vec_col).cast("array<double>")
    return (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(_centroids_row(centroids)))
        .withColumn("__best", _best_struct(vd))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__best.cluster").alias("cluster"),
            F.col("__best.__d2").alias("__d2"),
        )
    )


def kmeans_assign(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means -> ``(id, vec, cluster, d2)``
    with ``d2`` the quantized squared L2 distance to the final
    centroid.

    ``iters`` Lloyd refinements after the seed assignment, each mean
    quantized to 1e-6 (see module docstring); a cluster that loses all
    members falls back to its seed centroid, so no centroid is ever
    NULL and the output always has exactly ``k`` possible labels.
    """
    if k < 1 or dim < 1 or iters < 0:
        raise ValueError("kmeans_assign needs k >= 1, dim >= 1, iters >= 0")
    cent = _fit_centroids(
        vectors, k=k, dim=dim, iters=iters, id_col=id_col, vec_col=vec_col
    )
    final = _assign(vectors, cent, id_col=id_col, vec_col=vec_col)
    return final.select(
        id_col, vec_col, "cluster", _q6(F.col("__d2")).alias("d2")
    )


def _fit_centroids(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The Lloyd loop of :func:`kmeans_assign`, factored out so evals
    (silhouette) can reuse the FITTED ``(cluster, centroid)`` relation
    with identical quantized arithmetic."""
    # materialize the k-row seed table and every Lloyd iterate (see
    # _materialize_small): one corpus pass per iteration instead of a
    # lazy chain re-evaluated per downstream reference
    seeds = _materialize_small(
        _seed_centroids(vectors, k=k, id_col=id_col, vec_col=vec_col)
    )
    cent = seeds
    for _ in range(iters):
        assigned = _assign(vectors, cent, id_col=id_col, vec_col=vec_col)
        vd = F.col(vec_col).cast("array<double>")
        means = (
            assigned.select("cluster", vd.alias("__v"))
            .groupBy("cluster")
            .agg(
                *[
                    F.avg(F.element_at("__v", i + 1)).alias(f"__m{i}")
                    for i in range(dim)
                ]
            )
            .select(
                "cluster",
                F.array(
                    *[_q6(F.col(f"__m{i}")) for i in range(dim)]
                ).alias("centroid"),
            )
        )
        cent = _materialize_small(
            seeds.select("cluster", F.col("centroid").alias("__seed"))
            .join(F.broadcast(means), "cluster", "left")
            .select(
                "cluster", F.coalesce("centroid", "__seed").alias("centroid")
            )
        )
    return cent


def kmeans_silhouette(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster over the
    fitted k-means partition -> ``(cluster, n, mean_sil, mean_a,
    mean_b)`` with per-point ``sil = (b - a) / max(a, b)``, ``a`` the
    quantized squared L2 to the OWN centroid and ``b`` to the nearest
    OTHER centroid (Hruschka et al.'s O(n*k) form — the exact
    silhouette's O(n^2) pair sums don't survive 100 TB; this one is a
    broadcast-centroid scan). A cluster near 0 is overlapping its
    neighbor (merge candidate), near 1 is well separated; paired with
    emb_kmeans it is the k-knob diagnostic for the SemDeDup pipeline.

    Deterministic: the per-point centroid ranking reuses the
    (d2, cluster) tie order of the assignment itself, and a/b are
    floor-quantized before the ratio so both engines divide identical
    doubles. ``max(a, b) == 0`` (point equal to two centroids) yields
    sil = 0.
    """
    if k < 2:
        raise ValueError("kmeans_silhouette needs k >= 2")
    cent = _fit_centroids(
        vectors, k=k, dim=dim, iters=iters, id_col=id_col, vec_col=vec_col
    )
    vd = F.col(vec_col).cast("array<double>")
    # Scan-stage (r12): sort the per-row (d2, cluster) candidate array
    # once and read elements 1 and 2 — identical (own, runner) pair to
    # the old per-id row_number window (same (d2, cluster) order),
    # without fanning the corpus out k-ways and shuffling it by id for
    # the window sort.
    ranked_arr = F.array_sort(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                _sq_l2(vd, c["centroid"]).alias("__d2"),
                c["cluster"].alias("cluster"),
            ),
        )
    )
    scored = (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(_centroids_row(cent)))
        .withColumn("__rk", ranked_arr)
        .select(
            F.col("__rk")[0]["cluster"].alias("cluster"),
            _q6(F.col("__rk")[0]["__d2"]).alias("__a"),
            _q6(F.col("__rk")[1]["__d2"]).alias("__b"),
        )
    )
    mx = F.greatest(F.col("__a"), F.col("__b"))
    sil = F.when(
        mx > 0, _q6((F.col("__b") - F.col("__a")) / mx)
    ).otherwise(F.lit(0.0))
    return (
        scored
        .select(F.col("cluster"), F.col("__a"), F.col("__b"), sil.alias("__s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _q6(F.avg("__s")).alias("mean_sil"),
            _q6(F.avg("__a")).alias("mean_a"),
            _q6(F.avg("__b")).alias("mean_b"),
        )
    )


def semdedup_keep(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    threshold: float,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: k-means partition, then drop every vector whose
    quantized cosine similarity to a LOWER-id vector in the SAME
    cluster is >= ``threshold`` -> kept set ``(id, cluster)``.

    The keep rule ("survive unless a lower-id near-twin exists") needs
    only one anti-join over the within-cluster pair relation — no
    iterative component search — and keeps exactly one representative
    (the minimum id) of every mutually-similar group, matching the
    paper's keep-one-per-group semantics for transitive duplicate sets.

    The pairwise cosine compares RAW vectors (not centroids), is
    prenormed below the join (one dot fold per pair — the round-4
    hot-loop rule, docs/SCALING.md), and is quantized to 1e-6 BEFORE
    the threshold compare so the keep decision is engine-stable.
    """
    if not -1.0 <= threshold <= 2.0:
        # values just above 1 are a legal degenerate ("drop nothing")
        # and the tests use one; far outside [-1, 1] is a caller bug
        raise ValueError("semdedup_keep needs a cosine threshold in [-1, 2]")
    assigned = kmeans_assign(
        vectors, k=k, dim=dim, iters=iters, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cluster")
    vd = F.col(vec_col).cast("array<double>")
    pre = vectors.select(
        F.col(id_col), vd.alias("__v")
    ).withColumn("__n", F.sqrt(dot(F.col("__v"), F.col("__v"))))
    sides = assigned.join(pre, id_col)
    a = sides.select(
        F.col(id_col).alias("__ida"),
        F.col("cluster"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = sides.select(
        F.col(id_col).alias("__idb"),
        F.col("cluster"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    cos_q = _q6(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("__ida") < F.col("__idb"))
        .where(cos_q >= F.lit(threshold))
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(id_col, "cluster")


def pca_power_scores(
    vectors: DataFrame,
    *,
    dim: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """First-principal-component projection scores via deterministic
    power iteration -> ``(id, pc1)`` with ``pc1 = (x - mu) . v``
    quantized 1e-6 — the embedding-space structure probe (dominant
    direction / whitening diagnostic) a curation pipeline runs before
    trusting cosine geometry (anisotropic embedding spaces concentrate
    mass on one axis; a huge top eigenvalue says cosine thresholds are
    really measuring that axis).

    COVARIANCE-FREE: the d x d covariance is never materialized.
    Each iteration computes ``u = sum_i s_i (x_i - mu)`` with
    ``s_i = (x_i - mu) . v`` — two corpus-wide passes fused into one
    scan: a projection computes every ``s_i`` once (Project node, so
    the fold runs once per row, not once per dimension), then one
    map-side-combinable aggregate accumulates the d per-dimension
    sums. ``mu`` and ``v`` are 1-row relations, always broadcast.

    Determinism / parity: ``v_0 = e_1`` (no RNG; e_1 being exactly
    orthogonal to the top eigenvector is measure-zero and would show
    as all-zero u); the per-dim mean, every per-dim sum, and the
    normalized iterate are floor-quantized to 1e-6 before reuse, so
    both engines iterate over bit-identical (mu, v) even though their
    grouped-sum orders differ — the kmeans_assign centroid rule
    applied to the eigenvector. All dot products use the repo-wide
    left-to-right fold. The sign convention is inherited from v_0
    (power iteration converges up to sign; fixed init fixes the sign).
    """
    if dim < 1 or iters < 0:
        raise ValueError("pca_power_scores needs dim >= 1, iters >= 0")
    mu_row, v_row = _pca_mu_v(
        vectors, dim=dim, iters=iters, vec_col=vec_col
    )
    vd = F.col(vec_col).cast("array<double>")

    def centered_dot(v_expr: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                F.zip_with(vd, F.col("mu"), lambda x, m: x - m),
                v_expr,
                lambda cx, vv: cx * vv,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    return (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(mu_row))
        .crossJoin(F.broadcast(v_row))
        .select(
            F.col(id_col),
            _q6(centered_dot(F.col("v"))).alias("pc1"),
        )
    )


def _pca_mu_v(
    vectors: DataFrame,
    *,
    dim: int,
    iters: int,
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Fit the (mu, v) pair of the power iteration — shared by
    :func:`pca_power_scores` and :func:`abtt_topk`. Both are 1-row
    relations with quantized entries (see pca_power_scores).

    Each iterate is MATERIALIZED (one ``first()`` per iteration — the
    repo's bounded 1-row-collect convention, the BPE-merge shape) and
    re-injected as a literal array (r12.3). The previous lazy chaining
    nested every iteration's corpus aggregation inside the next one's
    broadcast subtree, and every *reference* to the chain re-evaluated
    it: abtt_topk's plan carried **36 parquet scans** of the corpus
    (pca_power_scores 18) for what is arithmetically ``iters + 1``
    passes. Every expression below is evaluated BY SPARK exactly as
    before on identical inputs, so the collected (mu, v) doubles are
    bit-identical to the lazy chain's; the power iteration is
    inherently sequential (each pass needs the previous v), so the
    per-iteration action adds no serialization that was not already
    there — it only stops the re-evaluation."""
    vd = F.col(vec_col).cast("array<double>")
    spark = vectors.sparkSession
    mu_raw = vectors.agg(
        *[
            F.avg(F.element_at(vd, i + 1)).alias(f"__m{i}")
            for i in range(dim)
        ]
    ).select(
        F.array(*[_q6(F.col(f"__m{i}")) for i in range(dim)]).alias("mu")
    )
    mu_vals = mu_raw.first()["mu"]

    def _lit_arr(vals) -> Column:
        return F.array(
            *[
                F.lit(x).cast("double")
                if x is not None
                else F.lit(None).cast("double")
                for x in vals
            ]
        )

    mu_lit = _lit_arr(mu_vals)
    v_vals = [1.0] + [0.0] * (dim - 1)

    for _ in range(iters):
        v_lit = _lit_arr(v_vals)
        s = F.aggregate(
            F.zip_with(
                F.zip_with(vd, mu_lit, lambda x, m: x - m),
                v_lit,
                lambda cx, vv: cx * vv,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        proj = vectors.select(
            vd.alias("__x"), mu_lit.alias("mu"), s.alias("__s")
        )
        u_row = proj.agg(
            *[
                F.sum(
                    F.col("__s")
                    * (
                        F.element_at(F.col("__x"), i + 1)
                        - F.element_at(F.col("mu"), i + 1)
                    )
                ).alias(f"__u{i}")
                for i in range(dim)
            ]
        ).select(
            F.array(*[_q6(F.col(f"__u{i}")) for i in range(dim)]).alias("u")
        )
        nrm = F.sqrt(
            F.aggregate(
                F.transform(F.col("u"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
        v_vals = u_row.select(
            F.transform(F.col("u"), lambda x: _q6(x / nrm)).alias("v")
        ).first()["v"]

    mu_row = spark.range(1).select(mu_lit.alias("mu"))
    v_row = spark.range(1).select(_lit_arr(v_vals).alias("v"))
    return mu_row, v_row


def abtt_topk(
    vectors: DataFrame,
    *,
    query_id: int,
    k: int,
    dim: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-but-the-top whitened cosine search (Mu & Viswanath 2018,
    "All-but-the-Top: Simple and Effective Postprocessing for Word
    Representations"): subtract the corpus mean and remove the
    projection onto the top principal component, then exact cosine
    top-k in the whitened space -> ``(vec_id, cos)``.

    The anisotropy fix the :func:`pca_power_scores` probe motivates:
    when one dominant direction carries most of the mass, raw cosine
    mostly measures that direction; removing it restores contrast.
    ``x' = (x - mu) - ((x - mu) . v) v`` — per-row arithmetic against
    the two broadcast 1-row relations (mu, v), with the centered array
    and its projection each bound ONCE via lambda variables (the
    _let rule: a repeated O(dim) subexpression re-evaluates per
    reference otherwise). Deterministic given the quantized (mu, v);
    cosine quantized 1e-6 with (cos DESC, id) order.
    """
    from ..functions.sax import _let

    if k < 1 or dim < 1 or iters < 0:
        raise ValueError("abtt_topk needs k >= 1, dim >= 1, iters >= 0")
    mu_row, v_row = _pca_mu_v(
        vectors, dim=dim, iters=iters, vec_col=vec_col
    )
    vd = F.col(vec_col).cast("array<double>")
    wx = _let(
        F.zip_with(vd, F.col("mu"), lambda x, m: x - m),
        lambda cx: _let(
            F.aggregate(
                F.zip_with(cx, F.col("v"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            lambda s: F.zip_with(cx, F.col("v"), lambda a, b: a - s * b),
        ),
    )
    whitened = (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(mu_row))
        .crossJoin(F.broadcast(v_row))
        .select(F.col(id_col), wx.alias("__wx"))
        .withColumn("__wn", F.sqrt(dot(F.col("__wx"), F.col("__wx"))))
    )
    q = whitened.where(F.col(id_col) == query_id).select(
        F.col("__wx").alias("__qx"), F.col("__wn").alias("__qn")
    )
    cos_q = _q6(
        dot(F.col("__wx"), F.col("__qx")) / (F.col("__wn") * F.col("__qn"))
    )
    return (
        whitened.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(F.col(id_col), cos_q.alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def kcenter_coreset(
    vectors: DataFrame,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_frac: float | None = None,
) -> DataFrame:
    """Farthest-point traversal coreset (Gonzalez 1985 k-center
    2-approximation — the standard geometric data-pruning picker):
    seed with the smallest id, then ``k - 1`` times add the vector
    farthest (squared L2, 6-decimal rounded, min-id tiebreak) from
    everything selected so far ->
    ``(pick_rank, vec_id, min_dist)`` where ``min_dist`` is the
    pick's distance to the previously-selected set — the coverage
    radius sequence, non-increasing by construction.

    Scale shape: the selected set is driver state (<= k rows, like
    kmeans centroids and the BPE merge list); each iteration is ONE
    incremental scan — ``md := least(md, d2(v, new_pick))`` against a
    LITERAL vector — ending in a 1-row TakeOrderedAndProject. The
    corpus never shuffles; lineage stays flat via the same
    one-step-behind persist pattern as bpe_merges.

    At 100 TB the persisted working set is CORPUS-sized, so each of
    the k iterations re-reads it — expect cache misses (executor
    storage evicts under memory pressure and the scan falls back to
    the parquet source; the plan is still one flat pass, just not a
    RAM hit). The standard mitigation is ``sample_frac``: pre-thin
    the corpus with a DETERMINISTIC hash filter
    (``xxhash64(id) % 2^20 < frac * 2^20`` — reproducible across
    runs and engines, unlike ``DataFrame.sample``) and traverse the
    sample; farthest-point picks on a uniform sample are the usual
    coreset seeding trade (coverage radius degrades gracefully with
    the sampling rate while per-iteration scan cost drops by 1/frac).
    Default ``None`` traverses the full corpus — the oracle-twinned
    exact form."""
    if k < 1:
        raise ValueError("kcenter_coreset needs k >= 1")
    if sample_frac is not None and not 0.0 < sample_frac <= 1.0:
        raise ValueError("kcenter_coreset needs 0 < sample_frac <= 1")
    if sample_frac is not None and sample_frac < 1.0:
        # The hash filter's resolution is 1/2^20: a smaller frac
        # would truncate the slot count to 0 and silently filter
        # EVERY row (empty coreset, no error) — reject it loudly.
        slots = int(sample_frac * (1 << 20))
        if slots < 1:
            raise ValueError(
                "kcenter_coreset sample_frac below the hash filter's "
                "1/2^20 resolution would select zero rows; use a "
                "larger fraction"
            )
        vectors = vectors.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1 << 20))
            < F.lit(slots)
        )
    spark = vectors.sparkSession
    v = F.col(vec_col).cast("array<double>")
    seed = (
        vectors.select(F.col(id_col).alias("vid"), v.alias("__v"))
        .orderBy("vid")
        .limit(1)
        .collect()
    )
    if not seed:
        return spark.createDataFrame(
            [], "pick_rank int, vec_id long, min_dist double"
        )
    out = [(1, int(seed[0]["vid"]), 0.0)]

    def lit_vec(vals) -> Column:
        return F.array(*[F.lit(float(x)) for x in vals])

    cur = (
        vectors.where(F.col(id_col) != seed[0]["vid"])
        .select(
            F.col(id_col).alias("vid"),
            v.alias("__v"),
            F.round(_sq_l2(v, lit_vec(seed[0]["__v"])), 6).alias("__md"),
        )
        .persist()
    )
    prev: DataFrame | None = None
    try:
        for rank in range(2, k + 1):
            best = (
                cur.orderBy(F.desc("__md"), "vid").limit(1).collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            b = best[0]
            out.append((rank, int(b["vid"]), float(b["__md"])))
            nxt = (
                cur.where(F.col("vid") != b["vid"])
                .select(
                    "vid",
                    "__v",
                    F.least(
                        F.col("__md"),
                        F.round(
                            _sq_l2(F.col("__v"), lit_vec(b["__v"])), 6
                        ),
                    ).alias("__md"),
                )
                .persist()
            )
            prev = cur
            cur = nxt
    finally:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return spark.createDataFrame(
        out, "pick_rank int, vec_id long, min_dist double"
    )


def kcenter_assign(
    vectors: DataFrame,
    *,
    picks: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Voronoi coverage report for a k-center coreset: assign every
    vector to its nearest pick (squared L2; pick_rank breaks exact
    ties) -> ``(pick_rank, pick_id, n_assigned, mean_d2, max_d2)``.
    ``picks`` is the driver-state output of :func:`kcenter_coreset`
    joined back to its vectors: ``(pick_rank, pick_id, vector)``.

    Determinism across engines without struct least() (DuckDB 1.0
    lacks it): each candidate is ONE BIGINT key
    ``floor(d2 * 1e6 + 0.5) * 100 + pick_rank`` — the raw d2 doubles
    are bit-identical on both engines (same fold), so the
    micro-quantized integer is too, and integer ``least`` picks
    (nearest, then lowest rank) in one comparison. Stats are sums and
    maxes of those exact integers, divided back out at the end.

    Scale shape: one scan with k literal-vector distance expressions
    + one combinable groupBy(rank at most k groups). No shuffle of
    the corpus, no join — the picks ride in as literals."""
    if not picks:
        raise ValueError("kcenter_assign needs at least one pick")
    if len(picks) >= 100:
        raise ValueError("pick_rank packs into 2 decimal digits (< 100)")
    # Packing validity window: the key floor(d2 * 1e6 + 0.5) * 100 +
    # rank is exact only while d2 < 2^53 / 1e8 (~9.0e7) — the
    # divide-back-out transits a double. The corpus's max d2 is not
    # knowable driver-side, but a coordinate-scale blow-up is already
    # visible among the picks themselves (they are a farthest-point
    # traversal of the corpus), so guard on the pick-pair diameter —
    # k^2 driver floats — and fail loudly instead of mis-binning.
    _lim = (2.0**53) / 1e8
    _diam2 = max(
        (
            sum((a - b) ** 2 for a, b in zip(va, vb))
            for i, (_, _, va) in enumerate(picks)
            for _, _, vb in picks[i + 1:]
        ),
        default=0.0,
    )
    if _diam2 > _lim / 4.0:
        raise ValueError(
            f"pick-pair squared distance {_diam2:.3g} implies packed "
            f"keys near 2^53 (exactness bound d2 < {_lim:.3g}); "
            "rescale the embedding coordinates"
        )
    v = F.col(vec_col).cast("array<double>")

    def lit_vec(vals) -> Column:
        return F.array(*[F.lit(float(x)) for x in vals])

    keys = [
        (
            F.floor(_sq_l2(v, lit_vec(vec)) * 1e6 + F.lit(0.5)).cast("long")
            * 100
            + F.lit(rank)
        )
        for rank, _pid, vec in picks
    ]
    key = keys[0] if len(keys) == 1 else F.least(*keys)
    asg = vectors.select(
        (key % 100).cast("int").alias("pick_rank"),
        ((key - key % 100) / F.lit(100)).cast("long").alias("__micro"),
    )
    agg = asg.groupBy("pick_rank").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.sum("__micro").alias("__sum"),
        F.max("__micro").alias("__max"),
    )
    spark = vectors.sparkSession
    meta = spark.createDataFrame(
        [(rank, pid) for rank, pid, _ in picks],
        "pick_rank int, pick_id long",
    )
    return meta.join(agg, "pick_rank", "left").select(
        "pick_rank",
        "pick_id",
        F.coalesce("n_assigned", F.lit(0)).alias("n_assigned"),
        F.when(
            F.coalesce("n_assigned", F.lit(0)) > 0,
            F.round(
                F.col("__sum").cast("double")
                / F.lit(1000000.0)
                / F.col("n_assigned"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_d2"),
        F.when(
            F.coalesce("n_assigned", F.lit(0)) > 0,
            F.round(F.col("__max").cast("double") / F.lit(1000000.0), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("max_d2"),
    )


def _parallel_candidates(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    ell: int | None = None,
    rounds: int = 3,
    salt: str = "kmpar",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-means|| oversampling initialization (Bahmani et al. 2012,
    "Scalable k-means++", VLDB) -> ``(vec_id, weight)``: the candidate
    center set a k-means++ recluster would seed from, each weighted by
    the number of corpus vectors it is nearest to.

    k-means++'s sequential weakness — k dependent passes, each picking
    ONE center by D² sampling — is replaced by ``rounds`` passes that
    each sample ~``ell`` centers INDEPENDENTLY per row: x is selected
    iff ``u(x) < ell * d2(x) / phi`` with ``d2`` the squared distance
    to the current center set and ``phi = sum d2``. The paper shows
    O(log n) rounds suffice; practice (and the registered query) uses
    a small constant with ``ell ~ 2k``.

    Determinism / oracle parity (the module's standing contract):

    * the first center is the lowest-id vector (no RNG);
    * ``u(x, round)`` is the exact md5 rational
      ``(hash60(id ':salt:' round) % 2^20 + 1) / (2^20 + 1)`` — the
      Efraimidis-Spirakis sampling convention (pipeline.py);
    * ``d2`` is quantized to INTEGER MICRO-UNITS
      (``floor(min_d2 * 1e6 + 0.5)`` as BIGINT), so ``phi`` is an
      exact integer sum — immune to float summation order across
      engines (the Page-Hinkley micro-unit convention);
    * the selection test is ``u * phi < ell * d2`` evaluated as ONE
      IEEE multiply per side on bit-identical operands — no division,
      no accumulated rounding. Already-selected centers have d2 = 0
      and are never re-selected.

    Scale shape: ``rounds + 1`` corpus scans, each a broadcast join
    against the center relation (≤ 1 + ell·rounds rows — kilobytes)
    plus a map-side-combinable 1-row sum; the corpus is never
    shuffled. The center table is eagerly checkpointed per round
    (bounded rows), which is also the only driver-side action. phi's
    BIGINT micro-units overflow 2^53 only past ~10^8 rows x d2~256;
    at that scale rescale the quantum (1e-4 units lose nothing: the
    threshold compare tolerates any shared quantum).
    """
    if k < 1 or dim < 1 or rounds < 1:
        raise ValueError(
            "kmeans_parallel_init needs k >= 1, dim >= 1, rounds >= 1"
        )
    ell = 2 * k if ell is None else ell
    if ell < 1:
        raise ValueError("ell must be >= 1")
    from symtseries_spark.functions.text import doc_hash60

    m = 1 << 20
    vd = F.col(vec_col).cast("array<double>")
    base = vectors.select(
        F.col(id_col).alias("__id"), vd.alias("__v")
    )
    centers = (
        base.orderBy("__id")
        .limit(1)
        .select(
            F.col("__id").alias("cluster"), F.col("__v").alias("centroid")
        )
        .localCheckpoint(eager=True)
    )
    for r in range(1, rounds + 1):
        # Scan-stage min-d2 (r12): centers ride in as ONE broadcast
        # array cell; the old crossJoin + groupBy(__id) shape shuffled
        # the corpus (ids AND vectors) TWICE per round (the unpersisted
        # d2i lineage re-ran for phi and for the selection filter) —
        # now both passes are shuffle-free scans. array_min over the
        # same _sq_l2 doubles == the grouped F.min, bit-exact.
        crow = centers.agg(F.collect_list("centroid").alias("__cs"))
        min_d2 = F.array_min(
            F.transform(F.col("__cs"), lambda c: _sq_l2(F.col("__v"), c))
        )
        # persist (r12.2): min-d2 over the growing center set is the
        # round's dominant cost and BOTH consumers need it — phi's
        # 1-row sum and the selection filter. Unpersisted, each round
        # evaluated it twice (the phi broadcast build and the filter
        # scan re-ran the lineage); the cached table is
        # (id, vec, d2i) — corpus-row count, kilobyte rows — filled by
        # the phi build job and read back by the filter, then dropped
        # before the next round.
        d2i = base.crossJoin(F.broadcast(crow)).select(
            "__id",
            "__v",
            F.floor(min_d2 * 1e6 + F.lit(0.5)).cast("long").alias("__d2i"),
        ).persist()
        phi = d2i.agg(F.sum("__d2i").alias("__phi"))
        u = (
            F.pmod(
                doc_hash60(
                    F.concat(
                        F.col("__id").cast("string"),
                        F.lit(f":{salt}:{r}"),
                    )
                ),
                F.lit(m),
            )
            + 1
        ).cast("double") / F.lit(float(m + 1))
        selected = (
            d2i.crossJoin(F.broadcast(phi))
            .where(
                u * F.col("__phi").cast("double")
                < F.lit(float(ell)) * F.col("__d2i").cast("double")
            )
            .select(
                F.col("__id").alias("cluster"),
                F.col("__v").alias("centroid"),
            )
        )
        centers = centers.unionByName(selected).localCheckpoint(eager=True)
        # the eager checkpoint above is the round's only action: it
        # built phi (filling the d2i cache) and ran the filter (reading
        # it) — the cache is dead weight from here on
        d2i.unpersist()

    final = _assign(
        base.select(
            F.col("__id").alias(id_col), F.col("__v").alias(vec_col)
        ),
        centers,
        id_col=id_col,
        vec_col=vec_col,
    )
    weights = final.groupBy("cluster").agg(
        F.count("*").cast("long").alias("weight")
    )
    # inner join: a candidate that won no corpus vector cannot exist
    # (it is at distance 0 from itself), so weights cover all centers
    return centers.join(weights, "cluster").select(
        "cluster", "weight", "centroid"
    )


def kmeans_parallel_init(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    ell: int | None = None,
    rounds: int = 3,
    salt: str = "kmpar",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Public projection of :func:`_parallel_candidates` ->
    ``(vec_id, weight)`` — the weighted candidate set; see that
    docstring for the algorithm and determinism contract."""
    return _parallel_candidates(
        vectors,
        k=k,
        dim=dim,
        ell=ell,
        rounds=rounds,
        salt=salt,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col("cluster").alias(id_col), "weight")


def kmeans_parallel_assign(
    vectors: DataFrame,
    *,
    k: int,
    dim: int,
    ell: int | None = None,
    rounds: int = 3,
    recluster_iters: int = 2,
    salt: str = "kmpar",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The complete Bahmani pipeline -> ``(vec_id, cluster, d2)``:
    k-means|| candidates (:func:`_parallel_candidates`), a WEIGHTED
    Lloyd recluster of the ≤ 1 + ell·rounds candidates down to ``k``
    centroids (the paper's "recluster the weighted candidate set"
    step — here it stays a tiny-table DataFrame computation, seeds =
    the k lowest-id candidates, means weighted by candidate weight,
    quantized to 1e-6 per round like every Lloyd mean in this module),
    then one nearest-centroid assignment of the corpus.

    Scale shape: the candidate table is kilobytes, so the recluster is
    free; corpus cost = the init's rounds+1 scans plus ONE final
    broadcast-assign scan. Cluster labels are 0..k-1 in candidate-id
    seed order."""
    if recluster_iters < 0:
        raise ValueError("recluster_iters must be >= 0")
    cands = _parallel_candidates(
        vectors,
        k=k,
        dim=dim,
        ell=ell,
        rounds=rounds,
        salt=salt,
        id_col=id_col,
        vec_col=vec_col,
    ).localCheckpoint(eager=True)
    seeds = (
        cands.orderBy("cluster")
        .limit(k)
        .select(
            # bounded: candidate table, not the corpus
            (F.row_number().over(Window.orderBy("cluster")) - 1).alias(
                "cluster"
            ),
            "centroid",
        )
    )
    cent = seeds
    cand_pts = cands.select(
        F.col("cluster").alias("__cid"),
        F.col("weight").cast("double").alias("__w"),
        F.col("centroid").alias("__v"),
    )
    for _ in range(recluster_iters):
        scored = cand_pts.crossJoin(F.broadcast(cent)).select(
            "__cid",
            "__w",
            "__v",
            "cluster",
            _sq_l2(F.col("__v"), F.col("centroid")).alias("__d2"),
        )
        best = F.min(F.struct("__d2", "cluster"))
        assigned = scored.groupBy("__cid").agg(
            F.first("__w").alias("__w"),
            F.first("__v").alias("__v"),
            best.getField("cluster").alias("cluster"),
        )
        means = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    (
                        F.sum(F.col("__w") * F.element_at("__v", i + 1))
                        / F.sum("__w")
                    ).alias(f"__m{i}")
                    for i in range(dim)
                ]
            )
            .select(
                "cluster",
                F.array(
                    *[_q6(F.col(f"__m{i}")) for i in range(dim)]
                ).alias("centroid"),
            )
        )
        cent = (
            seeds.alias("s")
            .join(means.alias("m"), "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("m.centroid"), F.col("s.centroid")).alias(
                    "centroid"
                ),
            )
        )
    final = _assign(vectors, cent, id_col=id_col, vec_col=vec_col)
    return final.select(
        id_col, "cluster", _q6(F.col("__d2")).alias("d2")
    )
