"""Dataset-preparation operators: deterministic splits and
sequence-length bucketing — the last mile of a training-data pipeline.

Both are pure per-row projections on the engine-independent 60-bit hash
(functions/text.py), so they are reproducible across runs, engines, and
cluster sizes — the property that matters for train/val hygiene.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_token_count, doc_hash60, tokens


def split_assignment(
    key: Column, fractions: dict[str, float], *, salt: str = "split"
) -> Column:
    """Deterministic split label from a key column: hash the salted key
    into [0, 1) and carve the unit interval by ``fractions`` (must sum
    to 1). Same key -> same split, forever, on any engine."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = (doc_hash60(F.concat(F.lit(salt), key.cast("string"))) % 1_000_000) / 1_000_000.0
    expr: Column | None = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def deterministic_split(
    docs: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Add a reproducible ``split`` column (e.g. train/val/test) keyed on
    the document id. No shuffle — evaluated inside the scan."""
    return docs.withColumn(
        out, split_assignment(F.col(id_col), fractions, salt=salt)
    )


def stratified_sample(
    docs: DataFrame,
    *,
    stratum: str,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """EXACT-size deterministic stratified sample: keep
    ``floor(fraction * |stratum|)`` rows per stratum, chosen by salted
    hash rank. Unlike ``df.sample`` (per-row Bernoulli — stratum sizes
    are binomial random variables AND depend on partitioning), this is
    reproducible across engines, runs, and cluster sizes, and each
    stratum's size is exactly what an eval-set budget asked for.

    One shuffle on the stratum; the rank and the stratum count share the
    same window partitioning. Tie-safe: ranks order by (hash, id).
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    from pyspark.sql import Window

    h = doc_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum)
    ranked = docs.withColumn("__h", h).withColumn(
        "__rn", F.row_number().over(w.orderBy("__h", id_col))
    ).withColumn("__n", F.count(F.lit(1)).over(w))
    return (
        ranked.where(F.col("__rn") <= F.floor(F.lit(fraction) * F.col("__n")))
        .drop("__h", "__rn", "__n")
    )


def weighted_sample_es(
    df: DataFrame,
    *,
    k: int,
    weight_col: str,
    by: str | None = None,
    id_col: str = "doc_id",
    salt: str = "es",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic weight-proportional sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, the A-ES scheme): each row gets the
    key ``ln(u) / w`` with ``u`` a reproducible md5-derived uniform in
    (0, 1), and the ``k`` LARGEST keys per group are the sample —
    exactly equivalent to ``u ** (1/w)`` top-k, the one-pass
    distributed replacement for sequential weighted reservoirs.
    -> input columns + ``(es_key, sample_rank)``, ``sample_rank <= k``.

    Unlike :func:`stratified_sample` (uniform, fraction-sized), rows
    are drawn with probability proportional to ``weight_col`` — the
    standard pick for token-weighted corpus subsampling (weight =
    token count samples tokens, not documents, uniformly).

    Determinism across engines: ``u = (hash60(id || salt) % 2^20 + 1)
    / (2^20 + 1)`` — exact rational from the shared md5 hash — and
    the key is rounded to ``round_to`` with an id tiebreak, so libm
    ulp differences in ``ln`` cannot reorder the pick (the same
    convention every cosine/entropy query uses). Non-positive weights
    are excluded (their inclusion probability is 0).

    Scale shape: scan-stage key computation, ONE shuffle for the
    per-group top-k window (or a TakeOrderedAndProject when ``by`` is
    None); group cardinality bounds the output at k rows each."""
    if k < 1:
        raise ValueError("weighted_sample_es needs k >= 1")
    m = 1 << 20
    u = (
        F.pmod(
            doc_hash60(
                F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
            ),
            F.lit(m),
        )
        + 1
    ).cast("double") / F.lit(float(m + 1))
    w = F.col(weight_col).cast("double")
    # + 0.0 normalizes the -0.0 a just-under-zero key rounds to
    # (IEEE: -0.0 + 0.0 = +0.0 on both engines; Spark's HALF_UP round
    # drops the sign, DuckDB's keeps it)
    key = F.round(F.log(u) / w, round_to) + F.lit(0.0)
    from pyspark.sql import Window

    keyed = df.where(w > 0).withColumn("es_key", key)
    if by is None:
        # global top-k: TakeOrderedAndProject (k rows to one task),
        # then the rank window runs over only those k rows
        top = keyed.orderBy(F.desc("es_key"), F.col(id_col)).limit(k)
        rank = F.row_number().over(
            Window.orderBy(F.desc("es_key"), F.col(id_col))
        )
        return top.withColumn("sample_rank", rank)
    rank = F.row_number().over(
        Window.partitionBy(by).orderBy(F.desc("es_key"), F.col(id_col))
    )
    return keyed.withColumn("sample_rank", rank).where(
        F.col("sample_rank") <= k
    )


def pack_shards(
    docs: DataFrame,
    *,
    shard_tokens: int,
    group: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget shard planner (sequence-packing prelude): within
    each ``group``, documents are laid out in id order and cut into
    shards of ``~shard_tokens`` BPE tokens by token OFFSET —
    ``shard_id = floor(tokens_before / shard_tokens)`` — so shard
    boundaries are a pure function of the data (any engine, any
    partitioning, same layout). Returns one row per
    ``(group, shard_id)``: doc count, token sum, and the id span a
    packing job would read.

    Scale shape: the running token sum is one window pass per group
    partition (the 100 TB layout keys shards by split/group exactly so
    this window never needs a global order), and the rollup reuses the
    same partitioning.
    """
    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be positive")
    from pyspark.sql import Window

    toks = bpe_token_count(F.col(text_col))
    w = (
        Window.partitionBy(group)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = docs.select(
        F.col(group), F.col(id_col), toks.alias("__t")
    ).withColumn(
        "shard_id",
        F.floor((F.sum("__t").over(w) - F.col("__t")) / F.lit(shard_tokens)).cast(
            "long"
        ),
    )
    return laid.groupBy(group, "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__t").alias("total_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )


def kmv_distinct(
    df: DataFrame,
    *,
    key: str,
    col: str,
    k: int = 32,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group ->
    ``(key, n_exact, est_distinct)``.

    Unlike HLL (``approx_count_distinct``), whose registers are
    implementation-defined, KMV over the engine-independent 60-bit md5
    hash is bit-deterministic: the estimate ``(k-1) * 2^60 / kth_min``
    is a pure function of the data, so a DuckDB oracle can reproduce it
    exactly. Groups with fewer than ``k`` distinct values fall back to
    the exact count (the sketch IS exact below k).

    Scale shape: distinct on ``(key, hash)`` (map-side combinable, the
    raw ``col`` never leaves the scan stage), then one window pass per
    key partition to rank hashes. At 100 TB you'd keep only the k
    smallest per partition before the shuffle; the distinct already
    bounds the shuffle to one row per distinct value, and the final
    per-key state is k longs — same as a production sketch.
    """
    if k < 2:
        raise ValueError("kmv_distinct requires k >= 2")
    from pyspark.sql import Window

    d = df.select(F.col(key), doc_hash60(F.col(col)).alias("__h")).distinct()
    w = Window.partitionBy(key).orderBy("__h")
    r = d.withColumn("__rn", F.row_number().over(w))
    agg = r.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__kth"),
    )
    est = F.round(
        F.when(
            F.col("__kth").isNotNull(),
            F.lit(float(k - 1)) * F.lit(2.0**60) / F.col("__kth"),
        ).otherwise(F.col("n_exact").cast("double")),
        3,
    )
    return agg.select(F.col(key), F.col("n_exact"), est.alias("est_distinct"))


def length_buckets(
    docs: DataFrame,
    *,
    bucket_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence-packing statistics: bucket documents by BPE-ish token
    count -> ``(bucket, n_docs, total_tokens)`` with
    ``bucket = floor(tokens / bucket_tokens)``. One map-side-combinable
    groupBy; the bucket column is what a packing job partitions by."""
    toks = bpe_token_count(F.col(text_col))
    return (
        docs.select(
            F.col(id_col),
            F.floor(toks / bucket_tokens).cast("long").alias("bucket"),
            toks.alias("__t"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("total_tokens"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style overlapping token chunking: split each document into
    windows of ``chunk_tokens`` tokens advancing by ``stride``
    -> ``(doc_id, chunk_id, start_token, n_tokens, chunk_text)``.

    Chunk starts are ``0, stride, 2*stride, ...`` up to the last start
    that still begins inside the document; the final chunk may be short
    (it is never back-padded — retrieval wants real text only). A
    document shorter than ``chunk_tokens`` yields exactly one chunk.

    Scale shape: pure scan-stage work — tokenize once per row, build the
    start offsets with ``sequence``, and ``posexplode`` the slices. No
    shuffle, no UDF; output rows inherit the input partitioning, which
    is what a downstream embedding job wants to map over.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).where(F.size("__toks") > 0)
    # last chunk start: largest multiple of stride strictly below n
    starts = F.sequence(
        F.lit(0),
        ((F.size("__toks") - 1) / stride).cast("long") * stride,
        F.lit(stride),
    )
    chunks = base.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_id", "start_token"),
        F.col("__toks"),
    )
    piece = F.slice(F.col("__toks"), F.col("start_token") + 1, chunk_tokens)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "start_token",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pattern_scrub(
    docs: DataFrame,
    patterns: dict[str, str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    replacement: str = "<scrubbed>",
) -> DataFrame:
    """PII/sensitive-pattern scrubbing pass: count and redact every
    regex in ``patterns`` (name -> pattern) from the text ->
    ``(doc_id, <name>_hits ... per pattern, scrubbed_text,
    chars_removed)``.

    Patterns are applied in dict order against the ORIGINAL text for
    counting (so overlapping patterns each report true hit counts) and
    sequentially for redaction. Keep patterns in the portable
    RE2-compatible subset (no backreferences or lookaround) so the same
    literal runs on Spark (java.util.regex) and any RE2-based engine —
    the repo's DuckDB oracles rely on this.

    Scale shape: pure scan-stage projection, the same never-shuffle
    contract as ``normalized_text`` cleaning; regex evaluation is
    JVM-side inside whole-stage codegen, no Python in the loop.
    """
    if not patterns:
        raise ValueError("patterns must be non-empty")
    cols = [F.col(id_col).alias("doc_id")]
    for name, pat in patterns.items():
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(
                f"{name}_hits"
            )
        )
    scrubbed = F.col(text_col)
    for pat in patterns.values():
        scrubbed = F.regexp_replace(scrubbed, pat, replacement)
    cols.append(scrubbed.alias("scrubbed_text"))
    cols.append(
        (F.length(F.col(text_col)) - F.length(scrubbed)).cast("long").alias(
            "chars_removed"
        )
    )
    return docs.select(*cols)


def vocab_coverage(
    docs: DataFrame,
    *,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-sizing diagnostic: fit a top-``vocab_size`` frequency
    vocabulary on the corpus, then measure per-document out-of-vocabulary
    rate -> ``(doc_id, n_tokens, oov_tokens, oov_ratio)`` with the ratio
    quantized to 6 decimals engine-independently.

    Vocabulary rank ties break on the term string, so the fitted vocab
    (and therefore every ratio) is deterministic.

    Scale shape: the term-frequency table is vocabulary-sized and its
    top-``vocab_size`` cut is a TakeOrderedAndProject (k rows, never a
    global sort of the term table); the cut is BROADCAST and probed
    map-side on a second scan, then re-aggregated per document — token
    rows never shuffle on the term key (same contract as
    ``retrieval.unigram_logprob``).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), "term")
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("oov_tokens"),
        )
    )
    ratio = F.col("oov_tokens") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "oov_tokens",
        (F.floor(ratio * 1e6 + F.lit(0.5)) / 1e6).alias("oov_ratio"),
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Domain-reweighting sampler: keep each document with its source's
    target rate (Bernoulli on the deterministic salted hash), the
    standard way a pretraining mix up/down-weights domains.

    Same key + salt -> same keep decision on any engine, any run, any
    partitioning (the property train-data reproducibility requires; the
    salt gives independent draws from the split/sample operators).

    Scale shape: pure scan-stage filter — the rate lookup is a plan-time
    CASE chain over the (small, bounded) source domain and the hash is
    one md5 per row; no shuffle, no sampling state.
    """
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    u = (
        doc_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % 1_000_000
    ) / 1_000_000.0
    rate_col = F.lit(float(default_rate))
    for name, rate in rates.items():
        rate_col = F.when(
            F.col(source_col) == name, F.lit(float(rate))
        ).otherwise(rate_col)
    return docs.where(u < rate_col)


def global_order_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "order",
    shards: int = 256,
    out: str = "train_order",
) -> DataFrame:
    """Deterministic global training order: a reproducible permutation
    index 0..N-1 over the salted 60-bit hash (ties on id) — the
    "shuffle the corpus once, identically, on any cluster" step before
    sequence packing.

    Scale shape — the two-pass shard-offset pattern, NOT a global
    window: a ``row_number() OVER (ORDER BY hash)`` has no PARTITION BY,
    so Spark would funnel 100 TB through ONE task. Instead: (1) bucket
    rows into ``shards`` hash-range shards and count each (tiny agg),
    (2) turn counts into cumulative shard offsets (shard-count-sized
    window, executes in one task on ``shards`` rows), broadcast them
    back, and (3) rank WITHIN each shard (parallel window) and add the
    shard's offset. Because the shard is a prefix of the hash, shard
    order + in-shard order = global hash order, so the index is
    identical to the single-task form — verified by the DuckDB oracle.
    """
    if shards < 1:
        raise ValueError("shards must be >= 1")
    from pyspark.sql import Window

    h = doc_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # shard by the hash PREFIX so shard id is monotone in the hash:
    # global order == (shard, hash, id) order
    with_shard = df.withColumn("__h", h).withColumn(
        "__shard", (F.col("__h") / F.lit(2**60 // shards)).cast("long")
    )
    counts = with_shard.groupBy("__shard").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # unpartitioned window is BOUNDED: the offset table has exactly
    # `shards` rows (plan-time constant), never data-sized
    w_off = (
        Window.orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "__shard", (F.sum("__n").over(w_off) - F.col("__n")).alias("__off")
    )
    w_in = Window.partitionBy("__shard").orderBy("__h", id_col)
    return (
        with_shard.join(F.broadcast(offsets), "__shard")
        .withColumn(
            out, (F.row_number().over(w_in) - 1 + F.col("__off")).cast("long")
        )
        .drop("__h", "__shard", "__off")
    )


def dsir_logweights(
    docs: DataFrame,
    *,
    n_buckets: int = 1024,
    target_col: str = "lang",
    target_value: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights for domain-targeted data selection
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling", arXiv:2302.03169) -> ``(doc_id, n_tokens,
    dsir_logweight)``.

    Features are hashed unigram buckets (the paper's hashed n-gram
    feature space): each token maps to ``doc_hash60(term) % n_buckets``.
    Two smoothed bag-of-buckets unigram models are fitted — the TARGET
    distribution over rows where ``target_col == target_value`` and the
    RAW distribution over the whole corpus — and each document scores
    the sum over its token instances of
    ``ln(p_target(bucket) / p_raw(bucket))`` with add-one smoothing,
    quantized to 1e-6. High weight = looks like the target domain;
    resampling by these weights is the paper's selection step (the
    deterministic sampler in :func:`mixture_sample` composes directly).

    Documents with zero tokens produce no row (no feature evidence).

    Scale shape: the feature table is ``n_buckets`` rows — broadcast —
    so the corpus is scanned twice (once to fit both models: a single
    map-side-combinable groupBy(bucket) with a conditional count; once
    to score) and is never shuffled on the token key, the same
    two-scan/broadcast profile as retrieval.unigram_logprob.
    """
    if n_buckets < 2:
        raise ValueError("dsir_logweights needs n_buckets >= 2")
    tok = _dsir_tokens(
        docs, n_buckets=n_buckets, target_col=target_col,
        target_value=target_value, id_col=id_col, text_col=text_col,
    )
    table = dsir_bucket_table(
        docs, n_buckets=n_buckets, target_col=target_col,
        target_value=target_value, id_col=id_col, text_col=text_col,
    )
    return (
        tok.join(F.broadcast(table), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.floor(F.sum("__lr") * 1e6 + F.lit(0.5)) / 1e6
            ).alias("dsir_logweight"),
        )
    )


def _dsir_tokens(
    docs: DataFrame,
    *,
    n_buckets: int,
    target_col: str,
    target_value: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(doc_id, __is_tgt, bucket) exploded token rows — shared by the
    model fit and the scoring join."""
    flag = F.col(target_col) == F.lit(target_value)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        flag.alias("__is_tgt"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).select(
        "doc_id",
        "__is_tgt",
        (doc_hash60(F.col("term")) % n_buckets).alias("bucket"),
    )


def dsir_bucket_table(
    docs: DataFrame,
    *,
    n_buckets: int = 1024,
    target_col: str = "lang",
    target_value: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The fitted DSIR model as a relation: ``(bucket, __lr)`` with
    ``__lr = ln(p_target(bucket)/p_raw(bucket))`` under add-one
    smoothing — ``n_buckets`` rows, always broadcastable. Exposed
    separately so a stream can score incoming documents against the
    offline-fitted model (the production fit-offline/score-online
    split; see q_docs_dsir_stream)."""
    tok = _dsir_tokens(
        docs, n_buckets=n_buckets, target_col=target_col,
        target_value=target_value, id_col=id_col, text_col=text_col,
    )
    counts = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("__is_tgt"), 1)).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cr").cast("double").alias("__nr"),
        F.sum("ct").cast("double").alias("__nt"),
    )
    b = float(n_buckets)
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.log(
            ((F.col("ct") + F.lit(1.0)) / (F.col("__nt") + F.lit(b)))
            / ((F.col("cr") + F.lit(1.0)) / (F.col("__nr") + F.lit(b)))
        ).alias("__lr"),
    )


def source_cap(
    docs: DataFrame,
    *,
    per_source: int = 10,
    n_salts: int = 32,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source quality quota (the CommonCrawl-pipeline "domain cap":
    no single source may dominate the corpus): keep the ``per_source``
    highest-quality documents of each source, ranked by
    ``(quality_score DESC, doc_id)`` -> ``(doc_id, source, src_rank,
    quality_score)``.

    Quality is the deterministic 4-decimal ``quality_metrics`` score
    (functions/text.py), so the rank order — and therefore the kept
    set — is engine-stable with no float drift in the compare.

    Scale shape: a naive per-key window rank shuffles the whole corpus
    on ``source`` and serializes each source through one task — fatal
    when one domain holds 10% of 100 TB. This runs the standard
    two-stage top-k instead: stage 1 ranks within ``(source, salt)``
    (salt = doc_id % n_salts) and keeps ``per_source`` per salt — an
    evenly-spread shuffle that cuts every source to at most
    ``n_salts * per_source`` rows; stage 2 ranks the survivors within
    ``source``. The stage-1 prune is lossless: the global top-k of a
    source is contained in the union of its per-salt top-k. Output is
    identical to the naive plan; only the shuffle geometry differs.
    """
    from pyspark.sql import Window

    from ..functions.text import quality_metrics

    if per_source < 1 or n_salts < 1:
        raise ValueError("source_cap needs per_source >= 1, n_salts >= 1")

    # explode(array(...)) is a Generate barrier: the (token-bound)
    # quality struct is evaluated once per row, not once per extracted
    # field (same trick as the text_quality query)
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.explode(F.array(quality_metrics(F.col(text_col)))).alias("__q"),
    ).select(
        "doc_id", "source", F.col("__q.quality_score").alias("quality_score")
    )
    stage1 = Window.partitionBy(
        "source", F.col("doc_id") % n_salts
    ).orderBy(F.desc("quality_score"), "doc_id")
    pruned = (
        scored.withColumn("__r1", F.row_number().over(stage1))
        .where(F.col("__r1") <= per_source)
        .drop("__r1")
    )
    stage2 = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), "doc_id"
    )
    return (
        pruned.withColumn("src_rank", F.row_number().over(stage2))
        .where(F.col("src_rank") <= per_source)
        .select("doc_id", "source", "src_rank", "quality_score")
    )


def key_skew(
    df: DataFrame,
    *,
    key: str,
    top_n: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """One-row key-distribution skew report ->
    ``(n_keys, total_rows, max_share, top{N}_share, gini)`` — the
    operational diagnostic behind every partitioning decision in this
    repo: a max_share near 1/partitions stalls a shuffle on one task,
    and the Gini coefficient summarizes how far the key histogram is
    from uniform (0 = uniform, -> 1 = one dominant key). Run it on
    the join/groupBy key BEFORE picking salting or AQE skew handling.

    Plan: one combinable count per key, then ONE DISTRIBUTED exact
    global rank over the |keys|-row table (operators/rank.py two-pass
    approxQuantile-bucket form — no single-partition sort even when
    the key space itself is large) and one final aggregate; the
    descending top-N selector is derived from the ascending rank and
    the rank pass's free total (sum-over-top-N is tie-invariant — see
    the in-body note). All sums are exact integers (rank * count), so
    only the emitted ratios are quantized:
    ``gini = 2*sum(i*x_i)/(k*total) - (k+1)/k`` over ascending
    (count, key) ranks.
    """
    from ..cache import persist_tracked
    from .rank import ranked_with_total
    from .timeseries import quantize

    if top_n < 1:
        raise ValueError("key_skew needs top_n >= 1")
    # Persist the small |keys|-row count table: the rank call takes
    # two driver actions + the final job over it, and the rank's
    # internal persist covers only its own two actions — uncached, the
    # full-corpus scan+groupBy would re-run for each. Tracked (the
    # bench/oracle harnesses unpersist after the query drains).
    # Rank-key precondition: __n = count(*) per key — a non-null
    # positive long by construction.
    counts = persist_tracked(
        df.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    )
    # ONE two-pass rank, not two (r12): the descending row_number was
    # only consumed as ``rd <= top_n`` inside a SUM of __n — and any
    # top-N cut by (__n DESC, tiebreak) selects the same MULTISET of
    # __n values as the last N rows of the ascending rank (sets differ
    # only in which EQUAL-__n rows they pick), so the sum is exact
    # either way: ``__ra > total - top_n`` replaces the second rank's
    # two driver jobs + its extra corpus-table window shuffle.
    ranked, n_total = ranked_with_total(
        counts, "__n", tiebreak=key, out="__ra", descending=False
    )
    ranked = ranked.select("__n", "__ra")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("total_rows"),
        F.max("__n").alias("__mx"),
        F.sum(F.col("__ra") * F.col("__n")).alias("__si"),
        F.sum(
            F.when(
                F.col("__ra") > F.lit(n_total - top_n), F.col("__n")
            ).otherwise(0)
        ).alias("__topn"),
    )
    k = F.col("n_keys").cast("double")
    tot = F.col("total_rows").cast("double")
    gini = (
        2.0 * F.col("__si").cast("double") / (k * tot) - (k + 1.0) / k
    )
    return agg.select(
        "n_keys",
        "total_rows",
        quantize(F.col("__mx").cast("double") / tot, round_to)
        .alias("max_share"),
        quantize(F.col("__topn").cast("double") / tot, round_to)
        .alias(f"top{top_n}_share"),
        quantize(gini, round_to).alias("gini"),
    )


def bpe_merges(
    docs: DataFrame,
    *,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE tokenizer-vocabulary induction: learn the first
    ``n_merges`` byte-pair merges over the corpus (Sennrich et al.
    2016) -> ``(merge_rank, left, right, merged, pair_count)``.

    The classic algorithm runs on the WORD-FREQUENCY table, not the
    corpus: one corpus scan builds ``(word, count)`` (vocab-sized —
    millions of rows at 100 TB, not billions), and every merge
    iteration then touches only that table: count adjacent symbol
    pairs weighted by word count (map-side-combinable groupBy), pick
    the argmax pair (TakeOrderedAndProject, 1 row to the driver —
    the merge decision IS driver-state, exactly like kmeans
    centroids), and apply the merge everywhere.

    Symbol sequences are encoded as strings — ``" a  b  c "``, every
    symbol owning one space on each side — so applying a merge is ONE
    literal ``replace(" l  r ", " lr ")``: non-overlapping left-to-
    right replacement is EXACTLY greedy BPE application (a merged
    symbol can never equal its own left half, so chain-merges cannot
    happen within a pass), and the DuckDB oracle replays the identical
    primitive. Tokens are ``[a-z0-9]+`` (functions.text.tokens), so
    symbols never contain spaces and the encoding is unambiguous.

    Each iteration's argmax collect is ALSO the action that populates
    the current vocab's cache (the pair aggregate reads every
    partition), so no separate count() job is needed; the predecessor
    is released one step behind, keeping lineage depth and cached
    footprint at ~one table regardless of ``n_merges``."""
    if n_merges < 1:
        raise ValueError("bpe_merges needs n_merges >= 1")
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.regexp_replace(F.col("w"), "(.)", " $1 ").alias("repr"),
            "cnt",
        )
    )
    cur = vocab.persist()
    prev: DataFrame | None = None
    out: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            syms = F.split(F.trim(F.col("repr")), "  ")
            pairs = cur.select(
                F.explode(
                    F.when(
                        F.size(syms) >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size(syms) - 1),
                            lambda i: F.struct(
                                F.element_at(syms, i).alias("l"),
                                F.element_at(syms, i + 1).alias("r"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<l:string,r:string>>")
                    )
                ).alias("p"),
                "cnt",
            )
            best = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), "l", "r")
                .limit(1)
                .collect()
            )
            # the collect above computed every partition of cur (full
            # pair shuffle), so cur's cache is populated and the
            # one-step-behind predecessor can go
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            row = best[0]
            l, r, c = row["l"], row["r"], int(row["c"])
            out.append((rank, l, r, l + r, c))
            nxt = cur.select(
                F.replace(
                    F.col("repr"),
                    F.lit(f" {l}  {r} "),
                    F.lit(f" {l}{r} "),
                ).alias("repr"),
                "cnt",
            ).persist()
            prev = cur
            cur = nxt
    finally:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return spark.createDataFrame(
        out,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


def bpe_apply_stats(
    docs: DataFrame,
    *,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list (see :func:`bpe_merges`) to the
    corpus and report per-document segmentation stats ->
    ``(doc_id, n_tokens, n_base_symbols, n_symbols, compression)``
    where ``n_base_symbols`` counts characters (the merge-0
    segmentation), ``n_symbols`` counts symbols after the merges, and
    ``compression = n_base_symbols / n_symbols`` — the fertility
    audit of the induced vocabulary, run before committing a
    tokenizer to a training corpus.

    Scale shape: a pure scan-stage pipeline — explode tokens, build
    the spaced-symbol encoding, apply ``len(merges)`` literal
    replaces in learned order (each exactly greedy, see
    :func:`bpe_merges`), and one map-side-combinable groupBy(doc).
    The merge list is plan-time literals (driver state), so nothing
    joins and nothing extra shuffles."""
    sym_sep = "  "
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    repr_col = F.regexp_replace(F.col("w"), "(.)", " $1 ")
    for l, r in merges:
        repr_col = F.replace(
            repr_col, F.lit(f" {l}{sym_sep}{r} "), F.lit(f" {l}{r} ")
        )
    per_tok = tk.select(
        "doc_id",
        F.length("w").alias("__base"),
        F.size(F.split(F.trim(repr_col), sym_sep)).alias("__sym"),
    )
    agg = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__base").alias("n_base_symbols"),
        F.sum("__sym").alias("n_symbols"),
    )
    n_base = F.coalesce("n_base_symbols", F.lit(0))
    n_sym = F.coalesce("n_symbols", F.lit(0))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            n_base.alias("n_base_symbols"),
            n_sym.alias("n_symbols"),
            F.when(
                n_sym > 0,
                F.round(n_base.cast("double") / n_sym.cast("double"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("compression"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff — the refresh-ingest audit "what changed
    between yesterday's crawl and today's": per document id, one of
    ``added`` (new only), ``removed`` (old only), ``modified`` (both,
    content hash differs), ``unchanged`` -> ``(doc_id, status)``.
    Run before re-deduplicating a refreshed corpus: only ``added`` and
    ``modified`` docs need to re-enter the dedup/quality pipeline.

    Scale shape: both sides reduce to (id, 128-bit md5) at the scan
    stage — text never crosses the shuffle — then ONE full-outer
    equi-join on the id (both sides hash-partition identically; at
    rest, id-bucketed snapshots make it shuffle-free). Status is a
    scan-stage CASE over null-ness and hash equality."""
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("__ho"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("__hn"),
    )
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", status.alias("status")
    )
