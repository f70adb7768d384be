"""Lexical retrieval over the documents table: BM25 ranking for a fixed
term query — the classic keyword-search counterpart to the embedding
similarity operators in ``simsearch``.

Scale shape: per-term term frequencies are scan-stage array expressions
(no explode, no inverted-index shuffle needed for a bounded query), the
corpus statistics (N, avgdl, per-term document frequencies) reduce to a
SINGLE broadcast row, and the final ranking is a TakeOrderedAndProject
(partial top-k per partition, k rows to the driver). Two scans of the
corpus total — both pruned to (id, tokens) — and zero Python.

Determinism note: scores use ``ln`` and double arithmetic in the same
expression shape on both engines; outputs are rounded to 6 decimals for
the oracle (values are O(1-10), cross-libm ulp noise is ~1e-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import kgram_hashes, tokens

__all__ = [
    "bigram_logprob",
    "bm25_topk",
    "hybrid_rrf_topk",
    "boilerplate_metrics",
    "repetition_metrics",
    "tfidf_top_terms",
    "pmi_bigrams",
    "top_terms",
    "unigram_logprob",
]


def boilerplate_metrics(
    docs: DataFrame,
    *,
    k: int,
    min_df: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate share: the fraction of a doc's word
    k-gram INSTANCES whose gram occurs in >= ``min_df`` distinct
    documents -> ``(doc_id, n_grams, n_boiler, boiler_ratio)`` (ratio
    rounded 4; gram-free docs emit ratio 0.0).

    Corpus-frequent k-grams are navigation chrome, license headers, and
    template text — the standard pre-training cleanup signal (the
    C4/Gopher "repeated passage" class). Positional grams (multiplicity
    kept) so a doc that is 90% repeated chrome scores 0.9 even when the
    distinct-shingle view looks clean.

    Plan: one explode of scan-stage gram hashes, a distinct-doc count
    per gram whose ``>= min_df`` survivor set is SMALL (frequent grams
    only) and broadcast by AQE into the join back, then one groupBy on
    doc_id. No pairwise work anywhere — linear in corpus size.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(kgram_hashes(F.col(text_col), k)).alias("gh"),
    )
    freq = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gh", F.lit(1).alias("__boiler"))
    )
    per_doc = (
        grams.join(freq, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("__boiler"), F.lit(0)).alias("n_boiler"),
        )
    )
    # left join back to ALL docs so gram-free rows (short docs) appear
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                    F.col("n_boiler") / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("boiler_ratio"),
        )
    )


def top_terms(
    docs: DataFrame,
    *,
    topk: int,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide exact heavy hitters: the ``topk`` terms by total
    occurrence count -> ``(term, occurrences, doc_freq)``.

    One explode + one groupBy(term): occurrence counts partially
    aggregate map-side before the shuffle, and doc_freq rides the same
    shuffle as ``count(DISTINCT doc_id)`` (Spark plans it as a two-phase
    expand over the already-shuffled relation). The final top-k is a
    TakeOrderedAndProject — k rows to the driver, never the term table.
    Ties break on the term string, so output is deterministic.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.length("term") >= min_len)
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("occurrences"), "term")
        .limit(topk)
    )


def repetition_metrics(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-document repetition profile for corpus quality filtering:
    ``(doc_id, n_tokens, n_distinct, dup_ratio, top_share)`` where
    ``dup_ratio = 1 - distinct/total`` (fraction of tokens that repeat
    an earlier one) and ``top_share`` is the most frequent token's share
    of the document. Documents with zero tokens are dropped.

    Shape: explode -> per-(doc, term) counts (map-side combinable) ->
    one per-doc aggregate. Both aggregations shuffle on doc_id-prefixed
    keys, so the second reuses the first's partitioning. Ratios are
    integer-division-to-double in a fixed expression shape and rounded,
    so any SQL engine reproduces them exactly.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    per_term = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    total = F.sum("tf").cast("double")
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.lit(1.0) - F.count(F.lit(1)).cast("double") / total, round_to
            ).alias("dup_ratio"),
            F.round(F.max("tf").cast("double") / total, round_to).alias(
                "top_share"
            ),
        )
    )


def gopher_repetition(
    docs: DataFrame,
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    hash_grams: bool = False,
) -> DataFrame:
    """Gopher-style n-GRAM repetition signals (Rae et al. 2021,
    appendix A1.1 — the repetition half of their quality battery;
    the unigram half is :func:`repetition_metrics`), adapted to
    word n-grams since granularity must be a pure function of the
    data: per document,

    - ``top{n}_frac`` for each ``n`` in ``top_ns``: the character
      mass of the MOST FREQUENT word n-gram (its occurrence count x
      its in-word character length, spaces excluded) over the
      document's total token characters — boilerplate phrases inflate
      it. Ties break to the lexicographically smallest gram. Can
      exceed 1 when occurrences overlap (Gopher's own definition
      shares this); it is a filter signal, not a probability.
    - ``dup{n}_frac`` for each ``n`` in ``dup_ns``: the fraction of
      n-gram POSITIONS whose gram occurs more than once in the
      document — long verbatim self-repeats push it toward 1.

    Zero-gram documents (fewer than n tokens) report 0.0 for that n.

    Scale shape: ONE explode into (doc, n, gram) rows (sum over ns of
    W-n+1 rows per doc), one groupBy(doc, n, gram), one groupBy(doc,
    n) reusing the doc-prefixed partitioning, then a conditional-
    aggregation pivot to columns and a join back to the scan-stage
    per-doc character totals (shuffles on doc_id). Nothing is
    corpus-global; skew is bounded by document length. The (doc, n,
    gram) keys are unique-ish per doc so the map-side combine buys
    little — the cost IS the ~5x-token-count string-key shuffle
    (measured ~12x wall for 10x rows at both 32 and 320 shuffle
    partitions: a bandwidth-bound aggregation, linear plan, no skew —
    at cluster scale it parallelizes with executors). Measured dead
    end, for the record: computing the
    battery IN-ROW with array_sort + run-length HOF folds (zero
    shuffle on paper) is ~100x SLOWER — interpreted HOF evaluation
    has no common-subexpression elimination, so every
    try_element_at(sorted_grams, i) lambda access re-evaluates the
    whole array_sort, going quadratic per document (observed: one
    task burning 10 CPU-minutes on 500 docs) — the same class of
    trap as the repo's documented 1000-term flat-expression cliff.

    ``hash_grams=True`` keys the tf aggregation by the 128-bit md5 of
    the gram instead of its text (the hash_spans convention): the
    shuffle key becomes fixed 16 bytes and the gram TEXT rides only
    inside a ``min`` aggregate (every row under one key holds the
    same gram, so the map-side combiner keeps one copy per key per
    partition — a within-doc-repeated gram ships once, not per
    occurrence). The text must ride somewhere: the output's top-gram
    pick tie-breaks on (tf desc, gram asc) and its char mass needs
    the gram length, so output is bit-identical to the text-keyed
    form up to md5 collisions (~2^-64 at 2^30 distinct grams)."""
    ns = sorted(set(top_ns) | set(dup_ns))
    if not ns or min(ns) < 2:
        raise ValueError("gopher_repetition needs n-gram sizes >= 2")
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__t"),
        F.length(F.concat_ws("", toks)).alias("__chars"),
    )
    per_doc = base.select(
        "doc_id",
        F.size("__t").alias("n_tokens"),
        F.col("__chars").alias("total_chars"),
    )
    def _ngrams(n: int):
        # NB: a one-arg lambda on purpose — PySpark passes (element,
        # index) to two-arg transform lambdas, which would shadow a
        # bound default
        return F.when(
            F.size("__t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - F.lit(n - 1)),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice(F.col("__t"), i, n), " ").alias(
                        "g"
                    ),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    grams = base.select(
        "doc_id",
        F.explode(F.flatten(F.array(*[_ngrams(n) for n in ns]))).alias(
            "s"
        ),
    ).select("doc_id", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
    if hash_grams:
        per_gram = (
            grams.groupBy("doc_id", "n", F.md5("g").alias("__h"))
            .agg(F.count(F.lit(1)).alias("tf"), F.min("g").alias("g"))
            .drop("__h")
        )
    else:
        per_gram = grams.groupBy("doc_id", "n", "g").agg(
            F.count(F.lit(1)).alias("tf")
        )
    # top gram by (tf desc, gram asc) via min(struct(-tf, gram));
    # its in-word char mass excludes the n-1 joining spaces
    per_n = per_gram.groupBy("doc_id", "n").agg(
        F.min(
            F.struct((-F.col("tf")).alias("neg"), F.col("g").alias("g"))
        ).alias("__top"),
        F.sum(F.when(F.col("tf") > 1, F.col("tf")).otherwise(F.lit(0)))
        .alias("__dup_pos"),
        F.sum("tf").alias("__pos"),
    )
    top_mass = (
        (F.lit(0) - F.col("__top.neg"))
        * (F.length("__top.g") - (F.col("n") - 1))
    ).cast("double")
    agg_cols = []
    for n in top_ns:
        agg_cols.append(
            F.round(
                F.coalesce(
                    F.max(F.when(F.col("n") == n, top_mass)), F.lit(0.0)
                )
                / F.col("total_chars"),
                round_to,
            ).alias(f"top{n}_frac")
        )
    for n in dup_ns:
        agg_cols.append(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("n") == n,
                            F.col("__dup_pos").cast("double")
                            / F.col("__pos"),
                        )
                    ),
                    F.lit(0.0),
                ),
                round_to,
            ).alias(f"dup{n}_frac")
        )
    return (
        per_doc.where(F.col("total_chars") > 0)
        .join(per_n, "doc_id", "left")
        .groupBy("doc_id", "n_tokens", "total_chars")
        .agg(*agg_cols)
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    topk: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the ``topk`` terms by TF-IDF
    (``tf * ln(N / df)``) -> ``(doc_id, term, tfidf, rank)``.

    The inverted-index shape: explode tokens -> per-(doc, term) counts
    (map-side combinable), document frequencies from a second aggregate
    over the SAME shuffled relation (reusing its partitioning), corpus
    size as a broadcast scalar row, then one window pass per doc for the
    top-k. Ties break on the term, so output is deterministic.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_row = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_t, "term")
        .join(F.broadcast(n_row))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("doc_id", "term", "tfidf", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    *,
    terms: list[str],
    topk: int,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``topk`` documents by BM25 score for the bag-of-words query
    ``terms`` -> ``(doc_id, score)``, score descending (id ascending on
    ties). Uses the Lucene-style non-negative idf:
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(F.col(text_col))

    def tf_of(term: str):
        # NB: the lambda must be unary — pyspark's HOF helper treats a
        # second parameter as the array-index argument
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [tf_of(term).alias(f"__tf_{i}") for i, term in enumerate(terms)]
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("__dl"),
        *tf_cols,
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        df_t = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
        )
        part = idf * tf * F.lit(k1 + 1.0) / norm
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(topk)
    )


def unigram_logprob(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model quality score (the CCNet-style cheap
    perplexity proxy): fit the corpus unigram distribution, then score
    each document by its mean token log-probability ->
    ``(doc_id, n_tokens, avg_logprob)`` with
    ``avg_logprob = mean(ln(count(tok) / total_tokens))``, quantized to
    6 decimals engine-independently.

    Every token is in-vocabulary by construction (the model IS the
    corpus), so no OOV smoothing term is needed; a held-out scorer
    would add one.

    Scale shape: two scans. Scan 1 reduces to the term-frequency table
    (one groupBy(term), map-side partial; vocabulary-sized, i.e. tiny
    vs the corpus) which is BROADCAST with its total. Scan 2 explodes
    tokens, map-side hash-joins the broadcast vocab, and re-aggregates
    per document — the same partial-agg-collapses-before-exchange shape
    as decontam.benchmark_contamination. The 100 TB corpus is never
    shuffled on the token key.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n")).select(
        F.col("n").cast("double").alias("__total")
    )
    scored = (
        tok.join(F.broadcast(vocab), "term")
        .join(F.broadcast(total))
        .select("doc_id", F.log(F.col("tf") / F.col("__total")).alias("__lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("__lp").alias("__alp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("__alp") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "avg_logprob"
        ),
    )


def bigram_logprob(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model quality score with add-one smoothing — the
    sequence-aware upgrade of :func:`unigram_logprob`: fit corpus
    adjacent-pair counts, score each document by its mean pair
    log-probability ->
    ``(doc_id, n_pairs, avg_logprob)`` with
    ``lp(w1 w2) = ln((c(w1,w2) + 1) / (ctx(w1) + V))`` where ``ctx(w1)``
    is the count of pairs starting with ``w1`` and ``V`` the distinct
    vocabulary size (so unseen continuations get mass 1/(ctx+V)).
    Documents with fewer than 2 tokens emit ``n_pairs 0, NULL score``.
    Quantized to 6 decimals engine-independently.

    Scale shape: same as unigram_logprob/pmi_bigrams — the pair table is
    vocab²-bounded after map-side combine (tiny vs the corpus), context
    counts aggregate FROM the pair table (never a second corpus scan),
    V is one scalar row; all three broadcast into the second scan's
    per-doc re-aggregation. The corpus is never shuffled on a token key.
    """
    toks = tokens(F.col(text_col))
    # bind tokens once (see pmi_bigrams.pairs_of: naming the raw
    # tokens() expression inside a lambda re-splits per element)
    bound_pairs = F.element_at(F.transform(F.array(toks), _adjacent_pairs), 1)
    pair_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bound_pairs).alias("pair"),
    )
    pc = pair_rows.groupBy("pair").agg(F.count(F.lit(1)).alias("n_pair"))
    ctx = (
        pc.groupBy(F.split_part(F.col("pair"), F.lit(" "), F.lit(1)).alias("w1"))
        .agg(F.sum("n_pair").alias("n_ctx"))
    )
    vocab_n = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .agg(F.count_distinct("term").alias("__v"))
    )
    scored = (
        pair_rows.join(F.broadcast(pc), "pair")
        .join(
            F.broadcast(ctx),
            F.split_part(F.col("pair"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .join(F.broadcast(vocab_n))
        .select(
            "doc_id",
            F.log(
                (F.col("n_pair") + F.lit(1.0))
                / (F.col("n_ctx") + F.col("__v"))
            ).alias("__lp"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.avg("__lp").alias("__alp"))
    )
    # left join back so <2-token docs appear with n_pairs 0
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            (F.floor(F.col("__alp") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "avg_logprob"
            ),
        )
    )


def _adjacent_pairs(t: Column) -> Column:
    """Ordered adjacent token pairs as space-joined strings from an
    ALREADY-BOUND token array (zip head with tail); < 2 tokens -> empty
    array. Same expression shape as pmi_bigrams.pairs_of."""
    return F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def pmi_bigrams(
    docs: DataFrame,
    *,
    topk: int,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction: top-``topk`` adjacent token pairs by
    pointwise mutual information ->
    ``(w1, w2, n_pair, pmi)`` with
    ``pmi = ln((n_pair/B) / ((n_w1/T) * (n_w2/T)))`` (B = total bigram
    occurrences, T = total token occurrences), quantized to 6 decimals.
    Pairs below ``min_count`` are dropped (PMI is noise at count 1).
    Ranking ties break on (w1, w2), so output is deterministic; every
    input to the formula is an exact integer count, so the float is a
    pure function of the data — bit-identical on any engine.

    Scale shape: one scan explodes ORDERED adjacent pairs (not the
    distinct shingle set — PMI needs occurrence counts), one
    map-side-combinable groupBy per table (pair / unigram / totals); the
    unigram table and the two scalar totals are vocabulary-bounded and
    BROADCAST into the pair table. The final top-k is a
    TakeOrderedAndProject — k rows to the driver, never the pair table.
    """
    toks = tokens(F.col(text_col))

    def pairs_of(t):
        # zip the array with its own tail; t is BOUND once (see below) —
        # naming the raw tokens() expression inside a lambda makes
        # Catalyst re-evaluate the regex split per element (O(len²)
        # splits per doc; measured 10s -> 0.4s at sf0.1 for this fix)
        return F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bound_pairs = F.element_at(F.transform(F.array(toks), pairs_of), 1)
    pairs = docs.select(F.explode(bound_pairs).alias("pair"))
    uni = docs.select(F.explode(toks).alias("term"))
    pair_counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_pair")
    )
    uni_counts = uni.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    tot_b = pair_counts.agg(F.sum("n_pair").alias("__b"))
    tot_t = uni_counts.agg(F.sum("n_term").alias("__t"))
    split = F.split(F.col("pair"), " ")
    scored = (
        pair_counts.where(F.col("n_pair") >= min_count)
        .select(
            split.getItem(0).alias("w1"),
            split.getItem(1).alias("w2"),
            "n_pair",
        )
        .join(
            F.broadcast(uni_counts.withColumnRenamed("term", "w1")
                        .withColumnRenamed("n_term", "n_w1")),
            "w1",
        )
        .join(
            F.broadcast(uni_counts.withColumnRenamed("term", "w2")
                        .withColumnRenamed("n_term", "n_w2")),
            "w2",
        )
        .join(F.broadcast(tot_b))
        .join(F.broadcast(tot_t))
    )
    pmi = F.log(
        (F.col("n_pair") / F.col("__b"))
        / ((F.col("n_w1") / F.col("__t")) * (F.col("n_w2") / F.col("__t")))
    )
    return (
        scored.select(
            "w1",
            "w2",
            "n_pair",
            (F.floor(pmi * 1e6 + F.lit(0.5)) / 1e6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(topk)
    )


def char_entropy(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character-level Shannon entropy ->
    ``(doc_id, n_chars, distinct_chars, char_entropy)`` in nats —
    the cheap gibberish/compressibility filter (near-zero entropy =
    repeated filler; implausibly high = binary junk or key mash) run
    next to the token-level quality gates.

    ``H = -sum_ch (c/n) ln(c/n)`` over the exact character histogram.
    Relational shape rather than a per-row O(len x alphabet) HOF: one
    char explode, a map-side-combinable groupBy(doc, char) (per-doc
    key space is the alphabet), and a combinable per-doc re-aggregate
    — the corpus is scanned once and never shuffled on anything wider
    than (doc_id, char). Empty documents have no characters and are
    not scored. The entropy sum is quantized 1e-6 (group-sum order
    drifts across engines); each ``(c/n) ln(c/n)`` term is identical
    arithmetic on identical integers in both engines.
    """
    # NB the length guard: Spark's sequence(1, 0) counts DOWN ([1, 0]),
    # so an empty document would fabricate two empty-string "chars";
    # the guard reproduces DuckDB's empty range(1, 1) => doc dropped
    ch = docs.where(F.length(text_col) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(text_col)),
                lambda i: F.col(text_col).substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    counts = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count(F.lit(1)).alias("distinct_chars"),
    )
    p = F.col("c").cast("double") / F.col("n_chars").cast("double")
    ent = (
        counts.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.first("n_chars").alias("n_chars"),
            F.first("distinct_chars").alias("distinct_chars"),
            (
                F.floor(F.sum(-p * F.log(p)) * 1e6 + F.lit(0.5)) / 1e6
            ).alias("char_entropy"),
        )
    )
    return ent


def zipf_fit(
    docs: DataFrame,
    *,
    top_v: int = 100,
    group_col: str = "lang",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Zipf's-law fit per corpus slice: OLS of ``ln(freq)`` on
    ``ln(rank)`` over the ``top_v`` most frequent terms ->
    ``(group, n_terms, zipf_slope, zipf_intercept)``. Natural text
    sits near slope -1; a slice drifting toward 0 is
    template/boilerplate-heavy and a steep slope flags a collapsed
    vocabulary — the distribution-level health check beside the
    per-doc quality gates (repetition_metrics, char_entropy).

    Plan: one explode + one map-side-combinable (group, term) count,
    one rank window over the per-group term table, then a ``top_v``-row
    per-group OLS — map-side-combinable sums again. Ranks tiebreak on
    the term string, so the fitted point set is deterministic; the
    closed-form slope/intercept are quantized (grouped float sums
    drift across engines, and ln() may differ in the last ulp — both
    absorbed at 1e-6). The term table never leaves the cluster: at
    100 TB this is the docs_top_terms shuffle plus a window over
    |groups| * top_v rows.
    """
    from pyspark.sql import Window

    from .timeseries import quantize

    if top_v < 3:
        raise ValueError("zipf_fit needs top_v >= 3")
    tok = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    freqs = tok.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("grp").orderBy(F.desc("freq"), "term")
    ranked = freqs.select(
        "grp",
        "freq",
        F.row_number().over(w).alias("rank"),
    ).where(F.col("rank") <= top_v)
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    pts = ranked.select("grp", x.alias("__x"), y.alias("__y"))
    agg = pts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("n_terms").cast("double")
    denom = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(
        (F.col("n_terms") >= 3) & (denom != 0),
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom,
    )
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    return agg.select(
        F.col("grp").alias(group_col),
        "n_terms",
        quantize(slope, round_to).alias("zipf_slope"),
        quantize(intercept, round_to).alias("zipf_intercept"),
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    vectors: DataFrame,
    *,
    terms: list[str],
    query_vec_id: int,
    n_leg: int,
    k: int,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal-rank-fusion hybrid retrieval: fuse the BM25 lexical
    top-``n_leg`` (bag-of-words query ``terms``) with the cosine
    semantic top-``n_leg`` (probe vector ``query_vec_id``; documents
    and vectors join 1:1 on id) into

        ``rrf = sum over legs of 1 / (rrf_k + rank_in_leg)``

    (Cormack, Clarke & Buettcher 2009, the standard training-free
    fusion in RAG stacks) -> top ``k`` rows ``(doc_id, r_lex, r_sem,
    rrf_score)``, rrf descending, doc_id tiebreak. A doc absent from a
    leg contributes 0 from that leg and reports rank 0 in the output.
    The probe document itself is excluded from BOTH legs.

    Scale shape: each leg is the corresponding scan-stage operator
    (``bm25_topk``: two pruned scans + broadcast stats;
    ``cosine_topk``: broadcast query row) ending in a
    TakeOrderedAndProject — the corpus never shuffles. Everything after
    the leg cuts (rank windows, full-outer fuse, final top-k) runs on
    at most ``2 * n_leg`` rows, bounded by a PLAN-TIME constant — the
    single-partition exchanges in that tail are k-row, not corpus-row
    (the docs/PLAN_AUDIT.md Class-B bounded-tail pattern).

    Determinism: leg ranks are row_number over (rounded score desc,
    id) — both engines produce identical 6-decimal leg scores (the
    bm25/cosine oracles are value-exact), so ranks, fusion sums over
    integer ranks, and the final rounded-score cut replay exactly."""
    from .simsearch import cosine_topk

    if n_leg < 1 or k < 1:
        raise ValueError("hybrid_rrf_topk needs n_leg >= 1 and k >= 1")
    if rrf_k < 1:
        raise ValueError("hybrid_rrf_topk needs rrf_k >= 1")
    from pyspark.sql import Window

    lex = bm25_topk(
        docs.where(F.col(id_col) != query_vec_id),
        terms=terms, topk=n_leg, k1=k1, b=b,
        id_col=id_col, text_col=text_col,
    ).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("r_lex"),
    )
    sem = cosine_topk(
        vectors, query_id=query_vec_id, k=n_leg,
        id_col=vec_id_col, vec_col=vec_col,
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), "vec_id"))
        .alias("r_sem"),
    )
    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("r_lex")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("r_sem")), F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.coalesce("r_lex", F.lit(0)).alias("r_lex"),
            F.coalesce("r_sem", F.lit(0)).alias("r_sem"),
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(k)
    )
