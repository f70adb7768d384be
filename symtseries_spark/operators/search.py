"""SAX-space search operators: pattern matching, nearest-neighbor,
all-pairs similarity, motif counting.

These implement the query surface the reference only *hints* at ("HUGE
pattern collections", README.md:29-34): mindist is a lower bound on the
true Euclidean distance between z-normalized series, so every operator
here is a *pruning* primitive — filter cheap mindist first, refine with
exact distance only on survivors.

Scale notes:
* Literal query patterns are plan-time constants — no join at all.
* Pattern *collections* join via ``broadcast`` (a million SAX words is
  a few tens of MB — always broadcastable).
* All-pairs self-joins group by word prefix buckets when approximate
  mode is requested; exact mode is a full cross join and is flagged as
  such (the reference offers nothing better — mindist is not prunable
  without an index structure; iSAX trees are a possible extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import pykernel as pk
from ..functions.sax import sax_mindist_to_literal, sax_word_mindist


def mindist_to_pattern(
    words: DataFrame,
    pattern: str,
    *,
    c: int,
    word_col: str = "sax_word",
    n: str | Column | int | None = None,
    out: str = "mindist",
) -> DataFrame:
    """Distance from every word row to a literal pattern; adds
    ``out``/``out_above``/``out_below`` columns.

    The pattern is parsed with n=0 (wildcard), so each row's own ``n``
    drives the compression scale — the reference's wildcard rule
    (src/symtseries.c:594-601). The pattern is validated eagerly and
    compiled to plan-time CASE lookups (codegen path).
    """
    n_col = F.col(n) if isinstance(n, str) else n
    parts = sax_mindist_to_literal(
        F.col(word_col), pk.parse(pattern, c), c=c, n=n_col
    )
    return (
        words.withColumn("__m", parts)
        .withColumn(out, F.col("__m")["dist"])
        .withColumn(f"{out}_above", F.col("__m")["above"])
        .withColumn(f"{out}_below", F.col("__m")["below"])
        .drop("__m")
    )


def topk_nearest(
    words: DataFrame,
    pattern: str,
    *,
    c: int,
    k: int,
    word_col: str = "sax_word",
    n: str | Column | int | None = None,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Top-k rows nearest to a literal pattern (global order, deterministic
    via tiebreakers). A plan-time constant pattern means this is scan ->
    project -> TakeOrderedAndProject: no shuffle beyond the final top-k
    reduction, which AQE executes as partial top-k per partition.
    """
    scored = mindist_to_pattern(words, pattern, c=c, word_col=word_col, n=n)
    order = [F.col("mindist").asc()] + [F.col(t) for t in (tiebreakers or [])]
    return scored.orderBy(*order).limit(k)


def match_pattern(
    words: DataFrame,
    pattern: str,
    *,
    c: int,
    word_col: str = "sax_word",
) -> DataFrame:
    """Exact word equality against a literal pattern — the reference's
    ``__eq`` surface (structural (w, c, symbols) equality; '#' matches
    only '#'; src/symtseries.c:638-645). Plain string equality on the
    canonical form, so predicate pushdown applies when words are stored."""
    pk.parse(pattern, c)  # validate against cardinality
    return words.where(F.col(word_col) == pattern)


def motif_counts(
    words: DataFrame,
    *,
    word_col: str = "sax_word",
) -> DataFrame:
    """Occurrence count per SAX word ("motif"): dimensionality reduction
    makes the word a natural LSH-style bucket key; groupBy on it is a
    map-side-combinable single shuffle."""
    return (
        words.where(F.col(word_col).isNotNull())
        .groupBy(F.col(word_col).alias("motif"))
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )


def allpairs_within(
    words: DataFrame,
    *,
    w: int,
    c: int,
    delta: float,
    key_col: str = "series_key",
    word_col: str = "sax_word",
    n_col: str | None = "n",
    broadcast_right: bool = True,
) -> DataFrame:
    """All unordered pairs of series whose words are mindist-compatible
    (equal w, compatible n) and within ``delta``.

    Exact semantics require examining every pair: mindist is itself the
    pruning primitive (lower bound on true distance), so the output is a
    *candidate set* guaranteed to contain every true match within delta.
    The right side is broadcast by default — word tables are tiny
    relative to their source series (n doubles -> w chars). For word
    tables too large to broadcast, disable and let AQE pick a shuffle
    join; approximate prefiltering belongs to the LSH operators in
    operators/dedup.py.
    """
    cols = [F.col(key_col).alias("k"), F.col(word_col).alias("wd")] + (
        [F.col(n_col).alias("n")] if n_col else []
    )
    base = words.where(F.col(word_col).isNotNull()).select(*cols)
    left = base.select(
        F.col("k").alias("key_a"), F.col("wd").alias("word_a"), *([F.col("n").alias("n_a")] if n_col else [])
    )
    right = base.select(
        F.col("k").alias("key_b"), F.col("wd").alias("word_b"), *([F.col("n").alias("n_b")] if n_col else [])
    )
    if broadcast_right:
        right = F.broadcast(right)
    cond = (F.col("key_a") < F.col("key_b")) & (
        F.length("word_a") == F.length("word_b")
    )
    if n_col:
        cond = cond & (F.col("n_a") == F.col("n_b"))
    joined = left.join(right, cond)
    n_arg = F.col("n_a") if n_col else None
    parts = sax_word_mindist(F.col("word_a"), F.col("word_b"), w=w, c=c, n=n_arg)
    return (
        joined.withColumn("__m", parts)
        .where(F.col("__m")["dist"] <= delta)
        .select(
            "key_a",
            "key_b",
            "word_a",
            "word_b",
            F.col("__m")["dist"].alias("mindist"),
            F.col("__m")["above"].alias("above"),
            F.col("__m")["below"].alias("below"),
        )
    )
