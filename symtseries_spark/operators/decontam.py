"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out benchmark/eval set — the standard hygiene pass
(as popularized by the GPT-3/PaLM appendices) run before any pretraining
corpus ships.

Scale shape: the benchmark side is tiny relative to the corpus (eval
suites are MBs; the corpus is TBs), so its distinct shingle set is
BROADCAST and the corpus-side probe is a map-side hash join against the
broadcast table — the 100 TB corpus is scanned once, never shuffled on
the shingle key. The only shuffle is the per-document re-aggregation of
exploded shingle rows, which is map-side partial (doc_id rows are
contiguous within a scan partition, so the partial agg collapses each
document to one row before the exchange).

The per-shingle hash join (rather than a per-row ``array_intersect``
against a giant literal array) matters: the join builds the benchmark
hash table once per task, while ArrayIntersect would rebuild a
benchmark-sized hash set for every corpus row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles

__all__ = ["benchmark_contamination"]


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_matches: int = 1,
) -> DataFrame:
    """Per-corpus-document overlap with a benchmark shingle set.

    Returns ``(doc_id, matched_shingles, total_shingles,
    contamination)`` for corpus documents with at least ``min_matches``
    distinct word-``k``-shingles that also appear anywhere in
    ``benchmark``; ``contamination`` is the matched fraction of the
    document's distinct shingles, quantized to 6 decimals
    engine-independently (same floor(x*1e6+0.5)/1e6 convention as
    operators.timeseries.quantize).

    Documents shorter than ``k`` tokens have no shingles and are never
    flagged (they cannot textually contain a benchmark k-gram).
    """
    bench_set = (
        benchmark.select(
            F.explode(shingles(F.col(text_col), k)).alias("shingle")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus_sh = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )
    per_doc = (
        corpus_sh.join(F.broadcast(bench_set), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias(
                "matched_shingles"
            ),
            F.count(F.lit(1)).alias("total_shingles"),
        )
        .where(F.col("matched_shingles") >= min_matches)
    )
    ratio = F.col("matched_shingles") / F.col("total_shingles")
    return per_doc.select(
        "doc_id",
        "matched_shingles",
        "total_shingles",
        (F.floor(ratio * 1e6 + F.lit(0.5)) / 1e6).alias("contamination"),
    )


def novelty_scores(
    docs: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """First-occurrence n-gram novelty in corpus (training) order ->
    ``(doc_id, total_shingles, novel_shingles, novelty_ratio)``.

    A shingle is *novel* for a document iff that document is its
    earliest appearance in the corpus (global ``min(doc_id)``). Low
    novelty late in the train order marks documents that mostly repeat
    earlier data — the cheap curriculum/repetition diagnostic a
    pretraining run uses alongside dedup (dedup asks "is the whole doc
    a copy?", novelty asks "how much of it has been seen at all?").
    Documents with fewer than ``k`` tokens have no shingles and are
    not scored.

    Scale shape (r12, guide §2.4 — one exchange instead of two): one
    explode, ONE shuffle on the shingle, the first-occurrence id as a
    ``min() OVER (PARTITION BY shingle)`` window on that same
    partitioning (the former groupBy(shingle) + join-back re-shuffled
    the full shingle table a second time and re-ran the explode scan
    per side), one combinable per-doc re-aggregate. Skew profile
    unchanged: a hot shingle concentrated in one window partition
    exactly as it did on the join's probe side. No caps needed
    because no pair expansion happens. The ratio divides after
    casting both counts to double, quantized 1e-6, mirroring the
    oracle tree.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )
    first_w = F.min("doc_id").over(Window.partitionBy("shingle"))
    agg = (
        sh.withColumn("__first", first_w)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_shingles"),
            F.count(F.when(F.col("__first") == F.col("doc_id"), 1)).alias(
                "novel_shingles"
            ),
        )
    )
    ratio = F.col("novel_shingles").cast("double") / F.col(
        "total_shingles"
    ).cast("double")
    return agg.select(
        "doc_id",
        "total_shingles",
        "novel_shingles",
        (F.floor(ratio * 1e6 + F.lit(0.5)) / 1e6).alias("novelty_ratio"),
    )
