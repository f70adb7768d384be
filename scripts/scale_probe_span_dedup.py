#!/usr/bin/env python3
"""Scale probe for dedup.span_dedup with a PLANTED HOT SPAN — the
round-10 verdict's one code-level scale nit, now hardened: the
first-occurrence step is a map-side-combinable
``groupBy(key).agg(min(struct(doc_id, pos, span)))`` (no window sort,
no join-back), so a boilerplate span occurring in EVERY document
partially reduces inside each map task instead of all its occurrences
sorting in one reducer.

Corpus model: every document gets a fixed 5-token boilerplate header
(the C4 motivation — license banners / nav chrome), then the corpus is
replicated verbatim ``factor`` times with shifted doc_ids. At factor f
the header span occurs once per document = f x 5000 occurrences
(~10% of all span rows at sf0.1) — the planted hot key.

Closed-form invariants (exact, asserted):
- rows out        == f x base_docs
- sum(n_spans)    == f x (base_total_spans + base_docs)   [+1 header/doc]
- sum(n_dropped)  == total_spans - (base_kept_spans + 1)  [every distinct
  original span keeps exactly one copy, +1 for the header itself]
- hash_spans=True must produce the IDENTICAL result (exceptAll both
  ways at 10x; aggregate-equality at the headline factor).

A/B: the pre-round-11 implementation (row_number over a span-
partitioned window) is inlined here as ``span_dedup_window`` so the
skew cost is measured, not argued.

Usage: SPARK_GRAFT_SCALE_FACTOR=100 python3 scripts/scale_probe_span_dedup.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from symtseries_spark.operators.dedup import span_dedup
from symtseries_spark.functions.text import tokens

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "100"))
SPAN = 5
HEADER = "qq0 qq1 qq2 qq3 qq4"  # exactly SPAN alphanumeric tokens
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{BASE}/documents.parquet").select("doc_id", "text")


def span_dedup_window(d, *, span_tokens):
    """The pre-r11 first-occurrence plan (row_number over a window
    partitioned by span TEXT) — kept only as the probe's A/B foil."""
    toks = tokens(F.col("text"))
    n_sp = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_sp - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.array_join(
                F.slice(toks, i * span_tokens + 1, span_tokens), " "
            ).alias("span"),
        ),
    )
    ex = d.select(
        F.col("doc_id"),
        F.explode(F.when(n_sp > 0, spans).otherwise(
            F.array().cast("array<struct<pos:int,span:string>>")
        )).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.span").alias("span"))
    first = F.row_number().over(
        Window.partitionBy("span").orderBy("doc_id", "pos")
    )
    kept = ex.withColumn("__r", first).where(F.col("__r") == 1)
    agg_all = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    agg_kept = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("span")))
                ),
                lambda x: x["span"],
            ),
            " ",
        ).alias("clean_text"),
    )
    n_spans = F.coalesce("n_spans", F.lit(0))
    return (
        d.select("doc_id")
        .join(agg_all, "doc_id", "left")
        .join(agg_kept, "doc_id", "left")
        .select(
            "doc_id",
            n_spans.cast("long").alias("n_spans"),
            (n_spans - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def corpus(f):
    hdr = docs.select(
        "doc_id", F.concat(F.lit(HEADER + " "), F.col("text")).alias("text")
    )
    parts = [
        hdr.select((F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"), "text")
        for i in range(f)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run(fn, c, **kw):
    t0 = time.time()
    out = fn(c, span_tokens=SPAN, **kw)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_dropped").alias("dropped"),
    ).collect()[0]
    return time.time() - t0, agg["rows"], agg["spans"], agg["dropped"]


# Plan-shape evidence for "no single-task stage on a hot key": the
# hardened first-occurrence must reach the shuffle through a PARTIAL
# min (map-side combine: the hot key arrives at its reducer as <= one
# row per upstream partition) and must contain NO span-partitioned
# Window sort (the old plan's skew point: every occurrence of the hot
# span sorted in ONE task).
new_plan = span_dedup(docs, span_tokens=SPAN)._jdf.queryExecution().toString()
old_plan = (
    span_dedup_window(docs, span_tokens=SPAN)
    ._jdf.queryExecution()
    .toString()
)
assert "partial_min" in new_plan, "expected map-side partial_min"
assert "Window" not in new_plan.split("== Physical Plan ==")[1], (
    "hardened plan must not contain a Window sort")
assert "Window" in old_plan.split("== Physical Plan ==")[1]
print("plan shape: minstruct has partial_min + no Window; old foil has Window")

base = span_dedup(docs, span_tokens=SPAN).agg(
    F.count(F.lit(1)).alias("docs"),
    F.sum("n_spans").alias("spans"),
    F.sum("n_dropped").alias("dropped"),
).collect()[0]
base_docs, base_spans = base["docs"], base["spans"]
base_kept = base["spans"] - base["dropped"]
print(f"# span_dedup planted-hot-span probe  base={BASE}  factor={FACTOR}")
print(f"base: docs={base_docs} spans={base_spans} kept={base_kept}")
print("| impl | factor | wall_s | rows | spans | dropped | hot_occurrences |")
print("|---|---|---|---|---|---|---|")

for f in (10, FACTOR) if FACTOR != 10 else (10,):
    c = corpus(f).persist()
    c.count()
    exp_rows = f * base_docs
    exp_spans = f * (base_spans + base_docs)
    exp_dropped = exp_spans - (base_kept + 1)
    run(span_dedup, c)  # untimed warmup: codegen/shuffle infra
    for label, fn, kw in (
        ("minstruct", span_dedup, {}),
        ("minstruct+hash", span_dedup, {"hash_spans": True}),
        ("window(old)", span_dedup_window, {}),
    ):
        w, r, s, dr = run(fn, c, **kw)
        print(f"| {label} | {f} | {w:.1f} | {r} | {s} | {dr} | {exp_rows} |")
        assert (r, s, dr) == (exp_rows, exp_spans, exp_dropped), (
            label, (r, s, dr), (exp_rows, exp_spans, exp_dropped))
    if f == 10:
        a = span_dedup(c, span_tokens=SPAN)
        b = span_dedup(c, span_tokens=SPAN, hash_spans=True)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            "hash_spans output diverges")
        print("hash_spans exceptAll parity at 10x: OK")
    c.unpersist()

print("all invariants OK")
