#!/usr/bin/env python3
"""Scale probe for the round-12 keep-one REMOVAL family —
dedup.exact_substring_dedup (stride-1 window grain, join-back plan)
and dedup.line_dedup (line grain, unique-owner plan) — with a PLANTED
hot key: every document gets a constant boilerplate prefix, then the
corpus is replicated verbatim ``factor`` times with shifted doc_ids
(replica 0 keeps the original ids, so it owns every canonical pick).

Closed-form invariants (exact, asserted):
- rows out == f x base_docs for both operators.
- REPLICA-0 RESULTS ARE INVARIANT: filtering the f-fold output to
  replica 0 must equal the base-corpus output row for row (exceptAll
  both ways). Adding verbatim copies can only mark previously-unique
  keys duplicated, and their canonical occurrence is replica 0's own
  — so nothing changes there. This is the keep-one semantics witness
  at scale.
- REPLICAS > 0 ARE ERASED: every window/line they contain exists in
  replica 0, so every replica-1+ doc reports n_removed == n_tokens
  (resp. n_dropped == n_lines) and empty clean_text.

The planted hot key (boilerplate prefix -> one window/line text
occurring f x base_docs times) stresses exactly the documented risk
points: the removal operator's dup-table join-back (AQE skew-splits
against a 1-row build side) and line_dedup's combinable min-struct.

Usage: SPARK_GRAFT_SCALE_FACTOR=10 python3 scripts/scale_probe_keep_one.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.dedup import exact_substring_dedup, line_dedup

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
K = 5
SEP = " the "
# boilerplate prefix: a constant first LINE (before the first " the ")
# and a constant first WINDOW (its 5 leading tokens)
HEADER = "qq0 qq1 qq2 qq3 qq4 the "

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
raw = spark.read.parquet(f"{BASE}/documents.parquet").select("doc_id", "text")
docs0 = raw.select(
    "doc_id", F.concat(F.lit(HEADER), F.col("text")).alias("text")
)


def corpus(f):
    parts = [
        docs0.select(
            (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"), "text"
        )
        for i in range(f)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def leg(name, fn, c, base_out, total_col, removed_col, f):
    t0 = time.time()
    out = fn(c).persist()
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            (F.col(removed_col) == F.col(total_col)).cast("long")
        ).alias("erased"),
    ).collect()[0]
    w = time.time() - t0
    n_base = base_out.count()
    assert agg["rows"] == f * n_base, (name, agg["rows"], f, n_base)
    # replicas > 0: fully erased (every key exists in replica 0)
    n_rep = (f - 1) * n_base
    assert agg["erased"] >= n_rep, (name, agg["erased"], n_rep)
    # replica 0 invariant: row-identical to the base-corpus output
    r0 = out.where(F.col("doc_id") < 10**9)
    d1 = r0.exceptAll(base_out).count()
    d2 = base_out.exceptAll(r0).count()
    assert d1 == 0 and d2 == 0, (name, d1, d2)
    out.unpersist()
    print(
        f"| {name} | {f} | {w:.1f} | {agg['rows']} | {agg['erased']} "
        f"| replica-0 invariant, replicas erased |",
        flush=True,
    )


def exsub(c):
    return exact_substring_dedup(c, window_tokens=K, hash_windows=True)


def lines(c):
    return line_dedup(c, sep=SEP, hash_lines=True)


base_ex = exsub(docs0).persist()
base_ln = lines(docs0).persist()
print(f"# keep-one removal probe  base={BASE}  factor={FACTOR}")
print(f"base: docs={base_ex.count()}")
print("| op | factor | wall_s | rows | fully_erased | invariant |")
print("|---|---|---|---|---|---|")
for f in (FACTOR,):
    c = corpus(f).persist()
    c.count()
    leg("exact_substring_dedup", exsub, c, base_ex, "n_tokens",
        "n_removed", f)
    leg("line_dedup", lines, c, base_ln, "n_lines", "n_dropped", f)
    c.unpersist()
print("all invariants OK")
