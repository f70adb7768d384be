#!/usr/bin/env python3
"""Scale probe for the round-11 text-stats family:

- **gopher_repetition** (operators/retrieval.py): per-doc pure
  function of the text, so under verbatim replication every replica
  of a doc must report IDENTICAL signals — checked exactly via
  per-(doc mod base) aggregate equality — while wall scales with the
  explode volume (sum over ns of ~W rows per doc).
- **exact_substring_stats** (operators/dedup.py): under verbatim
  replication at factor f >= 2, EVERY window occurs >= f times, so
  n_dup_windows == n_windows for every doc — the closed-form
  invariant — and the unique-owner plan's combinable groupBy carries
  the f-fold hot windows without a join-back.

Usage: SPARK_GRAFT_SCALE_FACTOR=100 python3 scripts/scale_probe_textstats.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.dedup import exact_substring_stats
from symtseries_spark.operators.retrieval import gopher_repetition

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "100"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
K = 8

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{BASE}/documents.parquet").select("doc_id", "text")


def corpus(f):
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"), "text"
        )
        for i in range(f)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


base_g = gopher_repetition(docs).agg(
    F.count(F.lit(1)).alias("rows"),
    F.sum("top2_frac").alias("s2"),
    F.sum("dup5_frac").alias("s5"),
).collect()[0]
base_e = exact_substring_stats(docs, window_tokens=K).agg(
    F.count(F.lit(1)).alias("rows"), F.sum("n_windows").alias("w")
).collect()[0]
print(f"# text-stats scale probe  base={BASE}  factor={FACTOR}")
print(f"base: docs={base_g['rows']} sum_top2={base_g['s2']:.4f} "
      f"windows={base_e['w']}")
print("| op | factor | wall_s | rows | invariant |")
print("|---|---|---|---|---|")

for f in (10, FACTOR) if FACTOR != 10 else (10,):
    c = corpus(f).persist()
    c.count()
    # the gopher shuffle is ~5x the token count with per-doc-unique
    # keys (no combine win); partitions track volume (measured: the
    # ~12x-wall-for-10x-rows ratio is the same at fixed 32, so the
    # constant is aggregation bandwidth, not spill)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(int(CPUS) * max(1, f // 10))
    )

    t0 = time.time()
    g = gopher_repetition(c).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("top2_frac").alias("s2"),
        F.sum("dup5_frac").alias("s5"),
    ).collect()[0]
    wg = time.time() - t0
    ok_g = (
        g["rows"] == f * base_g["rows"]
        and abs(g["s2"] - f * base_g["s2"]) < 1e-6 * f
        and abs(g["s5"] - f * base_g["s5"]) < 1e-6 * f
    )
    print(f"| gopher | {f} | {wg:.1f} | {g['rows']} | "
          f"{'per-doc signals replica-identical' if ok_g else 'FAIL'} |",
          flush=True)
    assert ok_g, (g, base_g)

    t0 = time.time()
    e = exact_substring_stats(c, window_tokens=K).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_windows").alias("w"),
        F.sum("n_dup_windows").alias("d"),
    ).collect()[0]
    we = time.time() - t0
    ok_e = (
        e["rows"] == f * base_e["rows"]
        and e["w"] == f * base_e["w"]
        and e["d"] == e["w"]  # every window >= f-fold => all dup
    )
    print(f"| exsub | {f} | {we:.1f} | {e['rows']} | "
          f"{'all windows duplicated, counts exact' if ok_e else 'FAIL'} |",
          flush=True)
    assert ok_e, (e, base_e)

    # hash_grams / hash_windows legs: md5-keyed shuffles must be
    # BIT-IDENTICAL to the text-keyed forms (exceptAll both ways) and
    # are expected to shave the string-bandwidth constant
    t0 = time.time()
    gh = gopher_repetition(c, hash_grams=True).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("top2_frac").alias("s2"),
        F.sum("dup5_frac").alias("s5"),
    ).collect()[0]
    wgh = time.time() - t0
    print(f"| gopher hash_grams | {f} | {wgh:.1f} | {gh['rows']} | "
          f"delta {wg - wgh:+.1f}s vs text keys |", flush=True)
    # per-ROW bit-identity is proven by the exceptAll leg below; the
    # aggregate SUM of 500k doubles is summation-order-dependent
    # across different plans, so compare with ulp-scale tolerance
    assert gh["rows"] == g["rows"] and (
        abs(gh["s2"] - g["s2"]) < 1e-9 * max(1.0, abs(g["s2"]))
        and abs(gh["s5"] - g["s5"]) < 1e-9 * max(1.0, abs(g["s5"]))
    ), (gh, g)

    t0 = time.time()
    eh = exact_substring_stats(
        c, window_tokens=K, hash_windows=True
    ).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_windows").alias("w"),
        F.sum("n_dup_windows").alias("d"),
    ).collect()[0]
    weh = time.time() - t0
    print(f"| exsub hash_windows | {f} | {weh:.1f} | {eh['rows']} | "
          f"delta {we - weh:+.1f}s vs text keys |", flush=True)
    assert (eh["rows"], eh["w"], eh["d"]) == (
        e["rows"], e["w"], e["d"]
    ), (eh, e)

    if f == 10:
        # full-row equivalence at 10x, both directions
        for op, mk in (
            ("gopher", lambda hashed: gopher_repetition(
                c, hash_grams=hashed)),
            ("exsub", lambda hashed: exact_substring_stats(
                c, window_tokens=K, hash_windows=hashed)),
        ):
            a, b = mk(False), mk(True)
            d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
            print(f"| {op} exceptAll both ways | {f} | | "
                  f"{d1}+{d2} | {'bit-identical' if d1 == d2 == 0 else 'FAIL'} |",
                  flush=True)
            assert d1 == 0 and d2 == 0
    c.unpersist()

print("all invariants OK")
