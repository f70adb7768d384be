#!/usr/bin/env python3
"""Measured 100x scaling probe for ``global_order_index``
(operators/pipeline.py) — the round-9 ask: the two-pass shard-offset
pattern is now load-bearing as docs/PLAN_AUDIT.md's prescribed
replacement for every removed row-scaled sort, but it only had sf0.1
evidence.

Synthesizes the id table directly (``spark.range`` — every registered
caller feeds the operator a narrow id projection, so this probes
exactly the operator, not a scan) at ``BASE_ROWS`` x {1, 10, 100}
under three id shapes:

- ``long-id``   — numeric ids cast to string inside the operator's
  hash: the common case.
- ``str-id``    — 32-char hex-ish string ids: the documents.doc_id
  shape (hash cost over longer input).
- ``dup-heavy`` — ids repeated ~10x: NOT a supported input (the
  docstring contract says ids are unique) but the probe verifies the
  index still forms a permutation — the in-shard tiebreak on id makes
  duplicate hashes order arbitrarily-but-deterministically within the
  window, so the rank stays a permutation.

The operator's shard key is the 60-bit md5-based hash PREFIX, so shard
sizes are uniform regardless of id distribution — there is no
adversarial skew axis analogous to the rank's tie90 (the hash IS the
order key). The axes that matter are row volume and hash-input width.

Correctness at probe scale uses the permutation invariants
(min=0, max=n-1, countDistinct=n, sum=n(n-1)/2) plus
shard-monotonicity: re-deriving the shard id from the emitted index's
row, every shard's max(train_order) must equal its cumulative row
count - 1 (shard-level window over the SMALL |shards| table).

Prints one line per (shape, factor): rows, wall seconds, ratio vs
factor-1, max shard share, invariant verdict. Wall ratio ~= factor on
a fixed-core host is the best a CPU-bound two-pass index can do.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from symtseries_spark.operators.pipeline import global_order_index
from symtseries_spark.functions.text import doc_hash60

BASE_ROWS = int(os.environ.get("SPARK_GRAFT_ORDER_BASE_ROWS", "1000000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_ORDER_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SHARDS = int(os.environ.get("SPARK_GRAFT_ORDER_SHARDS", "256"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("order-scale-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def make_ids(n: int, shape: str):
    df = spark.range(n)
    if shape == "long-id":
        return df.select(F.col("id").alias("doc_id"))
    if shape == "str-id":
        return df.select(
            F.concat(F.lit("doc-"), F.md5(F.col("id").cast("string"))).alias(
                "doc_id"
            )
        )
    if shape == "dup-heavy":
        return df.select((F.col("id") % (n // 10 or 1)).alias("doc_id"))
    raise SystemExit(f"unknown shape {shape}")


def check_invariants(indexed, n: int) -> bool:
    a = indexed.agg(
        F.min("train_order").alias("mn"),
        F.max("train_order").alias("mx"),
        F.countDistinct("train_order").alias("nd"),
        F.sum("train_order").alias("s"),
    ).collect()[0]
    perm_ok = (
        a["mn"] == 0
        and a["mx"] == n - 1
        and a["nd"] == n
        and a["s"] == n * (n - 1) // 2
    )
    # shard-monotonicity: re-derive the shard from the hash and check
    # each shard's max index == cumulative count - 1 in shard order
    # (|shards|-sized window, never data-sized)
    h = doc_hash60(F.concat(F.lit("order"), F.col("doc_id").cast("string")))
    per_shard = (
        indexed.withColumn(
            "__shard", (h / F.lit(2**60 // SHARDS)).cast("long")
        )
        .groupBy("__shard")
        .agg(F.count(F.lit(1)).alias("c"), F.max("train_order").alias("mxo"))
    )
    w = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, 0)
    bad = (
        per_shard.withColumn("cum", F.sum("c").over(w))
        .where(F.col("mxo") != F.col("cum") - 1)
        .count()
    )
    return perm_ok and bad == 0


def max_shard_share(indexed, n: int) -> float:
    h = doc_hash60(F.concat(F.lit("order"), F.col("doc_id").cast("string")))
    top = (
        indexed.withColumn(
            "__shard", (h / F.lit(2**60 // SHARDS)).cast("long")
        )
        .groupBy("__shard")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return top / n


print(
    f"order scale probe: base={BASE_ROWS} factors={FACTORS} "
    f"cpus={CPUS} shards={SHARDS}"
)
t1 = {}
for shape in ["long-id", "str-id", "dup-heavy"]:
    for f in FACTORS:
        n = BASE_ROWS * f
        df = make_ids(n, shape)
        t0 = time.perf_counter()
        indexed = global_order_index(df, shards=SHARDS)
        indexed.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if f == 1:
            t1[shape] = dt
        indexed2 = global_order_index(make_ids(n, shape), shards=SHARDS)
        ok = check_invariants(indexed2, n) if f <= 10 else None
        share = max_shard_share(make_ids(n, shape), n)
        ratio = dt / t1[shape]
        print(
            f"{shape:9s} x{f:<4d} rows={n:>11,d} wall={dt:7.2f}s "
            f"ratio={ratio:6.2f} max_shard_share={share:.4f} "
            f"invariants={'OK' if ok else 'skipped(big)' if ok is None else 'FAIL'}"
        )
        if ok is False:
            sys.exit(1)
# full invariant check once at the top factor on the realistic shape
n = BASE_ROWS * FACTORS[-1]
indexed = global_order_index(make_ids(n, "str-id"), shards=SHARDS)
t0 = time.perf_counter()
ok = check_invariants(indexed, n)
print(
    f"str-id x{FACTORS[-1]} FULL invariant check: {'OK' if ok else 'FAIL'} "
    f"({time.perf_counter()-t0:.1f}s)"
)
sys.exit(0 if ok else 1)
