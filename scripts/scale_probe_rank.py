#!/usr/bin/env python3
"""Measured 100x scaling probe for the two-pass distributed rank
(operators/rank.py) — the round-8 ask: does the rank stage stay
parallel and near-linear at 100x rows, INCLUDING under heavy ties
where one dominant key forces its whole tie run into a single bucket?

Synthesizes the key table directly (``spark.range`` — the rank input
is always a narrow (id, key) projection in every registered caller, so
synthesizing it probes exactly the operator, not a scan) at
``BASE_ROWS`` x {1, 10, 100} under three key distributions:

- ``uniform``  — 1M distinct double keys: the balanced case.
- ``zipf-ish`` — key = floor(1e6 / (1 + id % 1000)): a few hundred
  heavy values, the realistic skewed-aggregate shape.
- ``tie90``    — 90% of rows share ONE key value: the adversarial
  bound. Since round 8 the operator SPLITS heavy tie runs: a dominant
  key shows up as a repeated approxQuantile boundary, and when the
  tiebreak column is numeric the run is sub-bucketed by tiebreak
  quantiles into composite ``(key, tiebreak)`` boundaries (see the
  operators/rank.py module docstring), so this case now parallelizes
  like the
  uniform one (measured: tie90 at 100M ~= uniform wall time, vs 60x
  serialized before the split). Only a NON-numeric tiebreak degrades
  to the old single-task-per-tie-run behavior — still exact, just
  serialized for that run.

Correctness at probe scale can't window-compare 100M rows; instead it
checks the permutation invariants that uniquely characterize an exact
global row_number:
  min(rn)=1, max(rn)=n, count(distinct rn)=n, sum(rn)=n(n+1)/2,
and key-monotonicity: grouping by key, every key's max(rn) must be
exactly its cumulative row count (verified against a key-level window
over the SMALL |keys| table).

Prints one line per (distribution, factor): rows, wall seconds, ratio
vs factor-1, max single-bucket share (the tie concentration), and the
invariant verdict. Wall ratio ~= factor on a fixed-core host is the
best a CPU-bound two-pass rank can do.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from symtseries_spark.operators.rank import distributed_row_number

BASE_ROWS = int(os.environ.get("SPARK_GRAFT_RANK_BASE_ROWS", "1000000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_RANK_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("rank-scale-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def make_keys(n: int, dist: str):
    df = spark.range(n).select(F.col("id"))
    if dist == "uniform":
        key = (F.col("id") * 2654435761 % 1000003).cast("double")
    elif dist == "zipf-ish":
        key = F.floor(F.lit(1e6) / (1 + F.col("id") % 1000)).cast("double")
    elif dist == "tie90":
        key = (
            F.when(F.col("id") % 10 < 9, F.lit(7.0))
            .otherwise((F.col("id") % 100000).cast("double"))
        )
    else:
        raise SystemExit(f"unknown dist {dist}")
    return df.withColumn("v", key)


def check_invariants(ranked, n: int) -> bool:
    a = ranked.agg(
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
        F.countDistinct("rn").alias("nd"),
        F.sum("rn").alias("s"),
    ).collect()[0]
    perm_ok = (
        a["mn"] == 1
        and a["mx"] == n
        and a["nd"] == n
        and a["s"] == n * (n + 1) // 2
    )
    # key-monotonicity: per-key max rank == cumulative count in key
    # order (computed over the SMALL per-key table, so the window here
    # is |keys|-sized, not |rows|-sized)
    per_key = ranked.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.max("rn").alias("mxr")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    bad = (
        per_key.withColumn("cum", F.sum("c").over(w))
        .where(F.col("mxr") != F.col("cum"))
        .count()
    )
    return perm_ok and bad == 0


def max_bucket_share(n: int, dist: str) -> float:
    # the largest tie run bounds the largest bucket from below
    top = (
        make_keys(n, dist)
        .groupBy("v")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return top / n


print(f"rank scale probe: base={BASE_ROWS} factors={FACTORS} cpus={CPUS}")
t1 = {}
for dist in ["uniform", "zipf-ish", "tie90"]:
    for f in FACTORS:
        n = BASE_ROWS * f
        df = make_keys(n, dist)
        t0 = time.perf_counter()
        ranked = distributed_row_number(df, "v", tiebreak="id", out="rn")
        ranked.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if f == 1:
            t1[dist] = dt
        ok = check_invariants(ranked, n) if f <= 10 else None
        share = max_bucket_share(n, dist)
        ratio = dt / t1[dist]
        print(
            f"{dist:9s} x{f:<4d} rows={n:>11,d} wall={dt:7.2f}s "
            f"ratio={ratio:6.2f} max_tie_share={share:.3f} "
            f"invariants={'OK' if ok else 'skipped(big)' if ok is None else 'FAIL'}"
        )
        if ok is False:
            sys.exit(1)
# full invariant check once at the top factor for the adversarial dist
n = BASE_ROWS * FACTORS[-1]
ranked = distributed_row_number(make_keys(n, "tie90"), "v", tiebreak="id", out="rn")
t0 = time.perf_counter()
ok = check_invariants(ranked, n)
print(f"tie90 x{FACTORS[-1]} FULL invariant check: {'OK' if ok else 'FAIL'} "
      f"({time.perf_counter()-t0:.1f}s)")
sys.exit(0 if ok else 1)
