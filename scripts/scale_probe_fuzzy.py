#!/usr/bin/env python3
"""Measured scale probe for operators/fuzzy.py edit_distance_pairs
(PassJoin pigeonhole blocking) at 100k/1M/10M distinct keys.

Key synthesis plants EXACT ground truth: base keys are md5-hex
prefixes (lengths 24..32, alphabet [0-9a-f]); 30% of bases get ONE
variant built by overlaying characters OUTSIDE the hex alphabet
('x'/'y'/'z'), so each planted pair's edit distance is exactly its
edit count (a non-hex char can only arise from its own edit):

- id % 10 == 0 -> 1 substitution          -> dist 1
- id % 10 == 1 -> delete + substitution   -> dist 2 (length gap
  forces >= 2; 'z' not a base char forces the second edit)
- id % 10 == 2 -> 3 substitutions         -> dist 3

Distinct md5 prefixes are ~uniform over 16^24, so no accidental pair
lands within tau=3 (a shared-segment candidate still differs in ~20
positions) — the operator's output must equal the planted multiset
EXACTLY at every scale: dist->count {1: n/10, 2: n/10, 3: n/10}.

Cost shape to verify: probe fanout is CONSTANT per key
((tau+1)^2*(2tau+1) rows), the join is hash-partitioned on segment
content, so wall should scale ~linearly with key count.

Env: SPARK_GRAFT_FUZZY_BASE (default 1e5), SPARK_GRAFT_FUZZY_FACTORS
(default 1,10,100), SPARK_GRAFT_CPUS, SPARK_GRAFT_DRIVER_MEM.

SPARK_GRAFT_FUZZY_HOT=1 runs the self-documented WORST CASE instead
(operators/fuzzy.py module docstring): every key is a 16-char
constant prefix + md5 suffix, so segment 0 is shared VERBATIM by the
whole population and the candidate join is genuinely quadratic in
each length bucket — there are no true pairs, yet the join must
grind |bucket|^2 candidates. The leg measures the blowup curve
(expect ~quadratic wall growth) and then demonstrates the seg_cap
knob failing fast (one combinable count over the index) before the
join is attempted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.fuzzy import edit_distance_pairs

BASE = int(os.environ.get("SPARK_GRAFT_FUZZY_BASE", "100000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_FUZZY_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TAU = 3

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("fuzzy-scale-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def make_keys(n: int):
    """n base keys + ~0.3n planted variants; returns (df, planted)
    where planted = {dist: exact expected pair count}."""
    base = spark.range(n).select(
        "id",
        F.expr("substring(md5(cast(id as string)), 1, 24 + cast(id % 9 as int))").alias(
            "k"
        ),
    )
    # edit position p in [2, 16]: clear of both ends at every length
    v = base.where(F.col("id") % 10 < 3).select(
        "id",
        "k",
        (F.col("id") % 10).alias("t"),
        (F.col("id") % 15 + 2).cast("int").alias("p"),
    )
    sub1 = v.where(F.col("t") == 0).select(
        F.expr("overlay(k PLACING 'z' FROM p FOR 1)").alias("k")
    )
    delsub = v.where(F.col("t") == 1).select(
        F.expr(
            "concat(substring(overlay(k PLACING 'z' FROM p FOR 1), 1, p + 1),"
            " substring(overlay(k PLACING 'z' FROM p FOR 1), p + 3))"
        ).alias("k")
    )
    sub3 = v.where(F.col("t") == 2).select(
        F.expr(
            "overlay(overlay(overlay(k PLACING 'x' FROM p FOR 1)"
            " PLACING 'y' FROM p + 3 FOR 1) PLACING 'z' FROM p + 6 FOR 1)"
        ).alias("k")
    )
    keys = base.select("k").unionByName(sub1).unionByName(delsub).unionByName(
        sub3
    )
    tenth = n // 10
    planted = {1: tenth, 2: tenth, 3: tenth}
    return keys, planted


def hot_prefix_leg():
    """Constant-prefix population: quadratic-candidate worst case."""
    import math

    print("# hot-prefix worst case (constant 16-char prefix, tau=3)")
    prev = None
    for n in (3_000, 10_000, 30_000):
        keys = spark.range(n).select(
            F.expr(
                "concat('PREFIXPREFIXPREF', "
                "substring(md5(cast(id as string)), 1, "
                "24 + cast(id % 9 as int)))"
            ).alias("k")
        )
        t0 = time.perf_counter()
        n_pairs = edit_distance_pairs(keys, key="k", tau=TAU).count()
        dt = time.perf_counter() - t0
        growth = "" if prev is None else f" wall_ratio={dt / prev[1]:.1f}x"             f" (data {n / prev[0]:.1f}x -> quadratic would be"             f" {(n / prev[0]) ** 2:.0f}x)"
        print(f"hot n={n:>7,d} wall={dt:7.2f}s pairs={n_pairs}{growth}",
              flush=True)
        prev = (n, dt)
    # seg_cap fails FAST on the same population at any size
    big = spark.range(1_000_000).select(
        F.expr(
            "concat('PREFIXPREFIXPREF', "
            "substring(md5(cast(id as string)), 1, "
            "24 + cast(id % 9 as int)))"
        ).alias("k")
    )
    t0 = time.perf_counter()
    try:
        edit_distance_pairs(big, key="k", tau=TAU, seg_cap=50_000)
        print("seg_cap FAILED TO RAISE", flush=True)
        sys.exit(1)
    except ValueError as e:
        dt = time.perf_counter() - t0
        print(f"seg_cap raised in {dt:.1f}s on 1M hot-prefix keys: "
              f"{str(e)[:80]}...", flush=True)


if os.environ.get("SPARK_GRAFT_FUZZY_HOT") == "1":
    hot_prefix_leg()
    sys.exit(0)

fail = False
t1 = None
for f_ in FACTORS:
    n = BASE * f_
    keys, planted = make_keys(n)
    t0 = time.perf_counter()
    got = {
        r.dist: r.n
        for r in edit_distance_pairs(keys, key="k", tau=TAU)
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    dt = time.perf_counter() - t0
    t1 = t1 or dt
    ok = got == planted
    fail |= not ok
    print(
        f"fuzzy x{f_:<4d} keys={int(n * 1.3):>11,d} wall={dt:7.2f}s "
        f"ratio={dt / t1:6.2f} pairs={got} "
        f"verdict={'OK' if ok else f'FAIL want {planted}'}",
        flush=True,
    )

sys.exit(1 if fail else 0)
