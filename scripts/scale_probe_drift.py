#!/usr/bin/env python3
"""Measured scale probe for the operators/drift.py battery (PSI /
chi-square / Mann-Whitney U) at 1M/10M/100M rows.

The battery's 100 TB claim is that ONE map-side-combinable groupBy
reduces the corpus to a GRID-bounded cell table (|groups| x |bins|,
|A| x |B|, |value grid|) and all statistic math runs on that bounded
table. So the probe (a) times each statistic per decade — the shape
should track the scan, near-linear — and (b) re-derives every output
EXACTLY in pure Python from the collected cell table (which is
grid-bounded, so collecting it is free at any corpus scale): the same
independent-reference discipline as tests/test_drift.py, applied at
volume.

Synthetic rows are hash-dispersed and fully deterministic:
- PSI: 20 groups, group g uniform over bins [0, g+1) — 20 distinct
  shapes against the blended total.
- chi-square: 8 x 12 grid with hash-independent margins.
- MWU: cohort B's value grid shifted +137 centi-units -> auc =
  P(A > B) lands below 0.5.

Env: SPARK_GRAFT_DRIFT_BASE (default 1e6), SPARK_GRAFT_DRIFT_FACTORS
(default 1,10,100), SPARK_GRAFT_CPUS, SPARK_GRAFT_DRIVER_MEM.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.drift import (
    chisq_independence,
    mann_whitney_u,
    psi_by_group,
)

BASE = int(os.environ.get("SPARK_GRAFT_DRIFT_BASE", "1000000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_DRIFT_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BINS = 20

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("drift-scale-probe")
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


def quant(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def psi_ref(group_cells, total_cells, n_bins, alpha=1):
    n_g = sum(group_cells.values())
    n_t = sum(total_cells.values())
    s = 0.0
    for b in range(n_bins):
        p = (group_cells.get(b, 0) + alpha) / (n_g + alpha * n_bins)
        q = (total_cells.get(b, 0) + alpha) / (n_t + alpha * n_bins)
        s += (p - q) * math.log(p / q)
    return s


fail = False
walls = {"psi": None, "chisq": None, "mwu": None}
for f_ in FACTORS:
    n = BASE * f_

    # --- PSI: 20 groups, group g uniform over [0, g+1) -------------
    d = spark.range(n).select(
        (F.col("id") % 20).cast("string").alias("g"),
        F.pmod(F.xxhash64("id"), F.col("id") % 20 + 1).alias("b"),
    )
    t0 = time.perf_counter()
    got = {
        r.g: (r.n_rows, r.psi)
        for r in psi_by_group(d, group="g", bin_col="b", n_bins=N_BINS).collect()
    }
    dt = time.perf_counter() - t0
    walls["psi"] = walls["psi"] or dt
    cells = {
        (r.g, r.b): r.c
        for r in d.groupBy("g", "b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    total = {}
    per_g = {}
    for (g, b), c in cells.items():
        total[b] = total.get(b, 0) + c
        per_g.setdefault(g, {})[b] = c
    ok = all(
        got[g][0] == sum(per_g[g].values())
        and abs(got[g][1] - quant(psi_ref(per_g[g], total, N_BINS))) <= 2e-6
        for g in per_g
    ) and len(got) == len(per_g)
    fail |= not ok
    print(
        f"psi   x{f_:<4d} rows={n:>11,d} wall={dt:7.2f}s "
        f"ratio={dt / walls['psi']:6.2f} groups={len(got)} "
        f"verdict={'OK' if ok else 'FAIL'}",
        flush=True,
    )

    # --- chi-square: 8 x 12 hash-independent grid -------------------
    d = spark.range(n).select(
        (F.col("id") % 8).cast("string").alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(12)).cast("string").alias("b"),
    )
    t0 = time.perf_counter()
    row = chisq_independence(d, a="a", b="b").first()
    dt = time.perf_counter() - t0
    walls["chisq"] = walls["chisq"] or dt
    cells = {
        (r.a, r.b): r.c
        for r in d.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    ra, rb = {}, {}
    for (a, b), c in cells.items():
        ra[a] = ra.get(a, 0) + c
        rb[b] = rb.get(b, 0) + c
    want = sum(
        (cells.get((a, b), 0) - ra[a] * rb[b] / n) ** 2 / (ra[a] * rb[b] / n)
        for a in ra
        for b in rb
    )
    ok = (
        row.n == n
        and row.dof == (len(ra) - 1) * (len(rb) - 1)
        and abs(row.chisq - quant(want)) <= 2e-6
    )
    fail |= not ok
    print(
        f"chisq x{f_:<4d} rows={n:>11,d} wall={dt:7.2f}s "
        f"ratio={dt / walls['chisq']:6.2f} chisq={row.chisq:.6f} "
        f"verdict={'OK' if ok else 'FAIL'}",
        flush=True,
    )

    # --- MWU: cohort B shifted +137 on a 5000-value grid ------------
    d = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("g"),
        (
            F.pmod(F.xxhash64("id"), F.lit(5000))
            + F.when(F.col("id") % 2 == 0, 0).otherwise(137)
        ).alias("v"),
    )
    t0 = time.perf_counter()
    row = mann_whitney_u(
        d, group="g", value_int="v", group_a="A", group_b="B"
    ).first()
    dt = time.perf_counter() - t0
    walls["mwu"] = walls["mwu"] or dt
    cells = {
        (r.g, r.v): r.c
        for r in d.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    grid = sorted({v for (_, v) in cells})
    cum_b, u2 = 0, 0
    n_a = n_b = 0
    for v in grid:
        ca = cells.get(("A", v), 0)
        cb = cells.get(("B", v), 0)
        u2 += ca * (2 * cum_b + cb)
        cum_b += cb
        n_a += ca
        n_b += cb
    ok = (
        row.n_a == n_a
        and row.n_b == n_b
        and row.u_a == u2 / 2.0
        and abs(row.auc - quant(u2 / (2.0 * n_a * n_b))) <= 1e-9
        # B shifted up => A rarely exceeds B => auc = P(A>B) < 0.5
        and row.auc < 0.5
    )
    fail |= not ok
    print(
        f"mwu   x{f_:<4d} rows={n:>11,d} wall={dt:7.2f}s "
        f"ratio={dt / walls['mwu']:6.2f} auc={row.auc:.6f} "
        f"verdict={'OK' if ok else 'FAIL'}",
        flush=True,
    )

sys.exit(1 if fail else 0)
