#!/usr/bin/env python3
"""Measured scale probe for the graph-analytics family beyond
connected components (r9 verdict ask #6): ``pagerank`` and
``triangle_stats`` (operators/graph.py) at 1M/10M/100M edges, with
closed-form invariants per shape (the same synthetic families as
scripts/scale_probe_components.py):

- ``stars10``  — 10-leaf stars: triangles 0, wedges 45/star; pagerank
  has exactly two value classes (center deg 10, leaf deg 1), whose
  quantized 5-round trajectory a scalar Python twin reproduces
  EXACTLY (same floor-quantization, same fold order — 10 equal leaf
  contributions sum exactly in any order).
- ``cliques8`` — 8-cliques: coeff == 1.0 (3*56/168); pagerank uniform
  by symmetry (one distinct (degree, pr) class).
- ``hub1k``    — 1000-leaf hubs with the CENTER IN THE id-MIDDLE of
  its leaves: the triangle enumeration's cost driver is
  sum_v in_deg(v) * out_deg(v) over canonical a<b<c edges, which is
  ~(h/2)^2 per hub — constant per component here, so volume scaling
  must stay linear. Triangles 0, wedges h*(h-1)/2 per hub.

Plus one fixed-volume leg, ``hubgrow``: 100k edges total, hub size
100 -> 1k -> 10k. Wedge-candidates per hub grow (h/2)^2 while edge
count stays fixed — the measured reason dedup pair generators CAP
per-key fanout (max_freq) upstream: triangle cost is quadratic in max
degree, linear in everything else. Expected wall growth ~x(h ratio)
per decade at fixed edges; the probe records it as the documented
knob rule rather than a failure.

Env: SPARK_GRAFT_GRAPH_BASE_EDGES (default 1e6),
SPARK_GRAFT_GRAPH_FACTORS (1,10,100), SPARK_GRAFT_CPUS,
SPARK_GRAFT_DRIVER_MEM, SPARK_GRAFT_GRAPH_LEGS
(csv of: pagerank, triangles, hubgrow).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.graph import pagerank, triangle_stats

BASE_EDGES = int(os.environ.get("SPARK_GRAFT_GRAPH_BASE_EDGES", "1000000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_GRAPH_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
LEGS = set(
    os.environ.get("SPARK_GRAFT_GRAPH_LEGS", "pagerank,triangles,hubgrow")
    .split(",")
)
# NOT the query defaults (0.85, round 6): at probe scale (1.1M-110M
# vertices) per-vertex rank is within a few quanta of 1/n, and with
# damping 0.85 the star-center update lands EXACTLY on a
# floor(x*q + 0.5) half-quantum tie (0.85 * 10k quanta = 8.5k), where
# one ulp of float-sum association difference (Spark's partial
# aggregates vs the twin's sequential fold) flips the floor — the r10
# first run failed the x1 leg this way. damping 0.8 makes the center
# product 8k (integer quanta, tie lands mid-interval) and the leaf
# product 0.08m, never exactly half for integer m; ROUND_TO=9 keeps
# ranks resolved at 110M vertices. The registered dedup_pagerank
# query (corpus-sized graph, DuckDB CTE oracle) keeps its defaults.
DAMPING, N_ITER, ROUND_TO = 0.8, 5, 9

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("graph-scale-probe")
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


def make_stars(n_edges: int):
    """Component i: center 11i, leaves 11i+1..11i+10 (the components
    probe's layout)."""
    n_comp = n_edges // 10
    e = spark.range(n_edges).select(
        ((F.col("id") / 10).cast("long") * 11).alias("src"),
        ((F.col("id") / 10).cast("long") * 11 + F.col("id") % 10 + 1)
        .alias("dst"),
    )
    return e, n_comp


def make_cliques(n_edges: int):
    """Component i: vertices 8i..8i+7, all 28 pairs."""
    n_comp = n_edges // 28
    pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    pa = F.array(*[F.lit(a) for a, _ in pairs])
    pb = F.array(*[F.lit(b) for _, b in pairs])
    e = spark.range(n_comp * 28).select(
        ((F.col("id") / 28).cast("long") * 8).alias("base"),
        (F.col("id") % 28 + 1).cast("int").alias("k"),
    ).select(
        (F.col("base") + F.element_at(pa, F.col("k"))).alias("src"),
        (F.col("base") + F.element_at(pb, F.col("k"))).alias("dst"),
    )
    return e, n_comp


def make_hubs(n_edges: int, h: int):
    """Hubs of ``h`` leaves with the center mid-range by id: component
    i spans ids [(h+1)i, (h+1)(i+1)); center = (h+1)i + h//2, leaves =
    every other id. Canonical a<b edges put ~h/2 below and ~h/2 above
    the center, so the triangle join's middle-vertex fanout is
    (h/2)^2 per hub — the max-degree cost axis, held constant when h
    is fixed."""
    n_comp = n_edges // h
    span = h + 1
    center = (F.col("id") / h).cast("long") * span + h // 2
    off = F.col("id") % h  # 0..h-1 -> leaf slot, skipping the center
    leaf = (F.col("id") / h).cast("long") * span + F.when(
        off < h // 2, off
    ).otherwise(off + 1)
    e = spark.range(n_comp * h).select(
        center.alias("src"), leaf.alias("dst")
    )
    return e, n_comp


def quant(x: float) -> float:
    q = 10.0 ** ROUND_TO
    return math.floor(x * q + 0.5) / q


def star_pr_twin(n_comp: int):
    """Exact scalar twin of pagerank() on disjoint 10-leaf stars: two
    classes, same quantized recurrence. Ten equal leaf contributions
    sum exactly in every order (repeated addition of the identical
    float), so engine fold order cannot drift."""
    n = 11 * n_comp
    t = quant((1.0 - DAMPING) / n)
    pr_c = pr_l = quant(1.0 / n)
    for _ in range(N_ITER):
        s_c = 0.0
        for _ in range(10):  # ten identical leaf contributions
            s_c += pr_l / 1.0
        pr_c, pr_l = t + quant(DAMPING * s_c), t + quant(DAMPING * (pr_c / 10.0))
    return pr_c, pr_l


def check_pagerank(shape: str, pr_df, n_comp: int) -> bool:
    if shape == "cliques8":
        # symmetry: one distinct (degree, pr) class, degree 7
        classes = pr_df.select("degree", "pagerank").distinct().collect()
        return len(classes) == 1 and classes[0]["degree"] == 7
    if shape == "stars10":
        classes = {
            (r["degree"], r["pagerank"])
            for r in pr_df.select("degree", "pagerank").distinct().collect()
        }
        pc, pl = star_pr_twin(n_comp)
        if classes != {(10, pc), (1, pl)}:
            print(
                f"    MISMATCH got={sorted(classes)} "
                f"want={[(10, pc), (1, pl)]}", flush=True,
            )
        return classes == {(10, pc), (1, pl)}
    raise SystemExit(f"no pagerank oracle for {shape}")


def check_triangles(shape: str, row, n_comp: int, h: int = 1000) -> bool:
    if shape == "stars10":
        want = (11 * n_comp, 10 * n_comp, 45 * n_comp, 0, 0.0)
    elif shape == "cliques8":
        want = (8 * n_comp, 28 * n_comp, 168 * n_comp, 56 * n_comp, 1.0)
    else:  # hubs: h leaves, wedges C(h,2) per hub, no triangles
        want = (
            (h + 1) * n_comp, h * n_comp, h * (h - 1) // 2 * n_comp, 0, 0.0
        )
    got = (
        row["n_nodes"], row["n_edges"], row["n_wedges"],
        row["n_triangles"], row["clustering_coeff"],
    )
    if got != want:
        print(f"    MISMATCH got={got} want={want}", flush=True)
    return got == want


fail = False
print(
    f"graph scale probe: base_edges={BASE_EDGES:,} factors={FACTORS} "
    f"cpus={CPUS} legs={sorted(LEGS)}", flush=True,
)

if "pagerank" in LEGS:
    for shape, make in (("stars10", make_stars), ("cliques8", make_cliques)):
        t1 = None
        for f_ in FACTORS:
            n_edges = BASE_EDGES * f_
            e, n_comp = make(n_edges)
            t0 = time.perf_counter()
            pr = pagerank(e, damping=DAMPING, n_iter=N_ITER, round_to=ROUND_TO)
            ok = check_pagerank(shape, pr, n_comp)
            dt = time.perf_counter() - t0
            t1 = t1 or dt
            fail |= not ok
            print(
                f"pagerank  {shape:9s} x{f_:<4d} edges={n_edges:>11,d} "
                f"wall={dt:7.2f}s ratio={dt / t1:6.2f} "
                f"verdict={'OK' if ok else 'FAIL'}", flush=True,
            )

if "triangles" in LEGS:
    for shape, make in (
        ("stars10", make_stars),
        ("cliques8", make_cliques),
        ("hub1k", lambda n: make_hubs(n, 1000)),
    ):
        t1 = None
        for f_ in FACTORS:
            n_edges = BASE_EDGES * f_
            if shape == "hub1k":
                # wedge rows = (h/2)^2 per hub: at 100M edges x h=1000
                # that is 25e9 rows (~600 GB shuffle) — a cluster job
                # by design (and a measured single-box ENOSPC, r10).
                # The hubgrow leg below measures this quadratic axis
                # CONTROLLED, at fixed edge volume. Cap, loudly.
                wedges = (1000 // 2) ** 2 * (n_edges // 1000)
                if wedges > int(
                    os.environ.get("SPARK_GRAFT_WEDGE_CAP", "5000000000")
                ):
                    print(
                        f"triangles {shape:9s} x{f_:<4d} "
                        f"edges={n_edges:>11,d} SKIP: {wedges:,} wedge "
                        f"rows exceed SPARK_GRAFT_WEDGE_CAP (single-box "
                        f"spill; linear-in-wedges on a cluster — the "
                        f"hubgrow leg measures this axis at fixed "
                        f"volume)", flush=True,
                    )
                    continue
            e, n_comp = make(n_edges)
            t0 = time.perf_counter()
            row = triangle_stats(e).first()
            dt = time.perf_counter() - t0
            t1 = t1 or dt
            ok = check_triangles(
                "hubs" if shape == "hub1k" else shape, row, n_comp
            )
            fail |= not ok
            print(
                f"triangles {shape:9s} x{f_:<4d} edges={n_edges:>11,d} "
                f"wall={dt:7.2f}s ratio={dt / t1:6.2f} "
                f"tri={row['n_triangles']:,} "
                f"verdict={'OK' if ok else 'FAIL'}", flush=True,
            )

if "hubgrow" in LEGS:
    # fixed 100k edges, growing hub size: the max-degree quadratic axis
    t1 = None
    for h in (100, 1000, 10000):
        e, n_comp = make_hubs(100_000, h)
        t0 = time.perf_counter()
        row = triangle_stats(e).first()
        dt = time.perf_counter() - t0
        t1 = t1 or dt
        ok = check_triangles("hubs", row, n_comp, h=h)
        fail |= not ok
        print(
            f"hubgrow   hub={h:<6d} x{h // 100:<4d} edges=    100,000 "
            f"wall={dt:7.2f}s ratio={dt / t1:6.2f} "
            f"wedges={row['n_wedges']:,} "
            f"verdict={'OK' if ok else 'FAIL'}", flush=True,
        )

sys.exit(1 if fail else 0)
