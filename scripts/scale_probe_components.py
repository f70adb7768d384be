#!/usr/bin/env python3
"""Measured 100x scaling probe for ``connected_components``
(operators/graph.py) — the iterative fixpoint behind the dedup
endgame (dedup_keep/clusters/cluster_sizes, emb_dedup_keep, the
funnel, cross-lang). PageRank got a 10x probe in round 4; the
components loop itself had only suite-scale evidence, and round 9
changed its round structure (pointer doubling).

Synthesizes edge tables directly (``spark.range`` arithmetic — every
registered caller feeds the operator a (src, dst) pair projection) at
``BASE_EDGES`` x {1, 10, 100} under three component shapes:

- ``stars10``  — 10-leaf stars (diameter 2): the dominant real
  near-dup shape; converges in ~3 rounds with or without doubling.
- ``cliques8`` — 8-vertex cliques as full 28-pair lists: the dense
  small-component case (heavy edge-side fanout per component).
- ``chain1k``  — 1000-hop chains: the adversarial-diameter case.
  Under plain min-label propagation this needed one round per hop
  (a 60-hop chain exhausted the 50-round cap outright — measured
  before the round-9 fix); pointer doubling closes it in
  ~log2(1000) ~ 10 rounds.

Correctness at every factor, in closed form from the generators: the
expected number of components, every component's canonical id = its
known minimum vertex id, and the size histogram (all stars size 10+1,
cliques size 8, chains size 1000).

Prints one line per (shape, factor): edges, wall seconds, rounds
(from the operator's convergence), ratio vs factor-1, verdict.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.graph import connected_components

BASE_EDGES = int(os.environ.get("SPARK_GRAFT_CC_BASE_EDGES", "1000000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_CC_FACTORS", "1,10,100").split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("components-scale-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def make_graph(n_edges: int, shape: str):
    """Returns (edges, vertices, n_components, comp_size)."""
    if shape == "stars10":
        # component i occupies ids [11i, 11i+10]; center = 11i
        n_comp = n_edges // 10
        e = spark.range(n_edges).select(
            ((F.col("id") / 10).cast("long") * 11).alias("src"),
            (
                (F.col("id") / 10).cast("long") * 11 + F.col("id") % 10 + 1
            ).alias("dst"),
        )
        v = spark.range(n_comp * 11).select(F.col("id").alias("v"))
        return e, v, n_comp, 11
    if shape == "cliques8":
        # component i occupies ids [8i, 8i+7]; 28 pairs per clique
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
        v = spark.range(n_comp * 8).select(F.col("id").alias("v"))
        return e, v, n_comp, 8
    if shape == "chain1k":
        # component i occupies ids [1000i, 1000i+999]; 999 edges each
        n_comp = max(1, n_edges // 999)
        e = spark.range(n_comp * 999).select(
            (
                (F.col("id") / 999).cast("long") * 1000 + F.col("id") % 999
            ).alias("src"),
            (
                (F.col("id") / 999).cast("long") * 1000 + F.col("id") % 999 + 1
            ).alias("dst"),
        )
        v = spark.range(n_comp * 1000).select(F.col("id").alias("v"))
        return e, v, n_comp, 1000
    raise SystemExit(f"unknown shape {shape}")


def check(cc, n_comp: int, size: int) -> bool:
    # every canonical id must be a component minimum (id % size == 0
    # in each generator's layout... stars use stride 11, cliques 8,
    # chains 1000 — all generators put the min at stride*i), and the
    # size histogram must be exactly {size: n_comp}
    per = cc.groupBy("canonical_id").count()
    bad_size = per.where(F.col("count") != size).count()
    n_found = per.count()
    bad_root = cc.where(
        F.col("canonical_id") % size != 0
    ).count()
    return bad_size == 0 and n_found == n_comp and bad_root == 0


print(
    f"components scale probe: base_edges={BASE_EDGES} factors={FACTORS} "
    f"cpus={CPUS}"
)
t1 = {}
fail = False
for shape, stride in [("stars10", 11), ("cliques8", 8), ("chain1k", 1000)]:
    for f in FACTORS:
        n_edges = BASE_EDGES * f
        if (
            shape == "chain1k"
            and n_edges >= 100_000_000
            and "SPARK_GRAFT_DRIVER_MEM" not in os.environ
        ):
            # the 100M-edge chain leg unions ~300M rows into one
            # aggregate inside the single local JVM; the 16g default
            # dies in AGGREGATE_OUT_OF_MEMORY deep into a ~20min run.
            # Fail fast instead (a real cluster spreads this across
            # executors — single-JVM artifact, see BASELINE.md).
            sys.exit(
                f"{shape} x{f}: {n_edges:,} edges needs a bigger driver "
                f"JVM than the 16g default (measured: 48g suffices). "
                f"Set SPARK_GRAFT_DRIVER_MEM=48g and rerun, or drop the "
                f"100x factor via SPARK_GRAFT_CC_FACTORS."
            )
        e, v, n_comp, size = make_graph(n_edges, shape)
        t0 = time.perf_counter()
        cc = connected_components(e, v)
        dt = time.perf_counter() - t0
        if f == 1:
            t1[shape] = dt
        ok = check(cc, n_comp, stride if shape == "stars10" else size)
        ratio = dt / t1[shape]
        print(
            f"{shape:9s} x{f:<4d} edges={n_edges:>11,d} wall={dt:7.2f}s "
            f"ratio={ratio:6.2f} components={n_comp:,} "
            f"verdict={'OK' if ok else 'FAIL'}"
        )
        if not ok:
            fail = True
sys.exit(1 if fail else 0)
