#!/usr/bin/env python3
"""END-TO-END dedup-funnel probe at 100x (r9 verdict ask #5): the real
registered chain — exact dedup -> MinHash-LSH pairs -> pointer-doubled
connected components -> winnow leak check (`q_docs_dedup_funnel`) — run
as ONE job on a replica-scaled corpus, validating the pair-volume ->
components handoff and the tracked-persist pattern at volume (the
components probe used synthetic edges; this drives the actual pair
generator into the actual component solver).

Corpus scaling reuses scale_probe_pairs' vowel x consonant permutation
replicas: each replica preserves the base corpus's intra-replica
duplicate structure while its shingle/fingerprint sets stay disjoint
from every other replica's, so EVERY funnel stage's survivor count has
a closed form: exactly FACTOR x the base count (the only leak would be
a cross-replica minhash band-hash collision merging two components —
counted and reported if it ever happens).

Reports per run: wall, LSH pair count, component rounds
(operators/graph.py LAST_ROUNDS — the O(log diameter) measurement),
stage survivors vs the FACTOR x base closed form.

Env: SPARK_GRAFT_SF_DIR (base, default sf0.1),
SPARK_GRAFT_SCALE_FACTOR (default 100; vowel perms cap it at 120),
SPARK_GRAFT_CPUS, SPARK_GRAFT_DRIVER_MEM.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as E
from scale_probe_pairs import build_scaled
from symtseries_spark.cache import release_persisted
from symtseries_spark.operators import graph
from symtseries_spark.operators.dedup import minhash_lsh_pairs
from symtseries_spark.sources import load

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "100"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("dedup-funnel-scale-probe")
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

funnel = E.queries()["docs_dedup_funnel"]


def run(sf_dir: str):
    graph.LAST_ROUNDS = None
    t0 = time.perf_counter()
    rows = {r["stage"]: r["survivors"] for r in funnel(spark, sf_dir).collect()}
    wall = time.perf_counter() - t0
    release_persisted()
    return wall, rows, graph.LAST_ROUNDS


def lsh_pairs_after_exact(sf_dir: str) -> int:
    """The stage-3 pair volume the funnel's component solver consumed
    (recomputed standalone: exact-survivor semi-join -> LSH pairs)."""
    from symtseries_spark.operators.dedup import exact_dedup_map

    docs = load(spark, sf_dir, "documents")
    s1_ids = (
        exact_dedup_map(docs)
        .where(~F.col("is_duplicate"))
        .select("doc_id")
    )
    s1 = docs.join(s1_ids, "doc_id", "left_semi")
    n = minhash_lsh_pairs(s1, **E.MINHASH).count()
    release_persisted()
    return n


out = os.path.join(tempfile.gettempdir(), f"scaled_funnel_{FACTOR}x")
print(f"[probe] building {FACTOR}x replica corpus at {out}", flush=True)
t0 = time.perf_counter()
build_scaled(spark, out, factor=FACTOR)
print(f"[probe] built in {time.perf_counter() - t0:.1f}s", flush=True)

wall_b, stages_b, rounds_b = run(BASE)
pairs_b = lsh_pairs_after_exact(BASE)
print(
    f"base   wall={wall_b:7.2f}s pairs={pairs_b:>10,d} rounds={rounds_b} "
    f"stages={stages_b}", flush=True,
)

wall_s, stages_s, rounds_s = run(out)
pairs_s = lsh_pairs_after_exact(out)
print(
    f"x{FACTOR:<4d} wall={wall_s:7.2f}s pairs={pairs_s:>10,d} "
    f"rounds={rounds_s} stages={stages_s}", flush=True,
)

ok = True
for stage, base_n in stages_b.items():
    want = base_n * FACTOR
    got = stages_s[stage]
    verdict = "OK" if got == want else f"DRIFT {got - want:+d}"
    if got != want:
        ok = False
    print(f"  stage {stage:10s}: {got:>10,d} vs closed-form {want:>10,d}  "
          f"{verdict}", flush=True)
print(
    f"pair volume x{pairs_s / max(pairs_b, 1):.2f} for x{FACTOR} docs "
    f"(closed form: exactly x{FACTOR}); "
    f"wall x{wall_s / wall_b:.2f}; rounds {rounds_b} -> {rounds_s} "
    f"(log-diameter claim: flat)", flush=True,
)
sys.exit(0 if ok and pairs_s == pairs_b * FACTOR else 1)
