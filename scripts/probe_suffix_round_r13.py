#!/usr/bin/env python3
"""r13 evidence probe for the suffix doubling-round fusion.

The registered queries' final ``.explain`` reads the loop's
localCheckpoints, so the fusion is invisible there. This probe
produces the evidence at the right altitude instead:

1. ``plans/r13/suffix_round_rank_{before,after}.txt`` — the EXECUTED
   plan of ONE doubling round's rank stage, before (distinct ->
   two-pass rank -> corpus join-back; reconstructed from the untouched
   ``ranked_with_total``) vs after (fused ``dense_ranked_with_total``
   carried on the paired rows).
2. Driver-job counts for the full ``suffix_ranks`` loop on the sf
   corpus (job-group scoped), old shape vs current module code — run
   it from a worktree at the pre-fusion commit to get the old number.
"""
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TAG = sys.argv[1] if len(sys.argv) > 1 else "after"

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("probe-suffix-round")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from symtseries_spark.operators import suffix as sx  # noqa: E402
from symtseries_spark.operators.rank import (  # noqa: E402
    _default_buckets,
    ranked_with_total,
)

docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

# --- full-loop driver-job count (whatever shape the module currently has)
sc = spark.sparkContext
sc.setJobGroup("sfxloop", "suffix_ranks full loop")
t0 = time.perf_counter()
positions = sx.token_positions(docs)
ranks, _ = sx.suffix_ranks(positions)
ranks.write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
jobs = sc.statusTracker().getJobIdsForGroup("sfxloop")
sc.setJobGroup(None, None)
print(
    f"[probe] suffix_ranks loop ({TAG}): rounds={sx.LAST_ROUNDS} "
    f"jobs={len(jobs)} wall={dt:.2f}s "
    f"load={open('/proc/loadavg').read().split()[0]}"
)

# --- one-round rank-stage plan, both shapes (plan only when repo has
# dense_ranked_with_total, i.e. the after tree)
plandir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)
os.makedirs(plandir, exist_ok=True)
pos_tbl = sx.token_positions(docs).localCheckpoint()
vocab = sx._vocab_ranks(pos_tbl)
cur = (
    pos_tbl.join(F.broadcast(vocab), "tok")
    .select("doc_id", "pos", "rank")
    .localCheckpoint()
)
vmax = int(cur.agg(F.max("rank")).first()[0] or 0)
w_doc = Window.partitionBy("doc_id").orderBy("pos")
paired = cur.select(
    "doc_id",
    "pos",
    F.col("rank").alias("r1"),
    F.coalesce(F.lead("rank", 1).over(w_doc), F.lit(-1).cast("long")).alias("r2"),
).persist()
nb = _default_buckets(paired)
kb = [float(1 + (i * vmax) // nb) for i in range(1, nb)]


def dump(df, fname):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(plandir, fname), "w") as fh:
        fh.write(buf.getvalue())


# BEFORE shape: distinct -> two-pass rank -> join-back
ranked_b, total_b = ranked_with_total(
    paired.select("r1", "r2").distinct(),
    "r1", tiebreak="r2", out="nr", descending=False, key_bounds=kb,
)
before_cur = paired.join(ranked_b, ["r1", "r2"]).select(
    "doc_id", "pos", F.col("nr").cast("long").alias("rank")
)
dump(before_cur, "suffix_round_rank_before.txt")

# AFTER shape: fused dense rank carried on the paired rows
try:
    from symtseries_spark.operators.rank import dense_ranked_with_total
except ImportError:
    dense_ranked_with_total = None
if dense_ranked_with_total is not None:
    ranked_a, total_a = dense_ranked_with_total(
        paired, "r1", tiebreak="r2", out="nr", key_bounds=kb
    )
    after_cur = ranked_a.select(
        "doc_id", "pos", F.col("nr").cast("long").alias("rank")
    )
    dump(after_cur, "suffix_round_rank_after.txt")
    assert total_a == total_b, (total_a, total_b)
    print(f"[probe] round-1 class totals agree: {total_a}")
paired.unpersist()
spark.stop()
