#!/usr/bin/env python3
"""Full-registry physical-plan audit: walk every ``queries()`` entry at
$SPARK_GRAFT_SF_DIR (default sf0.001 — the audit reads plan SHAPE, not
timings), grab the executed-plan string, and report every occurrence
of the two patterns that do not survive a 100x scale-up:

- ``Exchange SinglePartition`` — funnels the relation through one task
  (fine over a bounded aggregate, fatal over a corpus-sized lineage);
- global ``Sort`` nodes (``Sort [...], true,``) — a full-relation sort
  on a single ordering, the shape the distributed rank exists to avoid.

Output: one line per query with pattern counts, then a summary listing
queries with hits, ordered by count. Findings are REVIEW INPUT, not
failures: a global sort over a 9-row Benford table is intentional
(deterministic presentation of a bounded result); one over documents
is a bug. The reviewed verdicts live in docs/PLAN_AUDIT.md — keep that
file in sync when this script's output changes.

Usage: python3 scripts/audit_plans.py [only_these_queries...]
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from symtseries_spark.cache import release_persisted

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = (
    SparkSession.builder.master("local[8]")
    .appName("plan-audit")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

only = set(sys.argv[1:])
results = []
for name, fn in E.queries().items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as ex:
        print(f"{name}: PLAN ERROR {type(ex).__name__}: {ex}")
        results.append((name, None, None))
        continue
    finally:
        release_persisted()
    single = plan.count("Exchange SinglePartition")
    # global Sort: the Sort node's second argument (global flag) printed true
    gsorts = len(
        [ln for ln in plan.splitlines() if re.search(r"Sort \[.*\], true,", ln)]
    )
    results.append((name, single, gsorts))
    flag = " <--" if (single or gsorts) else ""
    print(
        f"{name}: single_partition={single} global_sorts={gsorts} "
        f"({time.time()-t0:.1f}s){flag}"
    )

hits = [(n, s, g) for n, s, g in results if (s or 0) + (g or 0) > 0]
errs = [n for n, s, g in results if s is None]
print(f"\n=== SUMMARY: {len(results)} plans, {len(hits)} with hits, "
      f"{len(errs)} errors ===")
for n, s, g in sorted(hits, key=lambda x: -(x[1] + x[2])):
    print(f"  {n}: single_partition={s} global_sorts={g}")
if errs:
    print("errors:", errs)
