#!/usr/bin/env python3
"""Full-registry physical-plan audit + regression GATE.

Walks every ``queries()`` entry at $SPARK_GRAFT_SF_DIR (default
sf0.001 — the audit reads plan SHAPE, not timings), counts the two
patterns that do not survive a 100x scale-up (``Exchange
SinglePartition`` and global ``Sort`` nodes — definitions and the
benign/fatal adjudication live in symtseries_spark/plan_gate.py and
docs/PLAN_AUDIT.md), and compares the counts against the checked-in
whitelist ``docs/plan_whitelist.json``.

Exit status:
  0 — every query's counts are within its whitelisted allowance;
  1 — at least one query EXCEEDS its allowance (a new single-partition
      exchange or global sort the audit never adjudicated), or a plan
      failed to build.

Usage:
  python3 scripts/audit_plans.py [only_these_queries...]
  python3 scripts/audit_plans.py --write-whitelist   # full sweep, then
      regenerate docs/plan_whitelist.json from observed counts (run
      after ADJUDICATING new hits in docs/PLAN_AUDIT.md, never to
      silence a failure you haven't classified).

The marked-slow pytest twin (tests/test_plan_gate.py) runs the same
gate, so CI catches a regression even when nobody runs this script.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from symtseries_spark.plan_gate import (
    WHITELIST_PATH,
    audit_query,
    check,
    load_whitelist,
    stale_entries,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

args = sys.argv[1:]
write_whitelist = "--write-whitelist" in args
only = {a for a in args if not a.startswith("--")}

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

observed = {}
errors = []
for name, fn in E.queries().items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        counts = audit_query(fn, spark, SF)
    except Exception as ex:
        print(f"{name}: PLAN ERROR {type(ex).__name__}: {ex}")
        errors.append(name)
        continue
    observed[name] = counts
    flag = " <--" if any(counts.values()) else ""
    print(
        f"{name}: single_partition={counts['single_partition']} "
        f"global_sorts={counts['global_sorts']} "
        f"({time.time()-t0:.1f}s){flag}"
    )

hits = {n: c for n, c in observed.items() if any(c.values())}
print(f"\n=== SUMMARY: {len(observed)} plans, {len(hits)} with hits, "
      f"{len(errors)} errors ===")
for n, c in sorted(hits.items(), key=lambda x: -sum(x[1].values())):
    print(f"  {n}: single_partition={c['single_partition']} "
          f"global_sorts={c['global_sorts']}")
if errors:
    print("errors:", errors)

if write_whitelist:
    if only:
        sys.exit("refusing --write-whitelist on a partial sweep")
    wl = {n: {k: v for k, v in c.items() if v} for n, c in hits.items()}
    with open(WHITELIST_PATH, "w") as fh:
        json.dump(wl, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwhitelist regenerated: {WHITELIST_PATH} ({len(wl)} entries)")
    sys.exit(1 if errors else 0)

try:
    whitelist = load_whitelist()
except FileNotFoundError:
    sys.exit(f"\nGATE SKIP: no whitelist at {WHITELIST_PATH} — run with "
             f"--write-whitelist after adjudicating the sweep above")

violations, improvements = check(observed, whitelist)
if not only:
    stale = stale_entries(observed, whitelist)
    if stale:
        print(f"\n{len(stale)} whitelist entries match no registered query "
              f"(renamed/removed — regenerate with --write-whitelist):")
        for n in stale:
            print(f"  {n}")
if improvements:
    print(f"\n{len(improvements)} below allowance (tighten whitelist):")
    for ln in improvements:
        print(f"  {ln}")
if violations or errors:
    print(f"\nGATE FAIL: {len(violations)} violations, {len(errors)} errors")
    for ln in violations:
        print(f"  {ln}")
    sys.exit(1)
print(f"\nGATE PASS: {len(observed)} plans within whitelisted allowances")
