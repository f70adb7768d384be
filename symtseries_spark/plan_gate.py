"""Physical-plan regression gate: the audit's Class A/B adjudication
(docs/PLAN_AUDIT.md) carried as DATA, so a NEW scale-hostile plan shape
fails loudly instead of waiting for a human re-read of the audit prose.

Two patterns are counted per executed plan (same definitions as
``scripts/audit_plans.py``, which is now a thin CLI over this module):

- ``Exchange SinglePartition`` — everything below it runs in ONE task;
  benign only under a final aggregate of map-side partials or a
  driver-bounded collect (Class A);
- global ``Sort`` nodes (``Sort [...], true,``) — a full range-exchange
  of the sorted relation; benign only over bounded-report output whose
  row order is part of its contract (Class B).

The whitelist (``docs/plan_whitelist.json``) maps query name ->
allowed {"single_partition": n, "global_sorts": n} — the counts the
round-8 audit adjudicated. The gate fails when ANY query's observed
count EXCEEDS its allowance (a query absent from the whitelist is
allowed zero of both). Counts BELOW the allowance pass with a note:
that is an improvement, tighten the whitelist with
``scripts/audit_plans.py --write-whitelist``.

Used by ``scripts/audit_plans.py`` (CLI, exits nonzero on violations)
and ``tests/test_plan_gate.py`` (marked-slow full-registry sweep).
"""

from __future__ import annotations

import json
import os
import re

WHITELIST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "plan_whitelist.json",
)

_GLOBAL_SORT = re.compile(r"Sort \[.*\], true,")


def count_patterns(plan: str) -> dict[str, int]:
    """Count the two audited patterns in an executed-plan string."""
    return {
        "single_partition": plan.count("Exchange SinglePartition"),
        "global_sorts": sum(
            1 for ln in plan.splitlines() if _GLOBAL_SORT.search(ln)
        ),
    }


def audit_query(fn, spark, sf_dir: str) -> dict[str, int]:
    """Build one query's executed plan and count patterns. Runs any
    driver actions the query builder itself performs (rank count
    passes, kmeans fits) but never executes the returned plan."""
    from symtseries_spark.cache import release_persisted

    try:
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_persisted()
    return count_patterns(plan)


def load_whitelist(path: str = WHITELIST_PATH) -> dict[str, dict[str, int]]:
    with open(path) as fh:
        return json.load(fh)


def check(
    observed: dict[str, dict[str, int]],
    whitelist: dict[str, dict[str, int]],
) -> tuple[list[str], list[str]]:
    """Compare observed counts against the whitelist.

    Returns ``(violations, improvements)`` — human-readable lines.
    ``violations`` non-empty means the gate FAILS: some query grew a
    single-partition exchange or a global sort the audit never
    adjudicated. ``improvements`` are queries now cheaper than their
    allowance (tighten the whitelist)."""
    violations: list[str] = []
    improvements: list[str] = []
    for name, counts in observed.items():
        allowed = whitelist.get(name, {})
        for pat in ("single_partition", "global_sorts"):
            got = counts.get(pat, 0)
            cap = allowed.get(pat, 0)
            if got > cap:
                violations.append(
                    f"{name}: {pat}={got} exceeds whitelisted {cap} "
                    f"(new scale-hostile plan shape — see docs/PLAN_AUDIT.md "
                    f"policy; if adjudicated benign, regenerate with "
                    f"scripts/audit_plans.py --write-whitelist)"
                )
            elif got < cap:
                improvements.append(f"{name}: {pat}={got} < whitelisted {cap}")
    return violations, improvements


def stale_entries(
    observed: dict[str, dict[str, int]],
    whitelist: dict[str, dict[str, int]],
) -> list[str]:
    """Whitelist names absent from ``observed`` — meaningful only on a
    FULL registry sweep, where they mark allowances for renamed/removed
    queries that would otherwise linger silently until the next
    ``--write-whitelist``. Report them so the whitelist stays in sync
    with the registry; on a partial sweep the result is noise."""
    return sorted(set(whitelist) - set(observed))
