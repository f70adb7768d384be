"""The plan-audit regression GATE as a test (round-9 ask: the audit
was a script + prose; a new query adding a row-scaled ``.orderBy``
only failed if it happened to be one of the pinned names in
test_no_global_sort_regression.py).

Two layers:

1. Fast unit tests proving the gate MECHANISM catches what it must: a
   scratch query with a deliberate Class-C global sort (or a gratuitous
   single-partition exchange) violates against an empty allowance, and
   counts at-or-below allowance pass.
2. A marked-slow FULL-REGISTRY sweep: every ``queries()`` entry's
   executed plan at sf0.001 must stay within its whitelisted
   allowance (docs/plan_whitelist.json — the docs/PLAN_AUDIT.md
   Class A/B adjudication carried as data).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from symtseries_spark.plan_gate import (
    audit_query,
    check,
    count_patterns,
    load_whitelist,
)


def test_gate_catches_deliberate_class_c_sort(spark, sf_dir):
    """A scratch query ending in a row-scaled .orderBy must violate."""

    def scratch(s, sf):
        docs = s.read.parquet(f"{sf}/documents.parquet")
        return docs.select("doc_id", "lang").orderBy("doc_id")

    counts = audit_query(scratch, spark, sf_dir)
    assert counts["global_sorts"] >= 1
    violations, _ = check({"scratch": counts}, load_whitelist())
    assert violations and "scratch" in violations[0]


def test_gate_catches_single_partition_exchange(spark, sf_dir):
    """An unpartitioned row_number window funnels through one task."""
    from pyspark.sql import Window

    def scratch(s, sf):
        docs = s.read.parquet(f"{sf}/documents.parquet")
        return docs.select(
            "doc_id",
            F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
        )

    counts = audit_query(scratch, spark, sf_dir)
    assert counts["single_partition"] >= 1
    violations, _ = check({"scratch2": counts}, load_whitelist())
    assert violations


def test_counts_within_allowance_pass():
    wl = {"q": {"single_partition": 1, "global_sorts": 2}}
    v, imp = check({"q": {"single_partition": 1, "global_sorts": 2}}, wl)
    assert not v and not imp
    v, imp = check({"q": {"single_partition": 0, "global_sorts": 1}}, wl)
    assert not v and len(imp) == 2


def test_count_patterns_definitions():
    plan = (
        "Sort [a ASC NULLS FIRST], true, 0\n"
        "  Exchange SinglePartition\n"
        "    Sort [b ASC], false, 0\n"
    )
    assert count_patterns(plan) == {"single_partition": 1, "global_sorts": 1}


@pytest.mark.slow
def test_full_registry_within_whitelist(spark, sf_dir):
    """Every registered query's plan stays within its adjudicated
    allowance. ~Minutes: builds all executed plans (some query
    builders run bounded driver actions — rank count passes, kmeans
    fits). Run explicitly with ``-m slow`` or let the full suite
    carry it."""
    whitelist = load_whitelist()
    observed = {}
    for name, fn in entry.queries().items():
        observed[name] = audit_query(fn, spark, sf_dir)
    violations, _ = check(observed, whitelist)
    assert not violations, "\n".join(violations)


def test_stale_entries_reports_whitelist_orphans():
    """Whitelist rows for renamed/removed queries surface as 'stale' on
    a full sweep instead of lingering silently (ADVICE r9)."""
    from symtseries_spark.plan_gate import stale_entries

    observed = {"q_live": {"single_partition": 1, "global_sorts": 0}}
    wl = {
        "q_live": {"single_partition": 1},
        "q_renamed_away": {"global_sorts": 2},
        "q_deleted": {"single_partition": 3},
    }
    assert stale_entries(observed, wl) == ["q_deleted", "q_renamed_away"]
    assert stale_entries(wl, wl) == []
