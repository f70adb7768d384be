"""Regression gate for the round-7 distributed-rank wiring: the six
queries that formerly compiled to a single-task global sort
(unpartitioned ``Window.orderBy`` + ``row_number``/``ntile``) must now
show (a) a window PARTITIONED by the rank bucket key and (b) NO global
Sort node anywhere in the executed plan. A physical Sort prints its
global flag as ``, true,`` — partition-local sorts print ``, false,``.

The final ``orderBy`` of small REPORT relations (n-row aggregates) is
exempt by construction: none of these six queries ends in one over a
data-sized relation (value/key skew emit 1 row, rfm/ccnet/filter3 emit
per-user/doc rows with no output sort).
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"

RANK_WIRED = [
    "docs_ccnet_bucket",
    "docs_corpus_filter3",
    "events_value_skew",
    "events_key_skew",
    "docs_source_skew",
    "events_rfm",
]


@pytest.mark.parametrize("name", RANK_WIRED)
def test_no_global_sort_in_rank_wired_query(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__bkt" in plan, (
        f"{name}: expected the distributed rank's bucket-partitioned "
        "window in the plan"
    )
    global_sorts = [
        line
        for line in plan.splitlines()
        if "Sort [" in line and "], true," in line
    ]
    assert global_sorts == [], (
        f"{name}: global Sort node(s) reappeared:\n" + "\n".join(global_sorts)
    )


# Round-8 policy gate (docs/PLAN_AUDIT.md Class C): queries whose
# output is ROW-SCALED must not carry a physical total order — at
# scale a final orderBy is a full extra range-exchange of a
# corpus-sized relation that no consumer needs (the correctness
# comparator is order-insensitive; ordered training layouts come from
# rank COLUMNS instead). Representative members of the 19 cleaned in
# round 8, one per output family.
ROW_SCALED_UNSORTED = [
    "events_sessions",  # per-session table
    "events_asof_join",  # per-row join output
    "dedup_keep",  # corpus-sized survivor set
    "docs_tfidf",  # per-doc top-k terms
    "events_pivot",  # per-user wide table
    "docs_setops",  # id set
]


@pytest.mark.parametrize("name", ROW_SCALED_UNSORTED)
def test_no_global_sort_on_row_scaled_output(spark, name):
    import __spark_entry__ as entry

    from symtseries_spark.cache import release_persisted

    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    global_sorts = [
        line
        for line in plan.splitlines()
        if "Sort [" in line and "], true," in line
    ]
    assert global_sorts == [], (
        f"{name}: total-order sort on a row-scaled output "
        "(see docs/PLAN_AUDIT.md Class C):\n" + "\n".join(global_sorts)
    )
