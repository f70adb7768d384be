"""Declarative data-quality constraint audit — the "unit tests for
data" stage a training pipeline runs on every ingest BEFORE dedup or
filtering touches the batch (Schelter et al. 2018, "Automating
Large-Scale Data Quality Verification", VLDB 11(12) — the Deequ
design; re-expressed Spark-first).

Two operators:

- ``audit(df, checks)`` — a battery of declarative constraints
  (completeness, distinctness, bounds, set/regex conformance,
  arbitrary row predicates). Deequ's key scale idea is preserved: the
  WHOLE battery compiles to ONE aggregation pass over a SINGLE scan —
  every metric is a map-side-combinable aggregate (conditional counts,
  min/max, one exact count-distinct per distinctness check), so at
  100 TB the audit costs one read of the audited columns, not one scan
  per constraint. The single-row aggregate is then unpivoted
  driver-free via ``stack`` into one row per check.

- ``referential_orphans(edges)`` — foreign-key conformance across
  tables: for each (child key -> parent key) edge, count child rows
  whose key has no parent ("orphans") plus null keys. Parents reduce
  to DISTINCT key sets before the join (combinable, and keeps a
  skewed fact table from fanning out), children project the key
  column only, and small parent key sets broadcast under AQE — the
  orphan audit never shuffles payload columns.

Float parity with the DuckDB oracle is exact: every emitted metric is
either an integer count cast to double, a min/max, or a ratio of two
exact BIGINTs (IEEE division is bit-identical cross-engine). No
rounding needed.

No reference counterpart (the reference is a SAX kernel library);
the constraint vocabulary follows Deequ §3.1.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "check_completeness",
    "check_distinctness",
    "check_min",
    "check_max",
    "check_in_set",
    "check_regex",
    "check_predicate",
    "audit",
    "referential_orphans",
]


class Check(NamedTuple):
    """One declarative constraint.

    ``metric`` is any expression built from aggregate functions
    (evaluated in the single shared pass); ``op``/``threshold`` decide
    ``passed`` (``ge``: metric >= threshold, ``le``: metric <=
    threshold).
    """

    check: str
    col_name: str
    metric: Column
    op: str
    threshold: float


def _frac(cond: Column) -> Column:
    # exact BIGINT / BIGINT -> double; bit-identical cross-engine
    return F.sum(cond.cast("long")) / F.count(F.lit(1))


def check_completeness(column: str, min_frac: float = 1.0) -> Check:
    """Fraction of rows with ``column`` non-null >= ``min_frac``."""
    return Check(
        "completeness", column, _frac(F.col(column).isNotNull()), "ge", min_frac
    )


def check_distinctness(column: str, min_frac: float = 1.0) -> Check:
    """Exact count-distinct / row count >= ``min_frac`` (1.0 = the
    column is a key). The one non-trivial aggregate in the battery —
    Spark plans it as a two-stage expand+partial, still one pass."""
    return Check(
        "distinctness",
        column,
        F.countDistinct(F.col(column)) / F.count(F.lit(1)),
        "ge",
        min_frac,
    )


def check_min(column: str, lower: float) -> Check:
    """min(column) >= lower."""
    return Check(
        "min", column, F.min(F.col(column)).cast("double"), "ge", lower
    )


def check_max(column: str, upper: float) -> Check:
    """max(column) <= upper."""
    return Check(
        "max", column, F.max(F.col(column)).cast("double"), "le", upper
    )


def check_in_set(
    column: str, values: Sequence[str], min_frac: float = 1.0
) -> Check:
    """Fraction of rows whose value is one of ``values`` (nulls fail
    membership) >= ``min_frac``."""
    return Check(
        "in_set",
        column,
        _frac(F.col(column).isin(list(values))),
        "ge",
        min_frac,
    )


def check_regex(column: str, pattern: str, min_frac: float = 1.0) -> Check:
    """Fraction of rows matching anchored ``pattern`` (nulls fail)
    >= ``min_frac``. Keep the pattern in the cross-engine-safe subset
    (char classes, anchors, +*? — no lookaround) so the DuckDB twin
    evaluates it identically."""
    return Check(
        "regex",
        column,
        _frac(F.coalesce(F.col(column).rlike(pattern), F.lit(False))),
        "ge",
        min_frac,
    )


def check_predicate(
    name: str, column: str, cond: Column, min_frac: float = 1.0
) -> Check:
    """Fraction of rows where arbitrary row-level ``cond`` holds
    (null counts as fail) >= ``min_frac`` — the escape hatch for
    cross-column conformance rules."""
    return Check(
        name, column, _frac(F.coalesce(cond, F.lit(False))), "ge", min_frac
    )


def audit(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run the whole battery in ONE aggregation pass.

    Returns one row per check: (check_name, col_name, metric double,
    passed boolean). The single-row global aggregate is partial-agg
    combinable (one ``Exchange SinglePartition`` of one row); the
    ``stack`` unpivot and pass/fail comparisons run on that one row.
    """
    if not checks:
        raise ValueError("audit needs at least one Check")
    ops = {"ge", "le"}
    bad = [c.op for c in checks if c.op not in ops]
    if bad:
        raise ValueError(f"unknown comparator(s) {bad}; use 'ge' or 'le'")
    row = df.agg(
        *[c.metric.cast("double").alias(f"_m{i}") for i, c in enumerate(checks)]
    )
    # stack(n, name1, col1, m1, ...) -> one row per check, no driver trip
    parts: list[Column] = []
    for i, c in enumerate(checks):
        parts.extend([F.lit(c.check), F.lit(c.col_name), F.col(f"_m{i}")])
    unpivoted = row.select(
        F.stack(
            F.lit(len(checks)), *parts
        ).alias("check_name", "col_name", "metric")
    )
    # pass/fail: re-derive threshold per (check_name, col_name) key.
    # Keys must be unique per check for the CASE mapping to be sound.
    keys = [(c.check, c.col_name) for c in checks]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate (check, column) keys in battery: {keys}")
    passed: Column = F.lit(None).cast("boolean")
    for c in checks:
        hit = (F.col("check_name") == c.check) & (F.col("col_name") == c.col_name)
        cmp = (
            F.col("metric") >= F.lit(float(c.threshold))
            if c.op == "ge"
            else F.col("metric") <= F.lit(float(c.threshold))
        )
        passed = F.when(hit, cmp).otherwise(passed)
    return unpivoted.select(
        "check_name",
        "col_name",
        F.col("metric"),
        passed.alias("passed"),
    )


def referential_orphans(
    edges: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit.

    ``edges``: (edge_name, child_df, child_key, parent_df, parent_key)
    tuples. Returns one row per edge: (edge, n_child, n_null_keys,
    n_orphans) where orphans are non-null child keys absent from the
    parent's key set.

    Scale shape: per edge, the child projects ONLY the key column and
    the parent reduces to DISTINCT keys (map-side combinable) before a
    left join on the key — payloads never cross the wire, duplicate
    parent keys can't fan the child out, and a dimension-sized parent
    key set broadcasts under AQE. Output is |edges| rows.
    """
    if not edges:
        raise ValueError("referential_orphans needs at least one edge")
    outs = []
    for name, child, ckey, parent, pkey in edges:
        c = child.select(F.col(ckey).alias("k"))
        p = (
            parent.select(F.col(pkey).alias("k"))
            .where(F.col("k").isNotNull())
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        outs.append(
            c.join(p, "k", "left").agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col("k").isNull().cast("long")).alias("n_null_keys"),
                F.sum(
                    (F.col("k").isNotNull() & F.col("_hit").isNull()).cast(
                        "long"
                    )
                ).alias("n_orphans"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
