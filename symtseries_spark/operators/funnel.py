"""Ordered funnel analysis: how many entities reach each stage of an
event sequence (stage i+1 must happen strictly AFTER the entity's
earliest stage-i completion — the standard product-analytics funnel).

Shape: one aggregate per stage, every one on the SAME key partitioning
(Spark reuses the exchange), joined back key-to-key. No window over the
whole event history, no per-entity event collection — state per key is
one timestamp per stage, so a billion-user funnel is s small
aggregates + s-1 same-key joins. Counts are integers: deterministic on
any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts"]


def funnel_counts(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Count entities reaching each funnel stage in order ->
    ``(stage_idx, stage, n_entities)``, one row per stage.

    An entity reaches stage 0 if it has any ``stages[0]`` event; it
    reaches stage i via the earliest qualifying chain: t_i = min ts of a
    ``stages[i]`` event with ts > t_{i-1}. Earliest-chain is the
    standard greedy that maximizes conversions (a later stage-i event
    can only shrink the window for stage i+1)."""
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = df.groupBy(key).agg(
        F.min(F.when(F.col(type_col) == stages[0], F.col(ts))).alias("__t0")
    )
    for i, stage in enumerate(stages[1:], 1):
        prev = f"__t{i - 1}"
        joined = df.join(cur, key)
        cur = joined.groupBy(key, *[f"__t{j}" for j in range(i)]).agg(
            F.min(
                F.when(
                    (F.col(type_col) == stage) & (F.col(ts) > F.col(prev)),
                    F.col(ts),
                )
            ).alias(f"__t{i}")
        )
    counts = cur.agg(
        *[
            F.count(f"__t{i}").alias(f"__n{i}")
            for i in range(len(stages))
        ]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"__n{i}").alias("n_entities"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(stage_rows).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_entities"
    )
