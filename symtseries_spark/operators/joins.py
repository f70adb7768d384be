"""Temporal joins the reference (and stock Spark SQL) lack as
first-class operators: as-of join, bounded interval join, and
sessionization. All three are expressed as shuffle-once compositions of
built-in DataFrame ops — no range-join nested loops, no Python on the
data path — so the plans survive a 100x scale-up:

- ``asof_join``: union-then-window. Both sides shuffle ONCE on the join
  key; a single ``last(..., ignorenulls)`` running window carries the
  most recent build-side row forward to each probe row. This is the
  standard distributed as-of formulation (vs. the quadratic
  BroadcastNestedLoop a naive ``ts <= ts`` join plans to).
- ``interval_join``: time-bucketed equi-join. Bucket width = interval
  span, probe rows replicate into at most 2 adjacent buckets, so the
  range predicate becomes an equi-join on ``(key, bucket)`` plus a
  residual filter — a plain shuffled hash join Catalyst/AQE can size
  and skew-split.
- ``sessionize``: gap-based session ids from one window partitioning
  (lag -> boundary flag -> running sum), the batch twin of Structured
  Streaming's ``session_window``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: int | float | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row of the same key
    with ``right.ts <= left.ts`` (ties inclusive), i.e. ANSI/DuckDB
    ``ASOF LEFT JOIN`` semantics. Unmatched left rows keep NULLs.

    Output = all left columns + ``right_ts`` + ``right_cols`` (caller
    must ensure the names don't collide; rename beforehand if needed).

    Scale shape: ``union`` of the two sides tagged by origin, one
    window partitioned by key ordered by ``(ts, side, tiebreak)`` where
    build rows sort before probe rows at equal ts, then
    ``last(payload, ignorenulls=True)`` over the running frame. Exactly
    one shuffle (on ``on``); per-partition sort replaces the per-key
    binary search a single-node engine would do. ``tolerance`` (same
    units as the ts columns) turns matches older than
    ``left.ts - tolerance`` back into NULLs without changing the plan.
    """
    pay_fields = [F.col(right_ts).alias("__ats")] + [
        F.col(c).alias(c) for c in right_cols
    ]
    build = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*pay_fields).alias("__pay"),
    )
    pay_type = build.schema["__pay"].dataType
    lrow_t = F.struct(*[F.col(c) for c in left.columns])
    probe = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_type).alias("__pay"),
        lrow_t.alias("__lrow"),
    )
    build = build.withColumn("__lrow", F.lit(None).cast(probe.schema["__lrow"].dataType))
    u = probe.unionByName(build)

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__pay", ignorenulls=True).over(w)
    out = u.withColumn("__m", matched).where(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(F.col("__m.__ats") >= F.col("__t") - F.lit(tolerance), F.col("__m")),
        )
    proj = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    proj.append(F.col("__m.__ats").alias(right_ts))
    proj.extend(F.col(f"__m.{c}").alias(c) for c in right_cols)
    return out.select(*proj)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    how: str = "inner",
) -> DataFrame:
    """Join pairs with ``left.ts + lower <= right.ts <= left.ts + upper``
    on the same key. ``lower``/``upper`` are in the ts columns' units
    (e.g. nanoseconds for the events table) with ``upper > lower``.

    Scale shape: bucket width = ``upper - lower``; each left row lands
    in the (at most) 2 buckets its interval can overlap
    (``posexplode`` of a 1-2 element array), the right side buckets by
    ``floor(ts / width)``, and the range predicate collapses to an
    equi-join on ``(key, bucket)`` + residual range filter. Duplicated
    probe rows are a bounded 2x; the join itself is a plain shuffled
    hash join (AQE can skew-split it), never a nested loop.

    Output: all left columns + all right columns (caller ensures
    disjoint names). ``how="left"`` keeps unmatched left rows (dedup'd
    back to one row per left occurrence via a distinct on the probe
    replica id).
    """
    if upper <= lower:
        raise ValueError("interval_join requires upper > lower")
    width = upper - lower
    lo_b = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    hi_b = F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(width))
    buckets = F.array_distinct(F.array(lo_b, hi_b))
    lx = left.withColumn("__bs", buckets).select(
        "*", F.explode("__bs").alias("__b")
    ).drop("__bs")
    rx = right.withColumn("__b", F.floor(F.col(right_ts) / F.lit(width)))
    cond = (
        (lx[on] == rx[on])
        & (lx["__b"] == rx["__b"])
        & (rx[right_ts] >= lx[left_ts] + F.lit(lower))
        & (rx[right_ts] <= lx[left_ts] + F.lit(upper))
    )
    joined = lx.join(rx, cond, "inner").drop(rx[on]).drop("__b")
    if how == "inner":
        return joined
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # left join: bucket replication would duplicate unmatched rows, so
    # anti-join the unmatched originals back in unreplicated.
    missing = left.join(
        joined.select(*left.columns).distinct(),
        on=left.columns,
        how="left_anti",
    )
    for c in right.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return joined.unionByName(missing)


def gapfill_locf(
    buckets: DataFrame,
    *,
    key: str,
    bucket: str,
    value: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward —
    the TSDB ``time_bucket_gapfill(..) + locf(..)`` shape. ``buckets``
    holds one row per observed ``(key, bucket)``; the output has one row
    per key for EVERY bucket in ``[lo, hi]``, with missing buckets
    filled by the key's previous value (NULL before the first
    observation) and flagged ``is_filled``.

    Scale shape: the dense axis is generated per key with
    ``explode(sequence(lo, hi))`` — no cross join, no driver-side
    range materialization — and the fill is one ``last(ignorenulls)``
    running window sharing the join's key partitioning. Cost is
    O(keys x buckets) output rows, which is the answer's own size.
    """
    if hi < lo:
        raise ValueError("gapfill_locf requires hi >= lo")
    keys = buckets.select(F.col(key)).distinct()
    dense = keys.select(
        F.col(key),
        F.explode(F.sequence(F.lit(lo), F.lit(hi))).alias(bucket),
    )
    joined = dense.join(buckets, [key, bucket], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key),
        F.col(bucket),
        F.last(value, ignorenulls=True).over(w).alias(value),
        F.col(value).isNull().alias("is_filled"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    on: str,
    salts: int,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the dim side is too big to broadcast
    AND the fact side has hot keys: the dim replicates ``salts`` times
    (one row per salt), the fact side picks a deterministic salt from a
    row hash, and the join runs on ``(key, salt)`` — splitting each hot
    key's rows across ``salts`` reducers instead of funneling them into
    one.

    This is the classic manual salting pattern. On Spark 3+, AQE's
    skew-join splitting usually makes it unnecessary for sort-merge
    joins (and that is this engine's default answer — see
    docs/SCALING.md); ``salted_join`` exists for the cases AQE does not
    cover: skewed SHUFFLED HASH joins, skew in the build of an
    aggregation-free pipeline, or engines/configs with AQE off.
    Replication cost is |dim| × salts, so use single-digit salt counts.

    Result is identical to ``fact.join(dim, on, how)`` (verified by
    test); supports ``inner`` and ``left``.
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    salt_arr = F.array(*[F.lit(i) for i in range(salts)])
    dim_rep = dim.withColumn("__salt", F.explode(salt_arr))
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(salts))
    )
    out = fact_s.join(dim_rep, [on, "__salt"], how)
    return out.drop("__salt")


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever the
    time since the previous event of the same key exceeds ``gap`` (same
    units as ``ts``). Adds a ``session_id`` column (0-based ordinal per
    key). Batch twin of Structured Streaming's ``session_window``.

    Scale shape: one shuffle on ``key``; the boundary flag (lag) and the
    running sum share the same window partitioning, so Spark plans a
    single sort + two WindowExec passes without re-shuffling.
    """
    order = [ts] if tiebreak is None else [ts, tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    new_sess = (
        F.when(prev.isNull() | (F.col(ts) - prev > F.lit(gap)), F.lit(1))
        .otherwise(F.lit(0))
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", (F.sum(new_sess).over(frame) - F.lit(1)).cast("long")
    )
