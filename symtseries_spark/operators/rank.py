"""Distributed exact global ranking.

``row_number() OVER (ORDER BY key)`` with no PARTITION BY funnels the
whole relation through ONE task — the classic 100x scale-killer. This
module provides the exact two-pass replacement used by every registered
query that needs a true global rank (CCNet buckets, DSIR rank gates,
Gini/skew reports, RFM ntiles):

1. **Boundary pass** — ``approxQuantile`` picks ``buckets-1`` range
   boundaries on the (double-cast) sort key. Boundary *placement* only
   affects balance, never correctness: any boundary set yields exact
   ranks because the bucket id is a monotone function of the key and
   equal keys always share a bucket.
2. **Count pass** — per-bucket row counts, collected to the driver
   (bounded: at most ``buckets`` rows) and turned into cumulative
   prefix offsets, re-entering the plan as a literal map.
3. **Rank pass** — ``row_number()`` WITHIN each bucket (parallel
   window, one task per bucket) plus the bucket's offset. Bucket order
   + in-bucket order = global order, so the result is bit-identical to
   the single-task global window — the DuckDB oracles run the literal
   global form and stay green unchanged.

The input lineage is persisted across the two driver actions and
unpersisted before the final plan is handed back, so upstream work runs
twice total (once cached for both actions, once in the caller's job)
instead of three times.

Preconditions: the sort key must be numeric, non-null, and non-NaN
(NaN orders differently in a bucket comparison than in a sort).
Heavily tied keys degrade gracefully: all ties land in one bucket, so a
single dominant key value concentrates its (unavoidable, since ranks
among ties must be assigned in one place) sort in one task while every
other bucket still runs in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_row_number", "distributed_ntile"]


def _bucket_expr(bounds: list[float], key_d):
    """Bucket id = number of boundaries <= key (monotone in key)."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= key_d))


def distributed_row_number(
    df: DataFrame,
    key: str,
    *,
    tiebreak: str,
    out: str = "rn",
    descending: bool = False,
    buckets: int = 64,
    rel_err: float = 0.01,
) -> DataFrame:
    """Append ``out`` = exact global ``row_number() OVER (ORDER BY key
    [DESC], tiebreak)`` without a single-partition sort.

    ``tiebreak`` always orders ascending (the repo-wide deterministic
    tie rule). Ranks are 1-based and bit-identical to the global-window
    form; see the module docstring for the two-pass shape.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    # Orientation: rank ascending over sgn * key so one code path
    # serves both directions. Negation of a double/long is exact.
    key_d = F.col(key).cast("double")
    oriented = (-key_d) if descending else key_d
    work = df.withColumn("__dk", oriented)

    work.persist()
    try:
        qs = [i / buckets for i in range(1, buckets)]
        bounds = sorted(set(work.stat.approxQuantile("__dk", qs, rel_err))) if qs else []
        with_bkt = work.withColumn(
            "__bkt", _bucket_expr(bounds, F.col("__dk"))
        )
        counts = {
            r["__bkt"]: r["cnt"]
            for r in with_bkt.groupBy("__bkt")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
    finally:
        work.unpersist()

    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        off_map = F.create_map(
            *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]
        )
        off = F.element_at(off_map, F.col("__bkt").cast("int"))
    else:
        off = F.lit(0)

    order_key = F.col(key).desc() if descending else F.col(key).asc()
    w_in = Window.partitionBy("__bkt").orderBy(order_key, F.col(tiebreak))
    # Rebuild bucket on the original lineage (post-unpersist) — the
    # bucket expression is a pure function of the key, so the final
    # job's bucket ids match the counted ones exactly.
    key_d2 = F.col(key).cast("double")
    oriented2 = (-key_d2) if descending else key_d2
    return (
        df.withColumn("__bkt", _bucket_expr(bounds, oriented2))
        .withColumn(
            out, F.row_number().over(w_in).cast("long") + off.cast("long")
        )
        .drop("__bkt")
    )


def distributed_ntile(
    df: DataFrame,
    key: str,
    *,
    tiebreak: str,
    n_tiles: int,
    out: str = "tile",
    descending: bool = False,
    buckets: int = 64,
) -> DataFrame:
    """Append ``out`` = exact global ``ntile(n_tiles) OVER (ORDER BY
    key [DESC], tiebreak)`` via :func:`distributed_row_number`.

    SQL ntile semantics: with ``n`` rows, the first ``n % k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k`` — derived arithmetically
    from the distributed rank and the total count, so the result is
    bit-identical to the window form (and to DuckDB's ``ntile``).
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    ranked = distributed_row_number(
        df, key, tiebreak=tiebreak, out="__gr", descending=descending,
        buckets=buckets,
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    r = F.col("__gr")
    n = F.col("__n")
    # q = n div k, rem = n % k; row r (1-based) falls in tile:
    #   r <= rem*(q+1)          -> ceil(r / (q+1))
    #   otherwise               -> rem + ceil((r - rem*(q+1)) / q)
    qq = F.expr(f"__n div {n_tiles}")
    rem = n % F.lit(n_tiles)
    cut = rem * (qq + 1)
    tile = (
        F.when(r <= cut, F.ceil(r / (qq + 1)))
        .otherwise(rem + F.ceil((r - cut) / qq))
        .cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out, tile)
        .drop("__gr", "__n")
    )
