"""Session-scoped tracking for caller-side ``persist()`` calls.

Several registered queries persist a small intermediate (survivor-ID
skeletons, candidate pairs, per-doc score tables) because the returned
plan consumes it more than once. The persist must OUTLIVE the query
function — the caller drains the returned DataFrame later — so the
query can't unpersist it itself. Left alone, those blocks accumulate
across a long shared session (a bench segment runs ~45 queries in one
JVM) until LRU eviction, adding memory pressure for later queries.

The contract: query code persists through :func:`persist_tracked`;
any harness that drains queries in a loop (bench segments, the oracle
checker, test fixtures) calls :func:`release_persisted` after each
query's terminal action. A harness that doesn't call it (e.g. the
round driver's one-query-at-a-time correctness probe at sf0.01) just
degrades to the old leak-until-LRU behavior, which is safe — persist
is an optimization hint, never a correctness dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["persist_tracked", "release_persisted"]

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """``df.persist()`` + register for the next :func:`release_persisted`."""
    out = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(out)
    return out


def release_persisted() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    ``blocking=False`` (the default) — block eviction proceeds async on
    the executors, which is all the memory-pressure fix needs.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            # a stopped/replaced SparkContext makes unpersist moot
            pass
        n += 1
    return n
