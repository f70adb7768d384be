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
query's terminal action — or wraps each query in the
:func:`tracked_persists` context manager, which releases on exit.

A caller that never releases (e.g. the round driver's one-query-at-a-
time correctness probe, or a plain library consumer) is bounded by a
FIFO cap: registering past ``_CAP`` entries unpersists the OLDEST
tracked DataFrame first, so neither the JVM cache nor the driver-side
reference list grows without bound. Evicting a persist a caller still
intends to drain is harmless — Spark recomputes the lineage; persist
is an optimization hint, never a correctness dependency. (Strong
references are deliberate: the cached blocks live in the JVM
CacheManager keyed by logical plan, so letting the Python object die
would leak the blocks with no handle left to unpersist them.)

Thread-affinity: the registry is guarded by a lock, so concurrent
registration is safe, but bare :func:`release_persisted` releases
EVERYTHING tracked so far — two harness threads interleaving
query+release cycles would release each other's persists early
(harmless for correctness, wasteful for time). Every current harness
drains queries single-threaded; a concurrent harness should scope each
thread's queries with :func:`tracked_persists`, which releases only
the persists registered during its own block.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["persist_tracked", "release_persisted", "tracked_persists"]

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []
# every registered query persists <= ~4 intermediates; 64 outstanding
# persists means ~16 queries' worth of never-released hints — far past
# any legitimate single-query working set
_CAP = 64


def _unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        # a stopped/replaced SparkContext makes unpersist moot
        pass


_SCOPES = threading.local()


def persist_tracked(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """``df.persist()`` + register for release.

    Inside a :func:`tracked_persists` scope on the SAME thread, the
    registration belongs to that scope (released at its exit, invisible
    to other threads and to :func:`release_persisted`). Otherwise it
    joins the global registry. Either way, past ``_CAP`` outstanding
    registrations the oldest is unpersisted (FIFO), so growth stays
    bounded for callers that never release AND for long-lived scopes."""
    out = df.persist(level) if level is not None else df.persist()
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        # the same FIFO cap applies inside a scope: a long-lived scope
        # (a harness wrapping a whole segment rather than one query)
        # must not accumulate unbounded persists either — the scope
        # list is thread-owned, so no lock is needed
        mine = stack[-1]
        mine.append(out)
        if len(mine) > _CAP:
            _unpersist(mine.pop(0))
        return out
    evicted = None
    with _LOCK:
        _TRACKED.append(out)
        if len(_TRACKED) > _CAP:
            evicted = _TRACKED.pop(0)
    if evicted is not None:
        _unpersist(evicted)
    return out


def release_persisted() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    ``blocking=False`` (the default) — block eviction proceeds async on
    the executors, which is all the memory-pressure fix needs.
    """
    with _LOCK:
        dfs, _TRACKED[:] = _TRACKED[:], []
    for df in dfs:
        _unpersist(df)
    return len(dfs)


@contextmanager
def tracked_persists():
    """Scope persists to a block: on exit, release exactly the persists
    registered inside the block ON THIS THREAD (a thread-local scope
    stack, so concurrent harness threads can never release each other's
    registrations — a registry snapshot diff would). Nests: an inner
    scope owns its own registrations."""
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    mine: list[DataFrame] = []
    stack.append(mine)
    try:
        yield
    finally:
        stack.pop()
        for df in mine:
            _unpersist(df)
