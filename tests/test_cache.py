"""Tracked-persist registry semantics (symtseries_spark/cache.py):
release drains, the FIFO cap bounds never-releasing callers, and the
context-manager scope releases only its own registrations."""

import symtseries_spark.cache as cache
from symtseries_spark.cache import (
    persist_tracked,
    release_persisted,
    tracked_persists,
)


def _is_cached(df) -> bool:
    return df._jdf.queryExecution().optimizedPlan().toString().startswith(
        "InMemoryRelation"
    ) or df.storageLevel.useMemory


def test_release_drains_everything(spark):
    release_persisted()
    a = persist_tracked(spark.range(10))
    b = persist_tracked(spark.range(20))
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    assert release_persisted() == 2
    assert not a.storageLevel.useMemory and not b.storageLevel.useMemory
    assert release_persisted() == 0


def test_fifo_cap_bounds_untracked_callers(spark, monkeypatch):
    release_persisted()
    monkeypatch.setattr(cache, "_CAP", 3)
    dfs = [persist_tracked(spark.range(i + 1)) for i in range(5)]
    # the two oldest were evicted (unpersisted) at registration 4 and 5
    assert not dfs[0].storageLevel.useMemory
    assert not dfs[1].storageLevel.useMemory
    assert all(d.storageLevel.useMemory for d in dfs[2:])
    assert release_persisted() == 3


def test_tracked_persists_scope_releases_own_only(spark):
    release_persisted()
    outer = persist_tracked(spark.range(5))
    with tracked_persists():
        inner = persist_tracked(spark.range(6))
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory
    assert outer.storageLevel.useMemory
    assert release_persisted() == 1
    assert not outer.storageLevel.useMemory


def test_tracked_scopes_are_thread_safe(spark):
    """A thread exiting its tracked_persists scope must release exactly
    its own registrations — another thread's still-open scope keeps its
    persist cached (the documented concurrent-harness contract; a
    registry-snapshot diff would wrongly release the other thread's)."""
    import threading

    release_persisted()
    a_registered = threading.Event()
    b_registered = threading.Event()
    a_exited = threading.Event()
    state = {}

    def worker_a():
        with tracked_persists():
            state["a"] = persist_tracked(spark.range(11))
            a_registered.set()
            b_registered.wait(30)  # B registers AFTER A entered
        a_exited.set()

    def worker_b():
        a_registered.wait(30)
        with tracked_persists():
            state["b"] = persist_tracked(spark.range(13))
            b_registered.set()
            a_exited.wait(30)
            # A has exited its scope: A's persist is gone, B's MUST
            # still be cached (A must not release B's registration)
            assert not state["a"].storageLevel.useMemory
            assert state["b"].storageLevel.useMemory
        assert not state["b"].storageLevel.useMemory

    ta = threading.Thread(target=worker_a)
    tb = threading.Thread(target=worker_b)
    ta.start(); tb.start(); ta.join(30); tb.join(30)
    assert not state["a"].storageLevel.useMemory
    assert not state["b"].storageLevel.useMemory
    assert release_persisted() == 0  # scoped persists never hit the registry


def test_nested_scopes_each_own_their_registrations(spark):
    release_persisted()
    with tracked_persists():
        outer = persist_tracked(spark.range(7))
        with tracked_persists():
            inner = persist_tracked(spark.range(8))
            assert inner.storageLevel.useMemory
        assert not inner.storageLevel.useMemory
        assert outer.storageLevel.useMemory
    assert not outer.storageLevel.useMemory
    assert release_persisted() == 0


def test_fifo_cap_applies_inside_scopes(spark, monkeypatch):
    """A long-lived scope must not accumulate unbounded persists: the
    same FIFO cap evicts the oldest SCOPED registration (ADVICE r9)."""
    release_persisted()
    monkeypatch.setattr(cache, "_CAP", 3)
    with tracked_persists():
        dfs = [persist_tracked(spark.range(i + 1)) for i in range(5)]
        assert not dfs[0].storageLevel.useMemory
        assert not dfs[1].storageLevel.useMemory
        assert all(d.storageLevel.useMemory for d in dfs[2:])
    assert not any(d.storageLevel.useMemory for d in dfs)
    assert release_persisted() == 0
