"""Bounded keep-recent cache registry for operator-internal persists.

Operators that reference one computed relation from multiple plan
branches (two-phase rank offsets, vocabulary-overlap sizes) persist it so
the branches share one computation. A bare ``persist()`` leaks one cached
relation per call in a long session (registry sweep, bench loop); the
previous keep-at-most-ONE scheme had the opposite failure — building a
second plan unpersisted the first plan's relation BEFORE it ever
executed, silently reintroducing the duplicate work (and, for the rank,
re-exposing the range-boundary-sampling consistency hazard the persist
exists to prevent).

``keep_cached`` holds the most recent ``CACHE_KEEP`` relations FIFO —
large enough that interleaved build-then-execute patterns (the plan
sweep builds many plans before executing any; bench executes each plan
4×) keep their caches live, small enough that a 150-query session holds
a bounded handful of vocabulary-sized relations. ``release_all`` frees
everything (test teardown / memory pressure)."""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

CACHE_KEEP = 8

_RECENT: list[DataFrame] = []
# registry mutations are lock-guarded: plan building is legal from
# multiple driver threads (streaming foreachBatch callbacks, thread-pool
# query fan-out), and an unguarded append/pop race could unpersist a
# relation another thread just registered
_LOCK = threading.Lock()


def keep_cached(df: DataFrame) -> DataFrame:
    """persist() ``df`` and register it, releasing the oldest registered
    relation beyond ``CACHE_KEEP``. Lazy — no job runs here."""
    df.persist()
    evicted: list[DataFrame] = []
    with _LOCK:
        _RECENT.append(df)
        while len(_RECENT) > CACHE_KEEP:
            evicted.append(_RECENT.pop(0))
    for old in evicted:  # unpersist outside the lock (it can RPC)
        old.unpersist()
    return df


def release_all() -> None:
    with _LOCK:
        drained, _RECENT[:] = _RECENT[:], []
    for df in drained:
        df.unpersist()
