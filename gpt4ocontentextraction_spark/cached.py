"""Session-level cache hygiene for operator-internal persists.

Several operators persist() a scored relation that the RETURNED plan
consumes two or more times (minhash signatures across the banded
self-join, simhash fingerprints, embedding-LSH band keys/relations) —
without the persist, every reference re-evaluates the whole subtree
(measured: simhash banded pairs 13-20 s -> 2.9 s). The persist must
therefore OUTLIVE the operator call: it is released only after the
caller materializes the result, which the operator cannot observe.

This registry closes the leak (VERDICT r3 finding #4) without giving up
the caching: operators register their persists with track(); consumers
call release_all() once the previous result is materialized. The gate
wrapper (__spark_entry__._wrap) and bench harness do this between
queries, so a full 49-query sweep holds at most ONE query's persists at
any time (assertable via n_persistent()); long-lived sessions composing
operators directly call release_all() themselves — releasing early is
always CORRECT (the plan just recomputes), never wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_BC: list = []


def track(df: DataFrame) -> DataFrame:
    """persist() df and register it for a later release_all()."""
    df.persist()
    _TRACKED.append(df)
    return df


def track_broadcast(bc):
    """Register a sc.broadcast for release_all() (e.g. the large-K IVF
    centroid matrix — ~100 MB per call at realistic K, and Spark never
    reclaims a broadcast the driver still references)."""
    _TRACKED_BC.append(bc)
    return bc


def mark() -> tuple[int, int]:
    """Registry positions for a later release_since() — the
    operator-scoped release: an iterative caller (the Lloyd loop) marks
    before creating its per-iteration persists/broadcasts and releases
    only the entries IT added, leaving a concurrently composing
    operator's tracked state alone (a sweep-wide release_broadcasts()
    inside a loop silently dropped every other operator's ~100 MB
    broadcast, forcing lazy re-ships with no signal). Scopes nest
    LIFO on the single driver thread; this module is not thread-safe."""
    return (len(_TRACKED), len(_TRACKED_BC))


def release_since(m: tuple[int, int]) -> int:
    """Unpersist (never destroy) every relation and broadcast tracked
    since ``m = mark()``; returns how many were released. Releasing is
    always CORRECT (plans lazily recompute/re-ship), never wrong."""
    n_df, n_bc = m
    n = 0
    for df in _TRACKED[n_df:]:
        if df is None:
            continue  # tombstoned by release_entry
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
        n += 1
    del _TRACKED[n_df:]
    for bc in _TRACKED_BC[n_bc:]:
        if bc is None:
            continue
        try:
            bc.unpersist(blocking=False)
        except Exception:
            pass
        n += 1
    del _TRACKED_BC[n_bc:]
    return n


def release_entry(obj) -> bool:
    """Release ONE tracked relation or broadcast — the other
    iterative-operator shape (label propagation): drop the previous
    iteration's persist specifically, leaving every other tracked entry
    (including this iteration's) in place. The slot is TOMBSTONED (set
    to None), not removed: mark() scopes are registry POSITIONS, so
    removal would shift a pre-mark entry out of an active scope and
    leave a later-tracked persist behind — the exact leak this registry
    exists to prevent."""
    for reg in (_TRACKED, _TRACKED_BC):
        for i, e in enumerate(reg):
            if e is obj:
                reg[i] = None
                try:
                    obj.unpersist(blocking=False)
                except Exception:
                    pass
                return True
    return False


def release_broadcasts() -> int:
    """UNPERSIST (not destroy) every tracked broadcast: executor copies
    are dropped, but a plan that still references the broadcast simply
    re-ships it lazily on its next action — preserving this module's
    invariant that releasing early is always CORRECT, never wrong
    (destroy() would poison such plans permanently). Iterative callers
    (the Lloyd loop) call this between iterations so dead per-iteration
    broadcasts never accumulate."""
    n = 0
    while _TRACKED_BC:
        bc = _TRACKED_BC.pop()
        if bc is None:
            continue  # tombstoned by release_entry
        try:
            bc.unpersist(blocking=False)
        except Exception:
            pass
        n += 1
    return n


def release_all() -> int:
    """Unpersist every tracked relation and broadcast (non-blocking);
    returns how many were released."""
    n = release_broadcasts()
    while _TRACKED:
        df = _TRACKED.pop()
        if df is None:
            continue  # tombstoned by release_entry
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped: nothing to release
        n += 1
    return n


def n_persistent(spark) -> int:
    """Number of RDDs the context currently holds persisted (tests)."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()
