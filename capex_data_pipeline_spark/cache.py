"""Tracked persistence — a release handle for every ``persist()`` the
engine takes out.

Several operators persist an intermediate frame that is consumed more
than once inside the plan they return (dedup signature frames, the
pipeline's tagged lineage frame, the fail-open add-back frame, the q93
false-negative key set).  The persist is a structural win — without it
the producing subplan runs once per consumer — but Spark never evicts
MEMORY_AND_DISK blocks on its own, so a long-lived session that calls
these operators repeatedly would accumulate cached blocks without
bound.

Every engine-internal ``persist`` therefore goes through
:func:`persisted`, which registers the frame here.  Callers can release
everything with :func:`release_persisted` (e.g. between batches of a
long-lived service), and :class:`~capex_data_pipeline_spark.plans.pipeline.PipelineResult`
exposes a per-run ``unpersist()`` over just its own frames.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: guards _TRACKED / _RELEASE_HOOKS — Spark driver apps routinely call
#: operators from multiple threads (concurrent job submission is the
#: documented way to overlap independent actions), so registry
#: mutations must not race. The lock is held only around list
#: mutations, never across JVM calls (persist/unpersist).
_LOCK = threading.RLock()
_TRACKED: list[DataFrame] = []
_RELEASE_HOOKS: list[Callable[[], "int | None"]] = []


def persisted(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register the frame for later release."""
    out = df.persist(level)
    with _LOCK:
        _TRACKED.append(out)
    return out


def untrack(df: DataFrame) -> None:
    """Drop a frame from the release registry (identity match). Called
    by the per-run release paths (``PipelineResult.unpersist``) so an
    already-released frame neither lingers as a strong driver-side
    reference nor gets double-released later."""
    with _LOCK:
        for i in range(len(_TRACKED) - 1, -1, -1):
            if _TRACKED[i] is df:
                del _TRACKED[i]


def register_release_hook(hook: Callable[[], "int | None"]) -> None:
    """Run ``hook`` at the START of :func:`release_persisted`. Used by
    higher layers that memoize results built on persisted frames (the
    pipeline-plan cache): releasing the blocks under a live memo would
    leave it silently serving cold plans, so the memo registers its own
    invalidation here and the two release mechanisms stay coherent.
    A hook that releases frames itself should return how many, so the
    release_persisted total stays accurate."""
    with _LOCK:
        if hook not in _RELEASE_HOOKS:
            _RELEASE_HOOKS.append(hook)


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time: frames whose blocks were already evicted
    or whose session is gone are skipped.  Note this releases *cached
    blocks*, not results — a consumer holding one of these DataFrames
    can still use it (the subplan simply recomputes). Registered
    release hooks (memo invalidation) run first.
    """
    released = 0
    with _LOCK:
        hooks = list(_RELEASE_HOOKS)
    for hook in hooks:
        try:
            n = hook()
            if isinstance(n, int):
                released += n
        except Exception:
            pass
    while True:
        with _LOCK:
            if not _TRACKED:
                break
            df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass
    return released


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)


@contextmanager
def scoped_persists(blocking: bool = False):
    """Release just the frames persisted inside the ``with`` block —
    the operator-level counterpart of ``PipelineResult.unpersist``, so
    a long-lived service can free one dedup/enrichment computation
    without the all-or-nothing :func:`release_persisted` (which also
    invalidates the pipeline memo via its hook).

    Yields a ``release()`` callable for early release; exit releases
    whatever remains. Frames persisted by OTHER threads while the block
    runs are swept too (the registry is process-global) — serialize
    operator invocation, or use :func:`release_persisted` at a quiet
    point, if that matters. One more sharing caveat: Spark's
    CacheManager keys cached data by CANONICALIZED PLAN, not by
    DataFrame object — if an identical computation was persisted
    outside the scope, both share one cache entry and the scoped
    release drops its blocks for the outer consumer as well (which then
    simply recomputes).
    """
    with _LOCK:
        before = list(_TRACKED)

    def release() -> int:
        with _LOCK:
            new = [df for df in _TRACKED if not any(df is b for b in before)]
        n = 0
        for df in new:
            untrack(df)
            try:
                df.unpersist(blocking)
                n += 1
            except Exception:
                pass
        return n

    try:
        yield release
    finally:
        release()
