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

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persisted(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register the frame for later release."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time: frames whose blocks were already evicted
    or whose session is gone are skipped.  Note this releases *cached
    blocks*, not results — a consumer holding one of these DataFrames
    can still use it (the subplan simply recomputes).
    """
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass
    return released


def tracked_count() -> int:
    return len(_TRACKED)
