"""As-of (point-in-time) join — the temporal lookup Spark's DataFrame
API lacks as a primitive: for every left row, attach the LATEST right
row of the same key whose time is ``<=`` the left row's time
(backward, inclusive — the semantics of DuckDB/kdb ``ASOF JOIN`` and
pandas ``merge_asof``).  The workhorse of feature attribution ("state
of the account when the order arrived") and event attribution ("the
click that preceded this purchase").

Implemented as the union + running-last-value composition, NOT a range
join: tag both sides, union, ONE window over ``(key) ORDER BY (t,
side)`` carrying the right payload forward with ``last(..., ignore
nulls)``, keep left rows.  One shuffle on the join key, linear state,
no time-bucketing heuristics, no row explosion — a range join would
shuffle every (left, candidate) pair and blow up exactly when a key's
history is long, which is the common case at 100 TB.  Skewed keys are
AQE's standard case; an optional ``tolerance`` bounds how stale a
match may be (matches older than ``tolerance`` seconds null out,
mirroring ``merge_asof(tolerance=...)``).

Right-side rows must be unique per ``(key, time)`` (pre-aggregate if
not) — with duplicates the winner would be partition-order-dependent,
the same reason DuckDB's ASOF JOIN leaves it undefined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    time_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` row plus, for each right value column ``v``,
    ``v{suffix}`` from the latest right row with the same ``on`` key
    (one column or a compound-key list) and right ``time_col`` <=
    left ``time_col``, plus
    ``{time_col}{suffix}`` (the matched right time; all null when no
    right row precedes the left row or the match is older than
    ``tolerance_seconds``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, time_col)]
    clash = [f"{c}{suffix}" for c in value_cols + [time_col] if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: left side already carries output column(s) {clash} "
            "— drop or rename them, or pass a different suffix"
        )

    lcols = left.columns
    # side tag orders right before left at equal times → inclusive match
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(time_col).alias(f"{time_col}{suffix}"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.lit(None).cast(right.schema[time_col].dataType).alias(f"{time_col}{suffix}"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"_m_{c}")
            for c in value_cols + [time_col]
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("_t").cast("double")
            - F.col(f"_m_{time_col}").cast("double")
        ) <= F.lit(float(tolerance_seconds))
    else:
        fresh = F.lit(True)
    keep = F.col(f"_m_{time_col}").isNotNull() & fresh
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        *[
            F.when(keep, F.col(f"_m_{c}")).alias(f"{c}{suffix}")
            for c in value_cols + [time_col]
        ],
    ).select(*lcols, *[f"{c}{suffix}" for c in value_cols + [time_col]])
