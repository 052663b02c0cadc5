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
    direction: str = "backward",
) -> DataFrame:
    """As-of join, ``direction`` in {'backward', 'forward', 'nearest'}.

    Returns every ``left`` row plus, for each right value column ``v``,
    ``v{suffix}`` from the matched right row with the same ``on`` key
    (one column or a compound-key list): the latest right row with
    right ``time_col`` <= left's (backward, default), the earliest
    with right >= left (forward), or whichever of the two sits closer
    in time (nearest; exact ties prefer backward — the
    no-lookahead-when-avoidable convention). Plus
    ``{time_col}{suffix}`` (the matched right time; all null when no
    right row qualifies or the match is further than
    ``tolerance_seconds``).

    All three directions are the same union trick — no join, one
    window over the interleaved frame per direction (backward scans
    time ascending, forward descending; the side tag makes equal
    times inclusive either way). Nearest pays both window passes over
    ONE union/exchange and arbitrates per row among the
    TOLERANCE-QUALIFIED candidates (pandas merge_asof semantics: if
    the nearer side is out of tolerance but the other side is within
    it, the in-tolerance side wins); for backward/forward the
    tolerance nulls out a too-stale chosen match.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward/forward/nearest, "
            f"got {direction!r}"
        )
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
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    union = r.unionByName(l)
    mcols = value_cols + [time_col]

    def _carry(w, tag):
        return [
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"_{tag}_{c}")
            for c in mcols
        ]

    def _dist(tag):
        return F.abs(
            F.col("_t").cast("double")
            - F.col(f"_{tag}_{time_col}").cast("double")
        )

    if direction == "backward":
        carried = union.select("*", *_carry(wb, "m"))
    elif direction == "forward":
        carried = union.select("*", *_carry(wf, "m"))
    else:  # nearest: both scans over the one union frame, then pick
        # the nearest among TOLERANCE-QUALIFIED candidates — pandas
        # merge_asof(nearest, tolerance) semantics: when the nearer
        # side is out of tolerance but the opposite side is within it,
        # the in-tolerance match wins (not NULL).
        both = union.select("*", *_carry(wb, "b"), *_carry(wf, "f"))

        def _ok(tag):
            ok = F.col(f"_{tag}_{time_col}").isNotNull()
            if tolerance_seconds is not None:
                ok = ok & (_dist(tag) <= F.lit(float(tolerance_seconds)))
            return ok

        use_b = _ok("b") & (~_ok("f") | (_dist("b") <= _dist("f")))
        carried = both.select(
            "*",
            *[
                F.when(use_b, F.col(f"_b_{c}"))
                .when(_ok("f"), F.col(f"_f_{c}"))
                .alias(f"_m_{c}")
                for c in mcols
            ],
        )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = F.abs(
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
            for c in mcols
        ],
    ).select(*lcols, *[f"{c}{suffix}" for c in mcols])


def interpolated_asof(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    time_col: str = "ts",
    value_col: str = "value",
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """As-of join with LINEAR INTERPOLATION — the value a held
    quantity "was" at the probe instant, not just the last tick:
    for every left row, the right stream's value at the left time
    estimated between the bracketing right observations
    (v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev)).
    One-sided probes fall back to the available anchor (hold
    semantics — documented, not invented at query time); probes with
    no same-key right rows return NULL. The sensor-fusion /
    mark-to-market primitive :func:`asof_join` (nearest tick) stops
    short of.

    Same scale shape as asof_join: NO join — one union of the tagged
    streams, one exchange, both direction scans as windows over the
    interleaved frame (per-task state = one key's timeline). A right
    row AT the probe time is an exact hit (backward-inclusive tie,
    interpolation degenerates to v_prev). Values quantize to
    ``cents`` and times to integer microseconds, so the single
    double interpolation expression replays identically on any
    engine.

    Returns every left row plus (value_interp, t_prev_us, t_next_us).
    Left probes with a NULL ``time_col`` have no "as of" instant, so
    all three output columns are NULL for them (r12 ADVICE: without
    the guard a NULL probe time sorted last in the desc forward
    window and silently picked up the EARLIEST tick's value).
    """
    keys = [on] if isinstance(on, str) else list(on)
    scale = 10 ** cents
    lcols = left.columns
    clash = [
        c for c in ("value_interp", "t_prev_us", "t_next_us")
        if c in lcols
    ]
    if clash:
        raise ValueError(
            f"interpolated_asof: left side already carries output "
            f"column(s) {clash} — drop or rename them"
        )
    xv = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast(
        "long"
    )
    tus = F.unix_micros(F.col(time_col).cast("timestamp"))
    r = right.filter(F.col(value_col).isNotNull()).select(
        *[F.col(k) for k in keys],
        tus.alias("_t"),
        F.lit(0).alias("_side"),
        xv.alias("_rv"),
        tus.alias("_rt"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in lcols
        ],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        tus.alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rv"),
        F.lit(None).cast("long").alias("_rt"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    union = r.unionByName(l).select(
        "*",
        F.last("_rv", ignorenulls=True).over(wb).alias("_bv"),
        F.last("_rt", ignorenulls=True).over(wb).alias("_bt"),
        F.last("_rv", ignorenulls=True).over(wf).alias("_fv"),
        F.last("_rt", ignorenulls=True).over(wf).alias("_ft"),
    )
    probes = union.filter(F.col("_side") == 1)
    t = F.col("_t").cast("double")
    bt, ft = F.col("_bt").cast("double"), F.col("_ft").cast("double")
    bv, fv = F.col("_bv").cast("double"), F.col("_fv").cast("double")
    interp = (
        F.when(
            F.col("_bt").isNotNull() & F.col("_ft").isNotNull(),
            F.when(F.col("_ft") == F.col("_bt"), bv).otherwise(
                bv + (fv - bv) * (t - bt) / (ft - bt)
            ),
        )
        .when(F.col("_bt").isNotNull(), bv)
        .when(F.col("_ft").isNotNull(), fv)
    )
    # NULL-time probes carry no instant to interpolate at: null out
    # every output column (the desc forward window would otherwise
    # resolve them to the earliest tick — r12 ADVICE)
    has_t = F.col("_t").isNotNull()
    return probes.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.when(
            has_t, F.round(interp / F.lit(float(scale)), decimals)
        ).alias("value_interp"),
        F.when(has_t, F.col("_bt")).alias("t_prev_us"),
        F.when(has_t, F.col("_ft")).alias("t_next_us"),
    ).select(*lcols, "value_interp", "t_prev_us", "t_next_us")
