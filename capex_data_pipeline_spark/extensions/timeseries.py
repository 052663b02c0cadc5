"""Time-series relational operators Spark lacks as primitives: a
bounded interval ("range") join and grid resampling with forward fill.

``range_join`` — for every left row, all right rows of the same key
whose time falls in ``[left_t + lower, left_t + upper]`` seconds.  The
naive formulation (equi-join on key + theta filter on time) makes
Spark shuffle *every* same-key pair before filtering — O(n_k · m_k)
per key, which is exactly what explodes on hot keys at 100 TB.  This
operator instead quantizes time into bins of width ``upper - lower``:
each right row lands in exactly one ``(key, bin)`` bucket, each left
row's window overlaps at most TWO adjacent bins, so the left side is
exploded to ≤ 2 rows and the join becomes a plain equi-join on the
compound ``(key, bin)`` key with an exact range filter after.  Pair
work collapses from all same-key pairs to only near-in-time pairs, and
the compound key also spreads one hot key's traffic across its time
bins (a free partial skew fix; AQE handles the rest).  This is the
standard bucketed interval-join construction (cf. Spark's own
stream-stream interval join, which bounds state the same way).

``resample_ffill`` — per key, aggregate onto a fixed step grid between
the key's first and last observation and carry the last observed value
forward into empty cells (gap filling).  Grid generation is
``sequence()`` + ``explode`` (distributed, no driver loop); the fill is
ONE ``last(ignore nulls)`` running window per key.  Cost is linear in
emitted grid cells: step × span define the expansion, so callers
choose the densification they can afford; a ``max_span_steps`` guard
refuses accidental million-cell keys (no silent explosion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_EPOCH = "_ts_epoch"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    left_time: str = "ts",
    right_time: str = "ts",
    lower: float = -3600.0,
    upper: float = 0.0,
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Binned interval join: left rows × same-``on`` right rows with
    ``right_time - left_time`` in ``[lower, upper]`` seconds (both
    inclusive).  ``on`` is one key column or a list (compound key);
    ``how`` is ``'inner'`` or ``'left'`` (left keeps matchless rows
    with null right columns).

    Right columns other than ``on`` come back suffixed.  The bin width
    is ``upper - lower`` so each left window spans at most 2 bins; the
    underlying join is an equi-join on ``(on..., bin)``.
    """
    if upper <= lower:
        raise ValueError(f"range_join: need upper > lower, got [{lower}, {upper}]")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be 'inner' or 'left', not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # integer-microsecond internals: double-seconds epochs can slip an
    # ulp at exact window boundaries vs integer-time engines
    lower_us = int(round(lower * 1_000_000))
    upper_us = int(round(upper * 1_000_000))
    width = upper_us - lower_us

    r_vals = [c for c in right.columns if c not in keys]
    clash = [f"{c}{suffix}" for c in r_vals if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(
            f"range_join: left already carries output column(s) {clash} — "
            "rename them or pass a different suffix"
        )

    lt = F.unix_micros(F.col(left_time).cast("timestamp"))
    rt = F.unix_micros(F.col(right_time).cast("timestamp"))

    # each right row sits in exactly one bin of its own time
    r = right.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.floor(rt / F.lit(float(width))).cast("long").alias("_bin"),
        rt.alias("_rt"),
        *[F.col(c).alias(f"{c}{suffix}") for c in r_vals],
    )
    # each left row probes every bin its [lt+lower, lt+upper] window
    # touches — ≤ 2 consecutive bins by construction; a right row is in
    # exactly one bin, so no (left, right) pair can meet twice and no
    # post-join dedup is needed
    base = left.select("*", F.monotonically_increasing_id().alias("_lid"))
    if how == "left":
        # the row id feeds BOTH the probe side and the anti-join side;
        # persist so both branches observe one materialization (ids are
        # stable per partition layout, not across recomputations)
        from capex_data_pipeline_spark.cache import persisted

        base = persisted(base)
    l = base.select(
        "*",
        lt.alias("_lt"),
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lower_us)) / F.lit(float(width))).cast("long"),
                F.floor((lt + F.lit(upper_us)) / F.lit(float(width))).cast("long"),
            )
        ).alias("_bin"),
    )
    exact = (F.col("_rt") >= F.col("_lt") + F.lit(lower_us)) & (
        F.col("_rt") <= F.col("_lt") + F.lit(upper_us)
    )
    cond = l["_bin"] == r["_bin"]
    for i, k in enumerate(keys):
        cond = cond & (l[k] == r[f"_k{i}"])
    matched = (
        l.join(r, cond, "inner")
        .filter(exact)
        .select(*left.columns, "_lid", *[f"{c}{suffix}" for c in r_vals])
    )
    if how == "inner":
        return matched.drop("_lid")
    # left join = inner matches + anti-joined matchless left rows with
    # null right columns (the row id keeps duplicate left rows distinct)
    matchless = base.join(
        matched.select("_lid"), "_lid", "left_anti"
    ).select(
        *left.columns,
        "_lid",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in r_vals
        ],
    )
    return matched.unionByName(matchless).drop("_lid")


def resample_ffill(
    df: DataFrame,
    on: str,
    time_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
    max_span_steps: int = 1_000_000,
) -> DataFrame:
    """Per-``on`` fixed-grid resample + forward fill.

    Emits one row per ``(on, cell)`` for every ``step_seconds`` cell
    from the key's first observation's cell to its last, with:

    - ``n_obs``   — observations landing in the cell (0 for gaps)
    - ``value_last`` — last observation in the cell by (time, value)
      order, carried FORWARD into empty cells (never null: the first
      grid cell always contains the key's first observation)
    - ``filled`` — true where the cell had no observation

    Keys whose span exceeds ``max_span_steps`` cells raise at
    execution time, from inside the plan (no silent row explosion;
    widen the step or raise the guard deliberately).
    """
    ep = F.col(time_col).cast("timestamp").cast("double")
    cell = (F.floor(ep / step_seconds) * step_seconds).cast("long")
    # max_by(value, (epoch, value)) — deterministic under time ties
    per_cell = (
        df.select(
            F.col(on).alias("_k"),
            cell.alias("_cell"),
            ep.alias("_ep"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_k", "_cell")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.expr("max_by(_v, struct(_ep, _v))").alias("_cell_last"),
        )
    )
    # per_cell feeds both the spans aggregate and the final join; in
    # one plan Spark reuses the aggregation's exchange (ReusedExchange)
    # — no persist, no extra materialization pass
    spans = per_cell.groupBy("_k").agg(
        F.min("_cell").alias("_c0"), F.max("_cell").alias("_c1")
    )
    # lazy span guard: error at execution time from inside the plan (no
    # driver-side probe job — at 100 TB an eager guard would force a
    # full materialization before the real query starts)
    c1_checked = F.when(
        (F.col("_c1") - F.col("_c0")) / step_seconds >= max_span_steps,
        F.raise_error(
            F.concat(
                F.lit("resample_ffill: key "),
                F.col("_k").cast("string"),
                F.lit(
                    f" spans more than {max_span_steps} steps of "
                    f"{step_seconds}s — raise max_span_steps explicitly "
                    "if this densification is intended"
                ),
            )
        ).cast("long"),
    ).otherwise(F.col("_c1"))
    grid = spans.select(
        "_k",
        F.explode(
            F.sequence(F.col("_c0"), c1_checked, F.lit(step_seconds))
        ).alias("_cell"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_cell, ["_k", "_cell"], "left")
        .select(
            F.col("_k").alias(on),
            F.timestamp_seconds(F.col("_cell")).alias("cell_ts"),
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            F.last(F.col("_cell_last"), ignorenulls=True)
            .over(w)
            .alias("value_last"),
            F.col("n_obs").isNull().alias("filled"),
        )
    )


def global_running_sum(
    df: DataFrame,
    value: Column,
    order_by: "list[str]",
    bucket: Column,
    out_col: str = "running_total",
    cents: int = 2,
) -> DataFrame:
    """EXACT global running total in a total order — WITHOUT the
    global window that planlint bans (an unpartitioned
    ``sum() OVER (ORDER BY ...)`` funnels 100 TB through ONE task).
    The classic two-phase prefix sum, distributed:

    1. one hash aggregate collapses the frame onto per-``bucket``
       sums (``bucket`` must be a RANGE of the total order — e.g.
       ``date_trunc('day', ts)`` when ordering by ``(ts, id)`` — so
       bucket order refines row order);
    2. the bucket frame (calendar-bounded: days/hours, the
       sketch-sized driver read of the k-means convention) is
       cumulated driver-side into per-bucket OFFSETS and broadcast
       back;
    3. a window PARTITIONED BY bucket (bounded per partition by the
       bucket's row count, never global) cumulates within buckets;
       running = offset + within-bucket cumsum.

    Determinism across engines: float cumulative sums are
    association-sensitive (a segment-tree window sum and a sequential
    fold can differ in the last ulp), so the value is quantized to
    ``cents`` decimal digits and summed as INTEGERS — bit-exact under
    any association — then divided back once at the end. NULL values
    count as 0; ``order_by`` must be a deterministic total order
    (include a tiebreaker id).

    Returns ``df`` + (``out_col``) ordered-agnostic (attach, don't
    sort — consumers order as needed).
    """
    if not order_by:
        raise ValueError("order_by must be non-empty")
    scale = 10 ** cents
    q = F.coalesce(
        F.round(value * F.lit(scale)).cast("long"), F.lit(0)
    )
    base = df.select("*", bucket.alias("_bk"), q.alias("_q"))

    sums = base.groupBy("_bk").agg(F.sum("_q").alias("_s"))
    rows = sorted(sums.collect(), key=lambda r: (r["_bk"] is not None, r["_bk"]))
    running = 0
    offsets = []
    for r in rows:
        offsets.append((r["_bk"], running))
        running += int(r["_s"] or 0)
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, schema=sums.select("_bk").schema.add("_off", "long"))
    )

    w = (
        Window.partitionBy("_bk")
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(off, ["_bk"], "left")
        .withColumn("_cum", F.sum("_q").over(w))
        .withColumn(
            out_col,
            (
                (F.coalesce(F.col("_off"), F.lit(0)) + F.col("_cum"))
                / F.lit(float(scale))
            ),
        )
        .drop("_bk", "_q", "_off", "_cum")
    )


def funnel_report(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: "list[str]",
    decimals: int = 6,
) -> DataFrame:
    """Ordered funnel conversion REPORT — the per-step aggregate
    complement of :func:`~capex_data_pipeline_spark.extensions.
    analytics.funnel` (q85), which returns one frontier row per KEY
    with at-or-after tie semantics; this returns one row per STEP and
    pins the stricter convention: how many users reach step 1, then
    step 2 STRICTLY AFTER their first step-1 event, then step 3 after
    that, with per-step conversion (vs the funnel top) and drop-off
    (vs the previous step).
    First-touch semantics: each step's anchor is the user's EARLIEST
    qualifying occurrence (min ts strictly after the previous anchor)
    — the deterministic convention every funnel SQL restates, pinned
    here so ties (same-timestamp events) never count as progress.

    Scale shape: one user-keyed min-aggregate + one user-keyed join
    per step — the step list is METADATA (3-5 entries), so the whole
    funnel is a handful of same-key hash joins (co-partitioned by the
    repeated user key; AQE reuses the exchange where plans align),
    never a per-user event-sequence sort. The final conversion window
    runs over the |steps|-row count frame, not the data.

    Returns (step_idx 1-based, step, n_users, conversion, drop_off).
    """
    from pyspark.sql.window import Window

    if not steps:
        raise ValueError("funnel_report: steps must be non-empty")
    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
    ).filter(F.col("_u").isNotNull())
    reached = (
        base.filter(F.col("_e") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_t"))
    )
    counts = None
    for i, s in enumerate(steps):
        if i:
            reached = (
                base.filter(F.col("_e") == s)
                .join(reached.select("_u", "_t"), "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        row = reached.agg(
            F.lit(i + 1).alias("step_idx"),
            F.lit(s).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("step_idx")  # |steps|-row frame
    top = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("n_users").over(w)
    return counts.select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            F.col("n_users") / F.nullif(top.cast("double"), F.lit(0.0)),
            decimals,
        ).alias("conversion"),
        F.round(
            F.when(
                prev.isNull(), F.lit(0.0)
            ).otherwise(
                F.lit(1.0)
                - F.col("n_users")
                / F.nullif(prev.cast("double"), F.lit(0.0))
            ),
            decimals,
        ).alias("drop_off"),
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    decimals: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (current, next) event-type pair, the
    transition count and conditional probability P(next | current) —
    the session-model / next-action primitive behind "what usually
    follows an error?". Deterministic sequencing: events order by
    (ts, id) within user, so same-timestamp ties replay identically
    on any engine; each user's LAST event emits no transition.

    Scale shape: ONE user-partitioned lead() window (the q82
    sessionization shape — state per task is one user's events, never
    the corpus) + one hash aggregate on the compact type-pair key +
    a type-keyed window for the row-conditional totals (type domain =
    metadata). Returns (event_type, next_event_type, n, p).
    """
    from pyspark.sql.window import Window

    seq = Window.partitionBy("_u").orderBy("_ts", "_id")
    pairs = (
        df.select(
            F.col(user_col).alias("_u"),
            F.col(type_col).alias("_e"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
        )
        .filter(F.col("_u").isNotNull())
        .withColumn("_nx", F.lead("_e").over(seq))
        .filter(F.col("_nx").isNotNull())
        .groupBy(
            F.col("_e").alias("event_type"),
            F.col("_nx").alias("next_event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_event_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wt).cast("double"), decimals
        ).alias("p"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    max_bins_per_interval: int = 64,
) -> DataFrame:
    """Interval × interval OVERLAP join — the two-sided generalization
    of :func:`range_join` (point × window): all same-key pairs of
    CLOSED intervals [start, end] that overlap, with the exact overlap
    length. Meetings × outages, sessions × incidents, validity ranges
    × validity ranges.

    The naive theta join (equi-key + overlap predicate) shuffles every
    same-key pair before filtering — quadratic on hot keys. Here both
    sides explode onto the fixed time grid ``bin_width`` (an interval
    covers floor(start/w)..floor(end/w)), the join is a plain
    equi-join on the compound (key, bin) key — only near-in-time pairs
    ever pair, and a hot key's traffic spreads across its bins — then
    the exact overlap predicate filters and DISTINCT collapses pairs
    that met in several bins. Start/end are integer units (epoch
    millis by convention); choose ``bin_width`` ~ the typical interval
    length. A loud engine-side guard (raise_error) refuses intervals
    covering more than ``max_bins_per_interval`` bins — the silent
    row-explosion cap, per the resample_ffill convention — and the
    SAME loud convention applies to INVERTED intervals (end < start):
    they raise rather than silently drop, since an inverted interval
    usually means upstream corruption, not "no overlap". Null
    key/start/end rows are the only silent drops (documented here).

    Returns (key_col, <id>_l, <id>_r, overlap): one row per
    overlapping (left, right) pair, overlap in the same units
    (>= 0; 0 = they touch at one point).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1: {bin_width}")

    def _binned(df: DataFrame, tag: str) -> DataFrame:
        s = F.col(start_col).cast("long")
        e = F.col(end_col).cast("long")
        nbins = (F.floor(e / bin_width) - F.floor(s / bin_width) + 1)
        # the guard lives INSIDE the sequence's end bound so it is
        # load-bearing — a guard on a separate projected-then-dropped
        # column gets pruned by Catalyst and never evaluates
        end_bin = F.when(
            e < s,
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_overlap_join: inverted interval "
                        "(end < start) — upstream corruption? (id="
                    ),
                    F.col(id_col).cast("string"),
                    F.lit(")"),
                ).cast("string")
            ).cast("long"),
        ).when(
            nbins > max_bins_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_overlap_join: interval covers > "
                        f"{max_bins_per_interval} bins of width "
                        f"{bin_width}; raise bin_width or split "
                        "upstream (id="
                    ),
                    F.col(id_col).cast("string"),
                    F.lit(")"),
                ).cast("string")
            ).cast("long"),
        ).otherwise(F.floor(e / bin_width))
        return (
            df.filter(
                F.col(key_col).isNotNull() & s.isNotNull() & e.isNotNull()
            )
            .select(
                F.col(key_col).alias("_k"),
                F.col(id_col).alias(f"_id{tag}"),
                s.alias(f"_s{tag}"),
                e.alias(f"_e{tag}"),
                F.explode(
                    F.sequence(F.floor(s / bin_width), end_bin)
                ).alias("_bin"),
            )
        )

    l = _binned(left, "l")
    r = _binned(right, "r")
    return (
        l.join(r, ["_k", "_bin"])
        .filter(
            (F.col("_sl") <= F.col("_er")) & (F.col("_sr") <= F.col("_el"))
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("_idl").alias(f"{id_col}_l"),
            F.col("_idr").alias(f"{id_col}_r"),
            (
                F.least(F.col("_el"), F.col("_er"))
                - F.greatest(F.col("_sl"), F.col("_sr"))
            ).alias("overlap"),
        )
        .distinct()
    )


def session_paths(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = 1800,
    min_sessions: int = 1,
) -> DataFrame:
    """Session PATH analysis — the "what do journeys actually look
    like" report: gap-sessionize (q82's exact machinery, strict-gap
    semantics, (ts, id) tie-break), render each session's ordered
    event-type sequence as a '>'-joined path string, and count how
    many sessions walk each path. Composes q82 (which rows share a
    session) and q203 (one-step transitions) into whole-journey
    frequencies.

    The per-session collect is bounded by SESSION length (an
    inactivity gap bounds it physically — the one place a collect_list
    is honest at 100 TB), sorted inside the aggregate via
    array_sort on (ts, id, type) structs, never a window re-sort.
    Returns (path, n_sessions) for paths with >= ``min_sessions``.
    """
    from capex_data_pipeline_spark.extensions.analytics import sessionize

    s = sessionize(
        df.filter(F.col(user_col).isNotNull()),
        on=user_col,
        time_col=ts_col,
        gap_seconds=gap_seconds,
        tiebreak_col=id_col,
    )
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("_t"),
                        F.col(id_col).alias("_id"),
                        F.col(type_col).alias("_e"),
                    )
                )
            ),
            lambda m: m["_e"],
        ),
        ">",
    )
    return (
        s.groupBy(user_col, "session_id")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_sessions)
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """CUSUM changepoint detection per group — WHERE did the level
    shift: the cumulative sum of deviations from the group mean,
    CUSUM_t = Σ_{i<=t}(x_i − x̄), peaks in magnitude at the most
    likely single changepoint (Page 1954; the mean-shift detector
    behind every "when did this metric move" audit, the locator
    sibling of q96's did-it-move PSI).

    Exactness: computed as n·CUSUM_t = n·P_t − t·S (P_t = running
    cents-sum, S = group cents-sum) — ALL integers, carried as
    DECIMAL(38,0) (n·P_t overflows int64 at ~1e9 rows of ~1e4-cent
    values; the q197/q223 overflow-proofing), so the argmax is
    over exact values and ties break deterministically by
    (ts, id) ascending (min-struct, never a sort of the peak). One
    group-partitioned running-sum window (per-task state = one
    group), one scalar attach, one min-struct aggregate.

    Returns (group_col, n, cusum_stat, changepoint_ts,
    frac_position): cusum_stat = max_t |CUSUM_t| in original value
    units (the peak accumulated deviation), frac_position = t/n of
    the peak.
    """
    scale = 10 ** cents
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        x.alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = (
        Window.partitionBy("_g")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = base.select(
        "_g",
        "_ts",
        "_id",
        F.sum("_x").over(w).alias("_p"),
        F.row_number().over(
            Window.partitionBy("_g").orderBy("_ts", "_id")
        ).alias("_t"),
    )
    tot = base.groupBy("_g").agg(
        F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    # n·CUSUM_t = n·P_t − t·S, exact in DECIMAL(38,0) — bigint·bigint
    # wraps silently under non-ANSI Spark at ~1e9 rows × ~1e4 cents
    dec = "decimal(38,0)"
    nc = (
        F.col("_n").cast(dec) * F.col("_p").cast(dec)
        - F.col("_t").cast(dec) * F.col("_s").cast(dec)
    )
    peak = (
        run.join(tot, "_g")
        .select(
            "_g",
            "_n",
            F.struct(
                (-F.abs(nc)).alias("_neg"),
                F.col("_ts").alias("_pts"),
                F.col("_id").alias("_pid"),
                F.col("_t").alias("_pt"),
            ).alias("_cand"),
        )
        .groupBy("_g", "_n")
        .agg(F.min("_cand").alias("_pk"))
    )
    return peak.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        F.round(
            -F.col("_pk._neg")
            / (F.col("_n").cast("double") * F.lit(float(scale))),
            decimals,
        ).alias("cusum_stat"),
        F.col("_pk._pts").alias("changepoint_ts"),
        F.round(
            F.col("_pk._pt") / F.col("_n").cast("double"), decimals
        ).alias("frac_position"),
    )


def cohort_retention_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
    max_offset: int = 12,
    decimals: int = 6,
) -> DataFrame:
    """Cohort retention matrix — the "do users come back" triangle
    every growth dashboard leads with: users are grouped into cohorts
    by their FIRST activity period, and retention[cohort, k] = share
    of the cohort active again k periods later. Scale shape: ONE
    user-key aggregate collapses each user to their (horizon-bounded)
    SET of active periods — cohort is its first element, offsets are
    a map-side array transform — so the distinct-pair frame, the
    min-aggregate, and the cohort join-back of the textbook plan all
    fuse into a single shuffle; the set rows are distinct per (user,
    offset) by construction, so the (cohort, offset) count is a plain
    count, never a countDistinct. The tiny matrix joins its sizes by
    broadcast. ``max_offset`` bounds the matrix (offsets beyond it
    are dropped — the report's width, not a data cap); the per-user
    set is bounded by the analysis horizon (the q213/q247 bounded-
    collect contract).

    Returns (cohort, offset, n_active, cohort_size, retention) for
    0 <= offset <= max_offset; offset 0 is the cohort itself
    (retention 1.0 by construction — kept as the audit row).

    Naming: this is the single-shuffle MATRIX operator (q232);
    :func:`~capex_data_pipeline_spark.extensions.analytics.
    cohort_retention` (q84) is the older long-form triangle with
    per-pair countDistinct semantics. Use this one for the dashboard
    matrix; the analytics variant exists for the q84 oracle shape.
    The two share a name no longer — r12 ADVICE flagged the
    wrong-import hazard.
    """
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0: {max_offset}")
    unit = {"week": 7, "day": 1}.get(period)
    if unit is None:
        raise ValueError(
            f"cohort_retention: unsupported period {period!r} "
            "(use 'week' or 'day' — month offsets are not fixed-width)"
        )
    per = F.date_trunc(period, F.col(ts_col)).cast("date")
    per_user = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), per.alias("_p"))
        .groupBy("_u")
        .agg(F.array_sort(F.collect_set("_p")).alias("_arr"))
        .select(
            F.element_at("_arr", 1).alias("_c"),
            F.transform(
                F.col("_arr"),
                lambda p: (
                    F.datediff(p, F.element_at("_arr", 1)) / unit
                ).cast("long"),
            ).alias("_offs"),
        )
    )
    from capex_data_pipeline_spark.cache import persisted

    per_user = persisted(per_user)
    sizes = per_user.groupBy("_c").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    counts = (
        per_user.select(
            "_c", F.explode(F.col("_offs")).alias("offset")
        )
        .filter(F.col("offset") <= max_offset)
        .groupBy("_c", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return counts.join(F.broadcast(sizes), "_c").select(
        F.col("_c").alias("cohort"),
        "offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active") / F.col("cohort_size").cast("double"),
            decimals,
        ).alias("retention"),
    )


def time_weighted_average(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Time-weighted average (TWAP) per group over irregular samples —
    the honest mean for a value that HOLDS between observations
    (price, inventory level, sensor reading): each observation is
    weighted by how long it was current, i.e. the time to the next
    observation in the group. One lead() window per group (per-task
    state = one group's samples, deterministic (ts, id) order), then
    one aggregate of exact integer products — value quantized to
    ``cents``, duration in milliseconds, the cents x ms products
    summed as DECIMAL(38,0) (overflow-proof per the q197/q222
    convention). The last observation of a group has no successor and
    carries zero weight (the standard TWAP-to-last-tick convention,
    documented here rather than invented at query time).

    Returns (group_col, n_obs, span_ms, twap) — twap NULL for groups
    with a single observation (zero total duration).
    """
    scale = 10 ** cents
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    ms = F.unix_millis(F.col(ts_col))
    w = Window.partitionBy("_g").orderBy("_ms", "_id")
    base = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("_g"),
            F.col(id_col).alias("_id"),
            x.alias("_x"),
            ms.alias("_ms"),
        )
        .withColumn("_next", F.lead("_ms").over(w))
    )
    dur = (F.col("_next") - F.col("_ms")).cast("decimal(38,0)")
    dec = "decimal(38,0)"
    agg = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.when(F.col("_next").isNotNull(), dur).otherwise(F.lit(0).cast(dec))).alias("_span"),
        F.sum(
            F.when(
                F.col("_next").isNotNull(),
                F.col("_x").cast(dec) * dur,
            ).otherwise(F.lit(0).cast(dec))
        ).alias("_wsum"),
    )
    # final division in DOUBLE on both engines (decimal/decimal division
    # rescales differently than DuckDB's integer-/ -> DOUBLE); the exact
    # integers convert to double identically (round-to-nearest)
    return agg.select(
        F.col("_g").alias(group_col),
        "n_obs",
        F.col("_span").cast("long").alias("span_ms"),
        F.round(
            F.col("_wsum").cast("double")
            / F.nullif(F.col("_span").cast("double"), F.lit(0.0))
            / F.lit(float(scale)),
            decimals,
        ).alias("twap"),
    )


def ohlc_candles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    period: str = "day",
    cents: int = 2,
) -> DataFrame:
    """OHLC candlestick aggregation per (group, period) — the
    canonical downsampling of an observation stream: open = first
    value in the period, close = last, high/low = extremes, plus the
    observation count. ONE hash aggregate: open/close via
    min_by/max_by on the deterministic (ts, id) struct order — never
    a window re-sort of the raw stream — and values quantize to
    ``cents`` so first/last election replays exactly on any engine.

    Returns (group_col, period_start, open, high, low, close, n_obs).
    """
    per = F.date_trunc(period, F.col(ts_col))
    key = F.struct(F.col(ts_col).alias("_t"), F.col(id_col).alias("_i"))
    v = F.round(F.col(value_col).cast("double") * F.lit(10 ** cents)).cast(
        "long"
    ) / F.lit(float(10 ** cents))
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        per.alias("period_start"),
        v.alias("_v"),
        key.alias("_k"),
    )
    return (
        base.groupBy("_g", "period_start")
        .agg(
            F.min_by("_v", "_k").alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max_by("_v", "_k").alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .withColumnRenamed("_g", group_col)
    )


def autocorrelation(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    lag: int = 1,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """EXACT lag-``lag`` autocorrelation per group — "does the series
    remember itself": ACF_l = Σ(x_t−μ)(x_{t−l}−μ) / Σ(x_t−μ)², the
    detector behind seasonality checks and residual whiteness audits.
    Exactness contract (the q222/q225 class): values quantize to
    ``cents``; with P = Σ x_t·x_{t−l} over the c valid pairs,
    A = Σ x_t, B = Σ x_{t−l} over those pairs, S/Q/n the plain sums,
    both sides of the ratio clear denominators exactly —
    n²·num = n²P − nS·B − nS·A + cS², n·den·n = n²Q − nS² — ALL
    integers in DECIMAL(38,0), so the single double division at the
    end replays bit-for-bit on any engine. One lag() window per group
    (per-task state = one group), one aggregate.

    Returns (group_col, n, n_pairs, acf) — acf NULL for degenerate
    groups (n <= lag or zero variance).
    """
    if lag < 1:
        raise ValueError(f"autocorrelation: lag must be >= 1: {lag}")
    dec = "decimal(38,0)"
    scale = 10 ** cents
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    w = Window.partitionBy("_g").orderBy("_ts", "_id")
    base = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("_g"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            x.alias("_x"),
        )
        .withColumn("_xl", F.lag("_x", lag).over(w))
    )
    xd = F.col("_x").cast(dec)
    xld = F.col("_xl").cast(dec)
    has = F.col("_xl").isNotNull()
    agg = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum("_x").cast(dec).alias("_s"),
        F.sum(xd * xd).alias("_q"),
        F.sum(F.when(has, xd * xld)).alias("_p"),
        F.sum(F.when(has, xd)).alias("_a"),
        F.sum(F.when(has, xld)).alias("_b"),
        F.sum(F.when(has, 1).otherwise(0)).cast(dec).alias("_c"),
    )
    n, s = F.col("_n"), F.col("_s")
    num = (
        n * n * F.col("_p")
        - n * s * F.col("_b")
        - n * s * F.col("_a")
        + F.col("_c") * s * s
    )
    den = n * n * F.col("_q") - n * s * s
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("_n").cast("long").alias("n"),
        F.coalesce(F.col("_c"), F.lit(0).cast(dec))
        .cast("long")
        .alias("n_pairs"),
        F.round(
            num.cast("double")
            / F.nullif(den.cast("double"), F.lit(0.0)),
            decimals,
        ).alias("acf"),
    )


def heartbeat_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    decimals: int = 6,
) -> DataFrame:
    """Heartbeat / liveness gap report per key — "where did the feed
    go quiet": consecutive-event gaps exceeding ``gap_seconds`` are
    outages; per key the report counts them and sizes the worst and
    the total silence. ONE lead() window per key (per-task state =
    one key's timeline) + one aggregate; integer microsecond
    arithmetic throughout, so every duration is exact.

    Returns (key_col, n_events, n_gaps, max_gap_sec, downtime_sec,
    uptime_frac): uptime_frac = 1 − downtime/span (NULL for
    single-event keys with zero span).
    """
    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1: {gap_seconds}")
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy("_k").orderBy("_us")
    base = (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("_k"), us.alias("_us"))
        .withColumn("_next", F.lead("_us").over(w))
    )
    d = F.col("_next") - F.col("_us")
    thr = gap_seconds * 1_000_000
    agg = base.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(d > thr, 1).otherwise(0)
        ).cast("long").alias("n_gaps"),
        F.max(F.when(d > thr, d)).alias("_maxg"),
        F.coalesce(F.sum(F.when(d > thr, d)), F.lit(0)).alias("_down"),
        (F.max("_us") - F.min("_us")).alias("_span"),
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n_events",
        "n_gaps",
        F.round(F.col("_maxg") / F.lit(1e6), decimals).alias(
            "max_gap_sec"
        ),
        F.round(F.col("_down") / F.lit(1e6), decimals).alias(
            "downtime_sec"
        ),
        F.round(
            F.lit(1.0)
            - F.col("_down")
            / F.nullif(F.col("_span").cast("double"), F.lit(0.0)),
            decimals,
        ).alias("uptime_frac"),
    )


def seasonal_anomaly_report(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    k: int = 3,
) -> DataFrame:
    """Seasonal (day-of-week) anomaly report over daily event counts —
    "is today's volume weird FOR A TUESDAY": each (group, day)'s
    count compares to the exact median of its group's same-weekday
    days, with a median-absolute-deviation band (robust: one crazy
    day never drags its own baseline). Integer end-to-end: counts,
    medians (lower-middle element of the sorted array — unambiguous
    on any engine, no interpolation), MAD, and the band
    |x − med| > k·max(MAD, 1) are all exact BIGINT arithmetic.

    Scale shape: daily counts are a (group, day) aggregate; baselines
    aggregate those counts per (group, weekday) — a DOMAIN-sized
    frame (groups × 7) whose per-cell sorted array is bounded by the
    days in the analysis horizon (collect_list is honest here the
    same way q213's session collect is — physically bounded, and a
    report over years should window its input upstream); the flag is
    a broadcast join back. Returns one row per (group, day):
    (group_col, day, weekday, n, med, mad, is_anomaly).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        df.filter(F.col(group_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"), day.alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("weekday", F.dayofweek("day"))
    )

    def _med(arr: Column) -> Column:
        # lower-middle element: exact, interpolation-free
        return F.element_at(
            arr, F.ceil(F.size(arr) / F.lit(2.0)).cast("int")
        )

    base = daily.groupBy("_g", "weekday").agg(
        F.array_sort(F.collect_list("n")).alias("_arr")
    )
    med = base.select(
        "_g", "weekday", _med(F.col("_arr")).alias("med"), "_arr"
    )
    mad = med.select(
        "_g",
        "weekday",
        "med",
        _med(
            F.array_sort(
                F.transform(
                    F.col("_arr"),
                    lambda x: F.abs(x - F.col("med")),
                )
            )
        ).alias("mad"),
    )
    return daily.join(F.broadcast(mad), ["_g", "weekday"]).select(
        F.col("_g").alias(group_col),
        "day",
        "weekday",
        "n",
        "med",
        "mad",
        (
            F.abs(F.col("n") - F.col("med"))
            > F.lit(k) * F.greatest(F.col("mad"), F.lit(1))
        ).alias("is_anomaly"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Merged-interval coverage per key — how much time the UNION of
    [start, end] intervals actually covers (machine busy time, user
    online time, incident exposure): overlapping and touching
    intervals merge; double-counting is the bug this operator exists
    to remove. The classic gaps-and-islands construction: one
    running-max window over (start, end)-ordered intervals per key
    marks island starts (start > max(end) of everything before), a
    running sum of the markers numbers the islands, and one aggregate
    per (key, island) + one per key reduces to exact integer lengths
    — per-task state is one key's intervals, never the table.

    Inverted intervals (end < start) raise loudly (the q212
    convention); NULLs drop. Integer units (epoch millis by
    convention). Returns (key_col, n_intervals, n_islands,
    covered, span, coverage_frac) — covered/span exact integers,
    coverage_frac = covered/span (NULL for zero span).
    """
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    checked = F.when(
        e < s,
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_coverage: inverted interval (end < start) "
                    "— upstream corruption? (key="
                ),
                F.col(key_col).cast("string"),
                F.lit(")"),
            ).cast("string")
        ).cast("long"),
    ).otherwise(e)
    base = df.filter(
        F.col(key_col).isNotNull() & s.isNotNull() & e.isNotNull()
    ).select(
        F.col(key_col).alias("_k"), s.alias("_s"), checked.alias("_e")
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = base.withColumn(
        "_new",
        F.when(
            F.col("_s") > F.coalesce(
                F.max("_e").over(w), F.lit(-(1 << 62))
            ),
            1,
        ).otherwise(0),
    ).withColumn(
        "_isl",
        F.sum("_new").over(
            Window.partitionBy("_k")
            .orderBy("_s", "_e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = marked.groupBy("_k", "_isl").agg(
        F.min("_s").alias("_is"),
        F.max("_e").alias("_ie"),
        F.count(F.lit(1)).alias("_n"),
    )
    agg = islands.groupBy("_k").agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("_ie") - F.col("_is")).cast("long").alias("covered"),
        (F.max("_ie") - F.min("_is")).cast("long").alias("span"),
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n_intervals",
        "n_islands",
        "covered",
        "span",
        F.round(
            F.col("covered")
            / F.nullif(F.col("span").cast("double"), F.lit(0.0)),
            decimals,
        ).alias("coverage_frac"),
    )


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_gap_days: int = 14,
    decimals: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimator over an activity stream — the
    product-limit "how long do users stay" curve (Kaplan & Meier
    1958, public formula) with churn-as-event and right-censoring:
    a user whose last activity is more than ``churn_gap_days``
    before the study horizon (the corpus' max activity day) CHURNED
    with observed lifetime last−first days; everyone else is
    CENSORED at horizon−first days (still alive when observation
    ended — the half the naive "average lifetime" metric silently
    drops, biasing lifetimes down). At each event time t:
    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) with d_i = churns at t_i and
    n_i = users still at risk.

    Scale shape: ONE user-key aggregate collapses the stream to
    per-user (first, last) days; the horizon is a 1-row broadcast;
    lifetimes aggregate to one row per DISTINCT DURATION (bounded by
    the day-domain of the study window, not by users); and the
    product-limit recursion runs as a single sorted-array fold
    inside a global aggregate — deterministic summation order (the
    engine's sorted-fold float rule), no unpartitioned window, no
    per-timepoint rescan. ln terms are rounded to 12 decimals before
    the fold so the cumulative sum replays bit-for-bit on any
    engine.

    Returns (duration_days, n_risk, n_events, n_censored, survival)
    for event timepoints (d_i > 0), survival rounded to
    ``decimals``.
    """
    if churn_gap_days < 0:
        raise ValueError(f"churn_gap_days must be >= 0: {churn_gap_days}")
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("_d"),
    )
    pu = ev.groupBy("_u").agg(
        F.min("_d").alias("_f"), F.max("_d").alias("_l")
    )
    hz = pu.agg(F.max("_l").alias("_h"))
    churned = F.datediff(F.col("_h"), F.col("_l")) > churn_gap_days
    du = pu.crossJoin(F.broadcast(hz)).select(
        F.when(
            churned, F.datediff(F.col("_l"), F.col("_f"))
        )
        .otherwise(F.datediff(F.col("_h"), F.col("_f")))
        .alias("_dur"),
        churned.cast("long").alias("_e"),
    )
    return _km_curve(du, decimals)


def kaplan_meier_conversion(
    events: DataFrame,
    event_predicate: Column,
    user_col: str = "user_id",
    ts_col: str = "ts",
    decimals: int = 6,
) -> DataFrame:
    """Kaplan–Meier TIME-TO-CONVERSION curve — the same product-limit
    estimator with "event" = the user's first row satisfying
    ``event_predicate`` (first purchase, first error, first
    qualifying order): duration = days from the user's first activity
    to their first qualifying event; users who never qualify are
    right-censored at the study horizon. This is the funnel-latency
    statistic the naive "mean days to convert over converters"
    metric biases optimistic (it drops exactly the users still
    waiting). Identical scale shape and cross-engine float contract
    as :func:`kaplan_meier`; the subject differs, the curve
    machinery is shared.

    Returns (duration_days, n_risk, n_events, n_censored, survival)
    — survival here reads "share not yet converted by day t".
    """
    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("_d"),
        event_predicate.alias("_q"),
    )
    pu = base.groupBy("_u").agg(
        F.min("_d").alias("_f"),
        F.min(F.when(F.col("_q"), F.col("_d"))).alias("_c"),
    )
    hz = base.agg(F.max("_d").alias("_h"))
    converted = F.col("_c").isNotNull()
    du = pu.crossJoin(F.broadcast(hz)).select(
        F.when(converted, F.datediff(F.col("_c"), F.col("_f")))
        .otherwise(F.datediff(F.col("_h"), F.col("_f")))
        .alias("_dur"),
        converted.cast("long").alias("_e"),
    )
    return _km_curve(du, decimals)


def _km_curve(du: DataFrame, decimals: int) -> DataFrame:
    """Product-limit curve from a (_dur, _e) frame — the shared tail
    of the KM operators: duration-domain-bounded counts, then ONE
    sorted-array fold for the at-risk walk and the rounded-ln
    cumulative product (deterministic summation order; no
    unpartitioned window)."""
    cnt = du.groupBy("_dur").agg(
        F.sum("_e").alias("_dd"),
        F.sum(F.lit(1) - F.col("_e")).alias("_c"),
    )
    row = cnt.agg(
        F.sort_array(
            F.collect_list(F.struct("_dur", "_dd", "_c"))
        ).alias("_arr"),
        F.sum(F.col("_dd") + F.col("_c")).alias("_n"),
    )

    out_t = (
        "array<struct<t:int,n_risk:bigint,d:bigint,c:bigint,"
        "lns:double>>"
    )

    def _step(acc, x):
        n_i = acc["ar"]
        lns_new = acc["lns"] + F.round(
            F.log(
                (n_i - x["_dd"]).cast("double")
                / F.nullif(n_i.cast("double"), F.lit(0.0))
            ),
            12,
        )
        emit = F.struct(
            x["_dur"].cast("int").alias("t"),
            n_i.alias("n_risk"),
            x["_dd"].alias("d"),
            x["_c"].alias("c"),
            lns_new.alias("lns"),
        )
        has_event = x["_dd"] > 0
        return F.struct(
            (n_i - x["_dd"] - x["_c"]).alias("ar"),
            F.when(has_event, lns_new).otherwise(acc["lns"]).alias("lns"),
            F.when(
                has_event, F.concat(acc["out"], F.array(emit))
            )
            .otherwise(acc["out"])
            .alias("out"),
        )

    folded = row.select(
        F.aggregate(
            F.col("_arr"),
            F.struct(
                F.col("_n").alias("ar"),
                F.lit(0.0).alias("lns"),
                F.lit(None).cast(out_t).alias("out"),
            ).withField("out", F.array().cast(out_t)),
            _step,
            lambda acc: acc["out"],
        ).alias("_out")
    )
    return folded.select(F.explode("_out").alias("_r")).select(
        F.col("_r.t").alias("duration_days"),
        F.col("_r.n_risk").alias("n_risk"),
        F.col("_r.d").alias("n_events"),
        F.col("_r.c").alias("n_censored"),
        F.round(F.exp(F.col("_r.lns")), decimals).alias("survival"),
    )


def _trunc_div(n: Column, d: Column) -> Column:
    """Exact BIGINT truncating division (toward zero) — the same
    operation as Spark SQL's ``div`` and DuckDB's integer ``//``,
    expressible inside higher-order-function lambdas (where
    ``F.expr`` strings cannot reach lambda variables). The
    subtraction makes the numerator exactly divisible, so the double
    division is exact at ANY int64 magnitude (quotient < 2^53);
    pmod's floor-consistent remainder is then corrected to
    truncation for negative numerators."""
    q_floor = ((n - F.pmod(n, d)) / d).cast("long")
    return q_floor + F.when(
        (n < 0) & (F.pmod(n, d) != 0), F.lit(1)
    ).otherwise(F.lit(0))


def holt_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    horizon: int = 3,
    cents: int = 2,
) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing per key, in
    EXACT integer cents (Holt 1957, public formula; α=0.3, β=0.2 as
    tenths so every step is integer arithmetic):

        l_t = (3·x_t + 7·(l_{t−1} + b_{t−1})) div 10
        b_t = (2·(l_t − l_{t−1}) + 8·b_{t−1}) div 10

    with l_0 = x_0, b_0 = 0 over the key's DAILY value sums in
    cents-quantized integers (each row quantizes BEFORE the sum, so
    the daily totals are order-independent). Integer truncating
    division is the same operation on both engines, so levels,
    trends, and forecasts replay bit-for-bit — the float-free
    sibling of float exponential smoothing, whose running products
    are summation-order traps.

    Scale shape: one (key, day) aggregate collapses the stream; the
    sequential recursion — inherently order-dependent — runs as a
    per-key sorted-array fold (arrays bounded by the DAY DOMAIN of
    the horizon, the q213/q247 bounded-collect contract), one row
    per key out. No window over raw events, no driver loop.

    Returns (key_col, n_days, last_day, level_cents, trend_cents,
    forecast) — forecast = (level + horizon·trend) / 100 as the
    h-step-ahead linear projection in value units.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1: {horizon}")
    scale = 10 ** cents
    daily = (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(key_col).alias("_k"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("_d"),
            F.round(F.col(value_col).cast("double") * scale)
            .cast("long")
            .alias("_x"),
        )
        .groupBy("_k", "_d")
        .agg(F.sum("_x").alias("_x"))
    )
    per_key = daily.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("_d").alias("last_day"),
        F.sort_array(F.collect_list(F.struct("_d", "_x"))).alias("_arr"),
    )
    # same-shape accumulator trick (mirrors DuckDB's list_reduce,
    # whose accumulator must share the element type): elements carry
    # (a = x_t, b = 0), the accumulator reinterprets (a = level,
    # b = trend); the first element doubles as the init (l_0 = x_0,
    # b_0 = 0)
    elems = F.transform(
        F.col("_arr"),
        lambda s: F.struct(s["_x"].alias("a"), F.lit(0).cast("long").alias("b")),
    )

    def _step(acc, x):
        new_l = _trunc_div(
            F.lit(3) * x["a"] + F.lit(7) * (acc["a"] + acc["b"]),
            F.lit(10),
        )
        new_b = _trunc_div(
            F.lit(2) * (new_l - acc["a"]) + F.lit(8) * acc["b"],
            F.lit(10),
        )
        return F.struct(new_l.alias("a"), new_b.alias("b"))

    folded = F.aggregate(
        F.slice(elems, 2, F.greatest(F.size(elems) - 1, F.lit(0))),
        F.element_at(elems, 1),
        _step,
    )
    return per_key.select(
        F.col("_k").alias(key_col),
        "n_days",
        "last_day",
        folded["a"].alias("level_cents"),
        folded["b"].alias("trend_cents"),
        F.round(
            (folded["a"] + F.lit(horizon) * folded["b"])
            / F.lit(float(scale)),
            cents,
        ).alias("forecast"),
    )


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    cents: int = 2,
) -> DataFrame:
    """Theil–Sen robust trend per key — the median of all pairwise
    daily slopes (Theil 1950 / Sen 1968, public estimator), the
    outlier-resistant alternative to least-squares: one corrupted
    day moves OLS arbitrarily but moves the slope MEDIAN not at all
    (breakdown point ~29%). Slopes are exact integer micro-units:
    slope(i,j) = (x_j − x_i)·1e6 div (d_j − d_i) with cents-
    quantized daily sums and day-count denominators — truncating
    integer division, identical on both engines — and the median of
    integers is exact (mean of the two middles on even counts,
    a .5-exact double).

    Scale shape: the stream collapses to one row per (key, day)
    first, so the pairwise stage is quadratic in the DAY DOMAIN
    (bounded by the analysis horizon — ~n·(n−1)/2 pairs for n days),
    never in events; the per-key self-join ships compact
    (key, day, cents) rows and the median runs on a sorted
    slope array bounded the same way.

    Returns (key_col, n_days, n_pairs, slope_micro_median) —
    slope in value-cents·1e-6 per day.
    """
    scale = 10 ** cents
    daily = (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(key_col).alias("_k"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("_d"),
            F.round(F.col(value_col).cast("double") * scale)
            .cast("long")
            .alias("_x"),
        )
        .groupBy("_k", "_d")
        .agg(F.sum("_x").alias("_x"))
    )
    a = daily.select(
        F.col("_k"), F.col("_d").alias("_da"), F.col("_x").alias("_xa")
    )
    b = daily.select(
        F.col("_k"), F.col("_d").alias("_db"), F.col("_x").alias("_xb")
    )
    pairs = a.join(b, "_k").filter(F.col("_db") > F.col("_da"))
    slope = _trunc_div(
        (F.col("_xb") - F.col("_xa")) * F.lit(1_000_000),
        F.datediff(F.col("_db"), F.col("_da")).cast("long"),
    )
    per_key = (
        pairs.select("_k", slope.alias("_s"))
        .groupBy("_k")
        .agg(
            F.sort_array(F.collect_list("_s")).alias("_ss"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    n = F.col("n_pairs")
    mid_hi = F.element_at("_ss", ((n / 2).cast("int") + 1))
    mid_lo = F.element_at("_ss", F.greatest((n + 1) / 2, F.lit(1)).cast("int"))
    n_days = daily.groupBy("_k").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        per_key.join(n_days, "_k")
        .filter(F.col("n_pairs") > 0)
        .select(
            F.col("_k").alias(key_col),
            "n_days",
            "n_pairs",
            ((mid_lo + mid_hi) / F.lit(2.0)).alias("slope_micro_median"),
        )
    )


def sequence_pair_support(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    decimals: int = 6,
) -> DataFrame:
    """Temporal A-before-B pattern mining over daily activity
    windows — the sequential-pattern primitive between q203's Markov
    matrix (ADJACENT transitions only) and q202's funnel (one FIXED
    step list): for every ordered pair of event types, in how many
    (user, day) windows does A's first occurrence strictly precede
    B's first occurrence, and with what confidence given A appeared
    at all. This is the order-sensitive half of association mining
    (q150 counts co-presence; this counts PRECEDENCE) — the signal
    behind "users who err then purchase" style sequencing.

    Scale shape: the stream collapses to FIRST occurrence per
    (user, day, type) — one aggregate on compact keys, at most
    |type domain| rows per window — so the pair stage is a
    type-domain-bounded self-join per window (≤ T·(T−1) pairs, never
    events²), and the support/confidence aggregates run on pair-type
    keys. Equal first-occurrence instants count for NEITHER order
    (strict precedence — deterministic, no tie-break invention).

    Returns (ante, cons, support, n_ante_windows, confidence) for
    pairs with support >= 1; confidence = support / windows where
    ``ante`` appeared, rounded.
    """
    ev = df.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("_d"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    from capex_data_pipeline_spark.cache import persisted

    firsts = persisted(
        ev.groupBy("_u", "_d", "_t").agg(F.min("_ts").alias("_ft"))
    )
    a = firsts.select(
        "_u", "_d", F.col("_t").alias("ante"), F.col("_ft").alias("_fa")
    )
    b = firsts.select(
        "_u", "_d", F.col("_t").alias("cons"), F.col("_ft").alias("_fb")
    )
    sup = (
        a.join(b, ["_u", "_d"])
        .filter(
            (F.col("ante") != F.col("cons"))
            & (F.col("_fa") < F.col("_fb"))
        )
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    tw = firsts.groupBy(F.col("_t").alias("ante")).agg(
        F.count(F.lit(1)).alias("n_ante_windows")
    )
    return sup.join(tw, "ante").select(
        "ante",
        "cons",
        "support",
        "n_ante_windows",
        F.round(
            F.col("support")
            / F.nullif(F.col("n_ante_windows").cast("double"), F.lit(0.0)),
            decimals,
        ).alias("confidence"),
    )


def rate_limit_audit(
    df: DataFrame,
    limit: int,
    window_seconds: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window rate audit — which principals exceeded ``limit``
    events per ``window_seconds`` and by how much: for every event,
    the count of the key's events in the trailing window (inclusive);
    an event is a BURST event when that count >= limit. The
    abuse/quota primitive (API limits, scraper detection, fraud
    velocity checks) that tumbling-window counts under-detect — a
    burst straddling two tumbling windows hides in both halves, while
    the sliding count sees it whole.

    Scale shape: ONE key-partitioned RANGE window over integer
    microseconds — native frame, no self-join, no explode; per-task
    state is one key's timeline (the q243/q248 sort). Equal-instant
    events share a frame (RANGE semantics), so the count is
    order-independent under ties — deterministic with no invented
    tie-break. Output is per KEY (compact), not per event.

    Returns (user_col, n_events, n_burst_events, max_in_window,
    first_burst_ts) for every key; n_burst_events = 0 marks the
    compliant ones (kept — an audit that drops the innocent can't
    prove compliance).
    """
    if limit < 1:
        raise ValueError(f"limit must be >= 1: {limit}")
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1: {window_seconds}")
    us = window_seconds * 1_000_000
    ev = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_e"),
    )
    w = (
        Window.partitionBy("_u")
        .orderBy("_e")
        .rangeBetween(-(us - 1), 0)
    )
    cnt = ev.withColumn("_c", F.count(F.lit(1)).over(w))
    return cnt.groupBy(F.col("_u").alias(user_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("_c") >= limit).cast("long")).alias(
            "n_burst_events"
        ),
        F.max("_c").alias("max_in_window"),
        F.min(F.when(F.col("_c") >= limit, F.col("_ts"))).alias(
            "first_burst_ts"
        ),
    )


def clamped_balance(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    cents: int = 2,
    initial_cents: int = 0,
) -> DataFrame:
    """Floor-clamped running balance — the NON-LINEAR running sum
    behind inventory positions, prepaid credit, and token buckets:
    per key, fold deltas in time order with
    ``balance = max(0, balance + delta)`` — a drain below zero stops
    at zero instead of going negative, so later deposits start from
    0, not from a fictitious debt. A plain window cumsum CANNOT
    express this (the clamp makes each step depend on the clamped
    previous step); it is exactly a sequential fold.

    Exactness: deltas quantize to integer cents per row BEFORE any
    aggregation, the fold is integer max/add — bit-identical on any
    engine (DuckDB replays it as a scalar ``list_reduce``, which is
    safe — the struct-lambda accumulator bug q257 documents does not
    apply to scalar folds). Per-key arrays are bounded by the
    analysis horizon (the q213/q247 bounded-collect contract);
    deltas in the same instant fold in (ts, delta) sorted order — a
    pinned, engine-identical tie rule.

    Returns (key_col, n_deltas, sum_deltas_cents, final_cents,
    clamped — whether the floor ever engaged, exact).
    """
    scale = 10 ** cents
    ev = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("_x"),
    )
    per_key = ev.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_deltas"),
        F.sum("_x").alias("sum_deltas_cents"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_ts", "_x"))),
            lambda s: s["_x"],
        ).alias("_arr"),
    )
    folded = F.aggregate(
        F.col("_arr"),
        F.lit(initial_cents).cast("long"),
        lambda acc, x: F.greatest(acc + x, F.lit(0).cast("long")),
    )
    return per_key.select(
        F.col("_k").alias(key_col),
        "n_deltas",
        "sum_deltas_cents",
        folded.alias("final_cents"),
        # the floor engaged iff the clamped result exceeds the
        # unclamped one (clamping can only raise the balance)
        (
            folded
            > F.lit(initial_cents) + F.col("sum_deltas_cents")
        ).alias("clamped"),
    )
