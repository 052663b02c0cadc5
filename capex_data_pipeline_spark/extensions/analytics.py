"""Event-analytics operators over big event streams: gap-based
sessionization (assigning session ids to ROWS, the batch complement of
the aggregate-producing session window in streaming/windows.py),
robust per-key outlier scoring, and cohort retention.

Scale shapes:

- ``sessionize`` — one window over ``(key) ORDER BY ts``: ``lag`` to
  detect gaps, running ``sum`` of gap flags to number sessions.  One
  shuffle on the key, linear state, no self-join (the naive
  formulation joins events to session boundaries).
- ``robust_zscore`` — modified z-score ``0.6745·(x−median)/MAD``:
  outlier scoring that a single corrupt reading cannot poison (mean/
  stddev break down at one bad point; median/MAD have a 50 %
  breakdown).  Two aggregation passes over compact keys (medians are
  exact interpolated percentiles; at 100 TB swap
  ``percentile_approx`` — same plan shape, documented like q73) and
  one broadcast-friendly join back of the tiny per-key stats frame.
- ``cohort_retention`` — the first-seen-period frame is an aggregate
  (one row per key), joined back to events and re-aggregated onto
  ``(cohort, period_offset)``: two shuffles on compact keys; the
  classic retention triangle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    on: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a per-key session id to every row: a new session starts
    when the gap to the key's previous event exceeds ``gap_seconds``.

    Adds ``session_id`` (0-based per key, ordered by time) and
    ``is_session_start``.  Ties on ``time_col`` within a key stay in
    one session (gap 0); pass ``tiebreak_col`` (a unique id) to make
    WHICH tied row carries ``is_session_start`` deterministic.  One
    window, one shuffle on the key.
    """
    # integer microseconds: a double-seconds gap can exceed the
    # threshold by an ulp at exactly gap_seconds and split the session
    ep = F.unix_micros(F.col(time_col).cast("timestamp"))
    gap_us = int(round(gap_seconds * 1_000_000))
    order = [ep.asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(on).orderBy(*order)
    gap = ep - F.lag(ep).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > F.lit(gap_us)), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        "*",
        new_sess.alias("_ns"),
    ).select(
        *df.columns,
        (F.sum("_ns").over(run) - 1).cast("long").alias("session_id"),
        (F.col("_ns") == 1).alias("is_session_start"),
    )


def robust_zscore(
    df: DataFrame,
    on: str = "user_id",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Per-key modified z-score outlier flags (Iglewicz-Hoaglin):
    ``0.6745 · (x − median) / MAD`` with MAD = median absolute
    deviation.  Returns the input plus ``mzscore`` (null when the
    key's MAD is 0 — a degenerate constant-valued key, where no point
    is an outlier) and ``is_outlier``.

    Two exact-percentile aggregations + one join back of the per-key
    stats (tiny vs the event table; broadcast when it fits).
    """
    med = df.groupBy(on).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = (
        df.join(med, on)
        .select(
            F.col(on).alias("_k"),
            F.abs(F.col(value_col) - F.col("_med")).alias("_ad"),
        )
        .groupBy("_k")
        .agg(F.expr("percentile(_ad, 0.5)").alias("_mad"))
        .withColumnRenamed("_k", on)
    )
    stats = med.join(dev, on)
    z = F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad")
    return (
        df.join(stats, on)
        .select(
            *df.columns,
            F.when(F.col("_mad") > 0, z).alias("mzscore"),
        )
        .select(
            "*",
            (F.abs(F.col("mzscore")) > F.lit(float(threshold))).alias(
                "is_outlier"
            ),
        )
    )


def cohort_retention(
    df: DataFrame,
    on: str = "user_id",
    time_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention triangle: group keys into cohorts by their FIRST
    active period, then count how many of each cohort's keys are
    active 0, 1, 2, … periods later.

    ``period`` is any ``date_trunc`` unit (``'week'``, ``'month'``,
    ``'day'``).  Returns ``(cohort, period_offset, n_active,
    cohort_size, retention)`` — retention = n_active / cohort_size.
    Offsets are calendar-period differences (weeks = 7-day diffs of
    the truncated dates).
    """
    per = F.date_trunc(period, F.col(time_col)).cast("date")
    activity = df.select(F.col(on).alias("_k"), per.alias("_p")).distinct()
    first = activity.groupBy("_k").agg(F.min("_p").alias("_cohort"))
    div = {"day": 1, "week": 7}.get(period)
    joined = activity.join(first, "_k")
    if div is not None:
        off = (F.datediff(F.col("_p"), F.col("_cohort")) / div).cast("long")
    elif period == "month":
        off = (
            (F.year("_p") - F.year("_cohort")) * 12
            + (F.month("_p") - F.month("_cohort"))
        ).cast("long")
    else:
        raise ValueError(f"cohort_retention: unsupported period {period!r}")
    counts = (
        joined.select("_k", "_cohort", off.alias("period_offset"))
        .groupBy("_cohort", "period_offset")
        # rows are already distinct per (key, cohort, offset): activity
        # is .distinct() and the offset is a function of (_p, _cohort)
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        counts.join(sizes, "_cohort")
        .select(
            F.col("_cohort").alias("cohort"),
            "period_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    on: str = "user_id",
    time_col: str = "ts",
    event_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered conversion funnel: for every key, the earliest
    occurrence of ``steps[0]``, then for each later step the earliest
    matching event AT-OR-AFTER the previous step's matched time
    (optionally within ``within_seconds`` of step 1).  Returns one row
    per key that reached step 1: ``t1..tk`` (matched times, null once
    the chain breaks) and ``max_step`` (consecutive steps reached).

    k−1 small aggregate+join rounds on the compact key — each round
    filters one step's events, joins the (one-row-per-key) frontier,
    and takes a min.  No per-key event lists are ever materialized
    (the collect_list formulation caps at executor memory on hot keys;
    this one never does).
    """
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    ep = F.col(time_col).cast("timestamp").cast("double")
    ev = df.select(
        F.col(on).alias("_k"), F.col(event_col).alias("_e"), ep.alias("_t")
    )
    res = (
        ev.filter(F.col("_e") == steps[0])
        .groupBy("_k")
        .agg(F.min("_t").alias("t1"))
    )
    for i in range(1, len(steps)):
        prev, cur = f"t{i}", f"t{i + 1}"
        cand = ev.filter(F.col("_e") == steps[i]).join(
            res.select("_k", "t1", prev), "_k"
        )
        cond = F.col("_t") >= F.col(prev)
        if within_seconds is not None:
            cond = cond & (F.col("_t") <= F.col("t1") + F.lit(float(within_seconds)))
        ti = (
            cand.filter(cond)
            .groupBy("_k")
            .agg(F.min("_t").alias(cur))
        )
        res = res.join(ti, "_k", "left")
    reached = sum(
        (F.col(f"t{i + 1}").isNotNull()).cast("int") for i in range(len(steps))
    )
    return res.select(
        F.col("_k").alias(on),
        *[f"t{i + 1}" for i in range(len(steps))],
        reached.alias("max_step"),
    )


def rolling_window(
    df: DataFrame,
    on: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    window_seconds: float = 3600.0,
) -> DataFrame:
    """Per-key trailing time-window aggregates for EVERY row: count,
    sum and max of ``value_col`` over ``[t − window_seconds, t]``.

    A RANGE-framed window (``rangeBetween`` over the epoch ordering),
    not a self-join: one shuffle on the key, each partition keeps a
    sliding frame pointer — O(n) per key instead of the O(n·w) pair
    join. Rows sharing a timestamp are RANGE-frame peers: they all see
    the same trailing aggregate (deterministic under ties by
    construction — SQL semantics in every engine).
    """
    # RANGE offsets must be integral: order by epoch MICROS (long) so
    # sub-second timestamps keep exact interval semantics (unix_micros,
    # not a double round-trip — that can truncate an ulp at boundaries)
    ep_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    w = (
        Window.partitionBy(on)
        .orderBy(ep_us.asc())
        .rangeBetween(-int(window_seconds * 1_000_000), 0)
    )
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("rolling_n"),
        F.sum(value_col).over(w).alias("rolling_sum"),
        F.max(value_col).over(w).alias("rolling_max"),
    )


def scd2_intervals(
    df: DataFrame,
    on: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) builder: collapse a change
    log into validity intervals — one row per observed state with
    ``valid_from`` / ``valid_to`` (null = current) and ``is_current``.
    Consecutive duplicate values merge into one interval.

    One window per key ordered by time: ``lag`` drops no-change rows,
    ``lead`` closes each interval at the next change's time.  Two
    passes over the same partitioning (Catalyst runs them in one
    shuffle), linear state — the warehouse-standard dimension-history
    build at any scale.
    """
    order = [F.col(time_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(on).orderBy(*order)
    changed = (
        ~F.col(value_col).eqNullSafe(F.lag(value_col).over(w))
    ) | F.lag(time_col).over(w).isNull()
    cols = [on, time_col, value_col] + (
        [tiebreak_col] if tiebreak_col and tiebreak_col not in (on, time_col, value_col) else []
    )
    marked = df.select(*cols).withColumn("_chg", changed)
    keep = marked.filter(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(on).orderBy(F.col(time_col).asc())
    return keep.select(
        F.col(on),
        F.col(value_col).alias("state"),
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def distribution_drift(
    baseline: DataFrame,
    current: DataFrame,
    category_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Categorical distribution drift between two corpus slices via
    the Population Stability Index (PSI, public credit-scoring /
    ML-monitoring formula): per category,
    ``contrib = (q − p) · ln(q / p)`` where ``p``/``q`` are the
    add-``smoothing`` shares of the category in the baseline/current
    slice; ``Σ contrib`` is the PSI (≳0.2 is the conventional
    "shifted" alarm). The drift gate a training-data pipeline runs
    between crawl snapshots — a silent source/language mix shift is a
    data bug upstream filters can't see.

    Smoothed shares use the UNION category set size ``K``:
    ``p = (c_b + s) / (T_b + s·K)`` — so a category present in only
    one slice contributes a finite, bounded term instead of ±∞.

    Scale shape: the two inputs are tag-unioned so ONE hash aggregate
    on the category key produces both count columns (one scan each
    side, one shuffle of compact keys); totals and ``K`` come from a
    second aggregate over that tiny frame and ride along as a 1-row
    broadcast. NULL categories are a real category (sentinel-coalesced,
    like mixture_sample).

    Returns one row per union category: (category, n_base, n_curr,
    p_base, p_curr, psi_contrib), shares and contributions rounded to
    6 decimals.
    """
    from capex_data_pipeline_spark.cache import persisted

    s = float(smoothing)
    # not (s > 0) rather than s <= 0: NaN passes the latter and would
    # silently turn every share/contribution into NaN (and a PSI > 0.2
    # alarm comparison into False)
    if not (s > 0):
        raise ValueError("distribution_drift: smoothing must be > 0")
    gk = F.coalesce(F.col(category_col).cast("string"), F.lit("<null>"))
    tagged = baseline.select(gk.alias("category"), F.lit(0).alias("_t")).unionByName(
        current.select(gk.alias("category"), F.lit(1).alias("_t"))
    )
    counts = tagged.groupBy("category").agg(
        F.sum(F.when(F.col("_t") == 0, 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col("_t") == 1, 1).otherwise(0)).alias("n_curr"),
    )
    # two consumers (totals aggregate + final projection) — ledger rule
    counts = persisted(counts)
    totals = counts.agg(
        F.sum("n_base").alias("_tb"),
        F.sum("n_curr").alias("_tc"),
        F.count(F.lit(1)).alias("_k"),
    )
    p = (F.col("n_base") + s) / (F.col("_tb") + s * F.col("_k"))
    q = (F.col("n_curr") + s) / (F.col("_tc") + s * F.col("_k"))
    return counts.crossJoin(F.broadcast(totals)).select(
        "category",
        "n_base",
        "n_curr",
        F.round(p, 6).alias("p_base"),
        F.round(q, 6).alias("p_curr"),
        # + 0.0 collapses IEEE -0.0 (p == q rounds to -0.0 on one
        # engine and +0.0 on the other, like q87's pmi)
        (F.round((q - p) * F.log(q / p), 6) + F.lit(0.0)).alias("psi_contrib"),
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot — the MERGE/upsert batch
    maintenance every incremental pipeline needs (nightly corpus
    refresh, dimension sync from a change feed): ``changes`` carries
    the snapshot's columns plus ``version_col`` (monotone per key) and
    ``op_col`` ('U' upsert / 'D' delete). The result is the snapshot
    with each key overridden by its LATEST change; keys whose latest
    change is a delete are dropped; untouched snapshot rows pass
    through.

    Scale shape: tag-union (snapshot rides as version NULL, sorted
    below every real version) + ONE keyed window keeping the
    highest-version row per key — one shuffle on the key, identical
    to the W3 dedup-keep-first plan, never a join of snapshot against
    changes per operation type. Deterministic: ties on (key, version)
    break toward the changelog row, then by ``op_col`` descending
    ('U' > 'D' — an upsert and delete claiming the same version is a
    feed defect; prefer keeping data and let quality_report-style
    gates flag the duplicate version upstream), then by a payload
    hash descending — so even a feed that violates the expected
    unique-(key, version) precondition (duplicate snapshot rows for
    one key, or duplicate (key, version, op) change rows) yields one
    engine/partitioning-deterministic winner instead of whichever row
    the shuffle happened to order first.

    Returns the snapshot schema (key + payload columns, no op/version).
    """
    from pyspark.sql.window import Window

    payload = [c for c in snapshot.columns if c not in key_cols]
    extra = set(changes.columns) - set(snapshot.columns) - {
        version_col,
        op_col,
    }
    if extra:
        raise ValueError(
            f"apply_changelog: changes carry unknown column(s) "
            f"{sorted(extra)}"
        )
    snap = snapshot.select(
        *key_cols,
        *payload,
        F.lit(None).cast(
            changes.schema[version_col].dataType
        ).alias("_ver"),
        F.lit(0).alias("_is_change"),
        F.lit("U").alias("_op"),
    )
    chg = changes.select(
        *key_cols,
        *payload,
        F.col(version_col).alias("_ver"),
        F.lit(1).alias("_is_change"),
        F.col(op_col).alias("_op"),
    )
    # final tie-break: a deterministic payload hash (xxhash64 over the
    # payload columns plus a literal, so zero-payload frames still get
    # a constant) — identical duplicate rows tie harmlessly (same
    # payload → same output), differing ones pick a stable winner
    payload_hash = F.xxhash64(
        F.lit("apply_changelog"), *[F.col(c) for c in payload]
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_ver").desc_nulls_last(),
        F.col("_is_change").desc(),
        F.col("_op").desc(),
        payload_hash.desc(),
    )
    return (
        snap.unionByName(chg)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
        .select(*key_cols, *payload)
    )


def association_rules(
    baskets: "DataFrame",
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_support: int = 2,
    topk: int = 20,
    decimals: int = 6,
) -> "DataFrame":
    """Pairwise association-rule mining (the Apriori k=2 workhorse —
    Agrawal & Srikant 1994, public algorithm) over a (basket, item)
    fact table: for every item pair co-occurring in >= ``min_support``
    baskets, both directional confidences P(b|a) / P(a|b) and the
    symmetric lift P(a,b) / (P(a)·P(b)), reported for the ``topk``
    pairs by lift. Market-basket analytics, co-occurrence feature
    mining, and "users who bought X" candidates all reduce to this.

    Scale shape: the pair counting is the proven co-purchase
    equi-join (one self-join ON the basket key over DISTINCT
    (basket, item) rows — output bounded by Σ C(basket_size, 2), per-
    basket quadratic but basket sizes are small and bounded; hot-key
    skew is AQE's standard case); item supports and the basket count
    are compact-key aggregates of the same deduped frame; the
    min_support filter cuts the pair frame BEFORE the metric math and
    the top-k pick is TakeOrdered (per-partition heap — never a
    global sort). All metrics are exact integer ratios rounded to
    ``decimals``, so an independent engine replays them value-exact
    (q150).

    Returns (item_a, item_b, pair_support, support_a, support_b,
    confidence_ab, confidence_ba, lift, rank) with item_a < item_b,
    ranked by (lift desc, item_a, item_b).
    """
    from pyspark.sql.window import Window

    from capex_data_pipeline_spark.cache import persisted

    if min_support < 1 or topk < 1:
        raise ValueError("min_support and topk must be >= 1")
    bi = persisted(
        baskets.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        ).distinct()
    )
    # basket total as a broadcast 1-row frame (the repo convention) —
    # NOT a driver-side .count(): the operator stays lazy, no job runs
    # until a consumer acts
    n_baskets = bi.agg(F.countDistinct("_b").alias("_nb"))
    item_sup = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("sup"))
    pairs = (
        bi.alias("x")
        .join(
            bi.alias("y"),
            (F.col("x._b") == F.col("y._b"))
            & (F.col("x._i") < F.col("y._i")),
        )
        .groupBy(
            F.col("x._i").alias("item_a"), F.col("y._i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
    scored = (
        pairs.join(
            item_sup.select(
                F.col("_i").alias("item_a"), F.col("sup").alias("support_a")
            ),
            "item_a",
        )
        .join(
            item_sup.select(
                F.col("_i").alias("item_b"), F.col("sup").alias("support_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            F.round(F.col("pair_support") / F.col("support_a"), decimals)
            .alias("confidence_ab"),
            F.round(F.col("pair_support") / F.col("support_b"), decimals)
            .alias("confidence_ba"),
            F.round(
                F.col("pair_support")
                * F.col("_nb").cast("double")
                / (F.col("support_a") * F.col("support_b")),
                decimals,
            ).alias("lift"),
        )
    )
    top = scored.orderBy(
        F.desc("lift"), F.asc("item_a"), F.asc("item_b")
    ).limit(topk)
    # rank over <= topk rows only (post-limit) — the TakeOrdered shape
    w = Window.orderBy(F.desc("lift"), F.asc("item_a"), F.asc("item_b"))
    return top.withColumn("rank", F.row_number().over(w))


def skyline2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket,
) -> DataFrame:
    """2-D skyline (pareto frontier): the rows NOT dominated under
    (minimize ``min_col``, maximize ``max_col``) — row a dominates b
    iff a.min <= b.min and a.max >= b.max with at least one strict.
    The data-selection operator behind "earliest AND largest", "short
    AND high-quality", "cheap AND fresh" curation cuts: the frontier
    is what survives when no trade-off argument can save a row.

    Scale shape — never the quadratic dominance self-join the oracle
    runs. In 2-D, a row is on the skyline iff (1) its max_col equals
    its min_col-group's maximum and (2) that maximum STRICTLY exceeds
    every maximum at smaller min_col values — a prefix-max in
    min_col order. The prefix-max distributes exactly like
    ``timeseries.global_running_sum``'s prefix sum: one hash
    aggregate onto the distinct (bucket, min_col) frame, bucket-level
    maxima cumulated driver-side into strict-predecessor offsets
    (calendar-bounded read) and broadcast back, and a window
    PARTITIONED by bucket (rows unbounded preceding .. 1 preceding)
    for the within-bucket strict prefix — no global window, no
    single-task funnel. Rows reappear only in the final
    (min, groupmax)-keyed join. Max is idempotent, so unlike the sum
    no quantization is needed — results are exact data values.

    ``bucket`` must be a RANGE coarsening of ``min_col`` (e.g.
    ``F.date_trunc('month', F.col(min_col))``) so bucket order
    refines value order. Rows with NULL in either criterion are
    excluded (no dominance semantics for unknowns).
    """
    base = df.filter(
        F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
    )
    pm = (
        base.select(
            bucket.alias("_bk"),
            F.col(min_col).alias("_m"),
            F.col(max_col).alias("_v"),
        )
        .groupBy("_bk", "_m")
        .agg(F.max("_v").alias("_gm"))
    )
    bmax = sorted(
        pm.groupBy("_bk").agg(F.max("_gm").alias("_bm")).collect(),
        key=lambda r: r["_bk"],
    )
    offsets, running = [], None
    for r in bmax:
        offsets.append((r["_bk"], running))
        running = r["_bm"] if running is None else max(running, r["_bm"])
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(
            offsets, schema=pm.select("_bk").schema.add("_off", pm.schema["_gm"].dataType)
        )
    )
    w = (
        Window.partitionBy("_bk")
        .orderBy(F.asc("_m"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.greatest(F.col("_off"), F.max("_gm").over(w))
    keep = (
        pm.join(off, ["_bk"], "left")
        .withColumn("_bf", before)
        .filter(F.col("_bf").isNull() | (F.col("_gm") > F.col("_bf")))
        .select("_m", "_gm")
    )
    return df.join(
        keep,
        (F.col(min_col) == F.col("_m")) & (F.col(max_col) == F.col("_gm")),
    ).drop("_m", "_gm")


def isotonic_calibrate(
    df: DataFrame,
    bin_col: str,
    label_col: str,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a binned
    classifier score — PAV (pool-adjacent-violators): per score bin,
    the positive rate, replaced by the isotonic fit that pools any
    bin whose raw rate dips below its predecessor. The standard
    post-hoc calibrator (Zadrozny & Elkan 2002) for "does score 0.8
    actually mean 80%?", and the q154 ROC family's sibling.

    Scale shape: ONE counting aggregate onto the bounded bin frame
    (bins are metadata — 16/32/256 cells — so the driver-side PAV
    stack walk is a sketch-sized read, the q181 histogram-walk
    convention); the fit never touches row data again. PAV pools are
    compared with INTEGER cross-products (pos_a·n_b vs pos_b·n_a),
    so pooling decisions are exact; each fitted rate is one final
    sum/sum division — meaning every output double equals the
    corresponding range average the minimax characterization
    fit_i = max_{j<=i} min_{k>=i} avg(pos, j..k) names, which is
    EXACTLY what the q193 oracle computes in SQL: two genuinely
    different algorithms (O(B) stack vs O(B^3) closed form) agreeing
    bit-for-bit certifies the pooling logic.

    NULL labels/bins are excluded. Returns one row per non-empty bin:
    (bin_col, n, n_pos, rate_raw, rate_fit), rate_fit non-decreasing.
    """
    lab = F.col(label_col).cast("long")
    base = df.filter(
        F.col(bin_col).isNotNull() & lab.isNotNull()
    ).select(F.col(bin_col).alias("_b"), lab.alias("_y"))
    bins = sorted(
        (
            base.groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_p"))
            .collect()
        ),
        key=lambda r: r["_b"],
    )
    spark = df.sparkSession
    schema = (
        base.select("_b").schema
        .add("n", "long").add("n_pos", "long")
        .add("rate_raw", "double").add("rate_fit", "double")
    )
    if not bins:
        return spark.createDataFrame([], schema)
    # PAV stack: blocks of (span, n, pos); violation compared integer-exact
    blocks: "list[list]" = []
    for r in bins:
        blocks.append([1, int(r["_n"]), int(r["_p"])])
        while len(blocks) >= 2:
            s2, n2, p2 = blocks[-1]
            s1, n1, p1 = blocks[-2]
            if p2 * n1 < p1 * n2:  # avg(last) < avg(prev): pool
                blocks[-2:] = [[s1 + s2, n1 + n2, p1 + p2]]
            else:
                break
    rows, i = [], 0
    for span, n, p in blocks:
        fit = p / n  # one correctly-rounded divide, engine-portable
        for _ in range(span):
            r = bins[i]
            rows.append(
                (
                    r["_b"], int(r["_n"]), int(r["_p"]),
                    int(r["_p"]) / int(r["_n"]), fit,
                )
            )
            i += 1
    return spark.createDataFrame(rows, schema).withColumnRenamed(
        "_b", bin_col
    )


def group_linear_trend(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line — slope, intercept,
    and r² of y over x for every group — in ONE mergeable aggregate:
    the classic sufficient-statistics form (n, Σx, Σy, Σxy, Σx², Σy²),
    which is algebraic (partials merge by +), so a 100 TB trend scan
    is one hash aggregate with map-side combine and a day-over-day
    refresh merges cells like q184. The "is this metric drifting per
    service" primitive.

    Exactness contract: x must be integral (hour, day index, version);
    y is quantized to ``cents`` decimals (the q175 integer-sum trick),
    so every sufficient statistic is an exact integer. The products
    and their sums are accumulated as DECIMAL(38,0) — NOT int64 —
    because cents-scaled y is ~1e7 for 1e5-unit values, y² is ~1e14
    per row, and an int64 Σy² silently wraps (Spark non-ANSI long
    sum) around ~9e4 such rows, while DuckDB promotes BIGINT sums to
    HUGEINT. DECIMAL(38,0) matches the HUGEINT domain (<1e38), so the
    closed forms slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) etc. divide two
    exactly-known integers — bit-identical on any engine (decimal →
    double conversion and the divide are both correctly rounded).
    r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)), computed
    with the exact integer factors cast once. Degenerate groups
    (constant x: denominator 0) return NULL slope/intercept/r²
    rather than ±inf. NULL x/y rows are excluded.

    Returns (group_col, n, slope, intercept, r2) — slope and
    intercept in original y units per x unit, rounded to
    ``decimals``.
    """
    scale = 10 ** cents
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    xi = x.cast("long")
    yi = F.round(y.cast("double") * F.lit(scale)).cast("long")
    base = df.filter(xi.isNotNull() & yi.isNotNull()).select(
        F.col(group_col).alias("_g"), xi.alias("_x"), yi.alias("_y")
    )
    xd = F.col("_x").cast("decimal(19,0)")
    yd = F.col("_y").cast("decimal(19,0)")
    g = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope_scaled = num.cast("double") / F.nullif(denx, F.lit(0)).cast("double")
    # intercept (scaled units) = (Σy − slope·Σx)/n
    intercept_scaled = (
        F.col("sy").cast("double") - slope_scaled * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = (num.cast("double") * num.cast("double")) / F.nullif(
        denx.cast("double") * deny.cast("double"), F.lit(0.0)
    )
    return g.select(
        F.col("_g").alias(group_col),
        "n",
        F.round(slope_scaled / F.lit(float(scale)), decimals).alias("slope"),
        F.round(intercept_scaled / F.lit(float(scale)), decimals).alias(
            "intercept"
        ),
        F.round(r2, decimals).alias("r2"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    decimals: int = 6,
) -> DataFrame:
    """Mutual information between two categorical columns — the
    dependence measure behind feature selection ("does priority tell
    you anything about status?") and redundancy pruning (MI ~ H means
    one column is a function of the other; see q183's FD profile for
    the exact-key version): MI = Σ_xy p(x,y)·ln(p(x,y)/(p(x)p(y))),
    with both marginal entropies and the normalized
    NMI = MI/√(H_a·H_b) riding along. NULL is a category (sentinel
    semantics — a NULL-correlated column IS informative).

    One hash aggregate on the compact (a, b) cell key + two marginal
    aggregates OVER THE CELLS (never the data again) + domain-sized
    joins; ln/× land on round(·, decimals), the q130 convention, so
    the oracle replays the arithmetic. Returns ONE row:
    (n, n_cells, mi, h_a, h_b, nmi).
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("<null>"))
    joint = df.select(a.alias("_a"), b.alias("_b")).groupBy(
        "_a", "_b"
    ).agg(F.count(F.lit(1)).alias("_n"))
    ma = joint.groupBy("_a").agg(F.sum("_n").alias("_na"))
    mb = joint.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    tot = joint.agg(F.sum("_n").alias("_tn_all"))
    cells = (
        joint.join(ma, "_a")
        .join(mb, "_b")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("_tn_all").cast("double")
    mi_term = (F.col("_n") / nd) * F.log(
        F.col("_n") * F.col("_tn_all")
        / (F.col("_na").cast("double") * F.col("_nb").cast("double"))
    )
    mi_df = cells.agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(mi_term).alias("_mi"),
    )
    ent = lambda m, nc, N: m.crossJoin(F.broadcast(tot)).agg(  # noqa: E731
        F.sum(
            -(F.col(nc) / F.col("_tn_all").cast("double"))
            * F.log(F.col(nc) / F.col("_tn_all").cast("double"))
        ).alias(N)
    )
    ha = ent(ma, "_na", "_ha")
    hb = ent(mb, "_nb", "_hb")
    return (
        mi_df.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            "n",
            "n_cells",
            F.round("_mi", decimals).alias("mi"),
            F.round("_ha", decimals).alias("h_a"),
            F.round("_hb", decimals).alias("h_b"),
            F.round(
                F.col("_mi")
                / F.nullif(
                    F.sqrt(F.col("_ha") * F.col("_hb")), F.lit(0.0)
                ),
                decimals,
            ).alias("nmi"),
        )
    )


def robust_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Median/IQR feature scaling per group — the outlier-immune
    normalizer (sklearn's RobustScaler, distributed): scaled =
    (x − median_g) / (p75_g − p25_g), where the quartiles are EXACT
    discrete-rank data values from :func:`~capex_data_pipeline_spark.
    extensions.sketches.group_exact_quantiles` (q187 machinery — no
    per-group sort, group domain = metadata). Unlike mean/std scaling
    (q83's cousin) a handful of corrupt readings cannot poison the
    scale. Groups with IQR = 0 (degenerate spread) return NULL scaled
    — the honest answer; clamp upstream if you must emit something.

    One quantile pass + one broadcast join of the groups-sized stats
    frame + a map-side transform. Returns the input columns plus
    ``scaled`` (rounded to ``decimals``).
    """
    from capex_data_pipeline_spark.extensions.sketches import (
        group_exact_quantiles,
    )

    q = group_exact_quantiles(
        df.select(F.col(group_col).alias("_g"),
                  F.col(value_col).cast("double").alias("_v")),
        "_g",
        "_v",
        ps=[0.25, 0.5, 0.75],
    )
    stats = (
        q.groupBy("_g")
        .pivot("p", [0.25, 0.5, 0.75])
        .agg(F.first("value"))
        .select(
            F.col("_g").alias("_sg"),
            F.col("`0.25`").alias("_q1"),
            F.col("`0.5`").alias("_med"),
            F.col("`0.75`").alias("_q3"),
        )
    )
    iqr = F.col("_q3") - F.col("_q1")
    return (
        df.join(
            F.broadcast(stats),
            F.col(group_col).eqNullSafe(F.col("_sg")),
        )
        .select(
            *df.columns,
            F.round(
                (F.col(value_col).cast("double") - F.col("_med"))
                / F.nullif(iqr, F.lit(0.0)),
                decimals,
            ).alias("scaled"),
        )
    )


#: Poisson(1) inverse-CDF cumulative probabilities, k = 0..7 (tail mass
#: beyond 8 is ~1.1e-9 — weight caps at 8). Module-level literals so the
#: engine and every oracle compare against IDENTICAL constants.
POISSON1_CDF = (
    0.36787944117144233,  # k=0
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def bootstrap_mean_se(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    r: int = 32,
    cents: int = 2,
    seed: str = "bs",
    decimals: int = 6,
) -> DataFrame:
    """Poisson-bootstrap standard error of the per-group mean in ONE
    pass — the streaming bootstrap (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", public): resampling with
    replacement is impossible without materializing resamples, but
    each row's multiplicity in a bootstrap replicate is ~Poisson(1),
    so ``r`` deterministic Poisson weights per row (md5 inverse-CDF —
    replayable on any engine, weight capped at 8, tail mass 1e-9)
    yield ``r`` replicate means from ONE scan + one (group, replicate)
    aggregate. The uncertainty number a mean WITHOUT a bootstrap
    cannot honestly ship.

    Exactness: values quantized to ``cents`` and summed as BIGINT, so
    every replicate mean is a ratio of exact integers; the SE over the
    r-row replicate frame uses the two-pass (join the replicate mean
    back) form — no catastrophic cancellation. The explode is a
    map-side ×r expansion feeding immediately into map-side partial
    aggregation: nothing r-times-data-sized ever shuffles.

    Returns (group_col, n, mean, boot_se, n_replicates).
    """
    from capex_data_pipeline_spark.extensions.corpus import hash_u32

    if r < 2:
        raise ValueError(f"bootstrap_mean_se: r must be >= 2: {r}")
    scale = 10 ** cents
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(key_col).cast("string").alias("_k"),
        x.alias("_x"),
    ).filter(F.col("_x").isNotNull() & F.col("_k").isNotNull())
    rep = base.select(
        "_g",
        "_x",
        "_k",
        F.explode(F.array(*[F.lit(j) for j in range(r)])).alias("_j"),
    )
    u = hash_u32(
        F.concat(F.col("_k"), F.lit("|"), F.col("_j").cast("string")),
        seed,
    ).cast("double") / F.lit(float(1 << 32))
    w = F.lit(8)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    sums = rep.groupBy("_g", "_j").agg(
        F.sum(w * F.col("_x")).alias("_sx"),
        F.sum(w).alias("_sw"),
    ).filter(F.col("_sw") > 0)
    means = sums.select(
        "_g", (F.col("_sx") / F.col("_sw").cast("double")).alias("_m")
    )
    mbar = means.groupBy("_g").agg(F.avg("_m").alias("_mb"))
    se = (
        means.join(mbar, "_g")
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("_r"),
            F.sum(
                (F.col("_m") - F.col("_mb")) * (F.col("_m") - F.col("_mb"))
            ).alias("_ssq"),
        )
        .select(
            "_g",
            "_r",
            F.sqrt(
                F.col("_ssq")
                / F.nullif(
                    (F.col("_r") - F.lit(1)).cast("double"), F.lit(0.0)
                )
            ).alias("_se"),
        )
    )
    plain = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_x").alias("_tx")
    )
    # LEFT join plain→se: a tiny group whose every replicate drew total
    # Poisson weight 0 must still emit its exact mean (boot_se NULL),
    # and a single-surviving-replicate group has no variance estimate —
    # NULL, never a 0/0 NaN.
    return plain.join(se, "_g", "left").select(
        F.col("_g").alias(group_col),
        "n",
        F.round(
            F.col("_tx") / F.col("n").cast("double") / F.lit(float(scale)),
            decimals,
        ).alias("mean"),
        F.when(
            F.col("_r") >= 2,
            F.round(F.col("_se") / F.lit(float(scale)), decimals),
        ).alias("boot_se"),
        F.coalesce(F.col("_r"), F.lit(0).cast("long")).alias(
            "n_replicates"
        ),
    )


def ab_test_report(
    df: DataFrame,
    unit_col: str,
    convert: Column,
    arms: int = 2,
    seed: str = "ab",
    decimals: int = 6,
) -> DataFrame:
    """Two-arm A/B conversion report with the two-proportion z-test:
    units are assigned to arms by the deterministic md5 hash
    (replayable, stable across runs — the q104 split convention,
    applied to experiments), per-UNIT conversion is computed first
    (any converting event converts the unit — never row-weighted),
    and the pooled two-proportion z statistic quantifies the lift.
    The analysis every experimentation platform runs; here it is two
    hash aggregates (unit-level collapse, then arm-level counts) and
    one 2-row reduction. A degenerate experiment (pooled conversion
    0 or 1 — no variance) reports NULL z_stat rather than dividing
    by zero, and an experiment where one arm drew ZERO units still
    reports BOTH arm rows (the empty arm with n_units=0 and NULL cvr,
    lift/z NULL) — a 2-row arm grid anchors the output, so a broken
    randomizer is visible instead of silently collapsing the report.

    Returns one row per arm: (arm, n_units, n_converted, cvr, lift,
    z_stat) — lift/z_stat reported on arm 1 vs arm 0 (NULL on arm 0's
    row).
    """
    from capex_data_pipeline_spark.extensions.corpus import hash_u32

    if arms != 2:
        raise ValueError("ab_test_report: exactly 2 arms supported")
    units = (
        df.filter(F.col(unit_col).isNotNull())
        .select(
            F.col(unit_col).alias("_u"),
            convert.cast("boolean").alias("_c"),
        )
        .groupBy("_u")
        .agg(F.max(F.coalesce(F.col("_c"), F.lit(False))).alias("_conv"))
        .select(
            (hash_u32(F.col("_u"), seed) % arms).cast("int").alias("arm"),
            "_conv",
        )
    )
    per_arm = units.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.when(F.col("_conv"), 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
    )
    # ONE conditional aggregate (always exactly one row, even when an
    # arm — or the whole input — is empty) replaces the two-filter
    # inner crossJoin that vanished the populated arm's row whenever
    # the other arm had no units.
    wide = per_arm.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_units"))).alias("_n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("_c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_units"))).alias("_n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("_c1"),
    )
    stats = wide.select(
        (F.col("_c1") / F.col("_n1").cast("double")
         - F.col("_c0") / F.col("_n0").cast("double")).alias("_lift"),
        (
            (F.col("_c1") / F.col("_n1").cast("double")
             - F.col("_c0") / F.col("_n0").cast("double"))
            / F.nullif(
                F.sqrt(
                    ((F.col("_c0") + F.col("_c1"))
                     / (F.col("_n0") + F.col("_n1")).cast("double"))
                    * (1 - (F.col("_c0") + F.col("_c1"))
                       / (F.col("_n0") + F.col("_n1")).cast("double"))
                    * (1 / F.col("_n0").cast("double")
                       + 1 / F.col("_n1").cast("double"))
                ),
                F.lit(0.0),
            )
        ).alias("_z"),
    )
    grid = df.sparkSession.range(arms).select(
        F.col("id").cast("int").alias("arm")
    )
    both = grid.join(F.broadcast(per_arm), "arm", "left").select(
        "arm",
        F.coalesce(F.col("n_units"), F.lit(0).cast("long")).alias(
            "n_units"
        ),
        F.coalesce(F.col("n_converted"), F.lit(0).cast("long")).alias(
            "n_converted"
        ),
    )
    return both.crossJoin(F.broadcast(stats)).select(
        "arm",
        "n_units",
        "n_converted",
        F.round(
            F.col("n_converted")
            / F.nullif(F.col("n_units").cast("double"), F.lit(0.0)),
            decimals,
        ).alias("cvr"),
        F.when(F.col("arm") == 1, F.round(F.col("_lift"), decimals)).alias(
            "lift"
        ),
        F.when(F.col("arm") == 1, F.round(F.col("_z"), decimals)).alias(
            "z_stat"
        ),
    )


def correlation_matrix(
    df: DataFrame,
    cols: "list[str]",
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Exact Pearson correlation for every column pair in ONE pass —
    the feature-redundancy screen (the numeric sibling of q211's
    categorical mutual information, built on q197's exactness
    contract): values quantize to ``cents`` decimals, every
    sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²) accumulates as
    DECIMAL(38,0) — never int64, the same overflow-proofing as
    group_linear_trend — and corr divides exactly-known integers, so
    the matrix replays bit-for-bit on any engine.

    Each row explodes into its |cols|·(|cols|−1)/2 pair cells
    (pairs are METADATA — 4 columns = 6 cells per row) feeding one
    map-side-combining hash aggregate on the compact pair key. Rows
    where either member is NULL are excluded per pair (pairwise
    deletion, pinned). Degenerate pairs (zero variance) return NULL.

    Returns one row per unordered pair: (col_a, col_b, n, corr).
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix: need at least 2 columns")
    scale = 10 ** cents
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]

    def q(c: str) -> Column:
        return F.round(F.col(c).cast("double") * F.lit(scale)).cast("long")

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("_ca"),
                        F.lit(b).alias("_cb"),
                        q(a).alias("_x"),
                        q(b).alias("_y"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("_m")
    ).select("_m._ca", "_m._cb", "_m._x", "_m._y").filter(
        F.col("_x").isNotNull() & F.col("_y").isNotNull()
    )
    xd = F.col("_x").cast("decimal(19,0)")
    yd = F.col("_y").cast("decimal(19,0)")
    g = melted.groupBy("_ca", "_cb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        F.col("_ca").alias("col_a"),
        F.col("_cb").alias("col_b"),
        "n",
        F.round(
            num.cast("double")
            / F.nullif(
                F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double")),
                F.lit(0.0),
            ),
            decimals,
        ).alias("corr"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    decimals: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the hypothesis-test sibling of :func:`mutual_information`
    (MI measures HOW dependent; chi² asks IS the dependence bigger
    than sampling noise), plus Cramér's V (the [0,1]-normalized effect
    size a planner or drift monitor can threshold). NULL is a category
    (sentinel semantics). Same cost shape as q211: one (a, b) cell
    aggregate, marginals over the CELLS, domain-sized joins; expected
    counts e = n_a·n_b/N computed per OBSERVED cell plus the
    unobserved-cell correction Σe over missing cells added in closed
    form (Σ_missing e = N − Σ_observed e — since Σ_all e = N exactly),
    so sparse contingency tables are handled without materializing
    the full grid.

    Returns ONE row: (n, n_cells, dof, chi2, cramers_v).
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("<null>"))
    joint = df.select(a.alias("_a"), b.alias("_b")).groupBy(
        "_a", "_b"
    ).agg(F.count(F.lit(1)).alias("_n"))
    ma = joint.groupBy("_a").agg(F.sum("_n").alias("_na"))
    mb = joint.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    tot = joint.agg(
        F.sum("_n").alias("_tn_all"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    ka = ma.agg(F.count(F.lit(1)).alias("_ka"))
    kb = mb.agg(F.count(F.lit(1)).alias("_kb"))
    e = (
        F.col("_na").cast("double")
        * F.col("_nb").cast("double")
        / F.col("_tn_all").cast("double")
    )
    cells = (
        joint.join(ma, "_a").join(mb, "_b").crossJoin(F.broadcast(tot))
    )
    agg = cells.agg(
        F.sum("_n").alias("n"),
        F.first("n_cells").alias("n_cells"),
        F.sum((F.col("_n") - e) * (F.col("_n") - e) / e).alias("_chi_obs"),
        F.sum(e).alias("_e_obs"),
    )
    # unobserved cells contribute (0 - e)^2/e = e each; their total is
    # N - sum(e over observed cells), exactly
    return (
        agg.crossJoin(F.broadcast(ka))
        .crossJoin(F.broadcast(kb))
        .select(
            "n",
            "n_cells",
            ((F.col("_ka") - 1) * (F.col("_kb") - 1)).cast("long").alias(
                "dof"
            ),
            F.round(
                F.col("_chi_obs")
                + (F.col("n").cast("double") - F.col("_e_obs")),
                decimals,
            ).alias("chi2"),
            F.round(
                F.sqrt(
                    (
                        F.col("_chi_obs")
                        + (F.col("n").cast("double") - F.col("_e_obs"))
                    )
                    / F.nullif(
                        F.col("n").cast("double")
                        * F.least(
                            F.col("_ka") - 1, F.col("_kb") - 1
                        ).cast("double"),
                        F.lit(0.0),
                    )
                ),
                decimals,
            ).alias("cramers_v"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 1024,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """EXACT Gini concentration coefficient WITHOUT a global sort —
    "what share of revenue sits in the top orders" as one number in
    [0, 1): G = (2·Σ i·x_(i)) / (n·Σx) − (n+1)/n over values sorted
    ascending. The unpartitioned rank window this naively needs is
    exactly what planlint bans; instead the q175 two-phase prefix
    machinery computes Σ i·x distributed: one equi-width histogram
    pass gives per-bucket (count, sum); the driver cumulates bucket
    COUNT offsets C_b (a n_buckets-sized read); Σ i·x =
    Σ_b C_b·S_b (driver, exact Python ints) + Σ_b(within-bucket
    local-rank·x) from bucket-partitioned windows — never a global
    order. Rank ties are harmless by construction: equal values land
    in one bucket and Σ rank·x over a tie block is order-invariant.

    Values quantize to ``cents`` and every accumulator is integer
    (DECIMAL(38,0) engine-side), so G divides exactly-known integers.
    Requires non-negative values (the Gini domain — a loud error
    otherwise); NULLs excluded.

    Driver-read bound: the histogram collect is ``n_buckets`` rows by
    construction; a loud guard caps ``n_buckets`` at 1,048,576 so no
    future caller can widen the driver read silently (the q187
    grouped-quantiles guard convention).

    Returns ONE row: (n, total, gini).
    """
    from pyspark.sql.window import Window

    if not 2 <= n_buckets <= 1 << 20:
        raise ValueError(
            f"gini_coefficient: n_buckets={n_buckets} outside [2, 2^20] "
            "— the histogram is a driver-sized read and stays bounded"
        )
    scale = 10 ** cents
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(x.alias("_x"))
    stats = base.agg(
        F.min("_x").alias("lo"),
        F.max("_x").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("s"),
    ).collect()[0]
    spark = df.sparkSession
    out_schema = "n bigint, total double, gini double"
    if not stats["n"]:
        return spark.createDataFrame([], out_schema)
    if int(stats["lo"]) < 0:
        raise ValueError(
            "gini_coefficient: negative values are outside the Gini "
            f"domain (min={stats['lo'] / scale})"
        )
    lo, hi = int(stats["lo"]), int(stats["hi"])
    n, s = int(stats["n"]), int(stats["s"])
    if s == 0 or hi == lo:
        # all-equal (or all-zero) values: perfect equality
        return spark.createDataFrame(
            [(n, round(s / scale, 4), 0.0)], out_schema
        )
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)),
    ).cast("int")
    hist = sorted(
        (r["_b"], int(r["_c"]), int(r["_s"]))
        for r in base.groupBy(bucket.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"), F.sum("_x").alias("_s"))
        .collect()
    )
    cross = 0  # Σ_b C_b · S_b, exact Python ints
    c_run = 0
    for _b, c, sb in hist:
        cross += c_run * sb
        c_run += c
    local = (
        base.select("_x", bucket.alias("_b"))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_b").orderBy("_x")),
        )
        .agg(
            F.sum(
                (F.col("_rn").cast("decimal(19,0)"))
                * F.col("_x").cast("decimal(19,0)")
            ).cast("decimal(38,0)").alias("_lt")
        )
        .collect()[0]
    )
    t = cross + int(local["_lt"])
    gini = round(2.0 * t / (float(n) * float(s)) - (n + 1) / float(n),
                 decimals)
    return spark.createDataFrame(
        [(n, round(s / scale, 4), gini)], out_schema
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """DAU / trailing-WAU / stickiness per calendar day — the
    engagement triple every product dashboard leads with, computed
    EXACTLY without a per-day distinct re-scan: activity collapses to
    distinct (user, day) pairs once, then each pair votes into the
    ``window_days`` trailing windows it belongs to (a bounded
    explode — x7 the DISTINCT pair frame, not the raw events) and one
    hash aggregate counts distinct users per window end. Window ends
    are clipped to OBSERVED days (no phantom rows after the data
    ends); every observed day reports, with early partial windows
    flagged by ``full_window`` rather than silently dropped.

    Returns one row per observed day: (day, dau, rolling_au,
    stickiness = dau/rolling_au, full_window).

    Memory contract: the distinct-pair frame takes ONE tracked persist
    (three consumers: dau, the window votes, and the min-day bound) —
    a long-lived driver releases it between batches via
    ``cache.release_persisted`` / ``cache.scoped_persists``, the same
    contract as every other single-persist operator here.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: {window_days}")
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    activity = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), day.alias("_d"))
        .distinct()
    )
    from capex_data_pipeline_spark.cache import persisted

    activity = persisted(activity)
    dau = activity.groupBy("_d").agg(
        F.countDistinct("_u").alias("dau")
    )
    votes = activity.select(
        "_u",
        F.explode(
            F.sequence(
                F.col("_d"),
                F.date_add(F.col("_d"), window_days - 1),
            )
        ).alias("_wend"),
    )
    # clip to observed days so trailing windows never report for days
    # after the data ends
    wau = (
        votes.join(dau.select(F.col("_d").alias("_wend")), "_wend")
        .groupBy("_wend")
        .agg(F.countDistinct("_u").alias("rolling_au"))
    )
    bounds = activity.agg(F.min("_d").alias("_d0")).collect()[0]
    d0 = bounds["_d0"]
    return (
        dau.join(wau, dau["_d"] == wau["_wend"])
        .select(
            F.col("_d").alias("day"),
            "dau",
            "rolling_au",
            F.round(
                F.col("dau") / F.col("rolling_au").cast("double"), decimals
            ).alias("stickiness"),
            (F.datediff(F.col("_d"), F.lit(d0)) >= window_days - 1).alias(
                "full_window"
            ),
        )
    )


def rolling_active_users_hll(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """:func:`rolling_active_users` for OPEN user domains — the
    mergeable form a 100 TB event stream with billions of users needs:
    instead of counting distinct users exactly per window end (correct
    when daily actives fit an aggregate), each day maintains 2^b HLL
    REGISTERS (the q153 group-HLL machinery), and a trailing window's
    active-user estimate is the per-register MAX over its
    ``window_days`` days — registers merge, so the rolling estimate
    costs days × 2^b cells, never a re-scan, and yesterday's registers
    are exactly what a persisted/streaming fold maintains
    (q184/q199's algebra; stream==batch pinned in
    tests/test_streaming.py).

    No distinct-pair collapse is needed on the register path: the max
    over raw events equals the max over distinct users by idempotence
    — one fewer shuffle than the exact form. Same engine-portable
    estimator as :func:`~capex_data_pipeline_spark.extensions.
    sketches.table_stats` (md5 52-bit hash, b low bits pick the
    register, integer bitlength rank, exact power-of-two sums).
    Window ends clip to OBSERVED days; early partial windows are
    flagged by ``full_window``, not dropped.

    Returns one row per observed day: (day, dau_est, rolling_au_est,
    full_window) — estimates carry the standard ~1.04/sqrt(2^b)
    relative error (b=6: ~13%) in HLL's operating regime (daily
    actives >> 2^b; the raw estimator has no small-range linear-
    counting correction, so at toy cardinalities it overestimates —
    use the exact :func:`rolling_active_users` there, which is also
    simply the better tool when daily actives fit an aggregate). The
    measured band at sf0.01 (max DAU err 7.3%, WAU 3.7%) is pinned in
    tests/test_round12_tasks.py.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: {window_days}")
    reg = day_user_registers(df, user_col, ts_col, b=b)
    return rolling_from_registers(
        reg, window_days=window_days, b=b, decimals=decimals
    )


def day_user_registers(
    df: DataFrame, user_col: str, ts_col: str, b: int = 6
) -> DataFrame:
    """Per-day HLL register cells over the user column — the mergeable
    state :func:`rolling_active_users_hll` consumes and a streaming /
    persisted fold maintains (cells merge day-over-day by per-register
    MAX, same algebra as q199's stats cells). Returns (_d, _b, _mr):
    one row per (day, register) with the max rank."""
    m = 1 << b
    rest_bits = 52 - b
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    h = F.conv(
        F.substring(F.md5(F.col(user_col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    base = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(day.alias("_d"), h.alias("_h"))
    rest = F.shiftright(F.col("_h"), b)
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - bitlen + 1
    )
    return (
        base.select("_d", (F.col("_h") % m).alias("_b"), rank.alias("_r"))
        .groupBy("_d", "_b")
        .agg(F.max("_r").alias("_mr"))
    )


def rolling_from_registers(
    reg: DataFrame,
    window_days: int = 7,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """Finalize :func:`day_user_registers` state into the rolling
    DAU/WAU estimate report — the read-time half of
    :func:`rolling_active_users_hll`, split out so a streamed or
    persisted register store finalizes through the IDENTICAL
    arithmetic (the stream==batch pin in tests/test_streaming.py)."""
    m = 1 << b
    days = reg.select("_d").distinct()
    votes = reg.select(
        "_b",
        "_mr",
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), window_days - 1))
        ).alias("_wend"),
    )
    wreg = (
        votes.join(days.select(F.col("_d").alias("_wend")), "_wend")
        .groupBy("_wend", "_b")
        .agg(F.max("_mr").alias("_mr"))
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    est = F.round(
        alpha
        * F.lit(float(m * m))
        / (
            F.sum(F.pow(F.lit(2.0), -F.col("_mr")))
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        ),
        decimals,
    )
    dau_est = reg.groupBy("_d").agg(est.alias("dau_est"))
    wau_est = wreg.groupBy("_wend").agg(est.alias("rolling_au_est"))
    d0 = reg.agg(F.min("_d").alias("_d0")).collect()[0]["_d0"]
    return (
        dau_est.join(wau_est, dau_est["_d"] == wau_est["_wend"])
        .select(
            F.col("_d").alias("day"),
            "dau_est",
            "rolling_au_est",
            (F.datediff(F.col("_d"), F.lit(d0)) >= window_days - 1).alias(
                "full_window"
            ),
        )
    )


def _value_prefix_counts(
    pv: DataFrame, n_buckets: int = 1024
) -> DataFrame:
    """Shared two-phase EXACT global prefix over a per-distinct-value
    count frame (_x, _na, _nb) WITHOUT a global sort — the q175/q225
    machinery: equi-width buckets over [min, max], driver-cumulated
    bucket offsets (an n_buckets-bounded read), bucket-partitioned
    windows for the within-bucket prefix. Returns the input plus
    ``_cum_below`` = Σ counts of strictly smaller values (exact
    BIGINT). Rank ties are impossible by construction (one row per
    distinct value)."""
    from pyspark.sql.window import Window

    if not 2 <= n_buckets <= 1 << 20:
        raise ValueError(
            f"_value_prefix_counts: n_buckets={n_buckets} outside "
            "[2, 2^20] — the offsets read is driver-sized and stays "
            "bounded"
        )
    t = (F.col("_na") + F.col("_nb")).alias("_t")
    stats = pv.agg(
        F.min("_x").alias("lo"), F.max("_x").alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        return pv.withColumn("_cum_below", F.lit(0).cast("long"))
    if hi == lo:
        return pv.withColumn("_cum_below", F.lit(0).cast("long"))
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)),
    ).cast("int")
    withb = pv.withColumn("_bk", bucket)
    hist = sorted(
        (r["_bk"], int(r["_c"]))
        for r in withb.groupBy("_bk")
        .agg(F.sum(F.col("_na") + F.col("_nb")).alias("_c"))
        .collect()
    )
    offsets, cum = [], 0
    for bk, c in hist:
        offsets.append((bk, cum))
        cum += c
    spark = pv.sparkSession
    off = spark.createDataFrame(offsets, "_bk int, _off long")
    w = (
        Window.partitionBy("_bk")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        withb.join(F.broadcast(off), "_bk")
        .withColumn("_run", F.sum(F.col("_na") + F.col("_nb")).over(w))
        .select(
            "_x",
            "_na",
            "_nb",
            (
                F.col("_off")
                + F.col("_run")
                - (F.col("_na") + F.col("_nb"))
            ).alias("_cum_below"),
        )
    )


def _two_group_value_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    cents: int,
) -> DataFrame:
    x = F.round(
        F.col(value_col).cast("double") * F.lit(10 ** cents)
    ).cast("long")
    return (
        df.filter(
            F.col(group_col).isin([group_a, group_b])
            & F.col(value_col).isNotNull()
        )
        .select(
            x.alias("_x"),
            F.when(F.col(group_col) == F.lit(group_a), 1)
            .otherwise(0)
            .alias("_ia"),
        )
        .groupBy("_x")
        .agg(
            F.sum("_ia").cast("long").alias("_na"),
            F.sum(1 - F.col("_ia")).cast("long").alias("_nb"),
        )
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    cents: int = 2,
    n_buckets: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """EXACT Mann-Whitney U rank-sum test between two groups WITHOUT a
    global sort — "did the distribution shift" when nothing is normal
    enough for q221's z-test: the nonparametric workhorse, computed
    distributed. Values quantize to ``cents``; ranks come from the
    per-distinct-value count frame + the exact two-phase prefix
    (:func:`_value_prefix_counts` — bucket offsets cumulated on the
    driver, within-bucket windows), tie MIDRANKS handled in integer
    arithmetic: 2·R_A = Σ_v na_v·(2·cum_below_v + t_v + 1), all
    DECIMAL(38,0), so U is a ratio of exactly-known integers. The
    z statistic applies the standard tie-corrected variance
    na·nb/12·((n+1) − Σ(t³−t)/(n(n−1))) in double at the very end.

    Returns ONE row: (n_a, n_b, u_stat, z_stat) — u_stat is U for
    ``group_a``; z NULL when a group is empty or variance is 0.
    """
    pv = _two_group_value_counts(
        df, group_col, value_col, group_a, group_b, cents
    )
    pre = _value_prefix_counts(pv, n_buckets)
    dec = "decimal(38,0)"
    t = (F.col("_na") + F.col("_nb")).cast(dec)
    r2_term = F.col("_na").cast(dec) * (
        F.lit(2).cast(dec) * F.col("_cum_below").cast(dec)
        + t
        + F.lit(1).cast(dec)
    )
    ties = t * t * t - t
    agg = pre.agg(
        F.sum("_na").cast("long").alias("n_a"),
        F.sum("_nb").cast("long").alias("n_b"),
        F.sum(r2_term).alias("_r2"),
        F.sum(ties).alias("_ties"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u = (
        F.col("_r2").cast("double") - na * (na + F.lit(1.0))
    ) / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * (
            (n + F.lit(1.0))
            - F.col("_ties").cast("double")
            / F.nullif(n * (n - F.lit(1.0)), F.lit(0.0))
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(u, decimals).alias("u_stat"),
        F.round(
            (u - na * nb / F.lit(2.0))
            / F.nullif(F.sqrt(var), F.lit(0.0)),
            decimals,
        ).alias("z_stat"),
    )


def ks_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    cents: int = 2,
    n_buckets: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic WITHOUT a global
    sort: D = max_v |F_A(v) − F_B(v)| over the distinct quantized
    values, computed as an INTEGER maximization
    max |cumA_incl·n_b − cumB_incl·n_a| (cross-multiplied, so no
    float CDF ever compares) over the same two-phase prefix frame as
    :func:`mann_whitney_u` — the distribution-drift number q96's PSI
    approximates, exact. One division at the end.

    Returns ONE row: (n_a, n_b, ks_stat).
    """
    from pyspark.sql.window import Window

    pv = _two_group_value_counts(
        df, group_col, value_col, group_a, group_b, cents
    )
    if not 2 <= n_buckets <= 1 << 20:
        raise ValueError(
            f"ks_2samp: n_buckets={n_buckets} outside [2, 2^20]"
        )
    # per-group exact prefixes ride the SAME machinery: cum of the
    # combined frame splits into per-group runs by summing each side
    stats = pv.agg(
        F.min("_x").alias("lo"), F.max("_x").alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    spark = df.sparkSession
    out_schema = "n_a bigint, n_b bigint, ks_stat double"
    if lo is None:
        return spark.createDataFrame([], out_schema)
    if hi == lo:
        one = pv.agg(
            F.sum("_na").cast("long").alias("n_a"),
            F.sum("_nb").cast("long").alias("n_b"),
        )
        return one.select("n_a", "n_b", F.lit(0.0).alias("ks_stat"))
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)),
    ).cast("int")
    withb = pv.withColumn("_bk", bucket)
    hist = sorted(
        (r["_bk"], int(r["_ca"]), int(r["_cb"]))
        for r in withb.groupBy("_bk")
        .agg(
            F.sum("_na").alias("_ca"),
            F.sum("_nb").alias("_cb"),
        )
        .collect()
    )
    offs, ca, cb = [], 0, 0
    for bk, a, b in hist:
        offs.append((bk, ca, cb))
        ca += a
        cb += b
    off = spark.createDataFrame(offs, "_bk int, _offa long, _offb long")
    w = (
        Window.partitionBy("_bk")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(38,0)"
    cells = (
        withb.join(F.broadcast(off), "_bk")
        .withColumn("_runa", F.sum("_na").over(w))
        .withColumn("_runb", F.sum("_nb").over(w))
        .select(
            (F.col("_offa") + F.col("_runa")).cast(dec).alias("_cuma"),
            (F.col("_offb") + F.col("_runb")).cast(dec).alias("_cumb"),
        )
    )
    na, nb = ca, cb
    gap = F.abs(
        F.col("_cuma") * F.lit(nb).cast(dec)
        - F.col("_cumb") * F.lit(na).cast(dec)
    )
    agg = cells.agg(F.max(gap).alias("_d"))
    return agg.select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.round(
            F.col("_d").cast("double")
            / F.lit(float(na) * float(nb) if na and nb else None),
            decimals,
        ).alias("ks_stat"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic across groups — "do the group means
    differ more than noise explains", the k-group generalization of
    q221's two-arm z. ONE pass of integer sufficient statistics per
    group (n_g, Σx, Σx² in cents as DECIMAL(38,0) — the q197/q223
    convention), then the decomposition SSB = Σ S_g²/n_g − S²/n,
    SSW = Q − Σ S_g²/n_g.

    Sufficient statistics stay exact integers (DECIMAL(38,0)); the
    per-group S_g²/n_g terms and the F ratio are computed in DOUBLE
    with the SAME expression order as the oracle (the q211 precedent
    — the |groups|-term double sum varies only at the ~1e-15 relative
    level, far inside the round-to-6 output contract), with the fold
    over a group-domain-BOUNDED sorted array for one deterministic
    summation order.

    Returns ONE row: (k_groups, n, eta_sq, f_stat) — eta² =
    SSB/(SSB+SSW), the effect size in [0, 1]; both ratios are
    scale-free (round-6-stable at any data magnitude — raw SS values
    at ~1e10 sit below double's absolute 6-decimal resolution, so
    they are deliberately NOT emitted), with df1 = k−1, df2 = n−k;
    f_stat NULL when k < 2, n <= k, or SSW is 0.
    """
    dec = "decimal(38,0)"
    scale = 10 ** cents
    x = F.round(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    per_g = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(F.col(group_col).alias("_g"), x.alias("_x"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_x").cast(dec).alias("_s"),
            F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).alias(
                "_q"
            ),
        )
    )
    # one deterministic fold order for the double term sum: the
    # group-domain-bounded (g, s, n) structs sort, then fold in that
    # order (the behavior_entropy pattern)
    agg = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("_n").cast("long").alias("n"),
        F.sum("_s").alias("_st"),
        F.sum("_q").alias("_qt"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_g").cast("string").alias("g"),
                        F.col("_s").cast("double").alias("s"),
                        F.col("_n").cast("double").alias("cn"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["s"] * r["s"] / r["cn"],
        ).alias("_a"),
    )
    sc2 = F.lit(float(scale * scale))
    k = F.col("k_groups").cast("double")
    n = F.col("n").cast("double")
    ssb = (
        F.col("_a")
        - F.col("_st").cast("double") * F.col("_st").cast("double") / n
    ) / sc2
    ssw = (F.col("_qt").cast("double") - F.col("_a")) / sc2
    fstat = (ssb / (k - F.lit(1.0))) / F.nullif(
        ssw / (n - k), F.lit(0.0)
    )
    return agg.select(
        "k_groups",
        "n",
        F.round(
            ssb / F.nullif(ssb + ssw, F.lit(0.0)), decimals
        ).alias("eta_sq"),
        F.round(
            F.when((k >= 2) & (n > k), fstat), decimals
        ).alias("f_stat"),
    )


def behavior_entropy(
    df: DataFrame,
    user_col: str,
    type_col: str,
    decimals: int = 6,
    min_events: int = 1,
) -> DataFrame:
    """Per-user behavioral (Shannon) entropy over the event-type
    distribution — the "is this account a bot" feature: one dominant
    action → entropy near 0, uniform mixing → ln(k). Computed from
    per-(user, type) counts via H = ln(n) − (Σ c·ln c)/n — one
    compact-key aggregate then one per-user aggregate; the Σ c·ln c
    fold runs over a type-domain-BOUNDED sorted array (collect_list
    of the per-type counts, array_sort, F.aggregate) so the float sum
    has ONE deterministic order on every engine and partitioning.

    Returns (user_col, n_events, n_types, entropy) for users with
    >= ``min_events`` events; entropy rounded to ``decimals``.
    """
    per = (
        df.filter(
            F.col(user_col).isNotNull() & F.col(type_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("_u"), F.col(type_col).alias("_t"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    folded = per.groupBy("_u").agg(
        F.sum("_c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.aggregate(
            F.array_sort(F.collect_list(F.col("_c").cast("double"))),
            F.lit(0.0),
            lambda acc, c: acc + c * F.log(c),
        ).alias("_clc"),
    )
    return (
        folded.filter(F.col("n_events") >= min_events)
        .select(
            F.col("_u").alias(user_col),
            "n_events",
            "n_types",
            F.round(
                F.log(F.col("n_events").cast("double"))
                - F.col("_clc") / F.col("n_events").cast("double"),
                decimals,
            ).alias("entropy"),
        )
    )
