"""Data-layout operators: multi-dimensional (Z-order / Morton)
clustering for scan locality.

At 100 TB the scan cost of a selective query is decided by FILE
PRUNING: parquet/Delta readers skip whole files whose min/max column
stats exclude the predicate. A table range-partitioned on ONE column
prunes perfectly on that column and not at all on any other; Z-order
interleaves the bits of several columns into one sort key so that
files stay "rectangular" in ALL the interleaved dimensions — every
z-ordered column gets useful min/max pruning (the public Delta Lake
``OPTIMIZE ZORDER BY`` / Databricks liquid-clustering idea; the
z-curve itself is Morton 1966).

Engine-portable by construction: each column min-max-scales to a
``bits``-bit integer (the 1-row stats frame broadcasts — the q105
histogram pattern, never a second scan) and the interleave is pure
integer shift/mask arithmetic, so an independent SQL engine replays
z-values bit-for-bit (q149's oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_int(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale to the integer grid [0, 2^bits): NULL -> 0
    (documented: nulls cluster at the origin), constant columns -> 0
    (span guard), x == max -> 2^bits - 1 (clamped)."""
    top = (1 << bits) - 1
    span = F.when(cmax > cmin, cmax - cmin).otherwise(F.lit(1.0))
    v = F.floor(
        (col.cast("double") - cmin) / span * F.lit(float(top))
    ).cast("long")
    # coalesce FIRST: Spark's least/greatest skip NULL arguments (a
    # NULL input would otherwise clamp to top, not to the origin)
    return F.greatest(
        F.lit(0), F.least(F.coalesce(v, F.lit(0)), F.lit(top))
    )


def _interleave(ints: "list[Column]", bits: int) -> Column:
    """Morton interleave: output bit b*n+i = bit b of column i. All
    bits land below position bits*n <= 60, so the sum of disjoint
    powers of two is overflow-safe in ANSI mode (it IS the bitwise
    OR)."""
    n = len(ints)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(ints):
            z = z + F.shiftleft(
                F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)).cast("long"),
                b * n + i,
            )
    return z


def zorder_values(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 16,
    out_col: str = "zvalue",
) -> DataFrame:
    """Append the Z-order (Morton) key over ``cols``: one stats
    aggregate (1-row broadcast) + one map-only projection. ``bits``
    grid resolution per dimension; ``bits * len(cols)`` must stay
    <= 60 (BIGINT-safe, the engine-wide convention).
    """
    if not cols or len(cols) < 1:
        raise ValueError("zorder_values: cols must be non-empty")
    if bits < 1 or bits * len(cols) > 60:
        raise ValueError(
            f"zorder_values: bits * n_cols must be in [1, 60], got "
            f"{bits} * {len(cols)}"
        )
    stats = df.agg(
        *[
            f(F.col(c).cast("double")).alias(f"_{nm}_{c}")
            for c in cols
            for nm, f in (("min", F.min), ("max", F.max))
        ]
    )
    scaled = [
        _scaled_int(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, _interleave(scaled, bits))
        .drop(*[f"_{nm}_{c}" for c in cols for nm in ("min", "max")])
    )


def zorder_repartition(
    df: DataFrame,
    cols: "list[str]",
    n_partitions: int,
    bits: int = 16,
    keep_key: bool = False,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional scan locality: compute the
    Z-order key, range-repartition on it (ONE shuffle — the write-once
    cost every later pruned scan amortizes, same economics as
    bucketing), and sort within partitions so downstream file writes
    get tight per-file min/max stats on EVERY z-ordered column.

    The locality claim is measurable, not aspirational: on clustered
    data, per-partition bounding boxes shrink in ALL dimensions vs a
    single-column sort (asserted quantitatively in
    tests/test_layout.py).
    """
    z = zorder_values(df, cols, bits=bits)
    out = z.repartitionByRange(n_partitions, "zvalue").sortWithinPartitions(
        "zvalue"
    )
    return out if keep_key else out.drop("zvalue")


def rendezvous_shards(
    df: DataFrame,
    key: Column,
    n_shards: int = 16,
    n_shards_after: "int | None" = None,
    decimals: int = 6,
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard routing with a
    reshard-stability report — Thaler & Ravishankar 1998, the public
    consistent-routing algorithm: a key routes to the shard s
    maximizing hash(s|key), so when the fleet grows from n to n+1
    shards only the keys the NEW shard wins move (≈ 1/(n+1) of them),
    while mod-routing would reshuffle nearly everything. That
    stability is what keeps caches, stateful services, and bucketed
    storage warm through a resize — the report quantifies it instead
    of asserting it.

    Scale shape: the argmax is an explode of the key frame ×
    ``n_shards`` candidate weights (compact (key, shard, weight)
    rows) + one max-struct aggregate per key — map-side partials,
    no window, no sort; the per-shard rollup is an
    ``n_shards``-group aggregate. md5 weights, so an independent
    engine reproduces every routing decision bit-for-bit.

    Returns one row per BEFORE-shard: (shard, n_keys, share,
    n_moved, moved_frac) where n_moved counts the shard's keys that
    route elsewhere under ``n_shards_after`` (default n_shards + 1).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    after = n_shards_after if n_shards_after is not None else n_shards + 1
    if after < 1:
        raise ValueError(f"n_shards_after must be >= 1: {after}")

    keys = df.select(key.cast("string").alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct()
    m = max(n_shards, after)
    cand = keys.select(
        "_k",
        F.explode(
            F.array(*[F.lit(s) for s in range(m)])
        ).alias("_s"),
    ).select(
        "_k",
        "_s",
        F.md5(
            F.concat(F.col("_s").cast("string"), F.lit("|"), F.col("_k"))
        ).alias("_w"),
    )

    def argmax(limit: int, out: str) -> DataFrame:
        return (
            cand.filter(F.col("_s") < limit)
            .groupBy("_k")
            .agg(F.max(F.struct(F.col("_w"), F.col("_s"))).alias("_m"))
            .select("_k", F.col("_m._s").alias(out))
        )

    from capex_data_pipeline_spark.cache import persisted

    routed = persisted(
        argmax(n_shards, "shard").join(argmax(after, "shard_after"), "_k")
    )
    # key total as a broadcast 1-row frame (the lazy-build convention —
    # no driver action until a consumer acts)
    total = routed.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        routed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(
                F.when(F.col("shard") != F.col("shard_after"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_keys",
            F.round(
                F.col("n_keys") / F.col("_tot").cast("double"), decimals
            ).alias("share"),
            "n_moved",
            F.round(
                F.col("n_moved") / F.col("n_keys").cast("double"), decimals
            ).alias("moved_frac"),
        )
    )


def rendezvous_shards_weighted(
    df: DataFrame,
    key: Column,
    weights: "list[float]",
    weights_after: "list[float]",
    decimals: int = 6,
) -> DataFrame:
    """Capacity-weighted rendezvous routing + a fleet-change report —
    the production form of :func:`rendezvous_shards` (real fleets are
    never homogeneous, and shards get REMOVED, not just added). A key
    routes to the live shard maximizing the standard weighted-HRW
    score (Thaler & Ravishankar 1998 §4 / the logarithmic-score
    method): ``score(s, k) = -w_s / ln(u)`` with
    ``u = (h52 + 0.5) / 2^52`` from the 52-bit md5 prefix of
    ``s|key`` — u is uniform in (0,1), so a shard's win probability
    is proportional to its weight (share_s ≈ w_s / Σw), and because
    each shard's score depends only on ITS OWN hash, any fleet change
    leaves every surviving shard's score untouched: on removal, ONLY
    the removed shard's keys move (each to its second choice); on a
    weight increase, only keys the upweighted shard newly wins move.

    ``weights``/``weights_after`` are per-shard capacities (index =
    shard id); a weight of 0 marks the shard absent/removed. Scores
    round to ``decimals`` before the argmax (the repo's argmin/argmax
    quantization convention) and ties break by HIGHER shard id,
    matching an oracle's ``ORDER BY score DESC, s DESC``.

    Same scale shape as the unweighted form: explode keys × live
    shards into compact (key, shard, score) rows, one max-struct
    aggregate per key, an n_shards-group rollup — no window, no sort.

    Returns one row per BEFORE-shard: (shard, weight, n_keys, share,
    n_moved, moved_frac).
    """
    if not weights or any(w < 0 for w in weights):
        raise ValueError(f"weights must be non-empty and >= 0: {weights}")
    if not weights_after or any(w < 0 for w in weights_after):
        raise ValueError(
            f"weights_after must be non-empty and >= 0: {weights_after}"
        )
    if not any(w > 0 for w in weights) or not any(
        w > 0 for w in weights_after
    ):
        raise ValueError("at least one shard must have weight > 0")

    keys = (
        df.select(key.cast("string").alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
    )
    m = max(len(weights), len(weights_after))
    w_b = F.array(*[F.lit(float(w)) for w in weights])
    w_a = F.array(*[F.lit(float(w)) for w in weights_after])
    h52 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("_s").cast("string"), F.lit("|"), F.col("_k"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h52.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    cand = keys.select(
        "_k",
        F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("_s"),
    ).select(
        "_k",
        "_s",
        F.round(-F.lit(1.0) / F.log(u), decimals).alias("_inv"),
        F.when(F.col("_s") < len(weights), w_b[F.col("_s")])
        .otherwise(F.lit(0.0))
        .alias("_wb"),
        F.when(F.col("_s") < len(weights_after), w_a[F.col("_s")])
        .otherwise(F.lit(0.0))
        .alias("_wa"),
    )

    def argmax(weight_col: str, out: str) -> DataFrame:
        return (
            cand.filter(F.col(weight_col) > 0)
            .select(
                "_k",
                "_s",
                F.round(F.col(weight_col) * F.col("_inv"), decimals).alias(
                    "_score"
                ),
            )
            .groupBy("_k")
            .agg(F.max(F.struct(F.col("_score"), F.col("_s"))).alias("_m"))
            .select("_k", F.col("_m._s").alias(out))
        )

    from capex_data_pipeline_spark.cache import persisted

    routed = persisted(
        argmax("_wb", "shard").join(argmax("_wa", "shard_after"), "_k")
    )
    total = routed.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        routed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(
                F.when(F.col("shard") != F.col("shard_after"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            F.round(w_b[F.col("shard")], decimals).alias("weight"),
            "n_keys",
            F.round(
                F.col("n_keys") / F.col("_tot").cast("double"), decimals
            ).alias("share"),
            "n_moved",
            F.round(
                F.col("n_moved") / F.col("n_keys").cast("double"), decimals
            ).alias("moved_frac"),
        )
    )


def zonemap_skip_report(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    layout_key: Column,
    layout_name: str,
    pred_a: "tuple[float, float]",
    pred_b: "tuple[float, float]",
    n_buckets: int = 64,
    decimals: int = 6,
) -> DataFrame:
    """Zone-map (file-statistics) skipping report for a LAYOUT — the
    number that justifies paying for Z-order/sorting at all: lay the
    table out in ``n_buckets`` equal-width ranges of ``layout_key``
    (each bucket standing in for a parquet file / Delta data file),
    record per-bucket min/max "file stats" for the two predicate
    dimensions, and count how many buckets — and rows — a 2-D box
    predicate ``pred_a × pred_b`` can PROVE irrelevant without
    reading them (skip iff the bucket's [min,max] on EITHER dimension
    misses the box). This is the mechanism engines actually use
    (parquet row-group stats, Delta/Iceberg file pruning); run it for
    several candidate layouts and the skip fractions are the measured
    layout comparison q149's docstring argues qualitatively.

    Plan shape: one 1-row key-stats aggregate (broadcast), one
    map-only bucket assignment, ONE hash aggregate onto
    ``n_buckets`` zone-map cells, and an n_buckets-row summary —
    nothing scales with table width, and at 100 TB this is exactly
    the metadata a table format maintains for free.

    Returns ONE row: (layout, n_buckets, n_skipped_buckets,
    rows_total, rows_skipped, skip_frac, rows_matching) —
    ``rows_matching`` (true predicate hits) rides along to show
    skipping is sound: hits only ever live in unskipped buckets.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    lo_a, hi_a = pred_a
    lo_b, hi_b = pred_b
    k = layout_key.cast("double")
    base = df.select(
        F.col(dim_a).cast("double").alias("_a"),
        F.col(dim_b).cast("double").alias("_b"),
        k.alias("_k"),
    )
    stats = base.agg(
        F.min("_k").alias("_kmin"), F.max("_k").alias("_kmax")
    )
    span = F.when(
        F.col("_kmax") > F.col("_kmin"), F.col("_kmax") - F.col("_kmin")
    ).otherwise(F.lit(1.0))
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("_k") - F.col("_kmin")) / span * n_buckets).cast(
                "int"
            ),
        ),
    )
    hit = (
        (F.col("_a") >= lo_a)
        & (F.col("_a") <= hi_a)
        & (F.col("_b") >= lo_b)
        & (F.col("_b") <= hi_b)
    )
    zones = (
        base.crossJoin(F.broadcast(stats))
        .select(bucket.alias("_bk"), "_a", "_b", hit.cast("long").alias("_h"))
        .groupBy("_bk")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("_a").alias("_mina"),
            F.max("_a").alias("_maxa"),
            F.min("_b").alias("_minb"),
            F.max("_b").alias("_maxb"),
            F.sum("_h").alias("_hits"),
        )
    )
    skippable = (
        (F.col("_maxa") < lo_a)
        | (F.col("_mina") > hi_a)
        | (F.col("_maxb") < lo_b)
        | (F.col("_minb") > hi_b)
    )
    return zones.agg(
        F.lit(layout_name).alias("layout"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(skippable.cast("long")).alias("n_skipped_buckets"),
        F.sum("_n").alias("rows_total"),
        F.sum(F.when(skippable, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_skipped"),
        F.round(
            F.sum(F.when(skippable, F.col("_n")).otherwise(0))
            / F.sum("_n").cast("double"),
            decimals,
        ).alias("skip_frac"),
        F.sum("_hits").cast("long").alias("rows_matching"),
    )
