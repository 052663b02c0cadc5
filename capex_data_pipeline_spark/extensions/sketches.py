"""Probabilistic sketches with engine-portable determinism: count-min
frequency estimation and HyperLogLog cardinality estimation.

Together with `corpus.bloom_contamination` these complete the
constant-memory sketch toolkit a 100 TB pipeline leans on: membership
(Bloom), frequency (CMS), and cardinality (HLL) — each summarizing an
unbounded stream/corpus into a FIXED-size state that fits a broadcast
or a driver, with one-pass map-side updates and compact-key
aggregates.

Every hash here is md5-derived (the repo convention), so an
independent SQL engine reproduces the sketch — including its
collision/estimation errors — bit-for-bit; the HLL register sums are
exact powers of two whose partial sums never round (exponent spread +
count < 53 bits), so even the float arithmetic is order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_mod(prefix: Column, s: Column, m: int) -> Column:
    """60-bit md5 prefix of (prefix|s) mod m — the shared position
    hash (`corpus.bloom_contamination` uses the same shape)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(prefix, F.lit("|"), s)), 1, 15),
            16,
            10,
        ).cast("long")
        % m
    )


def cms_top_frequencies(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 3,
    width: int = 1024,
    topk: int = 20,
) -> DataFrame:
    """Count-min sketch over the corpus word stream, read back for the
    ``topk`` true-heaviest words: every token increments ``depth``
    counters (row j at column md5(j|word) mod ``width``), and a word's
    estimate is the MIN of its ``depth`` counters. The one-sided CMS
    guarantee — est ≥ true always, est ≤ true + εN w.h.p. — surfaces
    directly in the output as ``overestimate``.

    Scale shape: the sketch state is depth×width counters TOTAL
    (3 KiB-ish) regardless of corpus size — ONE hash aggregate whose
    map-side partials collapse onto those cells, so almost nothing
    crosses the wire; the candidate read-back joins ``topk × depth``
    rows against the cell frame. (The candidate list comes from the
    exact vocab frame here — batch context; a streaming deployment
    keeps a heavy-hitter heap beside the sketch instead.)

    Returns (word, true_count, est_count, overestimate).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1: {depth}/{width}")
    from capex_data_pipeline_spark.cache import persisted
    from capex_data_pipeline_spark.extensions.dedup import normalized_text

    words = persisted(
        df.select(
            F.explode(
                F.filter(
                    F.split(normalized_text(F.col(text_col)), " "),
                    lambda w: w != "",
                )
            ).alias("_w")
        )
    )
    rows = F.array(*[F.lit(str(j)) for j in range(depth)])
    cells = (
        words.select(
            F.explode(rows).alias("_j"),
            F.col("_w"),
        )
        .select("_j", _md5_mod(F.col("_j"), F.col("_w"), width).alias("_p"))
        .groupBy("_j", "_p")
        .agg(F.count(F.lit(1)).alias("_cell"))
    )
    vocab = words.groupBy("_w").agg(F.count(F.lit(1)).alias("true_count"))
    # top-k candidate pick as TakeOrderedAndProject (per-partition heap
    # + driver merge), NOT a global row_number over the full vocabulary
    cand = vocab.orderBy(F.desc("true_count"), F.asc("_w")).limit(topk)
    probes = cand.select(
        "_w", "true_count", F.explode(rows).alias("_j")
    ).select(
        "_w",
        "true_count",
        "_j",
        _md5_mod(F.col("_j"), F.col("_w"), width).alias("_p"),
    )
    return (
        probes.join(F.broadcast(cells), ["_j", "_p"])
        .groupBy("_w", "true_count")
        .agg(F.min("_cell").alias("est_count"))
        .select(
            F.col("_w").alias("word"),
            "true_count",
            "est_count",
            (F.col("est_count") - F.col("true_count")).alias(
                "overestimate"
            ),
        )
    )


def hll_cardinality(
    df: DataFrame,
    key: Column,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """Raw HyperLogLog cardinality estimate (Flajolet et al. 2007,
    without the small/large-range corrections — the estimator itself,
    stated plainly) next to the exact distinct count: each key hashes
    to a 52-bit md5 value; the low ``b`` bits pick one of m = 2^b
    registers and the register keeps the maximum rank (leading-zero
    count + 1) of the remaining 52-b bits; the estimate is
    α_m · m² / Σ 2^(-register).

    Engine-portability: rank extraction is pure INTEGER logic (binary
    string length — no float log2 at the boundary), the register sum
    adds exact powers of two whose partial sums never round, and α_m
    is spelled as the same literal formula both engines fold — so the
    estimate, error and all, reproduces bit-for-bit in SQL.

    Scale shape: the sketch is m registers TOTAL — one hash aggregate
    onto m cells (map-side partial max), one m-row finalize. The
    exact count rides along for the error report (at 100 TB you'd
    drop it — that's the point of the sketch).

    Returns one row: (n_exact, n_estimated, rel_error).
    """
    if not 1 <= b <= 16:
        raise ValueError(f"b must be in [1, 16], got {b}")
    m = 1 << b
    rest_bits = 52 - b
    k = F.coalesce(key.cast("string"), F.lit("<null>"))
    h = F.conv(F.substring(F.md5(k), 1, 13), 16, 10).cast("long")
    bucket = h % m
    rest = F.shiftright(h, b)  # exact integer shift, no float detour
    # rank = leading zeros of rest in rest_bits + 1; integer logic via
    # binary-string length (bitlen), never float log2
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - bitlen + 1
    )
    regs = (
        df.select(bucket.alias("_b"), rank.alias("_r"))
        .groupBy("_b")
        .agg(F.max("_r").alias("_mr"))
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    est = (
        alpha
        * F.lit(float(m * m))
        / (
            F.sum(F.pow(F.lit(2.0), -F.col("_mr")))
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        )
    )
    exact = df.select(F.countDistinct(k).alias("n_exact"))
    summary = regs.agg(F.round(est, decimals).alias("n_estimated"))
    return exact.crossJoin(summary).select(
        "n_exact",
        "n_estimated",
        F.round(
            F.abs(F.col("n_estimated") - F.col("n_exact"))
            / F.nullif(F.col("n_exact").cast("double"), F.lit(0.0)),
            decimals,
        ).alias("rel_error"),
    )


def hll_cardinality_by(
    df: DataFrame,
    group_col: str,
    key: Column,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimates — the sketch
    answer to the shuffle-heavy ``COUNT(DISTINCT key) GROUP BY group``
    (distinct users per event type, distinct domains per source, ...):
    the exact form shuffles every (group, key) pair; this shuffles at
    most ``groups × m`` register cells with map-side partial max, a
    FIXED ceiling per group regardless of key cardinality.

    Same engine-portable estimator as :func:`hll_cardinality`
    (md5-derived 52-bit hash, integer binary-string rank, exact
    power-of-two register sums, literal α_m) — the oracle replays
    estimates bit-for-bit per group. The exact count rides along per
    group for the error report (drop it at 100 TB — it is the cost
    the sketch removes).

    Returns (group_col, n_exact, n_estimated, rel_error), one row per
    group (NULL groups form their own row).
    """
    if not 1 <= b <= 16:
        raise ValueError(f"b must be in [1, 16], got {b}")
    m = 1 << b
    rest_bits = 52 - b
    k = F.coalesce(key.cast("string"), F.lit("<null>"))
    h = F.conv(F.substring(F.md5(k), 1, 13), 16, 10).cast("long")
    rest = F.shiftright(h, b)
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - bitlen + 1
    )
    regs = (
        df.select(F.col(group_col).alias("_g"), (h % m).alias("_b"), rank.alias("_r"))
        .groupBy("_g", "_b")
        .agg(F.max("_r").alias("_mr"))
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    est = (
        alpha
        * F.lit(float(m * m))
        / (
            F.sum(F.pow(F.lit(2.0), -F.col("_mr")))
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        )
    )
    summary = regs.groupBy("_g").agg(F.round(est, decimals).alias("n_estimated"))
    exact = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.countDistinct(k).alias("n_exact")
    )
    # null-safe join key: a NULL group forms its own row (both sides
    # aggregate it into one NULL group; a plain inner join would drop it)
    return exact.join(
        summary, exact["_g"].eqNullSafe(summary["_g"])
    ).select(
        exact["_g"].alias(group_col),
        "n_exact",
        "n_estimated",
        F.round(
            F.abs(F.col("n_estimated") - F.col("n_exact"))
            / F.nullif(F.col("n_exact").cast("double"), F.lit(0.0)),
            decimals,
        ).alias("rel_error"),
    )


def _cms_cells(
    df: DataFrame, key: Column, side: str, depth: int, width: int
) -> DataFrame:
    """Collapse one join side onto its depth×width CMS cells: ONE hash
    aggregate (map-side partials) over the key column."""
    rows = F.array(*[F.lit(str(j)) for j in range(depth)])
    return (
        df.select(key.cast("string").alias("_k"))
        .filter(F.col("_k").isNotNull())
        .select(F.explode(rows).alias("_j"), "_k")
        .select("_j", _md5_mod(F.col("_j"), F.col("_k"), width).alias("_p"))
        .groupBy("_j", "_p")
        .agg(F.count(F.lit(1)).alias(f"c_{side}"))
    )


def cms_join_estimate(
    df_a: DataFrame,
    key_a: Column,
    df_b: DataFrame,
    key_b: Column,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """The sketch-only half of :func:`cms_join_size`: a 1-row frame
    ``(est_join_rows)`` upper-bounding |A ⋈ B| via the count-min inner
    product, WITHOUT the exact per-key count (which shuffles every
    key and is exactly the cost a pre-flight must avoid at 100 TB).
    :func:`guarded_join` runs this before committing to a strategy."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1: {depth}/{width}")
    # the min must range over ALL depth rows: a row whose cells share
    # no positions has true inner product 0 (not "no vote") — without
    # it the estimate loosens, and fully disjoint key sets would
    # return NULL instead of 0 (the inner join is empty)
    all_rows = df_a.sparkSession.range(depth).select(
        F.col("id").cast("string").alias("_j")
    )
    return (
        all_rows.join(
            _cms_cells(df_a, key_a, "a", depth, width)
            .join(_cms_cells(df_b, key_b, "b", depth, width), ["_j", "_p"])
            .groupBy("_j")
            .agg(F.sum(F.col("c_a") * F.col("c_b")).alias("_ip")),
            "_j",
            "left",
        )
        .agg(F.min(F.coalesce("_ip", F.lit(0))).alias("est_join_rows"))
    )


def cms_join_size(
    df_a: DataFrame,
    key_a: Column,
    df_b: DataFrame,
    key_b: Column,
    depth: int = 3,
    width: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """Join-size estimation via the count-min inner product (Cormode &
    Muthukrishnan 2005): |A ⋈ B| on a key = Σ_k cnt_A(k)·cnt_B(k), and
    the MIN over depth rows of the sketch-cell inner products
    upper-bounds it within εN_A·N_B w.h.p. — the constant-memory
    pre-flight check a planner (or a cautious engineer) runs BEFORE an
    expensive join: a self-join estimate exploding past the input size
    is the skew alarm that says salt/cap first (exactly the q112
    co-purchase situation; pass the same frame twice for the
    self-join-size / second-frequency-moment form).

    Scale shape: each side collapses onto depth×width integer cells
    (ONE hash aggregate each, map-side partials); the cell frames join
    on the compact (row, position) key — at most depth·width rows move
    anywhere. The exact join size rides along for the error report
    (computed from per-key counts, NOT by materializing the join — at
    100 TB drop it; it is the cost the sketch avoids).

    Engine-portable md5 cells (the CMS convention here), integer
    products/sums — the estimate, the exact size, and the
    overestimate replay bit-for-bit in SQL. NULL keys are excluded on
    both sides (SQL join semantics: NULL matches nothing).

    Returns one row: (exact_join_rows, est_join_rows, overestimate).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1: {depth}/{width}")
    inner = cms_join_estimate(df_a, key_a, df_b, key_b, depth, width)
    ca = (
        df_a.select(key_a.cast("string").alias("_k"))
        .filter(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    cb = (
        df_b.select(key_b.cast("string").alias("_k"))
        .filter(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    exact = ca.join(cb, "_k").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias(
            "exact_join_rows"
        )
    )
    return exact.crossJoin(F.broadcast(inner)).select(
        "exact_join_rows",
        "est_join_rows",
        (F.col("est_join_rows") - F.col("exact_join_rows")).alias(
            "overestimate"
        ),
    )


def _check_join_columns(
    df_a: DataFrame,
    df_b: DataFrame,
    keys: "list[str]",
    reserved: "tuple[str, ...]" = (),
) -> None:
    """Fail FAST on the two column layouts the armored joins cannot
    produce sane output for: overlapping non-key columns (the final
    ``select(*out_cols)`` would only surface them later as an opaque
    AMBIGUOUS_REFERENCE), and caller columns that collide with the
    operator's internal working names (``_salt``/``_bloom``) or with
    derived-frame names (a key literally named ``count`` collides with
    ``groupBy(keys).count()``'s output in the hot-key split)."""
    overlap = sorted(
        (set(df_a.columns) & set(df_b.columns)) - set(keys)
    )
    if overlap:
        raise ValueError(
            f"non-key columns must be disjoint across the two sides; "
            f"rename or drop before joining: {overlap}"
        )
    hit = sorted(
        set(reserved) & (set(df_a.columns) | set(df_b.columns))
    )
    if hit:
        raise ValueError(
            f"column names reserved for internal use: {hit}"
        )
    if "count" in keys:
        raise ValueError(
            "a join key named 'count' collides with the hot-key "
            "split's groupBy().count() frame; alias it first"
        )


def guarded_join(
    df_a: DataFrame,
    df_b: DataFrame,
    on: "str | list[str]",
    est_threshold: int,
    over_strategy: str = "salt",
    n_salt: int = 16,
    hot_key_rows: int = 1000,
    max_rows_per_key: "int | None" = None,
    depth: int = 3,
    width: int = 1024,
    stats_out: "dict | None" = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-guarded equi-join: run the constant-memory CMS
    join-size pre-flight (:func:`cms_join_estimate`) FIRST, and only
    commit to a join strategy once the estimate is known — the
    "measure before you shuffle" armor the dedup family applies to
    its candidate buckets (``_cap_buckets``), applied to a general
    equi-join. The reference's co-purchase self-join family (q112) is
    the motivating shape: a celebrity key turns |A ⋈ B| quadratic,
    and the task that owns that key becomes the straggler that stalls
    a 1000-executor stage.

    Decision (recorded in ``stats_out``):

    - estimate <= ``est_threshold``: plain join — Catalyst/AQE handle
      the physical strategy.
    - over threshold, ``over_strategy='salt'``: value-IDENTICAL
      output, different physical distribution. Keys whose per-side
      row count exceeds ``hot_key_rows`` (one compact-key aggregate
      per side — the same aggregate a shuffle would do anyway, tiny
      next to the join it guards) are split out; the hot slice of A
      gets a deterministic content-hash salt (xxhash64 over the full
      row, so retries recompute the same value — rand() salting can
      lose/duplicate rows on partial stage retry), the hot slice of B
      replicates ``n_salt``× and the join runs on (key, salt), so the
      celebrity key's pairs spread over ``n_salt`` tasks instead of
      one. The cold slices join plain; the union is the exact plain-
      join result in every row (pinned by test + the q156 oracle).
      Identical FULL rows share a salt — salting splits a hot key
      whose rows differ anywhere; a corpus of bit-identical duplicate
      rows should pre-aggregate instead.
    - over threshold, ``over_strategy='cap'``: loud recall trade —
      each side keeps at most ``max_rows_per_key`` rows per key
      (deterministic md5-of-row pick, so the kept set is stable
      across engines and retries), the drop counts are written into
      ``stats_out`` and logged (the `_cap_buckets` convention: no
      silent caps).
    - over threshold, ``over_strategy='error'``: raise — the caller
      wants the pre-flight as a hard gate.

    ``how``: ``'inner'`` (default), ``'left_semi'``, or
    ``'left_anti'``. Semi/anti joins never multiply output, but a hot
    probe-side key still lands every one of its rows on ONE task — the
    anti join that computes "what's new" against an index (q164's
    shape) straggles exactly like the inner join, so it sits behind
    the same pre-flight gate. The salted semi/anti variant replicates
    only the DISTINCT hot B-side keys across salts (presence is all a
    semi/anti join reads from B), so the B-side replication cost is
    keys × n_salt, not rows × n_salt. ``over_strategy='cap'`` is
    inner-only (capping per-key rows on the probe side would silently
    change semi/anti semantics — rows, not pairs, would vanish) and
    raises otherwise. The non-key column-overlap guard applies only to
    ``how='inner'`` (semi/anti never surface B's columns).

    The pre-flight is an eager constant-size job (two depth×width
    sketches + a broadcast min) — the one action this operator runs
    before returning; everything after stays lazy.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if over_strategy not in ("salt", "cap", "error"):
        raise ValueError(f"unknown over_strategy: {over_strategy!r}")
    if est_threshold < 0 or n_salt < 1 or hot_key_rows < 1:
        raise ValueError("est_threshold/n_salt/hot_key_rows must be >= 0/1/1")
    if over_strategy == "cap" and (max_rows_per_key or 0) < 1:
        raise ValueError("over_strategy='cap' needs max_rows_per_key >= 1")
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(
            f"how must be 'inner', 'left_semi' or 'left_anti': {how!r}"
        )
    if how != "inner" and over_strategy == "cap":
        raise ValueError(
            "over_strategy='cap' applies to inner joins only: capping "
            "probe-side rows per key would drop OUTPUT rows of a "
            "semi/anti join, not just candidate pairs"
        )
    if how == "inner":
        _check_join_columns(df_a, df_b, keys, reserved=("_salt",))
    else:
        _check_join_columns(
            df_a, df_a.select(*keys), keys, reserved=("_salt",)
        )

    # NULL-propagating composite key: concat_ws silently DROPS null
    # components, so NULL-keyed rows (which the inner join can never
    # match) and partial-null keys like ('a', NULL) vs ('a', '') would
    # land in the sketches and inflate est_join_rows — the sketch's
    # isNotNull filter can only drop them if the composite goes NULL
    # whenever any component is NULL (SQL join semantics).
    def key_expr(df: DataFrame) -> Column:
        any_null = df[keys[0]].isNull()
        for k in keys[1:]:
            any_null = any_null | df[k].isNull()
        return F.when(any_null, F.lit(None)).otherwise(
            F.concat_ws("\x1f", *[df[k].cast("string") for k in keys])
        )
    est = int(
        cms_join_estimate(
            df_a, key_expr(df_a), df_b, key_expr(df_b), depth, width
        ).collect()[0]["est_join_rows"]
    )
    if stats_out is not None:
        stats_out["est_join_rows"] = est
        stats_out["est_threshold"] = est_threshold

    out_cols = keys + [
        c for c in df_a.columns if c not in keys
    ] + ([c for c in df_b.columns if c not in keys] if how == "inner" else [])

    if est <= est_threshold:
        if stats_out is not None:
            stats_out["strategy"] = "plain"
        if how == "inner":
            return df_a.join(df_b, keys).select(*out_cols)
        return df_a.join(df_b.select(*keys), keys, how)

    if over_strategy == "error":
        raise ValueError(
            f"guarded_join: estimated join size {est} exceeds "
            f"threshold {est_threshold} (over_strategy='error')"
        )

    if over_strategy == "cap":
        import logging

        from capex_data_pipeline_spark.cache import persisted
        from pyspark.sql.window import Window

        def _cap(df: DataFrame, side: str) -> DataFrame:
            w = Window.partitionBy(*keys).orderBy(
                F.md5(
                    F.concat_ws(
                        "\x1f", *[F.col(c).cast("string") for c in df.columns]
                    )
                )
            )
            capped = persisted(
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= max_rows_per_key)
                .drop("_rn")
            )
            if stats_out is not None:
                total = df.count()
                kept = capped.count()
                stats_out[f"dropped_rows_{side}"] = total - kept
                if total != kept:
                    logging.getLogger(__name__).warning(
                        "guarded_join cap=%d dropped %d/%d rows on side "
                        "%s — an explicit recall trade, not full coverage",
                        max_rows_per_key,
                        total - kept,
                        total,
                        side,
                    )
            return capped

        if stats_out is not None:
            stats_out["strategy"] = "cap"
        return _cap(df_a, "a").join(_cap(df_b, "b"), keys).select(*out_cols)

    # --- salt: split hot keys out, spread their pairs over n_salt tasks
    from capex_data_pipeline_spark.cache import persisted

    hot_a = df_a.groupBy(*keys).count().filter(F.col("count") > hot_key_rows)
    hot_b = df_b.groupBy(*keys).count().filter(F.col("count") > hot_key_rows)
    hot = persisted(
        hot_a.select(*keys).union(hot_b.select(*keys)).distinct()
    )
    a_cold = df_a.join(F.broadcast(hot), keys, "left_anti")
    b_cold = df_b.join(F.broadcast(hot), keys, "left_anti")
    a_hot = df_a.join(F.broadcast(hot), keys, "left_semi")
    b_hot = df_b.join(F.broadcast(hot), keys, "left_semi")

    salt_a = F.pmod(
        F.xxhash64(*[F.col(c) for c in df_a.columns]), F.lit(n_salt)
    ).alias("_salt")
    a_salted = a_hot.select("*", salt_a)
    # semi/anti read only key PRESENCE from B: replicate the distinct
    # hot keys (keys x n_salt rows), never the hot B rows themselves
    b_rep_src = (
        b_hot if how == "inner" else b_hot.select(*keys).distinct()
    )
    b_replicated = b_rep_src.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")
        ).alias("_salt"),
    )
    # EXPLICIT user repartition on (keys, salt), both sides: AQE sizes
    # post-shuffle partitions by shuffle INPUT bytes, and the exact
    # case this operator guards — modest inputs, quadratic output —
    # looks tiny to it, so AQE would coalesce the hot join back onto
    # ONE task and silently undo the salt (measured: the salted join
    # ran single-task until this pin). A user-specified repartition
    # count is exempt from AQE coalescing; width = max(n_salt,
    # session shuffle partitions) so several hot keys spread across
    # the full stage width, never fewer than n_salt tasks.
    n_part = max(
        n_salt,
        int(df_a.sparkSession.conf.get("spark.sql.shuffle.partitions")),
    )
    part_cols = [F.col(k) for k in keys] + [F.col("_salt")]
    hot_joined = (
        a_salted.repartition(n_part, *part_cols)
        .join(
            b_replicated.repartition(n_part, *part_cols),
            keys + ["_salt"],
            how,
        )
        .select(*out_cols)
    )
    if how == "inner":
        cold_joined = a_cold.join(b_cold, keys).select(*out_cols)
    else:
        cold_joined = a_cold.join(
            b_cold.select(*keys), keys, how
        ).select(*out_cols)
    if stats_out is not None:
        stats_out["strategy"] = "salt"
        stats_out["hot_keys"] = hot.count()
    return cold_joined.unionByName(hot_joined)


def ddsketch_quantiles_by(
    df: DataFrame,
    group_col: str,
    value: Column,
    alpha: float = 0.01,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    decimals: int = 6,
) -> DataFrame:
    """Per-group quantile estimates from a DDSketch-style log-bucketed
    histogram (Masson, Lee & Rim, VLDB 2019 — the fully-mergeable
    relative-error quantile sketch): a positive value lands in bucket
    ``i = ceil(ln v / ln gamma)`` with ``gamma = (1+alpha)/(1-alpha)``,
    and the bucket midpoint ``2·gamma^i / (gamma+1)`` estimates any
    member within relative error ``alpha``. This is the 100 TB answer
    to exact per-group percentiles (q73's shape, which must shuffle
    every (group, value) pair and sort within groups): bucket counts
    are an ALGEBRAIC aggregate — map-side partials collapse onto at
    most ``groups × ln(max/min)/ln(gamma)`` integer cells (~920
    buckets for a 1e8 dynamic range at alpha=0.01), merging across
    partitions/days/shards by simple addition, and every post-
    aggregate step is sketch-sized.

    Unlike KLL/GK there is NO sampling or compaction randomness — the
    sketch is a pure function of the value multiset, so two engines
    replay it bit-for-bit (the q126/q153 HLL convention; ln/pow land
    on quantized round(·, ``decimals``) outputs). Non-positive values
    are EXCLUDED (documented DDSketch domain) — route any column that
    can carry v <= 0 through :func:`ddsketch_quantiles_by_signed`
    (mirrored store + exact zero count; same merge algebra). The
    exact interpolated quantile
    rides along per (group, q) for the error report — at 100 TB drop
    it; it is the shuffle the sketch avoids.

    Returns (``group_col``, q, n, est_q, exact_q, rel_error), one row
    per group × quantile; ``rel_error`` <= ~alpha by construction.
    """
    import math

    from capex_data_pipeline_spark.cache import persisted
    from pyspark.sql.window import Window

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    if not quantiles or any(not 0 <= q <= 1 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 1]: {quantiles}")
    gamma = (1.0 + alpha) / (1.0 - alpha)

    v = value.cast("double")
    vals = df.select(F.col(group_col).alias("_g"), v.alias("_v")).filter(
        F.col("_v") > 0
    )
    cells = persisted(
        vals.groupBy(
            "_g",
            F.ceil(F.log(F.col("_v")) / F.log(F.lit(gamma))).alias("_i"),
        ).agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = cells.groupBy("_g").agg(F.sum("_c").alias("_n"))
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("_cum", F.sum("_c").over(wcum))
    qf = totals.select(
        "_g",
        "_n",
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q"),
    )
    # the DDSketch read: the first bucket whose cumulative count
    # exceeds rank floor(q·(n−1)); min-aggregate, never a sort
    pick = (
        qf.join(cum, "_g")
        .filter(F.col("_cum") > F.floor(F.col("q") * (F.col("_n") - 1)))
        .groupBy("_g", "q", "_n")
        .agg(F.min("_i").alias("_pick"))
    )
    est = pick.select(
        "_g",
        "q",
        F.col("_n").alias("n"),
        F.round(
            F.lit(2.0)
            * F.pow(F.lit(gamma), F.col("_pick"))
            / F.lit(gamma + 1.0),
            decimals,
        ).alias("est_q"),
    )
    qs_arr = F.array(*[F.lit(float(q)) for q in quantiles])
    exact = (
        vals.groupBy("_g")
        .agg(F.percentile("_v", qs_arr).alias("_ex"))
        .select(
            "_g",
            F.posexplode("_ex").alias("_pos", "_exv"),
        )
        .select(
            "_g",
            qs_arr.getItem(F.col("_pos")).alias("q"),
            F.round("_exv", decimals).alias("exact_q"),
        )
    )
    return est.join(exact, ["_g", "q"]).select(
        F.col("_g").alias(group_col),
        "q",
        "n",
        "est_q",
        "exact_q",
        # denominator floored at one rounding ulp (10^-decimals): a
        # legal tiny positive exact quantile (< 0.5·10^-decimals)
        # rounds exact_q to 0.0 and a bare division would emit a
        # NULL/inf rel_error row; the floor keeps the ratio finite and
        # is engine-replayable because exact_q is already quantized
        F.round(
            F.abs(F.col("est_q") - F.col("exact_q"))
            / F.greatest(F.col("exact_q"), F.lit(10.0 ** -decimals)),
            decimals,
        ).alias("rel_error"),
    )


def ddsketch_quantiles_by_signed(
    df: DataFrame,
    group_col: str,
    value: Column,
    alpha: float = 0.01,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    decimals: int = 6,
) -> DataFrame:
    """Signed-domain DDSketch per-group quantiles: the standard
    mirrored construction (Masson/Lee/Rim VLDB 2019 §2.3) — a
    POSITIVE log-bucket store, a mirrored NEGATIVE store over |v|,
    and an exact ZERO counter — so columns that legitimately carry
    negatives (deltas, adjustments, net changes) are handled loudly
    instead of silently excluded by :func:`ddsketch_quantiles_by`'s
    positive-only domain.

    Every cell is (group, store, sortpos): store ∈ {-1, 0, +1} and
    sortpos = -⌈ln|v|/ln γ⌉ for negatives / 0 / +⌈ln v/ln γ⌉ for
    positives, chosen so lexicographic (store, sortpos) ascending IS
    ascending value order — the quantile read stays one cumulative
    window + a min-struct aggregate, never a sort of raw values. The
    negative store inherits the same relative-error guarantee on |v|
    (rel_error here is measured against max(|exact|, 1 ulp), valid on
    BOTH tails); zeros are exact by construction. Still fully
    algebraic/mergeable: three integer stores per group, shards merge
    by addition. The exact interpolated quantile rides along for the
    error report — the drop-at-100TB column, as in q157.

    Returns (group_col, q, n, n_neg, n_zero, n_pos, est_q, exact_q,
    rel_error), one row per group × quantile.
    """
    import math  # noqa: F401 - parity with the unsigned variant

    from pyspark.sql.window import Window

    from capex_data_pipeline_spark.cache import persisted

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    if not quantiles or any(not 0 <= q <= 1 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 1]: {quantiles}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = F.log(F.lit(gamma))

    v = value.cast("double")
    vals = df.select(F.col(group_col).alias("_g"), v.alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    store = (
        F.when(F.col("_v") > 0, F.lit(1))
        .when(F.col("_v") < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )
    sortpos = (
        F.when(F.col("_v") > 0, F.ceil(F.log(F.col("_v")) / lg))
        .when(F.col("_v") < 0, -F.ceil(F.log(-F.col("_v")) / lg))
        .otherwise(F.lit(0))
    ).cast("long")
    cells = persisted(
        vals.groupBy("_g", store.alias("_s"), sortpos.alias("_sp")).agg(
            F.count(F.lit(1)).alias("_c")
        )
    )
    totals = cells.groupBy("_g").agg(
        F.sum("_c").alias("_n"),
        F.sum(F.when(F.col("_s") == -1, F.col("_c")).otherwise(0)).alias(
            "n_neg"
        ),
        F.sum(F.when(F.col("_s") == 0, F.col("_c")).otherwise(0)).alias(
            "n_zero"
        ),
        F.sum(F.when(F.col("_s") == 1, F.col("_c")).otherwise(0)).alias(
            "n_pos"
        ),
    )
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_s", "_sp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("_cum", F.sum("_c").over(wcum))
    qf = totals.select(
        "_g",
        "_n",
        "n_neg",
        "n_zero",
        "n_pos",
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q"),
    )
    pick = (
        qf.join(cum, "_g")
        .filter(F.col("_cum") > F.floor(F.col("q") * (F.col("_n") - 1)))
        .groupBy("_g", "q", "_n", "n_neg", "n_zero", "n_pos")
        .agg(F.min(F.struct("_s", "_sp")).alias("_pk"))
    )
    mid = (
        F.lit(2.0)
        * F.pow(F.lit(gamma), F.abs(F.col("_pk._sp")))
        / F.lit(gamma + 1.0)
    )
    est = pick.select(
        "_g",
        "q",
        F.col("_n").alias("n"),
        "n_neg",
        "n_zero",
        "n_pos",
        F.round(
            F.when(F.col("_pk._s") == 1, mid)
            .when(F.col("_pk._s") == -1, -mid)
            .otherwise(F.lit(0.0)),
            decimals,
        ).alias("est_q"),
    )
    qs_arr = F.array(*[F.lit(float(q)) for q in quantiles])
    exact = (
        vals.groupBy("_g")
        .agg(F.percentile("_v", qs_arr).alias("_ex"))
        .select("_g", F.posexplode("_ex").alias("_pos", "_exv"))
        .select(
            "_g",
            qs_arr.getItem(F.col("_pos")).alias("q"),
            F.round("_exv", decimals).alias("exact_q"),
        )
    )
    return est.join(exact, ["_g", "q"]).select(
        F.col("_g").alias(group_col),
        "q",
        "n",
        "n_neg",
        "n_zero",
        "n_pos",
        "est_q",
        "exact_q",
        # both tails: error relative to |exact|, ulp-floored as in the
        # unsigned variant
        F.round(
            F.abs(F.col("est_q") - F.col("exact_q"))
            / F.greatest(F.abs(F.col("exact_q")), F.lit(10.0 ** -decimals)),
            decimals,
        ).alias("rel_error"),
    )


def _bloom_positions(d: DataFrame, keys: "list[str]", m_bits: int, n_hashes: int):
    """n_hashes bit positions for a row's join key: seeded xxhash64
    over the RAW key columns (no string concat, no md5 — native
    whole-stage-codegen, measured ~10x cheaper per probe than the
    md5-string form at 600 k rows; the bitset never needs cross-engine
    replay because the operator's OUTPUT is value-identical to the
    plain join, which is what the oracles certify)."""
    return [
        F.pmod(
            F.xxhash64(F.lit(j), *[d[k] for k in keys]), F.lit(m_bits)
        )
        for j in range(n_hashes)
    ]


def _bloom_build(
    df: DataFrame, keys: "list[str]", m_bits: int, n_hashes: int
) -> "tuple[DataFrame, int]":
    """Fold a frame's distinct join keys into an ``m_bits``-bit Bloom
    bitset packed into m_bits/64 longs: the positions aggregate runs
    DISTRIBUTEDLY (one compact aggregate), only nonzero words are
    collected, and the result returns as a broadcastable one-row
    frame (``_bloom array<long>``) plus the set-bit count."""
    pos = (
        df.select(*[df[k] for k in keys])
        .distinct()
        .select(
            F.explode(
                F.array(*_bloom_positions(df, keys, m_bits, n_hashes))
            ).alias("_p")
        )
        .distinct()
    )
    words_rows = (
        pos.groupBy((F.col("_p") / 64).cast("long").alias("_w"))
        .agg(
            F.expr(
                "sum(shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT)))"
            ).alias("_bits")
        )
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in words_rows:
        words[int(r["_w"])] = int(r["_bits"])
    words = [w - (1 << 64) if w >= 1 << 63 else w for w in words]
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    bitset = df.sparkSession.createDataFrame([(words,)], "_bloom array<long>")
    return bitset, set_bits


def _bloom_member(
    df: DataFrame, keys: "list[str]", m_bits: int, n_hashes: int
) -> Column:
    """Membership predicate against the ``_bloom`` column attached by
    a broadcast crossJoin of :func:`_bloom_build`'s frame — pure
    JVM expressions (seeded xxhash64 positions + bit_get),
    codegen-friendly."""
    tests = [
        F.bit_get(
            F.element_at(F.col("_bloom"), (p / 64).cast("int") + 1),
            p % 64,
        )
        == 1
        for p in _bloom_positions(df, keys, m_bits, n_hashes)
    ]
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_filtered_join(
    df_big: DataFrame,
    df_small: DataFrame,
    on: "str | list[str]",
    m_bits: int = 1 << 18,
    n_hashes: int = 3,
    stats_out: "dict | None" = None,
) -> DataFrame:
    """Bloom-pruned inner equi-join — the selectivity armor beside
    :func:`guarded_join`'s skew armor: when the small side matches
    only a sliver of the big side's keys, the plain join still
    shuffles EVERY big-side row to its reducer before dropping the
    misses. Here the small side's distinct keys are folded into an
    ``m_bits``-bit Bloom bitset, packed into ``m_bits/64`` longs
    (32 KiB at the default 2^18 — the constant-size "array rider"
    `corpus.bloom_contamination`'s docstring promises), broadcast as a
    one-row frame, and the big side is filtered MAP-SIDE — inside the
    scan's whole-stage codegen, before any exchange — so only
    survivors shuffle. False negatives are impossible (a matching row
    always passes), so the output is value-IDENTICAL to the plain
    join — exactly what the q159 oracle certifies; false positives
    ((1 - e^(-kB/m))^k) just ride the shuffle and fall out of the
    join as they would have anyway.

    Spark's own runtime row-level filters cover the simplest cases;
    this operator makes the mechanism explicit, measurable (``stats_out`` reports pruned-row
    counts — the shuffle bytes saved), and composable with frames a
    runtime filter cannot see through (checkpoint boundaries, unions,
    Python-built plans).

    The bitset build is the one eager step (two compact distinct
    aggregates + a bounded collect of <= m_bits/64 words); pass
    ``stats_out={}`` for eager prune accounting, else the filtered
    plan stays lazy. Returns the joined frame (key cols + big cols +
    small cols, the `guarded_join` layout).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64: {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1: {n_hashes}")
    _check_join_columns(df_big, df_small, keys, reserved=("_bloom",))

    bitset, set_bits = _bloom_build(df_small, keys, m_bits, n_hashes)
    if stats_out is not None:
        stats_out["bloom_set_bits"] = set_bits
        stats_out["m_bits"] = m_bits
    big_keyed = df_big.crossJoin(F.broadcast(bitset))
    member = _bloom_member(df_big, keys, m_bits, n_hashes)
    survivors = big_keyed.filter(member).drop("_bloom")
    if stats_out is not None:
        total = df_big.count()
        kept = survivors.count()
        stats_out["big_rows"] = total
        stats_out["kept_rows"] = kept
        stats_out["pruned_rows"] = total - kept
    out_cols = keys + [
        c for c in df_big.columns if c not in keys
    ] + [c for c in df_small.columns if c not in keys]
    return survivors.join(df_small, keys).select(*out_cols)


def key_skew_profile(
    df: DataFrame,
    key: Column,
    topk: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """One-row skew profile of a prospective join/aggregation key —
    the diagnostic that decides BETWEEN the join armors (q155
    estimates the output size, this names the culprit): row count,
    distinct keys, the heaviest key's row count and share, the
    combined share of the ``topk`` heaviest keys, the Herfindahl
    index Σ share² (an ALGEBRAIC aggregate — sum of squared counts /
    n², map-side partials), and its reciprocal, the "effective number
    of keys" — the statistic that says a billion-key column behaves
    like 12 keys. max_key_share is also the fraction of the stage one
    task would own under hash partitioning — the straggler bound.

    Scale shape: one compact-key count aggregate; the top share is a
    TakeOrdered pick (never a global sort/window — the repo's
    planlint rule); everything else is algebraic. NULL keys count as
    a key (they hash somewhere and skew like anything else).

    Returns one row: (n_rows, n_keys, max_key_rows, max_key_share,
    topk_share, hhi, effective_keys).
    """
    if topk < 1:
        raise ValueError(f"topk must be >= 1: {topk}")
    counts = df.groupBy(key.alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = counts.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").alias("max_key_rows"),
        F.sum(F.col("_c") * F.col("_c")).alias("_ss"),
    )
    top = (
        # tie-break NULLS LAST to match ANSI/DuckDB default ascending
        # order (Spark's plain asc sorts NULL first): a NULL key tying
        # on count at the topk boundary must resolve identically
        counts.orderBy(
            F.desc("_c"), F.col("_k").cast("string").asc_nulls_last()
        )
        .limit(topk)
        .agg(F.sum("_c").alias("_top"))
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round(
            F.col("max_key_rows") / F.col("n_rows").cast("double"), decimals
        ).alias("max_key_share"),
        F.round(
            F.col("_top") / F.col("n_rows").cast("double"), decimals
        ).alias("topk_share"),
        F.round(
            F.col("_ss") / (F.col("n_rows") * F.col("n_rows")).cast("double"),
            decimals,
        ).alias("hhi"),
        F.round(
            (F.col("n_rows") * F.col("n_rows")).cast("double") / F.col("_ss"),
            decimals,
        ).alias("effective_keys"),
    )


def bloom_filtered_anti_join(
    df_new: DataFrame,
    df_index: DataFrame,
    on: "str | list[str]",
    m_bits: int = 1 << 18,
    n_hashes: int = 3,
    stats_out: "dict | None" = None,
) -> DataFrame:
    """Bloom-short-circuited LEFT ANTI join — the incremental-ingest
    "what's new" detector: rows of ``df_new`` whose key does NOT
    appear in ``df_index``. The Bloom direction flips relative to
    :func:`bloom_filtered_join`: a row that FAILS the membership test
    is DEFINITELY new (no false negatives) and short-circuits past
    the join entirely — map-side, no shuffle; only Bloom-POSITIVE
    rows (true matches + the (1-e^(-kB/m))^k false positives) take
    the exact left_anti join that settles them. The union is
    value-IDENTICAL to the plain anti join — the q164 oracle's NOT
    EXISTS certifies it. On a daily-crawl pipeline where yesterday's
    index dwarfs today's batch and most of the batch IS new, the
    anti-join shuffle shrinks to the duplicate sliver.

    Same engine-portable bitset as the join variant (32 KiB broadcast
    at the default 2^18 bits); ``stats_out`` reports how much
    short-circuited. Returns ``df_new``'s rows/columns unchanged.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64: {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1: {n_hashes}")
    if "_bloom" in df_new.columns:
        raise ValueError("column name reserved for internal use: ['_bloom']")

    bitset, set_bits = _bloom_build(df_index, keys, m_bits, n_hashes)
    if stats_out is not None:
        stats_out["bloom_set_bits"] = set_bits
        stats_out["m_bits"] = m_bits
    keyed = df_new.crossJoin(F.broadcast(bitset))
    member = _bloom_member(df_new, keys, m_bits, n_hashes)
    definitely_new = keyed.filter(~member).drop("_bloom")
    maybe_dup = keyed.filter(member).drop("_bloom")
    settled = maybe_dup.join(
        df_index.select(*keys).distinct(), keys, "left_anti"
    )
    if stats_out is not None:
        total = df_new.count()
        short = definitely_new.count()
        stats_out["new_rows"] = total
        stats_out["short_circuited"] = short
        stats_out["joined_rows"] = total - short
    return definitely_new.unionByName(settled).select(*df_new.columns)


def range_partition_planner(
    df: DataFrame,
    value: Column,
    n_bins: int = 8,
    alpha: float = 0.01,
    decimals: int = 6,
) -> DataFrame:
    """Balanced range-partition boundaries from the DDSketch — the
    constant-memory version of what Spark's RangePartitioner does by
    reservoir-sampling every partition: equi-depth cut points at
    ranks q = 1/n..(n-1)/n come straight from the log-bucketed
    histogram (:func:`ddsketch_quantiles_by`'s machinery, one
    algebraic aggregate), and the plan is validated by counting the
    ACTUAL rows landing in each bin (one map-side CASE pass — the
    broadcast boundary list is n_bins-1 doubles). A bin whose share
    strays far from 1/n is the sketch telling you the column has
    atoms (a single value heavier than a bin, which NO boundary
    placement can split — the honest limit of range partitioning).

    The boundary read is the one eager step (a collect bounded by the
    SKETCH's cell count — ~log_gamma(max/min) cells, ~1.4k at
    alpha=0.01 across 12 decades — never by the data; a loud guard
    refuses a pathological alpha that would widen it past
    ``max_cells``). STRICTLY positive values only (the DDSketch
    domain): any v <= 0 in the input RAISES — a planner that silently
    planned only the positive half of a signed column (deltas, PnL)
    would hand back wrong boundaries; route signed columns through
    the mirrored store (:func:`ddsketch_quantiles_signed`, q171/q201)
    or filter explicitly upstream. Returns one row per bin:
    (bin, lo, hi, n_rows, share) — lo/hi are (boundary[i-1],
    boundary[i]] edges with NULL at the open ends, share rounded to
    ``decimals``.
    """
    import math

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    max_cells = 100_000
    v = value.cast("double")
    vals = df.select(v.alias("_v")).filter(F.col("_v") > 0)
    # nonpositive rows fold into the SAME aggregate as a NULL-index
    # cell (no extra pass): any such cell => loud error, never a
    # silent positive-half plan
    cells = (
        df.select(v.alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy(
            F.when(
                F.col("_v") > 0,
                F.ceil(F.log(F.col("_v")) / F.log(F.lit(gamma))),
            ).alias("_i")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    n_nonpos = sum(r["_c"] for r in cells if r["_i"] is None)
    if n_nonpos:
        raise ValueError(
            f"range_partition_planner: {n_nonpos} rows with value <= 0 — "
            "the DDSketch domain is strictly positive; use the signed "
            "mirrored store (ddsketch_quantiles_signed / "
            "winsorized_stats_signed) or filter explicitly"
        )
    cells = [r for r in cells if r["_i"] is not None]
    if len(cells) > max_cells:
        raise ValueError(
            f"range_partition_planner: {len(cells)} sketch cells exceeds "
            f"the {max_cells} driver-read bound — alpha={alpha} is too "
            "fine for this value range; raise alpha"
        )
    cells.sort(key=lambda r: r["_i"])
    n = sum(r["_c"] for r in cells)
    if n == 0:
        raise ValueError("range_partition_planner: no positive values")
    bounds: "list[float]" = []
    cum, ci = 0, 0
    for b in range(1, n_bins):
        rank = math.floor(b / n_bins * (n - 1))
        while ci < len(cells) and cum + cells[ci]["_c"] <= rank:
            cum += cells[ci]["_c"]
            ci += 1
        idx = cells[min(ci, len(cells) - 1)]["_i"]
        bounds.append(
            round(2.0 * gamma**idx / (gamma + 1.0), decimals)
        )
    # first-match CASE chain: bin i iff v <= bounds[i] and no earlier
    # boundary matched — duplicate boundaries (atoms heavier than a
    # bin) simply yield empty middle bins, which is the report's
    # point, not an error
    bin_expr = None
    for i, b in enumerate(bounds):
        cond = F.col("_v") <= F.lit(b)
        bin_expr = F.when(cond, F.lit(i)) if bin_expr is None else bin_expr.when(cond, F.lit(i))
    bin_expr = bin_expr.otherwise(F.lit(len(bounds)))
    counts = (
        vals.select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spark = df.sparkSession
    edges = spark.createDataFrame(
        [
            (
                i,
                bounds[i - 1] if i > 0 else None,
                bounds[i] if i < len(bounds) else None,
            )
            for i in range(n_bins)
        ],
        "bin int, lo double, hi double",
    )
    return edges.join(counts, "bin", "left").select(
        "bin",
        "lo",
        "hi",
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        F.round(
            F.coalesce(F.col("n_rows"), F.lit(0)) / F.lit(float(n)), decimals
        ).alias("share"),
    )


def hll_overlap(
    df: DataFrame,
    group_col: str,
    key: Column,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """Cross-segment overlap from MERGED HyperLogLog registers — the
    query that exists because HLL sketches merge: per-group registers
    (the q153 state) combine by per-bucket MAX into exactly the
    registers the global stream would have produced, so
    |union| is estimated WITHOUT rescanning, and the inclusion-
    exclusion gap Σ per-group estimates − merged estimate measures
    how much the segments share (audience overlap, cross-source user
    duplication). This is the operational payoff of sketch
    mergeability at 100 TB: per-day/per-source registers are tiny
    (groups × m cells), keep them, and any union/overlap question
    later costs a register max — never a rescan.

    Same engine-portable estimator as :func:`hll_cardinality` (md5
    52-bit hash, integer binary-string rank, exact power-of-two
    register sums). The exact distinct counts ride along for the
    error report. Returns ONE row: (n_groups, sum_group_est,
    merged_est, overlap_est, sum_group_exact, union_exact,
    overlap_exact).
    """
    if not 1 <= b <= 16:
        raise ValueError(f"b must be in [1, 16], got {b}")
    m = 1 << b
    rest_bits = 52 - b
    k = F.coalesce(key.cast("string"), F.lit("<null>"))
    h = F.conv(F.substring(F.md5(k), 1, 13), 16, 10).cast("long")
    rest = F.shiftright(h, b)
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - bitlen + 1
    )
    from capex_data_pipeline_spark.cache import persisted

    regs = persisted(
        df.select(
            F.col(group_col).alias("_g"),
            (h % m).alias("_b"),
            rank.alias("_r"),
        )
        .groupBy("_g", "_b")
        .agg(F.max("_r").alias("_mr"))
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    est = (
        alpha
        * F.lit(float(m * m))
        / (
            F.sum(F.pow(F.lit(2.0), -F.col("_mr")))
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        )
    )
    per_group = regs.groupBy("_g").agg(F.round(est, decimals).alias("_e"))
    summed = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.round(F.sum("_e"), decimals).alias("sum_group_est"),
    )
    # the merge: per-bucket MAX across groups == the global registers
    merged = (
        regs.groupBy("_b")
        .agg(F.max("_mr").alias("_mr"))
        .agg(F.round(est, decimals).alias("merged_est"))
    )
    exact_g = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.countDistinct(k).alias("_ne")
    )
    exact_sum = exact_g.agg(F.sum("_ne").alias("sum_group_exact"))
    exact_union = df.agg(F.countDistinct(k).alias("union_exact"))
    return (
        summed.crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(exact_sum))
        .crossJoin(F.broadcast(exact_union))
        .select(
            "n_groups",
            "sum_group_est",
            "merged_est",
            F.round(
                F.col("sum_group_est") - F.col("merged_est"), decimals
            ).alias("overlap_est"),
            "sum_group_exact",
            "union_exact",
            (F.col("sum_group_exact") - F.col("union_exact")).alias(
                "overlap_exact"
            ),
        )
    )


def winsorized_stats_by(
    df: DataFrame,
    group_col: str,
    value: Column,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    alpha: float = 0.01,
    decimals: int = 6,
) -> DataFrame:
    """Winsorized per-group statistics with DDSketch-derived cut
    points: values are CLAMPED (not dropped) at the per-group
    p_lo/p_hi quantile estimates before averaging — the standard
    robust-mean treatment for heavy-tailed metrics (latency, price,
    doc length) where a handful of outliers move the raw mean by
    multiples. The cut points come from the same log-bucketed
    histogram as :func:`ddsketch_quantiles_by` (one algebraic cell
    aggregate; no per-group sort), so at 100 TB the whole operator is
    two passes: sketch, then a map-side clamp + mean with the
    groups-sized boundary frame broadcast.

    Positive values only (the DDSketch domain) — rows with v <= 0 are
    excluded from BOTH the sketch and the means; route signed columns
    through :func:`winsorized_stats_by_signed` instead. Returns per
    group: (``group_col``, n, lo_cut, hi_cut, n_clamped_lo,
    n_clamped_hi, raw_mean, winsorized_mean), means rounded to
    ``decimals``.
    """
    from capex_data_pipeline_spark.cache import persisted
    from pyspark.sql.window import Window

    if not 0 <= p_lo < p_hi <= 1:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1: {p_lo}/{p_hi}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    v = value.cast("double")
    vals = persisted(
        df.select(F.col(group_col).alias("_g"), v.alias("_v")).filter(
            F.col("_v") > 0
        )
    )
    cells = persisted(
        vals.groupBy(
            "_g",
            F.ceil(F.log(F.col("_v")) / F.log(F.lit(gamma))).alias("_i"),
        ).agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = cells.groupBy("_g").agg(F.sum("_c").alias("_n"))
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("_cum", F.sum("_c").over(wcum))
    qf = totals.select(
        "_g",
        F.explode(
            F.array(F.lit(float(p_lo)), F.lit(float(p_hi)))
        ).alias("q"),
        "_n",
    )
    picks = (
        qf.join(cum, "_g")
        .filter(F.col("_cum") > F.floor(F.col("q") * (F.col("_n") - 1)))
        .groupBy("_g", "q")
        .agg(F.min("_i").alias("_pick"))
        .select(
            "_g",
            "q",
            F.round(
                F.lit(2.0)
                * F.pow(F.lit(gamma), F.col("_pick"))
                / F.lit(gamma + 1.0),
                decimals,
            ).alias("_cut"),
        )
    )
    cuts = (
        picks.groupBy("_g").agg(
            F.min(F.when(F.col("q") == float(p_lo), F.col("_cut"))).alias(
                "lo_cut"
            ),
            F.min(F.when(F.col("q") == float(p_hi), F.col("_cut"))).alias(
                "hi_cut"
            ),
        )
    )
    clamped = vals.join(F.broadcast(cuts), "_g").select(
        "_g",
        "_v",
        "lo_cut",
        "hi_cut",
        F.least(F.greatest(F.col("_v"), F.col("lo_cut")), F.col("hi_cut")).alias(
            "_w"
        ),
    )
    return (
        clamped.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo_cut").alias("lo_cut"),
            F.min("hi_cut").alias("hi_cut"),
            F.sum(F.when(F.col("_v") < F.col("lo_cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_lo"),
            F.sum(F.when(F.col("_v") > F.col("hi_cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_hi"),
            F.round(F.avg("_v"), decimals).alias("raw_mean"),
            F.round(F.avg("_w"), decimals).alias("winsorized_mean"),
        )
    )


def winsorized_stats_by_signed(
    df: DataFrame,
    group_col: str,
    value: Column,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    alpha: float = 0.01,
    decimals: int = 6,
) -> DataFrame:
    """:func:`winsorized_stats_by` for SIGNED columns (deltas,
    adjustments, net changes): the cut points come from the mirrored
    DDSketch store of :func:`ddsketch_quantiles_by_signed` — positive
    log buckets, mirrored negative buckets over |v|, exact zero count
    — so values v <= 0 participate in both the sketch AND the clamp
    instead of being silently excluded (the r10 gap VERDICT task #6
    names). Same two-pass scale shape: one algebraic (group, store,
    sortpos) cell aggregate, then a map-side clamp + mean with the
    groups-sized boundary frame broadcast.

    Returns per group: (``group_col``, n, lo_cut, hi_cut,
    n_clamped_lo, n_clamped_hi, raw_mean, winsorized_mean).
    """
    from pyspark.sql.window import Window

    from capex_data_pipeline_spark.cache import persisted

    if not 0 <= p_lo < p_hi <= 1:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1: {p_lo}/{p_hi}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = F.log(F.lit(gamma))
    v = value.cast("double")
    vals = persisted(
        df.select(F.col(group_col).alias("_g"), v.alias("_v")).filter(
            F.col("_v").isNotNull()
        )
    )
    store = (
        F.when(F.col("_v") > 0, F.lit(1))
        .when(F.col("_v") < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )
    sortpos = (
        F.when(F.col("_v") > 0, F.ceil(F.log(F.col("_v")) / lg))
        .when(F.col("_v") < 0, -F.ceil(F.log(-F.col("_v")) / lg))
        .otherwise(F.lit(0))
    ).cast("long")
    cells = persisted(
        vals.groupBy("_g", store.alias("_s"), sortpos.alias("_sp")).agg(
            F.count(F.lit(1)).alias("_c")
        )
    )
    totals = cells.groupBy("_g").agg(F.sum("_c").alias("_n"))
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_s", "_sp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("_cum", F.sum("_c").over(wcum))
    qf = totals.select(
        "_g",
        F.explode(
            F.array(F.lit(float(p_lo)), F.lit(float(p_hi)))
        ).alias("q"),
        "_n",
    )
    mid = (
        F.lit(2.0)
        * F.pow(F.lit(gamma), F.abs(F.col("_pk._sp")))
        / F.lit(gamma + 1.0)
    )
    picks = (
        qf.join(cum, "_g")
        .filter(F.col("_cum") > F.floor(F.col("q") * (F.col("_n") - 1)))
        .groupBy("_g", "q")
        .agg(F.min(F.struct("_s", "_sp")).alias("_pk"))
        .select(
            "_g",
            "q",
            F.round(
                F.when(F.col("_pk._s") == 1, mid)
                .when(F.col("_pk._s") == -1, -mid)
                .otherwise(F.lit(0.0)),
                decimals,
            ).alias("_cut"),
        )
    )
    cuts = picks.groupBy("_g").agg(
        F.min(F.when(F.col("q") == float(p_lo), F.col("_cut"))).alias(
            "lo_cut"
        ),
        F.min(F.when(F.col("q") == float(p_hi), F.col("_cut"))).alias(
            "hi_cut"
        ),
    )
    clamped = vals.join(F.broadcast(cuts), "_g").select(
        "_g",
        "_v",
        "lo_cut",
        "hi_cut",
        F.least(
            F.greatest(F.col("_v"), F.col("lo_cut")), F.col("hi_cut")
        ).alias("_w"),
    )
    return (
        clamped.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo_cut").alias("lo_cut"),
            F.min("hi_cut").alias("hi_cut"),
            F.sum(F.when(F.col("_v") < F.col("lo_cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_lo"),
            F.sum(F.when(F.col("_v") > F.col("hi_cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_hi"),
            F.round(F.avg("_v"), decimals).alias("raw_mean"),
            F.round(F.avg("_w"), decimals).alias("winsorized_mean"),
        )
    )


def next_pow2_width(
    ndv: float, min_width: int = 64, max_width: int = 1 << 20
) -> int:
    """Smallest power of two >= ceil(ndv), clamped to
    [min_width, max_width] — the CMS width a planner should use when
    the key's NDV is known (q178 stats): collisions vanish once every
    distinct key can get its own cell, so width ~ NDV collapses the
    inner-product overestimate without paying for width the key
    domain can't use. Integer doubling, no float log — the q200
    oracle replays the same choice as an integer lookup."""
    import math

    target = max(1, int(math.ceil(ndv)))
    w = min_width
    while w < target and w < max_width:
        w <<= 1
    return w


def join_graph_profile(
    edges: "list[tuple[str, DataFrame, Column, DataFrame, Column]]",
    depth: int = 3,
    width: int = 1024,
    decimals: int = 9,
    ndv: "dict[str, float] | None" = None,
    include_exact: bool = True,
    min_width: int = 64,
    max_width: int = 1 << 20,
) -> DataFrame:
    """Sketch-driven join-graph advisor: estimate EVERY candidate join
    edge's output size from constant-memory CMS inner products
    (:func:`cms_join_size`) and rank the edges the way a greedy
    left-deep planner would pick them (smallest estimated output
    first) — the cost-based-optimizer decision, externalized, before
    a single expensive shuffle runs. At 100 TB this is the difference
    between discovering a fact-fact join explosion in the PLAN stage
    (depth×width integer cells per side) and discovering it as a
    cluster-wide straggler; the q156 guarded join consumes one edge's
    estimate, this profiles the whole graph.

    ``edges``: (edge_name, left_df, left_key, right_df, right_key).
    Per edge everything is sketch-or-smaller: two cell aggregates, a
    cells-sized inner product, two 1-row counts; the exact join size
    (computed from per-key counts, never by materializing the join)
    rides along for the error report — the drop-at-100TB column, per
    the q155 convention.

    Two modes, one function:

    * classic (default): fixed ``width`` for every edge, exact join
      size + overestimate riding along (q177 — the certified-error
      report a small-scale validation run wants).
    * stats-sized, sketch-only (``ndv=`` a {edge_name: NDV} dict from
      the q178/q199 statistics, ``include_exact=False``): per-edge
      width = next-pow2(NDV) clamped to [min_width, max_width], and
      NOTHING exact is computed — no per-key count shuffle anywhere,
      which is the default a 100 TB deployment should run (q200). The
      chosen width is emitted as ``cms_width`` for observability.
      This closes the stats -> planner loop: q178 already maintains
      per-column NDV; feeding it here collapses the fixed-width
      overestimate (measured in SCALE.md) at zero added scan cost.

    Returns one row per edge: (edge, n_left, n_right,
    [cms_width when ndv given,] est_join_rows, [exact_join_rows,
    overestimate when include_exact,] est_selectivity, plan_rank)
    with plan_rank 1 = join first (ties by edge name); the rank
    window runs over the |edges|-row profile frame, never the data.
    """
    if not edges:
        raise ValueError("join_graph_profile: edges must be non-empty")
    from pyspark.sql.window import Window

    from capex_data_pipeline_spark.cache import persisted

    # ---- fuse: one pass per TABLE, not 3 passes per edge SIDE -------
    # The same frame object typically carries several edges (lineitem
    # sits on 3 of q177's 5), and each edge side used to pay its own
    # scan for CMS cells, its own scan for per-key counts, and its own
    # scan for the row count — ~30 scans for q177's graph. Here every
    # frame melts its needed key projections ONCE (the _stats_melt
    # move, guide §2.4/§2.6); everything an edge consumes afterwards
    # is derived from the per-frame aggregate:
    #  * include_exact: one (key-tag, key-value) count shuffle per
    #    frame, persisted — CMS cells then aggregate over DISTINCT
    #    keys (sum of counts, bit-identical integers) instead of
    #    re-exploding every raw row, exact per-key counts filter by
    #    tag, and n_rows is the sum of any one tag's counts (each raw
    #    row emits exactly one melt row per tag, NULL keys included).
    #  * sketch-only: one (key-tag, depth-row, cell) count aggregate
    #    per frame, persisted (tags x depth x width rows) — NULL keys
    #    route to sentinel cell -1 so n_rows rides the same aggregate;
    #    real cells filter the sentinel out. NOTHING shuffles per-key
    #    counts, preserving the mode's at-scale contract.
    # All values are exact integer counts regrouped, so every edge row
    # is bit-identical to the unfused per-side computation.
    resolved = []  # (name, (fid, tag_l), (fid, tag_r), w_e)
    frames: "dict[int, dict]" = {}  # id(df) -> {df, tags: {(expr,w): tag}}

    def _side(df: DataFrame, key: Column, w_e: int) -> "tuple[int, str]":
        fid = id(df)
        ent = frames.setdefault(fid, {"df": df, "tags": {}})
        sig = (str(key), int(w_e))
        if sig not in ent["tags"]:
            ent["tags"][sig] = (f"t{fid}k{len(ent['tags'])}", key, int(w_e))
        return fid, ent["tags"][sig][0]

    for name, ld, lk, rd, rk in edges:
        w_e = width
        if ndv is not None:
            if name not in ndv:
                raise ValueError(
                    f"join_graph_profile: no NDV hint for edge {name!r}"
                )
            w_e = next_pow2_width(ndv[name], min_width, max_width)
        resolved.append((name, _side(ld, lk, w_e), _side(rd, rk, w_e), w_e))

    # per-frame fused aggregates
    from capex_data_pipeline_spark.sources.parquet import spread_few_splits

    per_frame: "dict[int, dict]" = {}
    for fid, ent in frames.items():
        tags = list(ent["tags"].values())  # [(tag, key, w)]
        # project the key columns FIRST (narrow exchange, guide §2.3),
        # then restore scan parallelism: the fused melt would otherwise
        # run the tags x depth md5 battery on the frame's few-split
        # scan — the old per-side subplans at least overlapped as
        # independent stages; the fuse must not serialize them onto
        # one task (no-op at scale, the spread_few_splits contract)
        proj = spread_few_splits(
            ent["df"].select(
                *[
                    key.cast("string").alias(f"_k{i}")
                    for i, (_tag, key, _w) in enumerate(tags)
                ]
            )
        )
        melted = proj.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(tag).alias("_kt"),
                            F.col(f"_k{i}").alias("_k"),
                        )
                        for i, (tag, _key, _w) in enumerate(tags)
                    ]
                )
            ).alias("_m")
        ).select("_m._kt", "_m._k")
        first_tag = tags[0][0]
        info: dict = {"first_tag": first_tag}
        if include_exact:
            kc = persisted(
                melted.groupBy("_kt", "_k").agg(
                    F.count(F.lit(1)).alias("_c")
                )
            )
            info["keycounts"] = kc
            info["n_rows"] = kc.filter(F.col("_kt") == first_tag).agg(
                F.coalesce(F.sum("_c"), F.lit(0)).alias("_n")
            )
        else:
            rows = F.array(*[F.lit(str(j)) for j in range(depth)])
            wcol = None
            for tag, _key, w_t in tags:
                cond = F.col("_kt") == tag
                wcol = (
                    F.when(cond, F.lit(w_t))
                    if wcol is None
                    else wcol.when(cond, F.lit(w_t))
                )
            p = F.when(F.col("_k").isNull(), F.lit(-1)).otherwise(
                _md5_mod(F.col("_j"), F.col("_k"), wcol)
            )
            info["cells"] = persisted(
                melted.select("_kt", "_k", F.explode(rows).alias("_j"))
                .select("_kt", "_j", p.alias("_p"))
                .groupBy("_kt", "_j", "_p")
                .agg(F.count(F.lit(1)).alias("_c"))
            )
            info["n_rows"] = (
                info["cells"]
                .filter(
                    (F.col("_kt") == first_tag) & (F.col("_j") == "0")
                )
                .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_n"))
            )
        per_frame[fid] = info

    def _cells_for(fid: int, tag: str, w_e: int, cname: str) -> DataFrame:
        info = per_frame[fid]
        if include_exact:
            kc = info["keycounts"]
            rows = F.array(*[F.lit(str(j)) for j in range(depth)])
            return (
                kc.filter(
                    (F.col("_kt") == tag) & F.col("_k").isNotNull()
                )
                .select("_k", "_c", F.explode(rows).alias("_j"))
                .select(
                    "_j",
                    _md5_mod(F.col("_j"), F.col("_k"), w_e).alias("_p"),
                    "_c",
                )
                .groupBy("_j", "_p")
                .agg(F.sum("_c").alias(cname))
            )
        return (
            info["cells"]
            .filter((F.col("_kt") == tag) & (F.col("_p") >= 0))
            .select("_j", "_p", F.col("_c").alias(cname))
        )

    parts = []
    for name, (fid_l, tag_l), (fid_r, tag_r), w_e in resolved:
        ca_cells = _cells_for(fid_l, tag_l, w_e, "c_a").alias("_ca")
        cb_cells = _cells_for(fid_r, tag_r, w_e, "c_b").alias("_cb")
        all_rows = (
            frames[fid_l]["df"]
            .sparkSession.range(depth)
            .select(F.col("id").cast("string").alias("_j"))
        )
        sz = (
            all_rows.join(
                ca_cells.join(
                    cb_cells,
                    (F.col("_ca._j") == F.col("_cb._j"))
                    & (F.col("_ca._p") == F.col("_cb._p")),
                )
                .groupBy(F.col("_ca._j").alias("_j"))
                .agg(F.sum(F.col("c_a") * F.col("c_b")).alias("_ip")),
                "_j",
                "left",
            )
            .agg(F.min(F.coalesce("_ip", F.lit(0))).alias("est_join_rows"))
        )
        if include_exact:
            ca = (
                per_frame[fid_l]["keycounts"]
                .filter((F.col("_kt") == tag_l) & F.col("_k").isNotNull())
                .select("_k", F.col("_c").alias("na"))
                .alias("_ea")
            )
            cb = (
                per_frame[fid_r]["keycounts"]
                .filter((F.col("_kt") == tag_r) & F.col("_k").isNotNull())
                .select(F.col("_k").alias("_kb"), F.col("_c").alias("nb"))
                .alias("_eb")
            )
            exact = ca.join(cb, F.col("_k") == F.col("_kb")).agg(
                F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias(
                    "exact_join_rows"
                )
            )
            sz = exact.crossJoin(F.broadcast(sz)).select(
                "exact_join_rows",
                "est_join_rows",
                (F.col("est_join_rows") - F.col("exact_join_rows")).alias(
                    "overestimate"
                ),
            )
        nl = per_frame[fid_l]["n_rows"].select(F.col("_n").alias("n_left"))
        nr = per_frame[fid_r]["n_rows"].select(F.col("_n").alias("n_right"))
        exact_cols = (
            ["exact_join_rows", "overestimate"] if include_exact else []
        )
        width_cols = (
            [F.lit(w_e).cast("long").alias("cms_width")]
            if ndv is not None
            else []
        )
        parts.append(
            sz.crossJoin(F.broadcast(nl))
            .crossJoin(F.broadcast(nr))
            .select(
                F.lit(name).alias("edge"),
                "n_left",
                "n_right",
                *width_cols,
                "est_join_rows",
                *exact_cols,
                F.round(
                    F.col("est_join_rows")
                    / (
                        F.col("n_left").cast("double")
                        * F.col("n_right").cast("double")
                    ),
                    decimals,
                ).alias("est_selectivity"),
            )
        )
    prof = parts[0]
    for p in parts[1:]:
        prof = prof.unionByName(p)
    w = Window.orderBy(F.asc("est_join_rows"), F.asc("edge"))
    return prof.withColumn("plan_rank", F.row_number().over(w))


def table_stats(
    df: DataFrame,
    cols: "list[str]",
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """ANALYZE-TABLE-style per-column statistics in ONE scan — the
    numbers a cost-based optimizer (or :func:`join_graph_profile`)
    plans from: row count, NULL count/fraction, average rendered
    width, and the distinct-value count as a mergeable HLL estimate
    (:func:`hll_cardinality_by`) with the exact NDV riding along for
    the error report (the drop-at-100TB column, per the sketch-family
    convention).

    The table melts into compact (column, value-string) pairs — one
    pass over the data emitting |cols| values per row — and
    everything downstream is column-count-sized: per-column counters
    from one hash aggregate, NDV from cols × 2^b HLL register cells
    with map-side partial max. No per-column scans, no shuffle of
    anything wider than the melted pair.

    Returns one row per column: (column_name, n_rows, n_null,
    null_frac, avg_len, ndv_exact, ndv_est, ndv_rel_error).
    """
    if not cols:
        raise ValueError("table_stats: cols must be non-empty")
    m = 1 << b

    from capex_data_pipeline_spark.cache import persisted

    # persisted: the cell aggregate and the exact-NDV ride-along both
    # consume the melted pairs — one scan + one explode, not two
    melted = persisted(_stats_melt(df, cols, spread=True))
    cells = _stats_cells(melted, b)
    return _stats_finalize(cells, melted, m, decimals)


def table_stats_sketch(
    df: DataFrame,
    cols: "list[str]",
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """:func:`table_stats` without the exact-NDV ride-along — the
    at-scale default (one melt scan, everything downstream
    column-count-sized, NO distinct-key shuffle anywhere). q200 feeds
    these NDV estimates into :func:`join_graph_profile`'s stats-sized
    mode. Returns (column_name, n_rows, n_null, null_frac, avg_len,
    ndv_est)."""
    if not cols:
        raise ValueError("table_stats_sketch: cols must be non-empty")
    melted = _stats_melt(df, cols, spread=True)
    return _stats_finalize(_stats_cells(melted, b), None, 1 << b, decimals)


def table_stats_sketch_multi(
    frames: "list[tuple[DataFrame, list[str]]]",
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """:func:`table_stats_sketch` over SEVERAL tables as ONE query —
    the per-table cell aggregates union into a single plan, so one
    Spark action scans every table with the independent scan stages
    overlapping instead of running as N sequential driver-blocking
    jobs (guide §2.6: actions are only sequential because driver code
    calls them sequentially). Column names must be globally unique
    across the frames (the TPC-H prefix convention) — the finalize
    arithmetic groups on the column name, and each column's cells come
    from exactly one table, so every per-column output row is
    bit-identical to the sequential per-table calls.

    Returns the union of the per-table sketch-stats rows:
    (column_name, n_rows, n_null, null_frac, avg_len, ndv_est)."""
    if not frames:
        raise ValueError("table_stats_sketch_multi: frames must be non-empty")
    seen: set[str] = set()
    cells = None
    for df, cols in frames:
        if not cols:
            raise ValueError(
                "table_stats_sketch_multi: cols must be non-empty"
            )
        dup = seen & set(cols)
        if dup:
            raise ValueError(
                "table_stats_sketch_multi: column names must be globally "
                f"unique across frames; duplicated: {sorted(dup)}"
            )
        seen |= set(cols)
        c = _stats_cells(_stats_melt(df, list(cols), spread=True), b)
        cells = c if cells is None else cells.unionByName(c)
    return _stats_finalize(cells, None, 1 << b, decimals)


def _stats_melt(
    df: DataFrame,
    cols: "list[str]",
    extra: "list[str]" = (),
    spread: bool = False,
) -> DataFrame:
    """Melt ``cols`` into compact (column, value-string) pairs — the
    one wide-data pass every stats variant shares. ``extra`` columns
    (e.g. an incremental partition key) ride along unmelted.

    ``spread`` (default False — new callers FAIL SAFE): pass True from
    the measured-heavy consumers (full-table stats / HLL register
    builds), where the cols-way explode + per-cell md5/HLL math
    downstream fuses onto the scan and a few-split input would run the
    whole stats pass single-task; the pre-melt projection then goes
    through spread_few_splits (no-op at scale). Light consumers (a
    plain count aggregate, a per-day batch) must NOT spread: one
    narrow exchange costs more than the parallelism buys — measured
    on q185: 0.49 -> 1.27 s with the spread. The r13 default was True,
    which made every new light caller silently pay the exchange
    (ADVICE r13); flipped so the expensive path is the explicit
    opt-in."""
    base = df.select(*[F.col(e) for e in extra], *[F.col(c) for c in cols])
    if spread:
        from capex_data_pipeline_spark.sources.parquet import (
            spread_few_splits,
        )

        base = spread_few_splits(base)
    return base.select(
        *[F.col(e) for e in extra],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_col"),
                        F.col(c).cast("string").alias("_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_m"),
    ).select(*extra, "_m._col", "_m._v")


def _stats_cells(melted: DataFrame, b: int, keys: "tuple[str, ...]" = ("_col",)) -> DataFrame:
    """The cols × (m + 1) cell aggregate (count / summed width / max
    HLL rank per (keys, bucket)); NULLs route to sentinel bucket -1 so
    every counter shares one set of map-side partials."""
    m = 1 << b
    rest_bits = 52 - b

    h = F.conv(F.substring(F.md5(F.col("_v")), 1, 13), 16, 10).cast("long")
    bucket = F.when(F.col("_v").isNull(), F.lit(-1)).otherwise(h % m)
    rest = F.shiftright(h, b)
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(F.col("_v").isNull(), F.lit(None)).otherwise(
        F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
            F.lit(rest_bits) - bitlen + 1
        )
    )
    return (
        melted.select(
            *keys,
            bucket.alias("_b"),
            F.length("_v").alias("_len"),
            rank.alias("_r"),
        )
        .groupBy(*keys, "_b")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum("_len").alias("_slen"),
            F.max("_r").alias("_mr"),
        )
    )


def _stats_finalize(cells: DataFrame, melted: "DataFrame | None", m: int, decimals: int) -> DataFrame:
    """(_col, _b) cells + melted pairs -> the ANALYZE output row per
    column. Separated so the incremental variant can feed MERGED
    cells through the identical arithmetic. ``melted=None`` omits the
    exact-NDV ride-along columns (the persisted-state fold, which by
    design never rescans the rows the cells were built from)."""
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    nonempty = F.sum(F.when(F.col("_b") >= 0, 1).otherwise(0))
    reg_sum = F.sum(
        F.when(F.col("_b") >= 0, F.pow(F.lit(2.0), -F.col("_mr"))).otherwise(
            F.lit(0.0)
        )
    )
    est_raw = (
        alpha
        * F.lit(float(m * m))
        / (reg_sum + (F.lit(m) - nonempty).cast("double"))
    )
    per_col = cells.groupBy("_col").agg(
        F.sum("_cnt").alias("n_rows"),
        F.sum(F.when(F.col("_b") == -1, F.col("_cnt")).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.round(
            F.sum("_slen")
            / F.sum(
                F.when(F.col("_b") >= 0, F.col("_cnt")).otherwise(0)
            ).cast("double"),
            2,
        ).alias("avg_len"),
        # empty value set: no registers — estimate 0, never the raw
        # formula's α·m²/m artifact
        F.round(
            F.when(nonempty > 0, est_raw).otherwise(F.lit(0.0)), decimals
        ).alias("ndv_est"),
    )
    if melted is None:
        return per_col.select(
            F.col("_col").alias("column_name"),
            "n_rows",
            "n_null",
            F.round(
                F.col("n_null") / F.col("n_rows").cast("double"), decimals
            ).alias("null_frac"),
            "avg_len",
            "ndv_est",
        )
    # the exact NDV ride-along: the one column whose maintenance cost
    # a 100 TB deployment drops (it shuffles the distinct pairs; the
    # sketch above is what replaces it)
    exact = melted.filter(F.col("_v").isNotNull()).groupBy("_col").agg(
        F.countDistinct("_v").alias("ndv_exact")
    )
    return per_col.join(exact, "_col", "left").select(
        F.col("_col").alias("column_name"),
        "n_rows",
        "n_null",
        F.round(
            F.col("n_null") / F.col("n_rows").cast("double"), decimals
        ).alias("null_frac"),
        "avg_len",
        F.coalesce(F.col("ndv_exact"), F.lit(0)).alias("ndv_exact"),
        "ndv_est",
        F.coalesce(
            F.round(
                F.abs(F.col("ndv_est") - F.col("ndv_exact"))
                / F.nullif(F.col("ndv_exact").cast("double"), F.lit(0.0)),
                decimals,
            ),
            F.lit(0.0),
        ).alias("ndv_rel_error"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    ps: "list[float]",
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT order statistics without a global sort: the classic
    two-phase targeted selection. DDSketch (``ddsketch_quantiles``)
    answers "p99 within 1%" in one mergeable pass; this operator is
    its exact sibling for when the number must be the true data value
    (SLA cut lines, regulatory percentiles, range-partition boundaries
    that must land on real keys).

    Phase 1: one aggregate for (min, max, n) — at warehouse scale this
    is free from footer/zone-map metadata (the q176/q178 stats this
    repo already maintains). Phase 2: one scan histograms values into
    ``n_buckets`` equi-width buckets (a compact keyed aggregate,
    bucket-count-sized result to the driver — the q156 pre-flight
    precedent). The driver walks cumulative counts to find, for each
    p, the bucket holding rank ceil(p*n) and the rank offset WITHIN
    it. Phase 3 is ONE Spark job for ALL requested ps: the target
    table (bucket, p, rank, offset) is broadcast, rows join to their
    target buckets, and a window PARTITIONED BY p over only the
    in-bucket rows (~n/n_buckets rows per partition, never the whole
    frame) picks row_number == offset. This is exactly the q187
    grouped machinery with a constant group — the implementations are
    shared, not duplicated.

    ``ps`` is validated (non-empty values all in (0, 1]) BEFORE any
    aggregate runs; ``ps=[]`` returns an empty frame with the output
    schema rather than scanning anything.

    Rank convention is DuckDB's ``quantile_disc`` (1-based rank
    ceil(p*n), lower value at ties), which the q181 oracle certifies.
    Bucket routing arithmetic is engine-internal only — the returned
    values are actual data doubles, so the oracle compare is
    bit-exact. NULLs excluded, like every SQL quantile.

    Returns one row per p: (p, rank, value).
    """
    for p in ps:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"exact_quantiles: p={p} outside (0, 1]")
    spark = df.sparkSession
    out_schema = "p double, rank bigint, value double"
    if not ps:
        return spark.createDataFrame([], out_schema)
    v = F.col(value_col).cast("double")
    tagged = df.filter(v.isNotNull()).select(
        F.lit(0).alias("_eq_g"), v.alias("_v")
    )
    return group_exact_quantiles(
        tagged, "_eq_g", "_v", ps, n_buckets=n_buckets
    ).select("p", "rank", "value")


def table_stats_incremental(
    df: DataFrame,
    cols: "list[str]",
    partition: Column,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """:func:`table_stats` maintained INCREMENTALLY: the cell frame is
    built per ``partition`` (a day, a file batch, an ingest run) and
    then MERGED into the table-level statistics — counts and widths
    by sum, HLL registers by max, all algebraic — before the identical
    finalize arithmetic. This is how the q177/q178 planning statistics
    survive 100 TB: each new partition pays one scan of ITSELF, the
    stored per-partition cells are partitions × cols × (2^b + 1) rows,
    and a day-over-day refresh is a cell-frame aggregate that never
    rescans history. Output schema and values are IDENTICAL to
    ``table_stats`` over the whole frame — the q184 oracle certifies
    the merge path against the direct-scan arithmetic value-for-value.

    (The exact-NDV ride-along column is the documented exception: true
    distinct counts don't merge from counters, so it is recomputed
    from the melted pairs — the cost the HLL column exists to drop.)
    """
    if not cols:
        raise ValueError("table_stats_incremental: cols must be non-empty")
    m = 1 << b

    from capex_data_pipeline_spark.cache import persisted

    melted = persisted(
        _stats_melt(
            df.withColumn("_pt", partition),
            cols,
            extra=["_pt"],
            spread=True,
        )
    )
    # the per-partition statistics table a deployment persists ...
    partial = _stats_cells(melted, b, keys=("_pt", "_col"))
    # ... and the algebraic merge that replaces every rescan
    merged = partial.groupBy("_col", "_b").agg(
        F.sum("_cnt").alias("_cnt"),
        F.sum("_slen").alias("_slen"),
        F.max("_mr").alias("_mr"),
    )
    return _stats_finalize(merged, melted.drop("_pt"), m, decimals)


def fd_profile(
    df: DataFrame,
    pairs: "list[tuple[str, str]]",
) -> DataFrame:
    """Functional-dependency / candidate-key profiling: for each
    (determinant, dependent) column pair, does det -> dep hold — i.e.
    does any determinant value map to more than one dependent value?
    The schema-discovery sibling of :func:`table_stats`: NDV tells the
    planner how big a key is, this tells it WHICH columns are keys /
    denormalized copies (safe to drop from a join, safe to dedup on,
    usable as a partition key without splitting an entity).

    Exact, one hash aggregate PER PAIR on the determinant key (compact
    keys, map-side partials; a multi-pair profile is a driver-side
    loop over column METADATA, never over data). NULLs are values
    here — both sides coalesce to a sentinel — because a profiler
    that silently ignores NULL-keyed rows reports keys that aren't
    (two NULL-det rows with different deps ARE a violation the
    dedup-on-this-key user will hit).

    Returns one row per pair: (determinant, dependent, n_keys,
    violating_keys, max_deps_per_key, fd_holds).
    """
    if not pairs:
        raise ValueError("fd_profile: pairs must be non-empty")

    def _s(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit("<null>"))

    out = None
    for det, dep in pairs:
        g = (
            df.select(_s(det).alias("_k"), _s(dep).alias("_d"))
            .groupBy("_k")
            .agg(F.countDistinct("_d").alias("_nd"))
        )
        row = g.agg(
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("violating_keys"),
            F.max("_nd").alias("max_deps_per_key"),
            (F.max("_nd") <= 1).alias("fd_holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def column_topk_values(
    df: DataFrame,
    cols: "list[str]",
    k: int = 5,
    decimals: int = 6,
) -> DataFrame:
    """The ``most_common_vals`` half of ANALYZE (pg_stats): per column,
    the k most frequent values with count and frequency fraction —
    what a planner uses for selectivity on skewed predicates, and what
    :func:`key_skew_profile` generalizes for join keys. Completes the
    statistics family: q178 maintains NDV/width, q183 finds keys,
    this records the heavy values.

    One melt pass (shared :func:`_stats_melt` shape) + one hash
    aggregate on the compact (column, value) key + a per-column
    window top-k that plans as WindowGroupLimit (each map task
    forwards at most k rows per column into the final exchange).
    NULL is a value here (sentinel-coalesced) — NULL frequency drives
    selectivity exactly like any heavy value. Ties break by value
    string ascending, pinned so the result is deterministic on any
    engine.

    Returns (column_name, value, n, frac, rank): rank 1..k.
    """
    from pyspark.sql.window import Window

    if not cols:
        raise ValueError("column_topk_values: cols must be non-empty")
    melted = _stats_melt(df, cols, spread=False).select(
        "_col", F.coalesce(F.col("_v"), F.lit("<null>")).alias("_v")
    )
    counts = melted.groupBy("_col", "_v").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("_col").orderBy(F.desc("n"), F.asc("_v"))
    totals = melted.groupBy("_col").agg(F.count(F.lit(1)).alias("_t"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(totals, "_col")
        .select(
            F.col("_col").alias("column_name"),
            F.col("_v").alias("value"),
            "n",
            F.round(F.col("n") / F.col("_t").cast("double"), decimals)
            .alias("frac"),
            "rank",
        )
    )


def group_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: "list[float]",
    n_buckets: int = 256,
    max_groups: int = 100_000,
) -> DataFrame:
    """:func:`exact_quantiles` PER GROUP — exact p50/p99 latency per
    service, exact length percentiles per source — without ever
    sorting a group. Same three-phase targeted selection, vectorized
    across groups:

    1. one aggregate for per-group (min, max, n) — a group-sized
       driver read (the house convention; guarded by ``max_groups``
       because the group domain must be metadata-sized: services,
       sources, event types — not user ids);
    2. one scan histograms every row into its GROUP'S equi-width
       bucket (per-group lo/width attach via a broadcast join on the
       group key); the (group × bucket) cell frame comes back to the
       driver, which locates for each (group, p) the target bucket
       and the rank offset within it;
    3. rows land on their (group, bucket) targets via a broadcast
       join, and a window PARTITIONED BY (group, p) over only
       IN-BUCKET rows (~n_g/n_buckets rows per partition, never the
       group) picks row_number == offset.

    Rank convention: ceil(p * n_g), DuckDB's quantile_disc — values
    are true data doubles, so the oracle compare is bit-exact. NULL
    values excluded; a NULL group is a group like any other.

    Returns (group_col, p, rank, value).
    """
    import math

    from pyspark.sql.window import Window

    for p in ps:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"group_exact_quantiles: p={p} outside (0, 1]")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    stats = base.groupBy("_g").agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    srows = stats.collect()
    spark = df.sparkSession
    gtype = base.schema["_g"].dataType
    out_fields = (
        base.select("_g").schema
        .add("p", "double").add("rank", "long").add("value", "double")
    )
    if not srows:
        return spark.createDataFrame([], out_fields).withColumnRenamed(
            "_g", group_col
        )
    if len(srows) > max_groups:
        raise ValueError(
            f"group_exact_quantiles: {len(srows)} groups exceeds "
            f"max_groups={max_groups} — the group domain must be "
            "metadata-sized (use ddsketch_quantiles_by for open domains)"
        )
    if len(srows) * n_buckets > 5_000_000:
        raise ValueError(
            f"group_exact_quantiles: {len(srows)} groups x {n_buckets} "
            "buckets exceeds the 5M-cell driver histogram budget — "
            "lower n_buckets or the group count"
        )
    # Degenerate groups (all values equal) are answered on the driver
    # from the stats alone — every quantile IS lo — instead of routing
    # n_g rows into bucket 0 and windowing the whole group.
    degenerate = [r for r in srows if float(r["_lo"]) == float(r["_hi"])]
    normal = [r for r in srows if float(r["_lo"]) != float(r["_hi"])]
    deg_df = None
    if degenerate:
        deg_df = spark.createDataFrame(
            [
                (r["_g"], float(p), int(math.ceil(p * int(r["_n"]))),
                 float(r["_lo"]))
                for r in degenerate
                for p in ps
            ],
            out_fields,
        ).withColumnRenamed("_g", group_col)
    if not normal:
        return deg_df if deg_df is not None else spark.createDataFrame(
            [], out_fields
        ).withColumnRenamed("_g", group_col)
    srows = normal
    meta = spark.createDataFrame(
        [
            (r["_g"], float(r["_lo"]),
             (float(r["_hi"]) - float(r["_lo"])) / n_buckets)
            for r in srows
        ],
        base.select("_g").schema.add("_lo", "double").add("_w", "double"),
    )
    bucket = F.when(F.col("_w") <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("_v") - F.col("_lo")) / F.col("_w")),
        ).cast("int")
    )
    # null-safe group equality (<=>): a NULL group is a group
    bucketed = (
        base.alias("bb")
        .join(
            F.broadcast(meta.alias("mm")),
            F.expr("bb._g <=> mm._g"),
        )
        .select(
            F.col("bb._g").alias("_g"),
            F.col("bb._v").alias("_v"),
            bucket.alias("_b"),
        )
    )
    hist = {}
    for r in (
        bucketed.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    ):
        hist.setdefault(r["_g"], {})[r["_b"]] = r["_c"]
    targets = []  # (_g, _b, p, rank, offset)
    for r in srows:
        g, n = r["_g"], int(r["_n"])
        cells = hist.get(g, {})
        for p in ps:
            rk = int(math.ceil(p * n))
            cum = 0
            for b in sorted(cells):
                if cum + cells[b] >= rk:
                    targets.append((g, b, float(p), rk, rk - cum))
                    break
                cum += cells[b]
    tdf = spark.createDataFrame(
        targets,
        base.select("_g").schema.add("_b", "integer").add("p", "double")
        .add("rank", "long").add("_off", "long"),
    )
    w = Window.partitionBy("_g", "p").orderBy(F.asc("_v"))
    picked = (
        bucketed.alias("xx")
        .join(
            F.broadcast(tdf.alias("tt")),
            F.expr("xx._g <=> tt._g AND xx._b = tt._b"),
        )
        .select(
            F.col("xx._g").alias("_g"),
            F.col("xx._v").alias("_v"),
            "tt.p", "tt.rank", "tt._off",
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == F.col("_off"))
        .select(
            F.col("_g").alias(group_col), "p", "rank",
            F.col("_v").alias("value"),
        )
    )
    return picked if deg_df is None else picked.unionByName(deg_df)


def group_mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cutoff: float = 3.0,
    decimals: int = 6,
) -> DataFrame:
    """EXACT robust outlier report per group: median, MAD (median
    absolute deviation, the robust sigma), and how many rows sit more
    than ``cutoff`` MADs from their group's median — the
    contamination report that mean/stddev z-scores get wrong the
    moment the contamination is heavy enough to drag the mean
    (:func:`winsorized_stats_by` is the sketch-guided cousin; this is
    the exact instrument, for metadata-sized group domains).

    Composition of :func:`group_exact_quantiles` (discrete-rank
    medians, so every statistic is a true data value): group medians
    (3 passes), deviations attached via a broadcast join on the group
    key (|x - med| is one exact-rounded IEEE subtract, identical on
    any engine), deviation medians (3 more passes over the derived
    frame), and one final counting aggregate. No global sorts
    anywhere; every driver read is group-sized.

    Returns (group_col, n, median, mad, n_outliers, outlier_frac).
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    med = group_exact_quantiles(base, "_g", "_v", ps=[0.5]).select(
        "_g", F.col("value").alias("_med")
    )
    dev = (
        base.alias("bb")
        .join(F.broadcast(med.alias("me")), F.expr("bb._g <=> me._g"))
        .select(
            F.col("bb._g").alias("_g"),
            F.col("bb._v").alias("_v"),
            F.col("me._med").alias("_med"),
            F.abs(F.col("bb._v") - F.col("me._med")).alias("_dev"),
        )
    )
    mad = group_exact_quantiles(dev, "_g", "_dev", ps=[0.5]).select(
        "_g", F.col("value").alias("_mad")
    )
    return (
        dev.alias("dd")
        .join(F.broadcast(mad.alias("ma")), F.expr("dd._g <=> ma._g"))
        .select(
            F.col("dd._g").alias("_g"), "dd._v", "dd._med", "dd._dev",
            "ma._mad",
        )
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("_med").alias("median"),
            F.max("_mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("_dev") > F.lit(float(cutoff)) * F.col("_mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("_g").alias(group_col),
            "n",
            "median",
            "mad",
            "n_outliers",
            F.round(
                F.col("n_outliers") / F.col("n").cast("double"), decimals
            ).alias("outlier_frac"),
        )
    )


def _equidepth_cuts(
    df: DataFrame, value_col: str, n_bins: int, n_buckets: int
) -> "list[float]":
    """The n_bins-1 equi-depth boundaries at ranks ceil(i/n_bins * n)
    — true data doubles from the q181 targeted selection (one
    histogram pass + one windowed pick for ALL boundaries). A
    (n_bins-1)-sized driver read: boundary lists are planner metadata
    by definition (they become broadcast literals in the binning
    CASE)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    ps = [i / n_bins for i in range(1, n_bins)]
    if not ps:
        return []
    rows = exact_quantiles(df, value_col, ps, n_buckets).collect()
    return [r["value"] for r in sorted(rows, key=lambda r: r["p"])]


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 8,
    n_buckets: int = 256,
    decimals: int = 6,
) -> DataFrame:
    """EXACT equi-depth histogram — the ANALYZE histogram planners use
    for selectivity on skewed columns, and the exact sibling of q165's
    DDSketch-approximate range planner: boundaries land on TRUE data
    values at ranks ceil(i/n_bins·n) (q181's targeted selection, no
    global sort), then ONE map-side CASE pass counts rows per bin.
    Binning convention is q165's: bin = number of boundaries strictly
    below v, so boundary-valued rows land in the LEFT bin and heavy
    atoms show up as an over-full bin (the column telling you no
    boundary can split that value). Empty bins are emitted with
    n_rows = 0.

    Returns (bin 0..n_bins-1, lo, hi, n_rows, share): lo/hi are the
    surrounding boundaries, NULL at the open ends.
    """
    cuts = _equidepth_cuts(df, value_col, n_bins, n_buckets)
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(v.alias("_v"))
    bin_expr = F.lit(0)
    for c in cuts:
        bin_expr = bin_expr + F.when(
            F.lit(float(c)) < F.col("_v"), 1
        ).otherwise(0)
    counts = base.groupBy(bin_expr.cast("int").alias("bin")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    tot = base.agg(F.count(F.lit(1)).alias("_n"))
    spark = df.sparkSession
    meta = spark.createDataFrame(
        [
            (
                i,
                float(cuts[i - 1]) if i > 0 else None,
                float(cuts[i]) if i < len(cuts) else None,
            )
            for i in range(n_bins)
        ],
        "bin int, lo double, hi double",
    )
    return (
        meta.join(counts, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "lo",
            "hi",
            F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("n_rows"),
            F.round(
                F.coalesce(F.col("_c"), F.lit(0))
                / F.nullif(F.col("_n").cast("double"), F.lit(0.0)),
                decimals,
            ).alias("share"),
        )
    )


def woe_binning(
    df: DataFrame,
    feature_col: str,
    label: Column,
    n_bins: int = 8,
    n_buckets: int = 256,
    decimals: int = 6,
) -> DataFrame:
    """Weight-of-evidence feature binning — the credit-scoring /
    feature-engineering report: equi-depth bins over a numeric
    feature (true-data boundaries, q181 machinery), and per bin the
    positive/negative counts, WOE = ln((n_pos/total_pos) /
    (n_neg/total_neg)), and the information-value contribution
    (dist_pos − dist_neg)·WOE whose sum ranks the feature's
    separating power. A bin with zero positives or negatives gets
    NULL woe/iv_term (ln(0) — the honest answer; regularize upstream
    if you must score it).

    One boundary read + ONE map-side CASE aggregate over the data;
    the totals attach from a broadcast 1-row frame. Rows with NULL
    feature or NULL label are excluded (pinned; a NULL label is not
    evidence for either class).

    Returns (bin, lo, hi, n_rows, n_pos, n_neg, woe, iv_term).
    """
    lab = label.cast("boolean")
    base = df.filter(
        F.col(feature_col).isNotNull() & lab.isNotNull()
    ).select(
        F.col(feature_col).cast("double").alias("_v"),
        lab.alias("_y"),
    )
    cuts = _equidepth_cuts(base, "_v", n_bins, n_buckets)
    bin_expr = F.lit(0)
    for c in cuts:
        bin_expr = bin_expr + F.when(
            F.lit(float(c)) < F.col("_v"), 1
        ).otherwise(0)
    counts = base.groupBy(bin_expr.cast("int").alias("bin")).agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_pos"),
    )
    tot = base.agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_tp"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_tn"),
    )
    spark = df.sparkSession
    meta = spark.createDataFrame(
        [
            (
                i,
                float(cuts[i - 1]) if i > 0 else None,
                float(cuts[i]) if i < len(cuts) else None,
            )
            for i in range(n_bins)
        ],
        "bin int, lo double, hi double",
    )
    dp = F.col("n_pos") / F.nullif(F.col("_tp").cast("double"), F.lit(0.0))
    dn = F.col("n_neg") / F.nullif(F.col("_tn").cast("double"), F.lit(0.0))
    woe = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.log(dp / dn)
    )
    return (
        meta.join(counts, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "lo",
            "hi",
            F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.col("_pos"), F.lit(0)).cast("long").alias("n_pos"),
            (
                F.coalesce(F.col("_c"), F.lit(0))
                - F.coalesce(F.col("_pos"), F.lit(0))
            ).cast("long").alias("n_neg"),
            "_tp",
            "_tn",
        )
        .select(
            "bin",
            "lo",
            "hi",
            "n_rows",
            "n_pos",
            "n_neg",
            F.round(woe, decimals).alias("woe"),
            F.round((dp - dn) * woe, decimals).alias("iv_term"),
        )
    )


def exact_weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    ps: "list[float]",
    n_buckets: int = 1024,
    cents: int = 2,
) -> DataFrame:
    """WEIGHTED exact order statistics without a global sort — the
    token-weighted median document length, the byte-weighted p99 file
    size: :func:`exact_quantiles` where every row counts ``weight``
    times. Convention: the quantile is the smallest value whose
    cumulative (value-ascending) weight reaches
    rank_w = ceil(p · W) in cents-integer weight units (weights are
    quantized to ``cents`` decimals and summed as BIGINT — the
    q175/q197 exactness trick — so thresholds and comparisons are
    integer-exact and replay bit-for-bit in SQL).

    Same three-phase targeted selection as q181/q187: one (min, max,
    ΣW) aggregate; one equi-width histogram of WEIGHT SUMS (driver
    walk locates each p's bucket and the weight offset within it);
    ONE final job for all ps — in-bucket rows collapse to distinct
    values (per-value weight sums), a window cumulates only
    ~n/n_buckets rows per p, and min(value) where the cumulative
    reaches the offset is the answer. Rows with NULL or non-positive
    weight are excluded (a zero-weight row cannot carry rank).

    Returns one row per p: (p, wrank, value).
    """
    import math

    from pyspark.sql.window import Window

    for p in ps:
        if not (0.0 < p <= 1.0):
            raise ValueError(
                f"exact_weighted_quantiles: p={p} outside (0, 1]"
            )
    spark = df.sparkSession
    out_schema = "p double, wrank bigint, value double"
    if not ps:
        return spark.createDataFrame([], out_schema)
    scale = 10 ** cents
    v = F.col(value_col).cast("double")
    wq = F.round(F.col(weight_col).cast("double") * F.lit(scale)).cast(
        "long"
    )
    base = (
        df.select(v.alias("_v"), wq.alias("_w"))
        .filter(
            F.col("_v").isNotNull()
            & F.col("_w").isNotNull()
            & (F.col("_w") > 0)
        )
    )
    stats = base.agg(
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
        F.sum("_w").alias("W"),
    ).collect()[0]
    if stats["W"] is None:
        return spark.createDataFrame([], out_schema)
    lo, hi, W = float(stats["lo"]), float(stats["hi"]), int(stats["W"])
    if hi == lo:
        return spark.createDataFrame(
            [(float(p), int(math.ceil(p * W)), lo) for p in ps], out_schema
        )
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("_v") - F.lit(lo)) / F.lit(width)),
    ).cast("int")
    hist = {
        r["_b"]: r["_ws"]
        for r in base.groupBy(bucket.alias("_b"))
        .agg(F.sum("_w").alias("_ws"))
        .collect()
    }
    targets = []  # (bucket, p, wrank, local weight offset)
    for p in ps:
        rank_w = int(math.ceil(p * W))
        cum = 0
        for b in sorted(hist):
            if cum + hist[b] >= rank_w:
                targets.append((b, float(p), rank_w, rank_w - cum))
                break
            cum += hist[b]
    tdf = spark.createDataFrame(
        targets, "_b int, p double, wrank long, _off long"
    )
    wv = (
        Window.partitionBy("p")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.withColumn("_b", bucket)
        .join(F.broadcast(tdf), "_b")
        .groupBy("p", "wrank", "_off", "_v")
        .agg(F.sum("_w").alias("_vw"))
        .withColumn("_cum", F.sum("_vw").over(wv))
        .filter(F.col("_cum") >= F.col("_off"))
        .groupBy("p", "wrank")
        .agg(F.min("_v").alias("value"))
        .select("p", "wrank", "value")
    )
