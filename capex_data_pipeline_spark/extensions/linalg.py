"""Distributed linear algebra over embedding columns.

Engine-portable PCA via power iteration: the route to a top principal
component that never materializes the d×d Gram/covariance matrix and
never shuffles anything wider than a (dim) key — per round the data
pays ONE map-only projection pass plus ONE 64-group hash aggregate,
so the shape survives a 1000-executor 100 TB corpus unchanged (the
model state is d doubles riding the driver as plan literals, exactly
like the k-means centers in ``similarity.kmeans_lloyd``).

Cross-engine determinism levers (shared with kmeans_lloyd): every
model value is rounded to a fixed scale INSIDE the engine before it
feeds forward (per-round re-anchoring, so ulp noise never compounds),
sequential array folds match DuckDB's ``list_reduce`` IEEE op order
(0.0-seeded fold == first-element-seeded fold since 0 + x == x), and
``round(…) + 0.0`` collapses IEEE -0.0 so value hashes agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_array(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _fold_sum(terms: Column, decimals: int) -> Column:
    """round(sequential fold of terms, decimals) + 0.0 — the IEEE op
    sequence DuckDB's first-element-seeded list_reduce performs."""
    s = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)
    return F.round(s, decimals) + F.lit(0.0)


def pca_power_projection(
    df: DataFrame,
    rounds: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Project every vector onto the corpus's top principal component,
    estimated by ``rounds`` of power iteration on the (implicit)
    covariance matrix: v ← normalize( (1/n) Σᵢ (xᵢ-μ)((xᵢ-μ)·v) ).

    The covariance matrix itself is NEVER formed — each round is a
    map-only scalar projection sᵢ = (xᵢ-μ)·v (v and μ are plan
    literals) followed by one per-dimension mean aggregate of sᵢ·(xᵢ-μ)
    (d groups, map-side partials), i.e. O(n·d) work and d doubles of
    driver traffic per round, versus the O(n·d²) Gram-matrix route.
    This is the standard big-data PCA shape (e.g. the randomized/power
    SVD family); embedding-decorrelation and whitening pipelines over
    web-scale corpora use exactly this pass.

    Deterministic init: v₀ = round(1/√d, decimals) in every dimension
    (computed engine-side so both engines round identically).
    Degenerate guard: a zero-norm update keeps the previous direction.

    Returns ``(id_col, score)`` with score = round((x-μ)·v_final,
    decimals) — fully re-derivable by an independent SQL engine.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    from capex_data_pipeline_spark.cache import persisted

    pts = persisted(
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        ).filter(F.col("_v").isNotNull() & (F.size("_v") > 0))
    )
    d_row = pts.agg(F.min(F.size("_v")).alias("d")).collect()
    if not d_row or d_row[0]["d"] is None:
        raise ValueError("pca_power_projection: no non-empty vectors")
    d = int(d_row[0]["d"])
    pts = pts.filter(F.size("_v") == d)

    # per-dim mean, rounded engine-side (d rows of driver traffic)
    mu_rows = (
        pts.select(F.posexplode("_v").alias("_dim", "_x"))
        .groupBy("_dim")
        .agg((F.round(F.avg("_x"), decimals) + F.lit(0.0)).alias("_m"))
        .collect()
    )
    mu = [0.0] * d
    for r in mu_rows:
        mu[r["_dim"]] = r["_m"]

    # v0: engine-computed so Spark's rounding (not Python's) decides
    spark = df.sparkSession
    v0 = spark.range(1).select(
        F.round(F.lit(1.0) / F.sqrt(F.lit(float(d))), decimals).alias("w")
    ).collect()[0]["w"]
    v = [v0] * d

    def centered_terms(v_lit: Column, mu_lit: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(d)),
            lambda i: (
                F.element_at("_v", i) - F.element_at(mu_lit, i)
            )
            * F.element_at(v_lit, i),
        )

    for _ in range(rounds):
        v_lit, mu_lit = _lit_array(v), _lit_array(mu)
        s_df = pts.withColumn(
            "_s", _fold_sum(centered_terms(v_lit, mu_lit), decimals)
        )
        t_df = (
            s_df.select("_s", F.posexplode("_v").alias("_dim", "_x"))
            .groupBy("_dim")
            .agg(
                (
                    F.round(
                        F.avg(
                            F.col("_s")
                            * (
                                F.col("_x")
                                - F.element_at(mu_lit, F.col("_dim") + 1)
                            )
                        ),
                        decimals,
                    )
                    + F.lit(0.0)
                ).alias("_t")
            )
        )
        # norm + normalize engine-side; d rows of driver traffic
        norm_df = t_df.agg(
            F.round(F.sqrt(F.sum(F.col("_t") * F.col("_t"))), decimals).alias(
                "_n"
            )
        )
        new_rows = (
            t_df.crossJoin(norm_df)
            .select(
                "_dim",
                (
                    F.round(
                        F.col("_t") / F.nullif(F.col("_n"), F.lit(0.0)),
                        decimals,
                    )
                    + F.lit(0.0)
                ).alias("_w"),
            )
            .collect()
        )
        new_v = list(v)
        for r in new_rows:
            if r["_w"] is not None:
                new_v[r["_dim"]] = r["_w"]
        v = new_v

    v_lit, mu_lit = _lit_array(v), _lit_array(mu)
    return pts.select(
        F.col(id_col),
        _fold_sum(centered_terms(v_lit, mu_lit), decimals).alias("score"),
    )


def hashed_buckets(text: Column, n_buckets: int) -> Column:
    """Sorted-distinct md5 feature buckets of the normalized words of
    ``text`` — the BINARY (presence) variant of the feature hashing
    that ``textstats.hashed_linear_score`` uses for inference, sorted
    so downstream sequential folds visit buckets in the same order in
    every engine (DuckDB ``list_sort(list_distinct(...))`` mirrors it
    exactly; first-occurrence order would NOT be portable)."""
    from capex_data_pipeline_spark.extensions.dedup import normalized_text

    words = F.filter(F.split(normalized_text(text), " "), lambda s: s != "")
    return F.array_sort(
        F.array_distinct(
            F.transform(
                words,
                lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast(
                    "long"
                )
                % n_buckets,
            )
        )
    )


def logreg_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 64,
    rounds: int = 3,
    lr: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """Train a hashed bag-of-words logistic-regression quality
    classifier by full-batch gradient descent — the TRAINING half of
    the fastText/DCLM-style pipeline whose inference half is
    ``textstats.hashed_linear_score`` (q89): the weights this returns
    (integer milli-units in ``weight_milli``) plug straight into that
    scorer.

    Features are BINARY presence bits over ``n_buckets`` md5 word
    buckets (see ``hashed_buckets``); the model is ``n_buckets``
    weights plus a bias (feature -1). Each round is:

        zᵢ = round(b + Σ_{k∈bucketsᵢ} w[k], decimals)      (map-only)
        pᵢ = round(sigmoid(zᵢ), decimals)                  (map-only)
        g_k = round(Σᵢ (pᵢ-yᵢ)·x_{ik} / n, decimals)       (ONE agg)
        w ← round(w - lr·g, decimals)   (engine-side, plan literals)

    Scale shape (same as ``pca_power_projection`` / k-means): the
    corpus is tokenized ONCE into a persisted compact (id, buckets,
    y) frame; per round the data pays one map-only scoring pass plus
    ONE hash aggregate with ``n_buckets + 1`` groups (map-side
    partials), and the model rides the driver as ``n_buckets + 1``
    doubles compiled into the next round's plan — no per-row Python,
    no weight-table join, no driver-side data. Full-batch GD (not
    SGD) is the deterministic choice: no sample order to disagree on.

    Cross-engine determinism: every model value is re-anchored to
    ``decimals`` inside the engine each round; the per-doc weight sum
    is a 0.0-seeded sequential fold over the SORTED bucket list
    (DuckDB ``list_reduce`` op order); ``round(…) + 0.0`` collapses
    -0.0. The one libm crossing is ``exp`` inside the sigmoid —
    rounded to ``decimals`` immediately, so engines disagree only if
    exp lands within an ulp of a 0.5·10^-decimals boundary.

    Returns ``(feature, weight, weight_milli)``: ``n_buckets`` rows
    for feature 0..n_buckets-1 plus one bias row at feature -1, with
    ``weight_milli = round(weight·1000)`` as BIGINT.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from capex_data_pipeline_spark.cache import persisted

    spark = df.sparkSession
    docs = persisted(
        df.select(
            hashed_buckets(F.col(text_col), n_buckets).alias("_bs"),
            F.col(label_col).cast("int").alias("_y"),
        )
    )
    n = docs.count()
    if n == 0:
        raise ValueError("logreg_train: empty corpus")

    w = [0.0] * n_buckets
    b = 0.0
    bias_key = F.lit(-1).cast("long")
    for _ in range(rounds):
        w_lit = _lit_array(w)
        # z = round(round(fold(w[k]), d) + b, d); empty docs -> b only
        z = F.round(
            _fold_sum(
                F.transform(
                    "_bs",
                    lambda k: F.element_at(w_lit, (k + 1).cast("int")),
                ),
                decimals,
            )
            + F.lit(b),
            decimals,
        )
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), decimals) + F.lit(
            0.0
        )
        resid = docs.select(
            (p - F.col("_y")).alias("_r"),
            F.concat("_bs", F.array(bias_key)).alias("_ks"),
        )
        g_df = (
            resid.select("_r", F.explode("_ks").alias("_k"))
            .groupBy("_k")
            .agg(
                (
                    F.round(F.sum("_r") / F.lit(float(n)), decimals)
                    + F.lit(0.0)
                ).alias("_g")
            )
        )
        prev = F.when(F.col("_k") == -1, F.lit(b)).otherwise(
            F.element_at(w_lit, (F.col("_k") + 1).cast("int"))
        )
        new_rows = g_df.select(
            "_k",
            (
                F.round(prev - F.lit(float(lr)) * F.col("_g"), decimals)
                + F.lit(0.0)
            ).alias("_w"),
        ).collect()
        for r in new_rows:  # absent buckets: g == 0, weight unchanged
            if r["_k"] == -1:
                b = r["_w"]
            else:
                w[int(r["_k"])] = r["_w"]

    w_lit = _lit_array(w)
    feats = spark.range(-1, n_buckets).select(
        F.col("id").cast("int").alias("feature")
    )
    weight = F.when(F.col("feature") == -1, F.lit(b)).otherwise(
        F.element_at(w_lit, F.col("feature") + 1)
    )
    return feats.select(
        "feature",
        (weight + F.lit(0.0)).alias("weight"),
        F.round(weight * F.lit(1000.0), 0).cast("long").alias("weight_milli"),
    )


def binned_roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 64,
    decimals: int = 6,
) -> DataFrame:
    """Binned ROC curve + AUC — the evaluation step that closes the
    in-engine classifier loop (train q129 → score q89 → calibrate
    q128 → EVALUATE): scores quantize onto a ``bins``-cell equal-width
    grid (1-row min/max broadcast, the q105 stats pattern), each
    occupied bin becomes one ROC operating point (threshold sweep from
    high score down), and AUC is the trapezoid over the curve.

    Exact-AUC-at-scale footnote, stated honestly: rank-based AUC needs
    a GLOBAL sort of every score (the single-partition window this
    engine lints against) or an O(P·N) pair join; the binned form is
    the standard scale answer — its AUC converges to the exact one as
    ``bins`` grows and IS exact whenever scores are already discrete
    at bin resolution.

    Engine-portable by construction: cumulative TP/FP are INTEGER
    slice-sums over the (bounded, keyless-aggregated) bin array and
    the trapezoid numerator Σ (cfp_i−cfp_{i−1})·(ctp_i+ctp_{i−1}) is
    exact integer arithmetic — ONE final division makes the float, so
    the oracle replays AUC value-exactly, not approximately.

    NULL scores are excluded (no operating point); needs at least one
    positive AND one negative label, else AUC is NULL. Returns one
    row per occupied bin, high-score bins first: (bin, n_pos, n_neg,
    tpr, fpr, auc) with auc repeated (single-frame contract).
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    scored = df.filter(F.col(score_col).isNotNull()).select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    )
    stats = scored.agg(
        F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
    )
    top = bins - 1
    span = F.when(
        F.col("_hi") > F.col("_lo"), F.col("_hi") - F.col("_lo")
    ).otherwise(F.lit(1.0))
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor(
                (F.col("_s") - F.col("_lo")) / span * F.lit(float(bins))
            ).cast("int"),
            F.lit(top),
        ),
    )
    per_bin = (
        scored.crossJoin(F.broadcast(stats))
        .select(b.alias("bin"), "_y")
        .groupBy("bin")
        .agg(
            F.sum("_y").cast("long").alias("n_pos"),
            F.sum(1 - F.col("_y")).cast("long").alias("n_neg"),
        )
    )
    # keyless aggregate -> ONE row carrying the (bounded) bin array:
    # the lint-sanctioned way to run a cumulative over it
    one = per_bin.agg(
        F.reverse(
            F.array_sort(
                F.collect_list(F.struct("bin", "n_pos", "n_neg"))
            )
        ).alias("_a"),
        F.sum("n_pos").alias("_P"),
        F.sum("n_neg").alias("_N"),
    )

    def _cum(field: str, upto: Column) -> Column:
        return F.aggregate(
            F.slice(F.col("_a"), F.lit(1), upto),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x[field],
        )

    n = F.size("_a")
    auc_numer = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: (_cum("n_neg", i) - _cum("n_neg", i - 1))
            * (_cum("n_pos", i) + _cum("n_pos", i - 1)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    auc = F.when(
        (F.col("_P") > 0) & (F.col("_N") > 0),
        F.round(
            auc_numer.cast("double")
            / (F.lit(2.0) * F.col("_P") * F.col("_N")),
            decimals,
        ),
    )
    summary = one.select("_a", "_P", "_N", auc.alias("auc"))
    ex = summary.select(
        "_a", "_P", "_N", "auc", F.posexplode("_a").alias("_i", "_row")
    )
    cum_tp = _cum("n_pos", F.col("_i") + 1)
    cum_fp = _cum("n_neg", F.col("_i") + 1)
    return ex.select(
        F.col("_row.bin").alias("bin"),
        F.col("_row.n_pos").alias("n_pos"),
        F.col("_row.n_neg").alias("n_neg"),
        F.when(
            F.col("_P") > 0,
            F.round(cum_tp.cast("double") / F.col("_P"), decimals),
        ).alias("tpr"),
        F.when(
            F.col("_N") > 0,
            F.round(cum_fp.cast("double") / F.col("_N"), decimals),
        ).alias("fpr"),
        "auc",
    )


def naive_bayes_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 64,
    decimals: int = 6,
) -> DataFrame:
    """Train a Bernoulli naive Bayes classifier over hashed presence
    features — the counting sibling of :func:`logreg_train` (same md5
    bucket space, same fastText-style quality-gate niche) and the
    model every "cheap prefilter before the expensive classifier"
    pipeline starts with. Training IS aggregation: class priors are
    doc counts, per-(bucket, class) likelihoods are presence counts
    with Laplace add-one smoothing —

        P(b | c) = (n_present + 1) / (n_docs_c + 2)

    so the entire trainer is one tokenize pass + TWO hash aggregates
    (class-sized and bucket×class-sized), no rounds, no driver-side
    model state. Counts are exact BIGINTs; the only float is the
    final ln of an exact integer ratio, rounded to ``decimals`` (the
    q130/q138 convention).

    Scale shape: the corpus collapses to (label, bucket-set) once;
    the explode is bounded by ≤ ``n_buckets`` per doc; both
    aggregates are map-side-combinable on compact keys. The model —
    2·``n_buckets`` rows — is the frame a scorer broadcasts.

    Returns (bucket, label, n_docs, n_present, logp_present,
    logp_absent, log_prior): a complete generative model — score a
    doc by summing logp_present over its present buckets and
    logp_absent over the rest, plus the prior.
    """
    from capex_data_pipeline_spark.cache import persisted

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    base = persisted(
        df.select(
            F.col(label_col).cast("int").alias("label"),
            hashed_buckets(F.col(text_col), n_buckets).alias("_bs"),
        )
    )
    cls = base.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    total = cls.agg(F.sum("n_docs").alias("_tot"))
    pres = (
        base.select("label", F.explode("_bs").alias("bucket"))
        .groupBy("label", "bucket")
        .agg(F.count(F.lit(1)).alias("n_present"))
    )
    spark = df.sparkSession
    grid = spark.range(n_buckets).select(
        F.col("id").alias("bucket")
    ).crossJoin(F.broadcast(cls))
    npres = F.coalesce("n_present", F.lit(0)).cast("long")
    return (
        grid.join(pres, ["label", "bucket"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "label",
            "n_docs",
            npres.alias("n_present"),
            F.round(
                F.log(
                    (npres + 1).cast("double")
                    / (F.col("n_docs") + 2).cast("double")
                ),
                decimals,
            ).alias("logp_present"),
            F.round(
                F.log(
                    (F.col("n_docs") - npres + 1).cast("double")
                    / (F.col("n_docs") + 2).cast("double")
                ),
                decimals,
            ).alias("logp_absent"),
            F.round(
                F.log(
                    F.col("n_docs").cast("double")
                    / F.col("_tot").cast("double")
                ),
                decimals,
            ).alias("log_prior"),
        )
    )
