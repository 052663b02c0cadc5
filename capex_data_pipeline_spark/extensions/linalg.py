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
