"""Iterative graph algorithms over edge-list DataFrames — the
link-analysis half of corpus curation (domain-authority weighting for
crawl prioritization, citation ranking for document importance).

The repo's iterative-algorithm pattern lives here alongside
``dedup.dedup_clusters`` (label propagation): per-round work is plain
joins/aggregates on compact keys, rounds compose by rebuilding the
frame, and deep-plan growth is controlled with an explicit plan
boundary (the q93 lesson — see docs/SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: ranks are BIGINT micro-units (1.0 == 1_000_000)
RANK_SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    plan_boundary: bool | str | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """PageRank in exact integer micro-units (simplified damped
    variant, public formula): starting from ``r0 = 1.0`` per vertex,

    ``r'(v) = 0.15 + 0.85 · Σ_{u→v} (r(u) div out_deg(u))``

    with every step in BIGINT micro-units and FLOOR division — so the
    result is bit-identical across engines, partitionings, and runs
    (float PageRank is partial-sum-order dependent; the micro-unit
    quantization error is ≤ deg/1e6 per vertex per round, irrelevant
    for ranking). Dangling vertices (no out-edges) simply contribute
    nothing — the standard simplification; their mass is not
    redistributed.

    Scale shape: each round is ONE equi-join of the edge list to the
    current rank frame on ``src`` plus ONE hash aggregate on ``dst``
    (both compact keys), and a left join back to the vertex set so
    sink-only vertices keep the 0.15 base. The degree-annotated edge
    list and the vertex set are persisted once and reused by every
    round (the ledger rule: ``iterations``+1 consumers). Plans deepen
    linearly with rounds, so ``plan_boundary`` cuts each round's rank
    frame via :func:`cache.plan_boundary`; default on when
    ``iterations > 4`` (the q93 rule: many-consumer deep tails pay
    analyzer cost multiplicatively). Pass ``plan_boundary='staging'``
    (or set ``$SPARK_GRAFT_BOUNDARY=staging`` with a staging dir) on
    dynamic-allocation clusters, where localCheckpoint blocks die with
    their executor; ``True``/``'local'`` selects localCheckpoint.

    ``assume_distinct=True`` skips the defensive edge ``distinct()``
    (a full shuffle of the edge list) when the caller guarantees no
    duplicate (src, dst) pairs — duplicate edges would double-count
    contributions, so only set it when the input is constructed
    distinct (as the q99 registry builder is).

    Returns (vertex, rank_micro) — rank in micro-units, BIGINT.
    """
    from capex_data_pipeline_spark.cache import persisted
    from capex_data_pipeline_spark.cache import plan_boundary as _boundary

    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    if plan_boundary is None:
        plan_boundary = iterations > 4
    boundary_mode = plan_boundary if isinstance(plan_boundary, str) else None

    from pyspark.sql.window import Window

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not assume_distinct:
        e = e.distinct()
    # degree-annotated edges in ONE pass over e (window count per src —
    # the aggregate-then-self-join shape would evaluate e's producer
    # twice); persisted, reused by every round AND by the vertex set
    edeg = persisted(
        e.withColumn(
            "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
    )
    verts = persisted(
        edeg.select(F.col("src").alias("v"))
        .unionByName(edeg.select(F.col("dst").alias("v")))
        .distinct()
    )

    ranks = verts.select("v", F.lit(RANK_SCALE).cast("long").alias("r"))
    base = (RANK_SCALE * 15) // 100  # 0.15 in micro-units
    for _ in range(iterations):
        contribs = (
            edeg.join(ranks, edeg["src"] == ranks["v"])
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = verts.join(
            contribs, verts["v"] == contribs["dst"], "left"
        ).select(
            "v",
            (
                F.lit(base).cast("long")
                + F.expr("850 * coalesce(s, 0L) div 1000")
            ).alias("r"),
        )
        if plan_boundary:
            ranks = _boundary(
                ranks, mode=boundary_mode, eager=False, label="pagerank"
            )
    return ranks.select(
        F.col("v").alias("vertex"), F.col("r").alias("rank_micro")
    )
