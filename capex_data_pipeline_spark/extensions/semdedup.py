"""Semantic deduplication over an embedding column — the SemDeDup
recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", public): cluster the
embeddings with a coarse quantizer, compare pairs only WITHIN a
cluster, and drop every vector that is ≥ ``threshold`` cosine-similar
to a better-ranked cluster mate.  Keeper preference follows the paper:
LOW similarity to the cluster centroid wins (the most "prototypical"
duplicates go, the outlier representative stays).

Scale shape: identical to the IVF index build (one assignment pass,
compact integer cluster keys) plus ONE self-join per cluster.  The
self-join is quadratic in cluster size, so ``n_clusters`` must grow
with the corpus (∝ sqrt N, the FAISS sizing rule) — with bounded
cluster sizes the total pair work is N × avg_cluster_size, linear in
practice.  Cluster skew is AQE's standard skew-join case; a hard
``max_cluster_size`` escape hatch mirrors dedup._cap_buckets semantics
(opt-in recall trade, never silent — cap stats are returned the same
way).

Two quantizer modes, mirroring ``similarity.ivf_topk``:

- ``"sample"``: centers = the ``n_clusters`` corpus vectors sorting
  first by md5(id) — closed-form over the data, so a DuckDB oracle
  re-derives center pick → assignment → pair compare → removal set
  exactly (registry q67).
- ``"kmeans"``: pyspark.ml k-means centers (model state; within-engine
  reproducible only).

All similarity comparisons use values rounded to 6 decimals so the
rank order and the threshold decision are stable across engines (the
raw doubles agree bit-for-bit in practice — q36/q37 evidence — but the
contract should not depend on that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from capex_data_pipeline_spark.cache import persisted
from capex_data_pipeline_spark.extensions.similarity import (
    _neg_cosine_cells,
    cosine,
)


def semantic_dedup(
    embs: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers_mode: str = "sample",
    seed: int = 42,
    max_cluster_size: int | None = None,
    cap_stats: dict | None = None,
) -> DataFrame:
    """Mark semantic near-duplicates for removal.

    Returns one row per input vector: ``(id_col, cluster,
    centroid_sim, removed)`` where ``removed`` is true iff some
    cluster mate with STRICTLY better keeper rank (lower centroid
    similarity; id as tie-break) is ≥ ``threshold`` cosine-similar.
    The kept subset is ``.filter(~F.col("removed"))`` — exactly one
    keeper survives per duplicate pair, and a pseudo-greedy chain
    (a≈b, b≈c, a≉c) keeps only the best-ranked member, matching the
    usual SemDeDup implementation shape.

    ``max_cluster_size`` (opt-in) excludes clusters larger than the
    cap from the pair join — the within-cluster join is quadratic in
    cluster size, and a badly-balanced quantizer (e.g. ``"sample"``
    centers on clustered data) can regenerate the n² candidate blowup
    in one hot cluster. Excluded clusters' vectors pass through with
    ``removed = false`` (no comparisons, no dedup — an explicit
    recall trade, same contract as ``dedup._cap_buckets``); pass
    ``cap_stats={}`` to have ``excluded_buckets`` / ``excluded_rows``
    eagerly counted into the dict and a warning logged when nonzero.
    """
    vecs = embs.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if centers_mode == "sample":
        rows = (
            vecs.withColumn("_h", F.md5(F.col("_id").cast("string")))
            .orderBy("_h", "_id")
            .limit(n_clusters)
            .collect()
        )
        centers = [list(map(float, r._v)) for r in rows]
    elif centers_mode == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        km = KMeans(k=n_clusters, seed=seed, maxIter=10)
        model = km.fit(vecs.select(array_to_vector(F.col("_v")).alias("features")))
        centers = [list(map(float, c)) for c in model.clusterCenters()]
    else:
        raise ValueError(f"unknown centers_mode: {centers_mode!r}")

    # nearest center by cosine (ties → lowest cell index), one pass;
    # centroid_sim rounded so rank order is engine-stable
    best = F.array_sort(_neg_cosine_cells("_v", centers))[0]
    assigned = vecs.select(
        "_id",
        "_v",
        best["cell"].alias("cluster"),
        F.round(-best["negcos"], 6).alias("centroid_sim"),
    )
    # keeper rank: centroid similarity ASCENDING (SemDeDup keeps the
    # vector FARTHEST from the centroid), id tie-break
    w = Window.partitionBy("cluster").orderBy(
        F.asc("centroid_sim"), F.asc("_id")
    )
    ranked = persisted(assigned.withColumn("_rk", F.row_number().over(w)))

    pair_src = ranked
    if max_cluster_size is not None:
        from capex_data_pipeline_spark.extensions.dedup import _cap_buckets

        pair_src = _cap_buckets(
            ranked, ["cluster"], max_cluster_size, cap_stats
        )

    a = pair_src.select(
        F.col("cluster"),
        F.col("_id").alias("_aid"),
        F.col("_v").alias("_av"),
        F.col("_rk").alias("_ark"),
    )
    b = pair_src.select(
        F.col("cluster"),
        F.col("_id").alias("_bid"),
        F.col("_v").alias("_bv"),
        F.col("_rk").alias("_brk"),
    )
    removed_ids = (
        a.join(b, "cluster")
        .filter(F.col("_ark") < F.col("_brk"))
        .filter(F.round(cosine(F.col("_av"), F.col("_bv")), 6) >= F.lit(threshold))
        .select(F.col("_bid").alias("_id"))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        ranked.join(removed_ids, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            "centroid_sim",
            F.coalesce(F.col("_rm"), F.lit(False)).alias("removed"),
        )
    )
