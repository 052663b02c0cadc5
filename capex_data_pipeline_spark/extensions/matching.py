"""Fuzzy string matching (entity resolution): similarity join between
two string columns by character-trigram Jaccard — "which rows of A
refer to the same thing as rows of B" when keys don't exist and
spellings drift.

Scale shape: NEVER the all-pairs similarity matrix.  Each side
projects to distinct character trigrams (map-only); candidate pairs
come from an equi-join ON THE TRIGRAM (compact key); Jaccard is then
computed FROM THE JOIN COUNTS alone — ``|A∩B|`` is the number of
joined trigrams, ``|A∪B| = |A| + |B| − |A∩B|`` from per-row trigram
counts — so strings are never re-compared and no second text pass
exists.  Total work is Σ_gram cnt_left(g)·cnt_right(g): dominated by
stop-grams ("the", "ing"), which is what ``max_gram_freq`` prunes —
the documented recall trade (a pair matched ONLY by ubiquitous grams
is below any useful threshold anyway; the same reasoning as the LSH
bucket caps in dedup.py, and like them it reports what it dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_trigrams(col: Column) -> Column:
    """Distinct character 3-grams of the normalized (lowercase,
    alnum-collapsed) string; strings shorter than 3 chars yield the
    whole string as one gram (so they can still match exactly)."""
    from capex_data_pipeline_spark.extensions.dedup import normalized_text

    s = normalized_text(col)
    return F.when(F.length(s) < 3, F.array(s)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 2),
                lambda i: s.substr(i, F.lit(3)),
            )
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    threshold: float = 0.6,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Trigram-Jaccard similarity join.  Returns
    ``(left_id, right_id, jaccard)`` for pairs with
    ``jaccard >= threshold``.

    ``max_gram_freq`` (optional) drops trigrams occurring in more than
    that many rows of EITHER side from candidate generation — the
    stop-gram prune that bounds hot-key blowup; exact Jaccard is still
    computed over ALL grams of surviving pairs, so only pairs whose
    every shared gram is ubiquitous are lost.
    """
    l = left.select(
        F.col(left_id).alias("_lid"),
        F.explode(char_trigrams(F.col(left_col))).alias("_g"),
    )
    r = right.select(
        F.col(right_id).alias("_rid"),
        F.explode(char_trigrams(F.col(right_col))).alias("_g"),
    )
    ln = l.groupBy("_lid").agg(F.count(F.lit(1)).alias("_ln"))
    rn = r.groupBy("_rid").agg(F.count(F.lit(1)).alias("_rn"))
    lc, rc = l, r
    if max_gram_freq is not None:
        hot = (
            l.groupBy("_g").agg(F.countDistinct("_lid").alias("_c1"))
            .join(
                r.groupBy("_g").agg(F.countDistinct("_rid").alias("_c2")),
                "_g",
                "outer",
            )
            .filter(
                (F.coalesce(F.col("_c1"), F.lit(0)) > max_gram_freq)
                | (F.coalesce(F.col("_c2"), F.lit(0)) > max_gram_freq)
            )
            .select("_g")
        )
        lc = l.join(hot, "_g", "left_anti")
        rc = r.join(hot, "_g", "left_anti")
    shared = (
        lc.join(rc, "_g")
        .groupBy("_lid", "_rid")
        .agg(F.count(F.lit(1)).alias("_shared_pruned"))
    )
    # exact |A∩B| over ALL grams for surviving pairs (recompute via a
    # semi-restricted join only when pruning removed grams)
    if max_gram_freq is not None:
        pairs = shared.select("_lid", "_rid")
        # restrict BOTH sides to candidate ids before re-joining on the
        # gram — without this the re-rank would regenerate every
        # hot-gram pair the prune exists to avoid
        l_cand = l.join(pairs.select("_lid").distinct(), "_lid", "left_semi")
        r_cand = r.join(pairs.select("_rid").distinct(), "_rid", "left_semi")
        shared = (
            l_cand.join(r_cand, "_g")
            .join(pairs, ["_lid", "_rid"], "left_semi")
            .groupBy("_lid", "_rid")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
    else:
        shared = shared.withColumnRenamed("_shared_pruned", "_shared")
    jac = F.col("_shared") / (F.col("_ln") + F.col("_rn") - F.col("_shared"))
    return (
        shared.join(ln, "_lid")
        .join(rn, "_rid")
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )
