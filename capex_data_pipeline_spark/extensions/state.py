"""Durable state for the incremental operators — persist-and-fold.

q189 (incremental connected components) and q184 (incremental table
statistics) prove their FOLDS are lossless: folding a batch into
existing state equals recomputing from scratch. But proved in-session,
the state is re-derived every run, so the daily-fold economics — "pay
for the batch, never rescan history" — are simulated. This module makes
the state DURABLE, extending the q75 pattern
(``dedup.build_neardup_index`` -> ``sources/bucketed.py``): state is
written ONCE as a parquet table BUCKETED on its fold key, and every
later fold reads it back already hash-partitioned, so the state side of
the fold join/aggregate has ZERO Exchange — the state never crosses the
network again, however many daily batches fold in.

Why bucketing is the whole story at 100 TB:

* CC labels are CORPUS-sized (one row per document). A naive fold
  shuffles them three times per day (label lookup for each edge
  endpoint + the seen-vertex anti join). Bucketed on ``vertex``, all
  three joins stream the state from local buckets; only the BATCH-sized
  side shuffles. ``tests/test_state.py`` pins this: no Exchange node in
  the fold plan has the state scan in its subtree.
* Stats cells are partitions x cols x (2^b + 1) rows — small per day
  but unbounded over years. Bucketed on the column key, the history
  merge (groupBy over all persisted cells) satisfies its distribution
  straight from the scan: zero Exchange on the only state-sized
  aggregate in the fold.

The fold outputs are certified by full-recompute oracles (q198/q199):
reading state from disk changes WHERE the labels come from, never what
they are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Column
from pyspark.sql import functions as F


# ----------------------------------------------------------------- CC


def save_cc_state(
    labels: DataFrame,
    table: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> DataFrame:
    """Persist a (vertex, component) labeling as a parquet table
    bucketed (and per-bucket sorted) on ``vertex`` — the layout every
    later :func:`cc_fold_persisted` call reads with zero state-side
    Exchange. Size ``n_buckets`` like shuffle partitions: one bucket of
    labels ~ one executor-memory unit at target scale. Returns the
    read-back frame."""
    from capex_data_pipeline_spark.sources.bucketed import write_bucketed

    write_bucketed(
        labels.select("vertex", "component"),
        table,
        ["vertex"],
        n_buckets=n_buckets,
        sort_cols=["vertex"],
        path=path,
    )
    return labels.sparkSession.table(table)


def cc_fold_persisted(
    spark: SparkSession,
    state_table: str,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    save_as: str | None = None,
    save_path: str | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Fold a batch of new edges into the PERSISTED labeling written by
    :func:`save_cc_state` (or a previous fold's ``save_as``). The fold
    itself is :func:`~capex_data_pipeline_spark.extensions.graph.
    cc_incremental` — union-find on supernodes, batch-bounded — but the
    corpus-sized labeling now streams from its buckets: the two
    endpoint label lookups and the seen-vertex anti join all run with
    no Exchange on the state side, so a daily fold's shuffle bill is
    the BATCH, full stop.

    ``save_as`` writes the updated labeling back as the next state
    table (same bucketed layout), closing the day-over-day loop.
    Returns the updated (vertex, component) frame (the read-back frame
    when ``save_as`` is given, so downstream consumers also see the
    bucketed layout)."""
    from capex_data_pipeline_spark.extensions.graph import cc_incremental

    labels = spark.table(state_table)
    folded = cc_incremental(
        labels, new_edges, src_col=src_col, dst_col=dst_col,
        max_iter=max_iter,
    )
    if save_as:
        return save_cc_state(
            folded, save_as, n_buckets=n_buckets, path=save_path
        )
    return folded


# -------------------------------------------------------------- stats


def save_stats_cells(
    df: DataFrame,
    cols: "list[str]",
    partition: Column,
    table: str,
    b: int = 6,
    n_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Build the per-partition statistics cell frame (the table a daily
    ingest persists: one row per (partition, column, bucket) carrying
    count / summed width / max HLL rank) and write it bucketed on the
    column key — the layout whose history merge needs no Exchange.
    ``mode='append'`` adds a new day's cells to an existing state
    table. Returns the read-back frame."""
    from capex_data_pipeline_spark.extensions.sketches import (
        _stats_cells,
        _stats_melt,
    )
    from capex_data_pipeline_spark.sources.bucketed import write_bucketed

    if not cols:
        raise ValueError("save_stats_cells: cols must be non-empty")
    melted = _stats_melt(df.withColumn("_pt", partition), cols,
                         extra=["_pt"])
    cells = _stats_cells(melted, b, keys=("_pt", "_col"))
    write_bucketed(
        cells,
        table,
        ["_col"],
        n_buckets=n_buckets,
        sort_cols=["_col", "_b"],
        path=path,
        mode=mode,
    )
    return df.sparkSession.table(table)


def stats_fold_persisted(
    spark: SparkSession,
    state_table: str,
    new_df: DataFrame | None = None,
    cols: "list[str] | None" = None,
    b: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """Table statistics from the PERSISTED cell state written by
    :func:`save_stats_cells`, optionally folding in a new (not yet
    persisted) frame's cells — counts and widths merge by sum, HLL
    registers by max, then the identical q178 finalize arithmetic.

    The only state-sized operation — the merge aggregate over every
    persisted partition's cells — reads the bucketed table with zero
    Exchange (the groupBy keys contain the bucket key). The optional
    new-day side is cols x (2^b + 1) cells AFTER its own batch-sized
    aggregate, so the outer merge join moves sketch-sized frames only.

    Sketch-only output (column_name, n_rows, n_null, null_frac,
    avg_len, ndv_est): the exact-NDV ride-along q178 carries is
    deliberately absent — true distinct counts don't merge from
    counters, and rescanning history for them is precisely the cost
    this state exists to drop (VERDICT r10 calls it the
    drop-at-100TB column)."""
    from capex_data_pipeline_spark.extensions.sketches import (
        _stats_cells,
        _stats_finalize,
        _stats_melt,
    )

    m = 1 << b
    state = spark.table(state_table)
    # the one state-sized op: bucketed on _col => no Exchange
    merged = state.groupBy("_col", "_b").agg(
        F.sum("_cnt").alias("_cnt"),
        F.sum("_slen").alias("_slen"),
        F.max("_mr").alias("_mr"),
    )
    if new_df is not None:
        if not cols:
            raise ValueError(
                "stats_fold_persisted: cols required with new_df"
            )
        day = _stats_cells(_stats_melt(new_df, cols), b)
        merged = (
            merged.alias("s")
            .join(day.alias("d"), ["_col", "_b"], "full_outer")
            .select(
                "_col",
                "_b",
                (
                    F.coalesce(F.col("s._cnt"), F.lit(0))
                    + F.coalesce(F.col("d._cnt"), F.lit(0))
                ).alias("_cnt"),
                (
                    F.coalesce(F.col("s._slen"), F.lit(0))
                    + F.coalesce(F.col("d._slen"), F.lit(0))
                ).alias("_slen"),
                F.greatest(F.col("s._mr"), F.col("d._mr")).alias("_mr"),
            )
        )
    return _stats_finalize(merged, None, m, decimals)
