"""Round-13 OPTIMIZATION pins: every rewrite that changed an
operator's internals is differentially tested against the shape it
replaced (identical rows, not just plausible ones)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    )


# ---------------------------------------------------------------- advisor


def test_table_stats_sketch_multi_equals_sequential(spark):
    """table_stats_sketch_multi (one unioned job) must produce the
    SAME per-column rows as the sequential per-table calls it
    replaced in q200 — the widths the advisor derives depend on it."""
    from capex_data_pipeline_spark.extensions.sketches import (
        table_stats_sketch,
        table_stats_sketch_multi,
    )

    a = spark.range(200).select(
        F.col("id").alias("a_key"),
        (F.col("id") % 7).cast("string").alias("a_val"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 13)
        .alias("a_sparse"),
    )
    b = spark.range(90).select(
        (F.col("id") * 3).alias("b_key"),
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("b_val"),
    )
    seq = _rows(
        table_stats_sketch(a, ["a_key", "a_val", "a_sparse"]).unionByName(
            table_stats_sketch(b, ["b_key", "b_val"])
        )
    )
    multi = _rows(
        table_stats_sketch_multi(
            [(a, ["a_key", "a_val", "a_sparse"]), (b, ["b_key", "b_val"])]
        )
    )
    assert multi == seq


def test_table_stats_sketch_multi_rejects_duplicate_columns(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        table_stats_sketch_multi,
    )

    a = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="globally unique"):
        table_stats_sketch_multi([(a, ["k"]), (a, ["k"])])


def test_save_stats_cells_multi_equals_append_loop(spark, tmp_path):
    """One unioned bucketed write must persist EXACTLY the rows the
    overwrite + append loop wrote (q228 / q251 nightly job), so every
    state reader sees identical cells."""
    from capex_data_pipeline_spark.extensions.state import (
        save_stats_cells,
        save_stats_cells_multi,
    )
    from capex_data_pipeline_spark.sources.bucketed import drop_table

    a = spark.range(120).select(
        F.col("id").alias("a_key"), (F.col("id") % 9).alias("a_val")
    )
    b = spark.range(40).select((F.col("id") * 2).alias("b_key"))
    parts = [
        (a, ["a_key", "a_val"], F.lit("ta")),
        (b, ["b_key"], F.lit("tb")),
    ]
    try:
        for i, (df, cols, pt) in enumerate(parts):
            save_stats_cells(
                df, cols, partition=pt, table="t_opt13_seq", b=4,
                n_buckets=4, path=str(tmp_path / "seq"),
                mode="overwrite" if i == 0 else "append",
            )
        save_stats_cells_multi(
            parts, table="t_opt13_multi", b=4, n_buckets=4,
            path=str(tmp_path / "multi"), mode="overwrite",
        )
        seq = _rows(spark.table("t_opt13_seq"))
        multi = _rows(spark.table("t_opt13_multi"))
        assert multi == seq and len(multi) > 0
    finally:
        drop_table(spark, "t_opt13_seq")
        drop_table(spark, "t_opt13_multi")
        shutil.rmtree(tmp_path, ignore_errors=True)
