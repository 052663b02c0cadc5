"""Regression tests for the round-12 ADVICE.md findings, fixed in
round 13:

1. compact_stats_cells raises early (by name) when save_as ==
   state_table instead of letting Spark fail at write time with
   'cannot overwrite a table that is also being read from'.
2. interpolated_asof: left probes with NULL time emit NULL
   value_interp/t_prev_us/t_next_us (pre-fix they resolved to the
   EARLIEST right tick), and output-column clashes raise like
   asof_join's guard.
3. referential_integrity_report: an empty child table reports
   n_child=0 (the NOT-EXISTS oracle's count(*) semantics), not NULL.
4. timeseries' cohort operator is now cohort_retention_matrix —
   distinct from analytics.cohort_retention — so the two same-named,
   differently-shaped operators can no longer be cross-imported.
5. join_graph_profile_persisted folds NULL-ndv_est columns into the
   loud named ValueError instead of a bare TypeError on float(None).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_compact_stats_cells_rejects_in_place(spark, tmp_path):
    from capex_data_pipeline_spark.extensions.state import (
        compact_stats_cells,
        save_stats_cells,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    save_stats_cells(
        df,
        ["k", "v"],
        partition=F.lit("d1"),
        table="t_r13_cells_inplace",
        b=4,
        n_buckets=2,
        path=str(tmp_path / "cells"),
    )
    with pytest.raises(ValueError, match="save_as must differ"):
        compact_stats_cells(
            spark, "t_r13_cells_inplace", "d9",
            save_as="t_r13_cells_inplace",
        )
    spark.sql("DROP TABLE IF EXISTS t_r13_cells_inplace")


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_interpolated_asof_null_probe_time_yields_null(spark):
    from capex_data_pipeline_spark.extensions.asof import interpolated_asof

    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00"), 1), ("k", None, 2)],
        "sym string, ts timestamp, probe_id long",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 09:00"), 10.0),
            ("k", _ts("2024-01-01 11:00"), 20.0),
        ],
        "sym string, ts timestamp, value double",
    )
    rows = {
        r["probe_id"]: r
        for r in interpolated_asof(left, right, "sym").collect()
    }
    # both left rows survive; the timed probe interpolates midway
    assert set(rows) == {1, 2}
    assert rows[1]["value_interp"] == pytest.approx(15.0)
    # the NULL-time probe gets NULLs, NOT the earliest tick's 10.0
    assert rows[2]["value_interp"] is None
    assert rows[2]["t_prev_us"] is None
    assert rows[2]["t_next_us"] is None


def test_interpolated_asof_output_clash_raises(spark):
    from capex_data_pipeline_spark.extensions.asof import interpolated_asof

    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00"), 0.0)],
        "sym string, ts timestamp, value_interp double",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 09:00"), 10.0)],
        "sym string, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="value_interp"):
        interpolated_asof(left, right, "sym")


def test_referential_integrity_empty_child_reports_zero(spark):
    from capex_data_pipeline_spark.extensions.cleaning import (
        referential_integrity_report,
    )

    child = spark.createDataFrame([], "fk long, x string")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = referential_integrity_report(
        [("edge", child, "fk", parent, "pk")]
    ).collect()[0]
    assert r["n_child"] == 0
    assert r["n_null_fk"] == 0
    assert r["n_orphan_keys"] == 0
    assert r["n_orphan_rows"] == 0
    assert r["orphan_row_frac"] is None


def test_cohort_operators_are_distinct_names():
    from capex_data_pipeline_spark.extensions import analytics, timeseries

    assert hasattr(analytics, "cohort_retention")
    assert hasattr(timeseries, "cohort_retention_matrix")
    # the hazard: timeseries must NOT export a same-named twin
    assert not hasattr(timeseries, "cohort_retention")


def test_advisor_null_ndv_raises_named_error(spark, tmp_path):
    """A persisted cell with _b>=0 but NULL max-rank finalizes to a
    NULL ndv_est (reg_sum over all-NULL is NULL); pre-fix the advisor
    did float(None) -> bare TypeError, post-fix the column folds into
    the loud named ValueError."""
    from capex_data_pipeline_spark.extensions.state import (
        join_graph_profile_persisted,
    )
    from capex_data_pipeline_spark.sources.bucketed import write_bucketed

    cells = spark.createDataFrame(
        [
            ("d1", "good_key", -1, 0, 0, None),
            ("d1", "good_key", 0, 3, 3, 2),
            ("d1", "weird", 0, 1, 1, None),
        ],
        "_pt string, _col string, _b int, _cnt long, _slen long, _mr int",
    )
    write_bucketed(
        cells,
        "t_r13_cells_nullndv",
        ["_col"],
        n_buckets=2,
        sort_cols=["_col", "_b"],
        path=str(tmp_path / "nullndv"),
    )
    df = spark.createDataFrame([(1, 1)], "good_key long, weird long")
    edges = [("e", df, F.col("good_key"), df, F.col("weird"))]
    with pytest.raises(ValueError, match="no usable cells.*weird"):
        join_graph_profile_persisted(
            spark,
            "t_r13_cells_nullndv",
            edges,
            {"e": ("good_key", "weird")},
            b=4,
        )
    spark.sql("DROP TABLE IF EXISTS t_r13_cells_nullndv")
