"""Pins for the round-11 VERDICT's prescribed round-12 tasks:

3. range_partition_planner raises loudly on mixed-sign / nonpositive
   input instead of silently planning the positive half (and the
   sketch-cell driver read carries an explicit bound).
8. gini_coefficient's histogram driver read is guarded by an explicit
   n_buckets cap (the q187 grouped-quantiles guard convention).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_range_planner_raises_on_mixed_sign(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        range_partition_planner,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in [-3.0, -1.0, 0.0, 2.0, 5.0, 9.0, 12.0]],
        "v double",
    )
    with pytest.raises(ValueError, match="rows with value <= 0"):
        range_partition_planner(df, F.col("v"), n_bins=2)


def test_range_planner_positive_input_unchanged(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        range_partition_planner,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "v double"
    )
    out = range_partition_planner(df, F.col("v"), n_bins=4).collect()
    assert len(out) == 4
    assert sum(r["n_rows"] for r in out) == 100
    # equi-depth within sketch tolerance: no bin wildly off 1/4
    assert all(0.15 <= r["share"] <= 0.35 for r in out)


def test_range_planner_all_nonpositive_still_raises(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        range_partition_planner,
    )

    df = spark.createDataFrame([(-1.0,), (0.0,)], "v double")
    with pytest.raises(ValueError, match="rows with value <= 0"):
        range_partition_planner(df, F.col("v"), n_bins=2)


def test_gini_n_buckets_guard(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        gini_coefficient,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="n_buckets"):
        gini_coefficient(df, "v", n_buckets=(1 << 20) + 1)
    with pytest.raises(ValueError, match="n_buckets"):
        gini_coefficient(df, "v", n_buckets=1)
    # in-range still exact: G of {1,2} = 1/6
    row = gini_coefficient(df, "v", n_buckets=16).collect()[0]
    assert row["gini"] == round(1 / 6, 6)
