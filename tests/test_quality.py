"""Data-quality expectations: exact violation counts, single-scan plan
for row-level rules, and the gate helper. Cross-engine values are
covered by the q98 oracle."""

from __future__ import annotations

import pytest

from capex_data_pipeline_spark.extensions.quality import (
    accepted_values,
    assert_passed,
    in_range,
    not_null,
    quality_report,
    unique,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 150.0, "b"),  # out of range
            (2, None, "zz"),  # duplicate id, not-accepted value
            (None, -5.0, None),  # null id, out of range, null value
        ],
        "id long, amount double, status string",
    )


def test_quality_report_exact_counts(frame):
    rep = {
        r.rule: r
        for r in quality_report(
            frame,
            [
                not_null("id"),
                in_range("amount", 0, 100),
                accepted_values("status", ["a", "b"]),
                unique("id"),
            ],
        ).collect()
    }
    assert rep["not_null(id)"].n_violations == 1
    # NULL amount is NOT an in_range violation (three-valued logic)
    assert rep["in_range(amount,0.0,100.0)"].n_violations == 2
    # NULL status is NOT an accepted_values violation
    assert rep["accepted_values(status)"].n_violations == 1
    # ids: 1, 2, 2, NULL -> 4 rows, 3 distinct key tuples (NULL counts)
    assert rep["unique(id)"].n_violations == 1
    assert all(r.n_rows == 4 for r in rep.values())
    assert rep["not_null(id)"].violation_frac == 0.25
    assert not rep["unique(id)"].passed


def test_quality_report_passes_clean_frame(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    rep = quality_report(df, [not_null("id"), unique("id")])
    assert all(r.passed for r in rep.collect())
    assert_passed(rep)  # must not raise


def test_quality_report_empty_input_passes(spark):
    df = spark.createDataFrame([], "id long, s string")
    rows = quality_report(df, [not_null("id"), unique("id", "s")]).collect()
    assert all(r.passed and r.n_violations == 0 for r in rows)
    assert all(r.violation_frac == 0.0 for r in rows)


def test_quality_report_null_key_components_count(spark):
    # two identical NULL-containing tuples ARE duplicates of each other
    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), (None, "y")], "a string, b string"
    )
    (row,) = quality_report(df, [unique("a", "b")]).collect()
    assert row.n_violations == 1


def test_assert_passed_raises_with_detail(frame):
    rep = quality_report(frame, [not_null("id")])
    with pytest.raises(ValueError, match=r"not_null\(id\): 1/4"):
        assert_passed(rep)


def test_quality_report_validates_rules(frame):
    with pytest.raises(ValueError):
        quality_report(frame, [])
    with pytest.raises(ValueError):
        quality_report(
            frame, [not_null("id", name="r"), unique("id", name="r")]
        )


def test_row_rules_share_one_scan(frame):
    """All row-level rules compile into ONE aggregate over ONE scan."""
    plan = (
        quality_report(
            frame,
            [not_null("id"), in_range("amount", 0, 100),
             accepted_values("status", ["a"])],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ") <= 1, plan


def test_custom_rule_counts_predicate_hits(spark):
    from capex_data_pipeline_spark.extensions.quality import (
        custom,
        quality_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "paid"), (2, -5.0, "paid"), (3, -1.0, "void"), (4, None, "paid")],
        "id long, amount double, status string",
    )
    (row,) = quality_report(
        df, [custom("neg_paid", "amount < 0 AND status = 'paid'")]
    ).collect()
    # NULL amount -> NULL predicate -> not a violation (3VL)
    assert row.n_violations == 1 and row.kind == "custom"


def test_profile_columns_and_snapshot_drift(spark):
    from capex_data_pipeline_spark.extensions.quality import (
        profile_columns,
        snapshot_drift,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "b")], "id long, s string"
    )
    curr = spark.createDataFrame(
        [(1, None), (None, None), (None, "b"), (4, "c")],
        "id long, s string",
    )
    prof = {r.column: r for r in profile_columns(base, ["id", "s"]).collect()}
    assert prof["id"].n_rows == 3 and prof["id"].n_null == 1
    assert prof["id"].n_distinct == 3  # {1, 2, NULL} — NULL counts
    assert prof["s"].n_distinct == 2

    drift = {
        r.column: r for r in snapshot_drift(base, curr, ["id", "s"]).collect()
    }
    assert drift["s"].n_null_base == 0 and drift["s"].n_null_curr == 2
    assert drift["s"].null_frac_delta == pytest.approx(0.5, abs=1e-9)
    assert drift["id"].n_distinct_curr == 3  # {1, NULL, 4}
    with pytest.raises(ValueError):
        profile_columns(base, [])


def test_profile_columns_rejects_duplicates(spark):
    from capex_data_pipeline_spark.extensions.quality import profile_columns

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unique"):
        profile_columns(df, ["id", "id"])


def test_numeric_histogram_hand_computed(spark):
    """Hand-built 4-bucket histogram over [0, 8]: width 2, the top
    edge (8.0) folds into the last bucket, NULLs excluded, empty
    buckets absent."""
    from capex_data_pipeline_spark.extensions.quality import numeric_histogram

    df = spark.createDataFrame(
        [(0.0,), (1.9,), (2.0,), (7.9,), (8.0,), (None,)], "v double"
    )
    rows = {r.bucket: r for r in numeric_histogram(df, "v", 4).collect()}
    assert set(rows) == {0, 1, 3}  # bucket 2 ([4,6)) is empty -> absent
    assert rows[0].n_rows == 2 and (rows[0].bucket_lo, rows[0].bucket_hi) == (0.0, 2.0)
    assert rows[1].n_rows == 1 and (rows[1].bucket_lo, rows[1].bucket_hi) == (2.0, 4.0)
    # 7.9 plus the max value 8.0 both land in the last bucket
    assert rows[3].n_rows == 2 and (rows[3].bucket_lo, rows[3].bucket_hi) == (6.0, 8.0)


def test_numeric_histogram_degenerate_and_guard(spark):
    """min == max puts every row in bucket 0 with zero-width edges;
    nbins < 1 is rejected."""
    from capex_data_pipeline_spark.extensions.quality import numeric_histogram

    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "v double")
    rows = numeric_histogram(df, "v", 4).collect()
    assert len(rows) == 1
    assert (rows[0].bucket, rows[0].n_rows) == (0, 3)
    assert rows[0].bucket_lo == 5.0 and rows[0].bucket_hi == 5.0
    with pytest.raises(ValueError, match="nbins"):
        numeric_histogram(df, "v", 0)

def test_unique_rejects_zero_columns():
    from capex_data_pipeline_spark.extensions.quality import unique

    with pytest.raises(ValueError, match="at least one column"):
        unique()
