"""Differential tests: our Spark pipeline vs the reference implementation
run side-by-side on the same inputs (SURVEY.md §5.2 strategy 1).

The comparison is order-insensitive (the reference's split-union stages
reorder rows; output order is not part of its semantics — SURVEY.md §4.1).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from capex_data_pipeline_spark.functions.keys import robust_key
from capex_data_pipeline_spark.plans.pipeline import CapexPipelineConfig, run_pipeline

REFERENCE_DIR = os.environ.get("CAPEX_REFERENCE_DIR", "/root/reference")


def _run_reference(reference_mod, raw_pdf, office_pdf, monkeypatch, tmp_path):
    """Run the reference pipeline on a pandas frame, isolated from CWD
    artifacts (no final_data.csv -> F15 skipped) and with a clean audit."""
    import pandas as pd

    monkeypatch.chdir(tmp_path)
    office_pdf.to_csv(tmp_path / "office_location.csv", index=False)
    reference_mod.EXCLUSION_REASONS.clear()
    processed, pivot, amc, sorter, rental = reference_mod.process_capex_data(
        raw_pdf.copy(), None
    )
    return processed, pivot, amc, sorter, rental


def _ref_keys(pdf):
    return sorted(_key_series(pdf).tolist())


def _spark_keys(sdf):
    rows = sdf.select(
        robust_key(
            F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")
        ).alias("k")
    ).collect()
    return sorted(r.k for r in rows)


@pytest.fixture(scope="module")
def both_results(request, spark, raw_pdf, office_pdf, raw_sdf, office_sdf):
    reference_mod = request.getfixturevalue("reference_mod")
    monkeypatch = pytest.MonkeyPatch()
    tmp_path = request.getfixturevalue("tmp_path_factory").mktemp("refrun")
    try:
        ref = _run_reference(reference_mod, raw_pdf, office_pdf, monkeypatch, tmp_path)
    finally:
        monkeypatch.undo()
    ours = run_pipeline(
        raw_sdf, office_sdf, golden=None, config=CapexPipelineConfig(fail_open=True)
    )
    return ref, ours


def test_processed_keys_match(both_results):
    (ref_processed, *_), ours = both_results
    assert _spark_keys(ours.processed) == _ref_keys(ref_processed)


def test_processed_row_count(both_results):
    (ref_processed, *_), ours = both_results
    assert ours.processed.count() == len(ref_processed)


def test_zone_region_category_values(both_results):
    (ref_processed, *_), ours = both_results
    import pandas as pd

    ref = ref_processed.copy()
    ref["_k"] = _key_series(ref)
    ref_map = {
        k: (str(z), str(r), str(c))
        for k, z, r, c in zip(
            ref["_k"], ref["Zone"], ref["Region"], ref["AssetCategoryName_2"]
        )
    }
    rows = ours.processed.select(
        robust_key(
            F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")
        ).alias("k"),
        "Zone",
        "Region",
        "AssetCategoryName_2",
    ).collect()
    for r in rows:
        assert (str(r.Zone), str(r.Region), str(r.AssetCategoryName_2)) == ref_map[r.k], r.k


def _key_series(pdf):
    """The reference's own astype-first builder (process_capex.py:168-179):
    astype(str) runs before fillna, so nulls render as the literal 'nan'
    (only VendorName's 'nan' is cleaned back to '')."""
    import pandas as pd

    req = pdf["RequestNo"].astype(str).fillna("").str.strip()
    item = pdf["AssetItemName"].astype(str).fillna("").str.strip()
    vendor = (
        pdf.get("VendorName", pd.Series([""] * len(pdf)))
        .astype(str)
        .fillna("")
        .str.strip()
        .replace({"nan": ""})
    )
    full = req + "|" + item + "|" + vendor
    short = req + "|" + item
    return full.where(vendor != "", short)


def test_extracts_match(both_results):
    (_, _, ref_amc, ref_sorter, ref_rental), ours = both_results
    assert ours.amc.count() == len(ref_amc)
    assert ours.sorter.count() == len(ref_sorter)
    assert ours.rental.count() == len(ref_rental)


def test_pivot_matches(both_results):
    (_, ref_pivot, *_), ours = both_results
    # our default parses dates day-first (documented fix); compare with
    # legacy mode off against the reference's groups ignoring the date
    # bug by comparing group counts and total amount
    ref_total = float(ref_pivot["AssetItemAmount"].sum())
    got = ours.pivot.agg(F.sum("AssetItemAmount").alias("s")).collect()[0]["s"]
    assert abs((got or 0.0) - ref_total) < 1e-6


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DIR, "sample_raw.csv")),
    reason="reference fixtures not available",
)
def test_sample_raw_end_to_end(request, spark, reference_mod):
    """The strongest parity signal: both engines on the reference's own
    2,238-row fixture; expected stage counts in BASELINE.md (787 final)."""
    import pandas as pd

    from capex_data_pipeline_spark.schemas import (
        CAPEX_RAW_SCHEMA,
        OFFICE_LOCATION_SCHEMA,
    )
    from capex_data_pipeline_spark.sources.csv import read_csv_with_fallback

    raw_pdf = pd.read_csv(
        os.path.join(REFERENCE_DIR, "sample_raw.csv"), encoding="cp1252"
    )
    office_pdf = pd.read_csv(os.path.join(REFERENCE_DIR, "office_location.csv"))

    monkeypatch = pytest.MonkeyPatch()
    tmp_path = request.getfixturevalue("tmp_path_factory").mktemp("refrun_sample")
    try:
        ref_processed, *_ = _run_reference(
            reference_mod, raw_pdf, office_pdf, monkeypatch, tmp_path
        )
    finally:
        monkeypatch.undo()

    raw_sdf = read_csv_with_fallback(
        spark, os.path.join(REFERENCE_DIR, "sample_raw.csv"), schema=CAPEX_RAW_SCHEMA
    )
    office_sdf = read_csv_with_fallback(
        spark,
        os.path.join(REFERENCE_DIR, "office_location.csv"),
        schema=OFFICE_LOCATION_SCHEMA,
    )
    ours = run_pipeline(raw_sdf, office_sdf, golden=None)

    assert _spark_keys(ours.processed) == _ref_keys(ref_processed)
    assert ours.processed.count() == len(ref_processed)

    # Stage-count report == the reference's printed per-stage trail
    # (BASELINE.md: 2238 -> 1626 -> 1008 -> 883 -> 729 -> 675 -> 558 ->
    # 529 -> 528 -> 524, then W1 -> 424 and fail-open -> 787)
    report = [(r.removed, r.remaining) for r in ours.stage_report.collect()]
    assert report == [
        (612, 1626),
        (618, 1008),
        (125, 883),
        (154, 729),
        (54, 675),
        (117, 558),
        (29, 529),
        (1, 528),
        (4, 524),
    ]
    assert ours.cleaned.count() == 524

    from capex_data_pipeline_spark.plans.pipeline import render_stage_report

    rendered = render_stage_report(ours, initial_count=2238, final_count=787)
    assert rendered.endswith(
        "Processing completed!\n"
        "Initial records: 2238\n"
        "Final records: 787\n"
        "Records removed: 1451"
    )
    assert "Remaining: 1626 rows" in rendered


def test_golden_filter_differential(request, spark, reference_mod, raw_pdf,
                                    office_pdf, raw_sdf, office_sdf):
    """F15 exercised in BOTH engines: every other diff test runs with no
    final_data.csv (reference skip-when-missing; golden=None here), so
    the golden-tagging branch would otherwise ship untested."""
    import pandas as pd

    golden_pdf = pd.DataFrame(
        {"RequestNo": sorted(raw_pdf["RequestNo"].dropna().unique())[::2]}
    )
    monkeypatch = pytest.MonkeyPatch()
    tmp = request.getfixturevalue("tmp_path_factory").mktemp("refrun_golden")
    try:
        monkeypatch.chdir(tmp)
        office_pdf.to_csv(tmp / "office_location.csv", index=False)
        golden_pdf.to_csv(tmp / "final_data.csv", index=False)
        reference_mod.EXCLUSION_REASONS.clear()
        ref_processed, *_ = reference_mod.process_capex_data(raw_pdf.copy(), None)
    finally:
        monkeypatch.undo()

    ours = run_pipeline(
        raw_sdf, office_sdf, golden=spark.createDataFrame(golden_pdf)
    )
    assert ours.processed.count() == len(ref_processed)
    assert _spark_keys(ours.processed) == _ref_keys(ref_processed)
    # and the golden rule shows up in the audit lineage
    golden_rows = ours.audit.filter(
        F.col("label") == "Post: Not in final_data RequestNos"
    ).count()
    assert golden_rows > 0
