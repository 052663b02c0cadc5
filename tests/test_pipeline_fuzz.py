"""Randomized differential testing: hypothesis-generated capex frames
run through BOTH pipelines; robust-key multisets must match exactly.

Value pools cover every rule family's trigger and near-miss domains
(FIXTURES.md §1). Four benign anchor rows (one per split-function) are
always appended: the reference crashes on an empty function group at
its split-filter stages (empty-Series .apply quirk), which is an
implementation accident, not a semantic we reproduce.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import RAW_COLUMNS, make_raw_row

STATUSES = ["Approved", "Rejected", "REJECTED ", "Sent for Approval", "Approval in Progress"]
FUNCTIONS = ["Ops", "IT", "Admin", "Ops through IT", "Sales", "vigilance", "CS", "0"]
CATEGORIES = [
    "COMPUTER", "PLANT & MACHINERY", "LEASEHOLD IMPROVEMENTS",
    "OFFICE EQUIPMENTS", "FURINTURE", "SOFTWARE", "OFFICE EQPT",
]
ITEMS = [
    "Conveyor Belt 20m", "Ceiling Fans", "Industrial Fan", "Fanfold Tray",
    "CCTV - BRANCH", "Dome Camera", "Laptop Dell 5420", "Split AC 2 Ton",
    "Storage Rack AC", "STOOL - Ops", "X-Ray Machine", "DWS System",
    "Sorter Arm", "AMC for Gensets", "Rental Forklift", "Table - Counter",
    "Fire Extingushier", "Weighing Scale", "Dock Leveler",
]
REMARKS = [
    "standard request", "no laptop required", "need macbook pro",
    "dark store expansion", "for DS hub", "feeds processing",
    "new counter for billing", "counter installation", "pilot run",
    "no pilot run", "latest spec", "industrial grade", "demo setup",
    "test bench", "this is not a test", "", None, "budget – approved",
]
VENDORS = ["Acme Corp", "Techno hub", "", None]
SELECTED = ["Yes", "-", None]
BRANCHES = ["A01", "B01", "M01", "ZZZ", "XXX"]
AMOUNTS = [100.0, 500.0, 1234.56]

row_strategy = st.builds(
    make_raw_row,
    request_no=st.sampled_from([f"F{i:03d}" for i in range(12)]),
    status=st.sampled_from(STATUSES),
    function=st.sampled_from(FUNCTIONS),
    category=st.sampled_from(CATEGORIES),
    item=st.sampled_from(ITEMS),
    remarks=st.sampled_from(REMARKS),
    vendor=st.sampled_from(VENDORS),
    selected=st.sampled_from(SELECTED),
    branch=st.sampled_from(BRANCHES),
    amount=st.sampled_from(AMOUNTS),
)

ANCHORS = [
    make_raw_row(request_no=f"ANCHOR-{fn}", function=fn, item=f"Anchor Unit {fn}",
                 remarks="routine operational purchase")
    for fn in ("Ops", "IT", "Admin", "Ops through IT")
] + [
    # the reference's F9 stage has the same empty-group crash for the
    # approval statuses
    make_raw_row(request_no="ANCHOR-SFA", status="Sent for Approval",
                 item="Anchor Unit SFA", remarks="routine operational purchase")
]


def _ref_keys(pdf):
    import pandas as pd

    req = pdf["RequestNo"].fillna("").astype(str).str.strip()
    item = pdf["AssetItemName"].fillna("").astype(str).str.strip()
    vendor = (
        pdf["VendorName"].fillna("").astype(str).str.strip().replace({"nan": ""})
    )
    full = req + "|" + item + "|" + vendor
    short = req + "|" + item
    return sorted(full.where(vendor != "", short).tolist())


@settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.lists(row_strategy, min_size=3, max_size=25))
def test_fuzzed_frames_match_reference(spark, reference_mod, office_pdf, tmp_path_factory, rows):
    import pandas as pd

    from capex_data_pipeline_spark.plans.pipeline import run_pipeline
    from capex_data_pipeline_spark.functions.keys import robust_key
    from capex_data_pipeline_spark.schemas import CAPEX_RAW_SCHEMA, OFFICE_LOCATION_SCHEMA
    from pyspark.sql import functions as F

    import numpy as np

    raw_pdf = pd.DataFrame(rows + ANCHORS, columns=RAW_COLUMNS)
    # CSV-faithful missing values (None -> NaN); see conftest.raw_pdf
    raw_pdf = raw_pdf.where(raw_pdf.notna(), np.nan)

    tmp = tmp_path_factory.mktemp("fuzz")
    office_pdf.to_csv(tmp / "office_location.csv", index=False)
    mp = pytest.MonkeyPatch()
    try:
        mp.chdir(tmp)
        reference_mod.EXCLUSION_REASONS.clear()
        with contextlib.redirect_stdout(io.StringIO()):
            ref_processed, *_ = reference_mod.process_capex_data(raw_pdf.copy(), None)
    finally:
        mp.undo()

    raw_sdf = spark.createDataFrame(raw_pdf, schema=CAPEX_RAW_SCHEMA)
    office_sdf = spark.createDataFrame(office_pdf, schema=OFFICE_LOCATION_SCHEMA)
    ours = run_pipeline(raw_sdf, office_sdf)
    got = sorted(
        r.k
        for r in ours.processed.select(
            robust_key(F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")).alias("k")
        ).collect()
    )
    assert got == _ref_keys(ref_processed)
