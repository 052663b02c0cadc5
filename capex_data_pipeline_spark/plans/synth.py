"""Deterministic capex-shaped input synthesized from the testdata star
schema — so the full cleaning pipeline can run (and be benchmarked) at
any scale factor, with rule-triggering value patterns injected by
modular arithmetic (no RNG, reproducible in any engine).

orders (1.5M rows at sf1) becomes the fact table; nation ⋈ region
becomes the office dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capex_data_pipeline_spark.sources.parquet import read_table

_STATUS = ["Approved", "Sent for Approval", "Approval in Progress", "Approved", "Rejected"]
_FUNCTION = ["Ops", "IT", "Admin", "Ops through IT", "Sales", "vigilance"]
_CATEGORY = [
    "COMPUTER",
    "PLANT & MACHINERY",
    "LEASEHOLD IMPROVEMENTS",
    "OFFICE EQUIPMENTS",
    "FURINTURE",
    "SOFTWARE",
]
_ITEM_SUFFIX = [
    "Conveyor Belt",
    "Ceiling Fans",
    "CCTV - BRANCH",
    "Laptop Dell",
    "X-Ray Machine",
    "Sorter Arm",
    "Split AC 2 Ton",
    "Weighing Scale",
    "AMC for Gensets",
    "Rental Forklift",
]
# entries 5-6 carry regioncode words (nation-name prefixes) so unmapped
# branches exercise the remarks-fallback join — IND and UNI are duplicated
# prefixes in the nation-derived dim, probing the dict-order semantics
_REMARKS = [
    "standard operational request",
    "no laptop required for this branch",
    "dark store expansion phase",
    "test setup for pilot",
    "new counter for billing",
    "central purchase for IND region",
    "pending UNI approval latest",
    "",
]


def _pick(col, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (col % len(values) + 1).cast("int"))


def synthesize_office(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        # deterministic row order: the zone join's dict semantics (first
        # occurrence wins on duplicate regioncodes) depend on it
        .orderBy("n_nationkey")
        .select(
            F.col("r_name").alias("zone"),
            F.col("n_name").alias("region"),
            F.col("n_name").alias("city"),
            F.concat(F.lit("B"), F.col("n_nationkey").cast("string")).alias("office"),
            F.concat(F.col("n_name"), F.lit(" office")).alias("name"),
            (F.col("n_nationkey") * 1.5).cast("double").alias("lat"),
            (F.col("n_regionkey") * 10.0).cast("double").alias("lon"),
            F.substring(F.col("n_name"), 1, 3).alias("regioncode"),
        )
    )


def synthesize_capex_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One capex request row per order; every rule family gets triggered
    by some residue class (statuses, device words, dark-store remarks,
    unmapped branches with regioncode fallbacks, '-' vendors, ...)."""
    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ck = F.col("o_custkey")
    amount = F.round(F.col("o_totalprice") / 10, 2)
    return o.select(
        F.concat(F.lit("REQ-"), (k / 4).cast("long").cast("string")).alias("RequestNo"),
        F.date_format(F.col("o_orderdate"), "dd-MM-yyyy").alias("RequestDate"),
        F.lit("Asset").alias("RequestType"),
        F.lit("Asset").alias("AssetFacilityType"),
        F.col("o_totalprice").alias("CapexRequestAmount"),
        F.lit("A").alias("RegionCode"),
        # ~1/7 of branch codes don't exist in the office dim -> fallback path
        F.when(k % 7 == 0, F.concat(F.lit("ZZ"), (ck % 5).cast("string")))
        .otherwise(F.concat(F.lit("B"), (ck % 25).cast("string")))
        .alias("BranchCode"),
        F.concat(F.lit("Branch "), (ck % 25).cast("string")).alias("BranchName"),
        F.lit("Dom Exp").alias("RequestBU"),
        _pick(ck, _FUNCTION).alias("RequestFunction"),
        F.lit("Yes").alias("IsBudgeted"),
        F.lit(None).cast("string").alias("BudgetRefNo"),
        _pick(k, _REMARKS).alias("UserRemarks"),
        _pick(k, _STATUS).alias("CurrentStatus"),
        F.date_format(F.col("o_orderdate"), "dd-MM-yyyy").alias("LastActionDate"),
        F.lit(None).cast("string").alias("LastActionRemarks"),
        F.lit(None).cast("string").alias("LastActionRejectionReason"),
        F.lit("approver").alias("LastActionBy"),
        _pick(ck + 1, _CATEGORY).alias("AssetCategoryName"),
        F.concat(
            _pick(k + 3, _ITEM_SUFFIX), F.lit(" #"), (k % 97).cast("string")
        ).alias("AssetItemName"),
        F.when(k % 3 == 0, F.lit("Central")).otherwise(F.lit("Local")).alias(
            "VendorProcType"
        ),
        F.lit("OPSASSET").alias("ItemCategory"),
        F.lit(0.0).alias("ItemRatePerQtyForCentralProcItems"),
        (k % 5 + 1).alias("AssetItemQty"),
        amount.alias("AssetItemRatePerQty"),
        F.lit(0.0).alias("AssetAddlCharges"),
        F.lit(None).cast("string").alias("AssetAddlChargesRemarks"),
        amount.alias("AssetItemAmount"),
        F.lit(None).cast("string").alias("AssetItemRemarks"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Vendor "), (k % 11).cast("string")))
        .alias("VendorName"),
        amount.alias("Vendor_RatePerQty"),
        amount.alias("Vendor_TotalAmount"),
        F.lit("30 days").alias("Vendor_DeliveryPeriod"),
        F.lit("30 days").alias("Vendor_PaymentTerms"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .when(k % 3 == 1, F.lit("Yes"))
        .otherwise(F.lit("-"))
        .alias("IsSelectedVendor"),
    )
