"""Declared schemas for every table the engine reads.

The reference lets pandas infer every dtype (process_capex.py:151,1096;
app.py:30,46). At scale, inference means an extra full scan and
nondeterministic types — so every reader here takes an explicit schema.
Dates arrive as ``dd-MM-yyyy`` strings and are parsed with
``to_date(col, 'dd-MM-yyyy')`` downstream (fixing the reference's
month-first misparse of ambiguous dates, process_capex.py:928 — see
SURVEY.md §1.2; the legacy behavior is available behind
``legacy_dates=True`` in the pipeline config).
"""

from __future__ import annotations

from pyspark.sql import types as T

_S = T.StringType()
_D = T.DoubleType()


def _f(name: str, dtype, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


#: 35-column raw capex fact table (FIXTURES.md §1; sample_raw.csv header).
CAPEX_RAW_SCHEMA = T.StructType(
    [
        _f("RequestNo", _S),
        _f("RequestDate", _S),
        _f("RequestType", _S),
        _f("AssetFacilityType", _S),
        _f("CapexRequestAmount", _D),
        _f("RegionCode", _S),
        _f("BranchCode", _S),
        _f("BranchName", _S),
        _f("RequestBU", _S),
        _f("RequestFunction", _S),
        _f("IsBudgeted", _S),
        _f("BudgetRefNo", _S),
        _f("UserRemarks", _S),
        _f("CurrentStatus", _S),
        _f("LastActionDate", _S),
        _f("LastActionRemarks", _S),
        _f("LastActionRejectionReason", _S),
        _f("LastActionBy", _S),
        _f("AssetCategoryName", _S),
        _f("AssetItemName", _S),
        _f("VendorProcType", _S),
        _f("ItemCategory", _S),
        _f("ItemRatePerQtyForCentralProcItems", _D),
        _f("AssetItemQty", T.LongType()),
        _f("AssetItemRatePerQty", _D),
        _f("AssetAddlCharges", _D),
        _f("AssetAddlChargesRemarks", _S),
        _f("AssetItemAmount", _D),
        _f("AssetItemRemarks", _S),
        _f("VendorName", _S),
        _f("Vendor_RatePerQty", _D),
        _f("Vendor_TotalAmount", _D),
        _f("Vendor_DeliveryPeriod", _S),
        _f("Vendor_PaymentTerms", _S),
        _f("IsSelectedVendor", _S),
    ]
)

#: office_location dimension (651 rows in the reference; FIXTURES.md §2).
OFFICE_LOCATION_SCHEMA = T.StructType(
    [
        _f("zone", _S),
        _f("region", _S),
        _f("city", _S),
        _f("office", _S),
        _f("name", _S),
        _f("lat", _D),
        _f("lon", _D),
        _f("regioncode", _S),
    ]
)

#: golden/final table = raw + (Zone, Region, AssetCategoryName_2),
#: inserted at their positions in the shipped file (CSV schemas are
#: positional): Zone/Region after BranchName, _2 after AssetCategoryName.
def _final_fields() -> list[T.StructField]:
    out = []
    for f in CAPEX_RAW_SCHEMA.fields:
        out.append(f)
        if f.name == "BranchName":
            out.extend([_f("Zone", _S), _f("Region", _S)])
        elif f.name == "AssetCategoryName":
            out.append(_f("AssetCategoryName_2", _S))
    return out


CAPEX_FINAL_SCHEMA = T.StructType(_final_fields())

#: columns the pipeline appends to the fact table (SURVEY.md §1.2)
DERIVED_COLUMNS = (
    "AssetCategoryName_2",
    "Zone",
    "Region",
    "Category_Type",
    "CompositePrimaryKey",
    "priority",
    "ReincludedViaFailOpen",
    "FailOpenNote",
)
