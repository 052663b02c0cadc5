"""Derived-column / conditional-update operators P1-P8 (SURVEY.md §2.3).

Each is a narrow transformation — no shuffle, fused by Catalyst into the
surrounding stage's whole-stage-codegen loop.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# P1 — category normalization map (process_capex.py:725-738). Applied to
# UPPER(TRIM(AssetCategoryName)); unmapped values pass through.
CATEGORY_NORMALIZATION = {
    "LEASEHOLD IMPROVEMENTS": "LEASEHOLD",
    "LEASE HOLD": "LEASEHOLD",
    "LEASEHOLD IMPROVEMENT": "LEASEHOLD",
    "FURNITURE": "FURNITURE",
    "FURNITURES": "FURNITURE",
    "FURINTURE": "FURNITURE",
    "FURINITURE": "FURNITURE",
    "OFFICE EQUIPMENTS": "OFFICE EQUIPMENTS",
    "OFFICE EQUIPMENT": "OFFICE EQUIPMENTS",
    "OFFICE-EQUIPMENTS": "OFFICE EQUIPMENTS",
    "OFFICE EQUIPTMENTS": "OFFICE EQUIPMENTS",
    "OFFICE EQPT": "OFFICE EQUIPMENTS",
}

# P2 — typo pre-normalization used only inside the office/furniture
# re-categorization (process_capex.py:750-757; note: a subset of P1's map).
_P2_TYPO_MAP = {
    "FURNITURES": "FURNITURE",
    "FURINTURE": "FURNITURE",
    "FURINITURE": "FURNITURE",
    "OFFICE EQUIPMENT": "OFFICE EQUIPMENTS",
    "OFFICE-EQUIPMENTS": "OFFICE EQUIPMENTS",
    "OFFICE EQUIPTMENTS": "OFFICE EQUIPMENTS",
    "OFFICE EQPT": "OFFICE EQUIPMENTS",
}

# P2 — items exempt from the office/furniture -> P&M move
# (process_capex.py:747). Substring, case-insensitive — so 'AC' exempts
# any item containing the letters "ac" (e.g. "Rack"): reference behavior,
# reproduced deliberately.
P2_ALLOWED_ITEMS = ("CCTV", "FireEx", "Projector", "Chairs", "AC", "Fans", "Stools")

# P3 — items split out of PLANT & MACHINERY (process_capex.py:704)
P3_SEPARATED_ITEMS = ("X-Ray", "DWS", "Sorter", "TBC")

# P4 — Category_Type keyword groups (process_capex.py:886-901). Assignment
# order Regular < AMC < Sorter < Rental_Opex; later assignments win on
# overlap (process_capex.py:906-909).
AMC_KEYWORDS = ("AMC", "Annual Maintenance Contract", "Maintenance Contract")
SORTER_KEYWORDS = ("Sorter", "Sorting Machine", "Sorting Equipment")
RENTAL_KEYWORDS = ("Rental", "Lease", "Hire", "Rent")

MUM_REMARK_SUFFIX = " [MUM Region - Centrally raised for Pan-India]"


def _contains_ci(col: Column, literal: str) -> Column:
    """pandas ``str.contains(lit, case=False, na=False)`` equivalent:
    case-insensitive substring, null -> False."""
    return F.coalesce(
        F.lower(col.cast("string")).contains(literal.lower()), F.lit(False)
    )


def contains_any_ci(col: "Column | str", literals) -> Column:
    """Case-insensitive any-substring match. Pass the column NAME when
    possible: that path builds ONE ``F.expr`` (a Column-tree OR chain
    costs ~3 py4j round-trips per literal, and the keyword lists run in
    every pipeline plan build)."""
    if isinstance(col, str):
        from capex_data_pipeline_spark.operators.rules import _contains_any_ci

        return F.expr(_contains_any_ci(col, literals))
    out = F.lit(False)
    for lit in literals:
        out = out | _contains_ci(col, lit)
    return out


def _mapped(col: Column, mapping: dict[str, str]) -> Column:
    lookup = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    return F.coalesce(lookup[col], col)


def normalized_category(asset_category: Column) -> Column:
    """P1 — ``AssetCategoryName_2`` expression (process_capex.py:718-740)."""
    return _mapped(F.upper(F.trim(asset_category.cast("string"))), CATEGORY_NORMALIZATION)


def apply_normalize_category(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "AssetCategoryName_2", normalized_category(F.col("AssetCategoryName"))
    )


def apply_office_furniture_recat(df: DataFrame) -> DataFrame:
    """P2 — office-equipment/furniture rows whose item is not in the
    exempt list become PLANT & MACHINERY (process_capex.py:742-770).

    Only ``AssetCategoryName`` needs mutating: the reference also writes
    ``AssetCategoryName_2`` here, but P1 (which runs after P2 in the DAG,
    process_capex.py:1123-1125) recomputes _2 from the mutated
    AssetCategoryName, so that write is dead.
    """
    cat = _mapped(F.upper(F.trim(F.col("AssetCategoryName").cast("string"))), _P2_TYPO_MAP)
    is_office = F.coalesce(cat.rlike(r"\bOFFICE\b.*\bEQUIP"), F.lit(False))
    is_furniture = F.coalesce(cat.rlike(r"\bFURNIT"), F.lit(False))
    exempt = contains_any_ci("AssetItemName", P2_ALLOWED_ITEMS)
    should_change = (is_office | is_furniture) & ~exempt
    return df.withColumn(
        "AssetCategoryName",
        F.when(should_change, F.lit("PLANT & MACHINERY")).otherwise(
            F.col("AssetCategoryName")
        ),
    )


def apply_separate_plant_machinery(df: DataFrame) -> DataFrame:
    """P3 — X-Ray/DWS/Sorter/TBC items get a dedicated
    ``PLANT & MACHINERY - <item>`` category label (process_capex.py:699-716).
    Later items in the list win when several match (loop order)."""
    expr = F.col("AssetCategoryName_2")
    for item in P3_SEPARATED_ITEMS:  # later iterations overwrite earlier
        expr = F.when(
            _contains_ci(F.col("AssetItemName"), item),
            F.lit(f"PLANT & MACHINERY - {item}"),
        ).otherwise(expr)
    return df.withColumn("AssetCategoryName_2", expr)


def category_type_col() -> Column:
    """P4 — Category_Type tag; reverse of the reference's assignment order
    so the *last* write wins (process_capex.py:906-909)."""
    item = "AssetItemName"
    return (
        F.when(contains_any_ci(item, RENTAL_KEYWORDS), F.lit("Rental_Opex"))
        .when(contains_any_ci(item, SORTER_KEYWORDS), F.lit("Sorter"))
        .when(contains_any_ci(item, AMC_KEYWORDS), F.lit("AMC"))
        .otherwise(F.lit("Regular"))
    )


def apply_category_type(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """P4 — returns (tagged df, amc, sorter, rental extracts). The three
    extracts may overlap, exactly as in the reference (they are filters of
    the *untagged* frame with their own Category_Type constant,
    process_capex.py:890-903)."""
    tagged = df.withColumn("Category_Type", category_type_col())
    item = "AssetItemName"
    amc = df.filter(contains_any_ci(item, AMC_KEYWORDS)).withColumn(
        "Category_Type", F.lit("AMC")
    )
    sorter = df.filter(contains_any_ci(item, SORTER_KEYWORDS)).withColumn(
        "Category_Type", F.lit("Sorter")
    )
    rental = df.filter(contains_any_ci(item, RENTAL_KEYWORDS)).withColumn(
        "Category_Type", F.lit("Rental_Opex")
    )
    return tagged, amc, sorter, rental


def apply_mum_remarks(df: DataFrame) -> DataFrame:
    """P5 — append the pan-India note to UserRemarks for MUM/MUMBAI region
    rows (process_capex.py:835-845). astype(str) semantics: a null remark
    becomes the literal 'nan' before the suffix is appended."""
    region = F.upper(F.trim(F.col("Region").cast("string")))
    is_mum = region.isin("MUMBAI", "MUM")
    remark_str = F.coalesce(F.col("UserRemarks").cast("string"), F.lit("nan"))
    return df.withColumn(
        "UserRemarks",
        F.when(is_mum, F.concat(remark_str, F.lit(MUM_REMARK_SUFFIX))).otherwise(
            F.col("UserRemarks")
        ),
    )


def priority_col() -> Column:
    """P8 — representative-row priority score (process_capex.py:1020-1023).
    Exact equality checks (not trimmed/case-folded), as in the reference."""
    return (
        F.when(F.col("CurrentStatus") == "Approved", 100).otherwise(0)
        + F.when(F.col("CurrentStatus") == "Sent for Approval", 50).otherwise(0)
        + F.when(F.col("IsSelectedVendor") == "Yes", 10).otherwise(0)
    )
